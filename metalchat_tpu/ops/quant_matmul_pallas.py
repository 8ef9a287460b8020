"""Pallas fused dequant+matmul for weight-only INT8/INT4 decode.

The first big win over the reference (SURVEY.md §7 stage 4): the reference
dequantizes int8 → bf16 with a broadcast-multiply kernel and then matmuls the
dense bf16 weights (quantization/linear.h:50-54 — dequant-then-matmul, 3×
the HBM traffic). This kernel reads the *packed* weights from HBM once,
dequantizes in VMEM, and feeds the MXU directly.

Design (decode matvec, B ≤ 16 rows):
  * grid over output-column strips only; the full reduction dimension rides
    in one VMEM-resident strip (activations are tiny at decode).
  * int8: w_tile [in, block_out] int8 → bf16 × group scales broadcast via
    `pltpu.repeat` (groups along `in`).
  * int4: nibbles are packed **half-split**: byte row r of a [in/2, out]
    strip holds w[r] in the low nibble and w[r + in/2] in the high nibble.
    Unpacking is then two arithmetic shifts and two half-size matmuls — no
    sublane interleave/relayout in the kernel at all:
        y = x[:, :in/2] @ (lo·s_lo) + x[:, in/2:] @ (hi·s_hi)

The half-split packing is the framework-wide canonical int4 layout
(quant.quantize._pack_int4), so no repacking happens at load time.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sublane_repeat(s: jax.Array, g: int) -> jax.Array:
    """Repeat rows g× along the sublane axis: [G, O] → [G*g, O]."""
    return pltpu.repeat(s.reshape(s.shape[0], 1, s.shape[1]), g, 1).reshape(
        s.shape[0] * g, s.shape[1]
    )


def _int8_kernel(x_ref, q_ref, s_ref, o_ref, *, group_size: int):
    w = q_ref[...].astype(jnp.float32) * _sublane_repeat(
        s_ref[...].astype(jnp.float32), group_size
    )
    o_ref[...] = jnp.dot(
        x_ref[...].astype(jnp.float32), w, preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def _int4_kernel(x_ref, q_ref, s_ref, o_ref, *, group_size: int):
    # Mosaic has no int8 vector shifts; widen to i32 for nibble extraction.
    q = q_ref[...].astype(jnp.int32)
    lo = (jnp.bitwise_xor(jnp.bitwise_and(q, 15), 8) - 8).astype(jnp.float32)
    hi = jnp.right_shift(q, 4).astype(jnp.float32)
    half = q.shape[0]  # = in // 2
    s = s_ref[...].astype(jnp.float32)
    n_groups = s.shape[0]
    s_lo = _sublane_repeat(s[: n_groups // 2], group_size)
    s_hi = _sublane_repeat(s[n_groups // 2 :], group_size)
    x = x_ref[...].astype(jnp.float32)
    acc = jnp.dot(x[:, :half], lo * s_lo, preferred_element_type=jnp.float32)
    acc += jnp.dot(x[:, half:], hi * s_hi, preferred_element_type=jnp.float32)
    o_ref[...] = acc.astype(o_ref.dtype)


def choose_block_out(out_features: int, preferred: int = 512) -> Optional[int]:
    """Largest lane-aligned output-strip width dividing out_features."""
    for candidate in (preferred, 256, 128):
        if candidate <= out_features and out_features % candidate == 0:
            return candidate
    return None


@functools.partial(
    jax.jit,
    static_argnames=("bits", "group_size", "block_out", "interpret"),
)
def quant_matmul_pallas(
    x: jax.Array,
    q: jax.Array,
    scales: jax.Array,
    *,
    bits: int = 8,
    group_size: int = 32,
    block_out: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """x [B, in] @ dequant(q, scales) [in, out] → [B, out].

    q: int8 [in, out] (bits=8) or half-split packed [in//2, out] (bits=4);
    scales: [in//group_size, out].
    """
    b, in_features = x.shape
    out_features = q.shape[-1]
    n_groups = scales.shape[0]
    assert n_groups * group_size == in_features
    block_out = min(block_out, out_features)
    assert out_features % block_out == 0

    kernel = _int8_kernel if bits == 8 else _int4_kernel
    q_rows = q.shape[0]

    grid = (out_features // block_out,)
    return pl.pallas_call(
        functools.partial(kernel, group_size=group_size),
        out_shape=jax.ShapeDtypeStruct((b, out_features), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((b, in_features), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((q_rows, block_out), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_groups, block_out), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, block_out), lambda j: (0, j), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * in_features * out_features,
            bytes_accessed=q.size + scales.nbytes + x.nbytes,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, q, scales)
