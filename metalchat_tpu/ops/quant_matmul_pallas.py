"""Pallas fused dequant+matmul for weight-only INT8/INT4 decode.

The first big win over the reference (SURVEY.md §7 stage 4): the reference
dequantizes int8 → bf16 with a broadcast-multiply kernel and then matmuls the
dense bf16 weights (quantization/linear.h:50-54 — dequant-then-matmul, 3×
the HBM traffic). This kernel reads the *packed* weights from HBM once,
dequantizes tile-by-tile in VMEM (bf16 — int8/int4 values are exact in
bf16), and feeds the MXU directly with f32 accumulation.

Grid: (out-strips, in-tiles); the reduction dimension is tiled so VMEM stays
bounded at any model width (8B's 14336-wide FFN fits comfortably), with an
f32 accumulator scratch carried across in-tiles.

INT4 packing is **half-split** (the framework-wide canonical layout,
quant.quantize._pack_int4): byte row r of the [in/2, out] array holds w[r]
in the low nibble and w[r + in/2] in the high nibble. Unpacking is therefore
two arithmetic ops and two half matmuls — no sublane interleave/relayout in
the kernel; the two x halves arrive as separate block-spec views of the same
activation row.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sublane_repeat(s: jax.Array, g: int) -> jax.Array:
    """Repeat rows g× along the sublane axis: [G, O] → [G*g, O]."""
    return pltpu.repeat(s.reshape(s.shape[0], 1, s.shape[1]), g, 1).reshape(
        s.shape[0] * g, s.shape[1]
    )


def _int8_kernel(x_ref, q_ref, s_ref, o_ref, acc_ref, *, group_size: int):
    @pl.when(pl.program_id(1) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = q_ref[...].astype(jnp.bfloat16) * _sublane_repeat(
        s_ref[...].astype(jnp.bfloat16), group_size
    )
    acc_ref[...] += jnp.dot(
        x_ref[...].astype(jnp.bfloat16), w, preferred_element_type=jnp.float32
    )
    o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _int4_kernel(x_lo_ref, x_hi_ref, q_ref, s_lo_ref, s_hi_ref, o_ref, acc_ref,
                 *, group_size: int):
    @pl.when(pl.program_id(1) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # Mosaic has no int8 vector shifts; widen to i32 for nibble extraction.
    q = q_ref[...].astype(jnp.int32)
    lo = (jnp.bitwise_and(q, 15) - 8).astype(jnp.bfloat16)  # offset-binary
    hi = jnp.right_shift(q, 4).astype(jnp.bfloat16)
    w_lo = lo * _sublane_repeat(s_lo_ref[...].astype(jnp.bfloat16), group_size)
    w_hi = hi * _sublane_repeat(s_hi_ref[...].astype(jnp.bfloat16), group_size)
    acc = jnp.dot(x_lo_ref[...].astype(jnp.bfloat16), w_lo,
                  preferred_element_type=jnp.float32)
    acc += jnp.dot(x_hi_ref[...].astype(jnp.bfloat16), w_hi,
                   preferred_element_type=jnp.float32)
    acc_ref[...] += acc
    o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def choose_block_out(out_features: int, preferred: int = 512) -> Optional[int]:
    """Largest lane-aligned output-strip width dividing out_features."""
    for candidate in (preferred, 256, 128):
        if candidate <= out_features and out_features % candidate == 0:
            return candidate
    return None


def choose_block_in(in_features: int, group_size: int, preferred: int = 2048) -> Optional[int]:
    """Reduction-tile width: divides in_features, multiple of group_size."""
    for candidate in (preferred, 1024, 512, 256):
        if (candidate <= in_features and in_features % candidate == 0
                and candidate % group_size == 0):
            return candidate
    if in_features % group_size == 0:
        return in_features
    return None


@functools.partial(
    jax.jit,
    static_argnames=("bits", "group_size", "block_out", "block_in", "interpret"),
)
def quant_matmul_pallas(
    x: jax.Array,
    q: jax.Array,
    scales: jax.Array,
    *,
    bits: int = 8,
    group_size: int = 32,
    block_out: int = 512,
    block_in: int = 2048,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """x [B, in] @ dequant(q, scales) [in, out] → [B, out].

    q: int8 [in, out] (bits=8) or half-split packed [in//2, out] (bits=4);
    scales: [in//group_size, out].
    """
    from metalchat_tpu.ops import resolve_interpret

    interpret = resolve_interpret(interpret)
    b, in_features = x.shape
    out_features = q.shape[-1]
    n_groups = scales.shape[0]
    assert n_groups * group_size == in_features
    block_out = min(block_out, out_features)
    block_in = min(block_in, in_features)
    assert out_features % block_out == 0
    assert in_features % block_in == 0 and block_in % group_size == 0
    n_in = in_features // block_in
    groups_per_tile = block_in // group_size

    cost = pl.CostEstimate(
        flops=2 * b * in_features * out_features,
        bytes_accessed=q.size + scales.nbytes + x.nbytes,
        transcendentals=0,
    )
    common = dict(
        out_shape=jax.ShapeDtypeStruct((b, out_features), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=cost,
        interpret=interpret,
    )
    out_spec = pl.BlockSpec((b, block_out), lambda j, k: (0, j))
    grid = (out_features // block_out, n_in)
    scratch = [pltpu.VMEM((b, block_out), jnp.float32)]

    if bits == 8:
        return pl.pallas_call(
            functools.partial(_int8_kernel, group_size=group_size),
            grid=grid,
            in_specs=[
                pl.BlockSpec((b, block_in), lambda j, k: (0, k)),
                pl.BlockSpec((block_in, block_out), lambda j, k: (k, j)),
                pl.BlockSpec((groups_per_tile, block_out), lambda j, k: (k, j)),
            ],
            out_specs=out_spec,
            scratch_shapes=scratch,
            **common,
        )(x, q, scales)

    # int4: tile k of the packed rows covers lo rows [k·bi/2, (k+1)·bi/2) and
    # hi rows [in/2 + k·bi/2, ...); x and scales get separate lo/hi views.
    half_bi = block_in // 2
    half_groups = groups_per_tile // 2
    assert block_in % (2 * group_size) == 0, "int4 tiles must not straddle groups"
    return pl.pallas_call(
        functools.partial(_int4_kernel, group_size=group_size),
        grid=grid,
        in_specs=[
            pl.BlockSpec((b, half_bi), lambda j, k: (0, k)),            # x lo
            pl.BlockSpec((b, half_bi), lambda j, k, n=n_in: (0, k + n)),  # x hi
            pl.BlockSpec((half_bi, block_out), lambda j, k: (k, j)),    # packed q
            pl.BlockSpec((half_groups, block_out), lambda j, k: (k, j)),  # s lo
            pl.BlockSpec((half_groups, block_out), lambda j, k, n=n_in: (k + n, j)),
        ],
        out_specs=out_spec,
        scratch_shapes=scratch,
        **common,
    )(x, x, q, scales, scales)
