"""Stacked W4A8/W8A8 decode matvec kernels (s8×s8→s32 on the MXU).

The decode hot path: every per-token matmul is a matvec whose cost is the
HBM stream of its quantized weights. Two design rules, both measured on v5e
(benchmarks/w4a8_kernel_experiment.py, benchmarks/profile_decode.py):

  1. **Weights are indexed out of the stacked [L, ...] array by a
     scalar-prefetched layer index.** Slicing a layer inside `lax.scan` and
     feeding it to a Pallas call materializes the slice (a full extra
     read+write); the BlockSpec index_map reads the right HBM offset
     directly instead.
  2. **Transposed, row-contiguous tiles.** Weights are stored [L, out, in]
     (int4: [L, out, in/2] packed) so each (block_out, in) tile is one
     contiguous HBM run — measured ~706 GB/s effective vs ~510 GB/s for the
     XLA 3-dot formulation the model used before (2.0x the read floor).

int4 packing is the half-split offset-binary format of quant/quantize.py
(byte = (lo+8) + 16·hi): the kernel separates nibbles with two byte-masks
that are valid s8 MXU operands — dot(x_lo, p & 0x0F) carries a +8·Σx_lo
bias corrected with one scalar reduce, and dot(x_hi, p & 0xF0) = 16·Σx_hi·hi
is exact under an arithmetic >>4. No dequantized weight ever exists; the
only non-integer work is the caller's post-scale (sx ⊗ s_col), applied in
XLA where it fuses into the next elementwise op.

Replaces (perf-wise) the reference's dequantize-then-matmul
(quantization/linear.h:50-54); numerically identical to quant_matmul's
`_matmul_a8` path (tests/test_a8_matvec.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _w4_kernel(l_ref, x_ref, p_ref, out_ref):
    x = x_ref[:]
    half = x.shape[1] // 2
    x_lo, x_hi = x[:, :half], x[:, half:]
    p = p_ref[0]                                   # [block_out, half] int8
    lo_op = jnp.bitwise_and(p, jnp.int8(15))       # (lo+8) ∈ [0, 15]
    hi_op = jnp.bitwise_and(p, jnp.int8(-16))      # 16·hi  ∈ [-128, 112]
    dims = (((1,), (1,)), ((), ()))
    acc_lo = jax.lax.dot_general(x_lo, lo_op, dims,
                                 preferred_element_type=jnp.int32)
    acc_hi = jax.lax.dot_general(x_hi, hi_op, dims,
                                 preferred_element_type=jnp.int32)
    corr = 8 * jnp.sum(x_lo.astype(jnp.int32), axis=1, keepdims=True)
    out_ref[:] = (acc_lo - corr) + jax.lax.shift_right_arithmetic(acc_hi, 4)


def _w8_kernel(l_ref, x_ref, q_ref, out_ref):
    out_ref[:] = jax.lax.dot_general(
        x_ref[:], q_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)


def choose_block_out(out: int, k: int = 2048,
                     tile_budget: int = 4 << 20) -> Optional[int]:
    """Largest lane-friendly block dividing `out` whose (block, k) tile fits
    the budget. ~4 MB tiles measured best on v5e: larger tiles (8-12 MB)
    lose DMA/compute overlap (+5-7% on the 8B FFN matvecs), smaller ones pay
    more per-grid-step overhead. The kernel raises the scoped VMEM limit so
    Mosaic can buffer several tiles deep (v5e has 128 MB VMEM; the deeper
    pipeline was worth -25% on the 167-step lm_head matvec)."""
    for candidate in (2048, 1024, 768, 512, 384, 256, 128):
        if candidate <= out and out % candidate == 0 and candidate * k <= tile_budget:
            return candidate
    return None


@functools.partial(jax.jit,
                   static_argnames=("bits", "block_out", "interpret"))
def quant_matvec_stacked(
    xq: jax.Array,        # int8 [B, in] — per-token dynamic-quantized input
    p_stack: jax.Array,   # int8 [L, out, in] (bits=8) / [L, out, in//2] (bits=4)
    layer: jax.Array,     # scalar int32
    *,
    bits: int,
    block_out: Optional[int] = None,
    interpret: bool = False,
) -> jax.Array:
    """Integer matvec against one layer of a stacked quantized weight.

    Returns s32 [B, out] — the caller applies `* sx * s_col` (exact for
    per-channel scales; see quant/quantize.py `_matmul_a8`).
    """
    L, out, k = p_stack.shape
    b, in_f = xq.shape
    assert k * (2 if bits == 4 else 1) == in_f, (p_stack.shape, xq.shape)
    bo = block_out or choose_block_out(out, k)
    assert bo is not None and out % bo == 0, (out, block_out)
    kernel = _w4_kernel if bits == 4 else _w8_kernel
    spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(out // bo,),
        in_specs=[
            pl.BlockSpec((b, in_f), lambda j, l: (0, 0)),
            pl.BlockSpec((1, bo, k), lambda j, l: (l[0], j, 0)),
        ],
        out_specs=pl.BlockSpec((b, bo), lambda j, l: (0, j)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=spec,
        out_shape=jax.ShapeDtypeStruct((b, out), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 << 20,
        ),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1), xq, p_stack)
