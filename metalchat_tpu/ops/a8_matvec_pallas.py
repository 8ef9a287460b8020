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


def _int_acc_w4(xq, p):
    half = xq.shape[1] // 2
    x_lo, x_hi = xq[:, :half], xq[:, half:]
    lo_op = jnp.bitwise_and(p, jnp.int8(15))       # (lo+8) ∈ [0, 15]
    hi_op = jnp.bitwise_and(p, jnp.int8(-16))      # 16·hi  ∈ [-128, 112]
    dims = (((1,), (1,)), ((), ()))
    acc_lo = jax.lax.dot_general(x_lo, lo_op, dims,
                                 preferred_element_type=jnp.int32)
    acc_hi = jax.lax.dot_general(x_hi, hi_op, dims,
                                 preferred_element_type=jnp.int32)
    corr = 8 * jnp.sum(x_lo.astype(jnp.int32), axis=1, keepdims=True)
    return (acc_lo - corr) + jax.lax.shift_right_arithmetic(acc_hi, 4)


def _int_acc_w8(xq, q):
    return jax.lax.dot_general(xq, q, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.int32)


def _w4_kernel(l_ref, x_ref, p_ref, out_ref):
    out_ref[:] = _int_acc_w4(x_ref[:], p_ref[0])


def _w8_kernel(l_ref, x_ref, q_ref, out_ref):
    out_ref[:] = _int_acc_w8(x_ref[:], q_ref[0])


def _act_quantize_block(x):
    """Mirror of quant/quantize.py `_act_quantize` (same ops, same order, so
    the fused kernel is numerically identical to quantize-outside+kernel)."""
    absmax = jnp.max(jnp.abs(x), axis=1, keepdims=True)
    sx = jnp.where(absmax == 0.0, 1.0, absmax / 127.0)
    xq = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)
    return xq, sx


def _fused_kernel(acc_fn, out_dtype, norm_eps=None, norm_offset=0.0):
    """bf16-in/bf16-out variant: per-token dynamic int8 quantization of x and
    the (sx ⊗ s_col) post-scale run INSIDE the kernel. The VPU work is on
    [B, in] / [B, block_out] rows — negligible next to the weight-tile DMA —
    and it removes ~3 XLA dispatches per matvec from the decode loop.

    With norm_eps set, the input rmsnorm runs in the prologue too (same
    f32-stats → bf16-round sequence as ops.xla.rms_norm): two more XLA
    dispatches per layer gone. On chip the f32 mean reduces in a different
    order than XLA's (±1 ulp in var — measured, tools/validate_kernels.py),
    which can flip borderline bf16/int8 rounds — one-quantum scheme noise;
    the act-quant and integer stages below are bit-exact vs interpret."""
    def kernel(l_ref, x_ref, p_ref, s_ref, out_ref, nw_ref=None):
        x = x_ref[:].astype(jnp.float32)
        if norm_eps is not None:
            var = jnp.mean(jnp.square(x), axis=1, keepdims=True)
            normed = x * jax.lax.rsqrt(var + norm_eps)
            w = norm_offset + nw_ref[...].astype(jnp.float32).reshape(1, -1)
            # Round through the activation dtype exactly like the XLA path.
            x = (normed * w).astype(out_dtype).astype(jnp.float32)
        xq, sx = _act_quantize_block(x)
        acc = acc_fn(xq, p_ref[0])
        s_col = s_ref[0].reshape(1, -1).astype(jnp.float32)
        out_ref[:] = (acc.astype(jnp.float32) * sx * s_col).astype(out_dtype)

    if norm_eps is None:
        return lambda l_ref, x_ref, p_ref, s_ref, out_ref: kernel(
            l_ref, x_ref, p_ref, s_ref, out_ref)
    return lambda l_ref, x_ref, p_ref, s_ref, nw_ref, out_ref: kernel(
        l_ref, x_ref, p_ref, s_ref, out_ref, nw_ref)


def _block_overrides() -> dict:
    """Shape-keyed block_out overrides for experiments:
    METALCHAT_BLOCK_OVERRIDES="4096x2048:512,28672x2048:1024" (out x k)."""
    import os

    raw = os.environ.get("METALCHAT_BLOCK_OVERRIDES", "")
    out = {}
    for item in raw.split(","):
        if ":" in item:
            shape, bo = item.split(":")
            out[tuple(map(int, shape.split("x")))] = int(bo)
    return out


# Per-(out, k)-shape tuned blocks, measured end-to-end on v5e 8B decode
# (r3 A/B, each vs the then-current default: wo@512 +1.8 tok/s, wqkv@768
# +3.1, w13@1024 +2.3, w2@256 +1.4; stacked total 170.4 -> 182.8). Smaller
# tiles = more grid steps = deeper DMA/compute pipelining; the effect is
# shape-specific, hence a measured table rather than a formula.
_TUNED = {
    (4096, 2048): 512,    # wo (4096-out, 4096-in packed int4)
    (6144, 2048): 768,    # fused wqkv at 8B GQA dims
    (28672, 2048): 1024,  # fused gate/up (w13)
    (4096, 7168): 256,    # w2 (down-projection)
}


def choose_block_out(out: int, k: int = 2048,
                     tile_budget: int = 4 << 20) -> Optional[int]:
    """Largest lane-friendly block dividing `out` whose (block, k) tile fits
    the budget. ~4 MB tiles measured best on v5e: larger tiles (8-12 MB)
    lose DMA/compute overlap (+5-7% on the 8B FFN matvecs), smaller ones pay
    more per-grid-step overhead. The kernel raises the scoped VMEM limit so
    Mosaic can buffer several tiles deep (v5e has 128 MB VMEM; the deeper
    pipeline was worth -25% on the 167-step lm_head matvec)."""
    override = _block_overrides().get((out, k)) or _TUNED.get((out, k))
    if override and out % override == 0:
        return override
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
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Integer matvec against one layer of a stacked quantized weight.

    Returns s32 [B, out] — the caller applies `* sx * s_col` (exact for
    per-channel scales; see quant/quantize.py `_matmul_a8`).
    """
    from metalchat_tpu.ops import resolve_interpret

    interpret = resolve_interpret(interpret)
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


@functools.partial(jax.jit,
                   static_argnames=("bits", "block_out", "interpret",
                                    "norm_eps", "norm_offset"))
def quant_matvec_stacked_fused(
    x: jax.Array,         # bf16/f32 [B, in] — UNquantized activations
    p_stack: jax.Array,   # int8 [L, out, in] (bits=8) / [L, out, in//2] (bits=4)
    s_stack: jax.Array,   # f32 [L, 1, out] per-channel weight scales
                          # (out on lanes — a trailing size-1 lane dim gets
                          # 128×-padded by XLA tiling; see QuantizedTensor)
    layer: jax.Array,     # scalar int32
    *,
    bits: int,
    block_out: Optional[int] = None,
    interpret: Optional[bool] = None,
    norm_stack: Optional[jax.Array] = None,  # [L, in] rmsnorm weights —
                                             # fuses the pre-norm in-kernel
    norm_eps: Optional[float] = None,
    norm_offset: float = 0.0,
) -> jax.Array:
    """`quant_matvec_stacked` with activation quantization and the
    (sx ⊗ s_col) post-scale fused into the kernel: takes bf16 activations,
    returns bf16/f32 [B, out]. Numerically identical to
    `_act_quantize` + `quant_matvec_stacked` + XLA post-scale (same ops,
    same order — tests/test_a8_matvec.py; bit-exact on chip vs interpret,
    tools/validate_kernels.py — the optional norm prologue alone carries
    ±1-ulp reduction-order noise), but saves ~3 XLA dispatches per matvec,
    which at 4 matvecs × n_layers dominates the decode step's non-HBM
    residual."""
    from metalchat_tpu.ops import resolve_interpret

    interpret = resolve_interpret(interpret)
    L, out, k = p_stack.shape
    b, in_f = x.shape
    assert k * (2 if bits == 4 else 1) == in_f, (p_stack.shape, x.shape)
    assert s_stack.shape == (L, 1, out), (s_stack.shape, p_stack.shape)
    bo = block_out or choose_block_out(out, k)
    assert bo is not None and out % bo == 0, (out, block_out)
    fuse_norm = norm_stack is not None
    kernel = _fused_kernel(_int_acc_w4 if bits == 4 else _int_acc_w8, x.dtype,
                           norm_eps=norm_eps if fuse_norm else None,
                           norm_offset=norm_offset)
    in_specs = [
        pl.BlockSpec((b, in_f), lambda j, l: (0, 0)),
        pl.BlockSpec((1, bo, k), lambda j, l: (l[0], j, 0)),
        pl.BlockSpec((1, 1, bo), lambda j, l: (l[0], 0, j)),
    ]
    args = [jnp.asarray(layer, jnp.int32).reshape(1), x, p_stack, s_stack]
    if fuse_norm:
        # MUST arrive pre-shaped [L, 1, in]: reshaping [L, in] here (inside
        # the caller's layer loop) materializes a copy of the WHOLE stack
        # every iteration — measured 46 µs/step PER NORM on the 8B r4 trace
        # (the caller hoists the reshape outside its fori_loop instead).
        assert norm_stack.shape == (L, 1, in_f), (norm_stack.shape, (L, in_f))
        assert norm_eps is not None
        # (1, 1, in) block has valid last-two dims (1 = the array's own
        # middle dim); (1, in) on [L, in] would not.
        in_specs.append(pl.BlockSpec((1, 1, in_f), lambda j, l: (l[0], 0, 0)))
        args.append(norm_stack)
    spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(out // bo,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((b, bo), lambda j, l: (0, j)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=spec,
        out_shape=jax.ShapeDtypeStruct((b, out), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 << 20,
        ),
        interpret=interpret,
    )(*args)
