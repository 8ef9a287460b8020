"""Microbenchmark: quantized matvec formulations on the real chip.

Measures effective HBM bandwidth of decode-shaped quantized matmuls
(batch=1 matvec over 8B-scale FFN weights) for competing dequant
formulations. Timing per CLAUDE.md: marginal cost between a short and a
long scan over stacked weights of the SAME formulation — the fixed ~1.7 s
tunnel latency cancels; weights are passed as jit args (no constant
folding); a host transfer forces completion.

Run: timeout 1200 python benchmarks/quant_microbench.py [--variants a,b,...]
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

K, N = 4096, 14336  # Llama-8B FFN up-projection
G = 32              # group size
L_LO, L_HI = 2, 10  # stacked layer counts for the marginal measurement


M_REPEATS = 30  # outer repeats of the layer scan (amplifies signal vs jitter)


def scan_matvec(step):
    """fn(x, stacked_pytree) -> [1,K]: M_REPEATS × scan over stacked layers."""

    def fn(x, weights):
        def body(carry, w):
            y = step(carry, w)
            # Consume EVERY output column (sum over N) — otherwise XLA
            # slices the dot to just the consumed columns and the "matvec"
            # reads a handful of weight columns. Feed the scalar back into
            # the carry so layers stay sequential.
            s = jnp.sum(y.astype(jnp.float32))
            return carry + (s * 1e-30).astype(carry.dtype), None

        def outer(i, carry):
            carry, _ = jax.lax.scan(body, carry, weights)
            return carry

        return jax.lax.fori_loop(0, M_REPEATS, outer, x)

    return jax.jit(fn)


# ---- variants --------------------------------------------------------------

def v_int8_weightscale(x, w):
    """Current production int8 path: scale folded into weight operand."""
    q, s = w
    wd = (q.astype(x.dtype).reshape(K // G, G, N) * s[:, None, :]).reshape(K, N)
    return jax.lax.dot_general(x, wd, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def v_int8_partialscale(x, w):
    """int8, convert-only weights; scales applied to [G?] no — to group
    partial sums: y = sum_G s[G,:] * (x_G @ q_G). 32x fewer scale mults."""
    q, s = w
    xg = x.reshape(1, K // G, G)
    qg = q.reshape(K // G, G, N).astype(x.dtype)
    partials = jnp.einsum("bgk,gkn->bgn", xg, qg,
                          preferred_element_type=jnp.float32)
    return jnp.sum(partials * s[None].astype(jnp.float32), axis=1)


def v_int8_xscale(x, w):
    """int8: fold scales into x? impossible exactly (scales vary over out),
    but test folding group scale into x for the *common* part with per-out
    residual — skipped; placeholder = weightscale with bf16 scales."""
    q, s = w
    wd = (q.astype(x.dtype).reshape(K // G, G, N) * s.astype(x.dtype)[:, None, :]).reshape(K, N)
    return jax.lax.dot_general(x, wd, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def v_int4_current(x, w):
    """Current int4: half-split packed int8, i32 nibble extract, two dots."""
    p, s = w
    half = K // 2
    hg = half // G
    p32 = p.astype(jnp.int32)
    lo = jnp.bitwise_xor(jnp.bitwise_and(p32, 15), 8) - 8
    hi = jnp.right_shift(p32, 4)
    w_lo = (lo.astype(x.dtype).reshape(hg, G, N) * s[:hg, None, :]).reshape(half, N)
    w_hi = (hi.astype(x.dtype).reshape(hg, G, N) * s[hg:, None, :]).reshape(half, N)
    dims = (((1,), (0,)), ((), ()))
    return (jax.lax.dot_general(x[:, :half], w_lo, dims, preferred_element_type=jnp.float32)
            + jax.lax.dot_general(x[:, half:], w_hi, dims, preferred_element_type=jnp.float32))


def v_int4_native(x, w):
    """Native jnp.int4 storage: XLA packs 2/byte; convert fused into dot."""
    q4, s = w
    wd = (q4.astype(x.dtype).reshape(K // G, G, N) * s[:, None, :]).reshape(K, N)
    return jax.lax.dot_general(x, wd, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def v_int4_native_partial(x, w):
    """Native int4 + partial-sum scaling (no per-element scale mult)."""
    q4, s = w
    xg = x.reshape(1, K // G, G)
    qg = q4.reshape(K // G, G, N).astype(x.dtype)
    partials = jnp.einsum("bgk,gkn->bgn", xg, qg,
                          preferred_element_type=jnp.float32)
    return jnp.sum(partials * s[None].astype(jnp.float32), axis=1)


def v_int4_partial(x, w):
    """Packed int4, i32 extract, partial-sum scaling."""
    p, s = w
    half = K // 2
    hg = half // G
    p32 = p.astype(jnp.int32)
    lo = jnp.bitwise_xor(jnp.bitwise_and(p32, 15), 8) - 8
    hi = jnp.right_shift(p32, 4)
    xg_lo = x[:, :half].reshape(1, hg, G)
    xg_hi = x[:, half:].reshape(1, hg, G)
    pl = jnp.einsum("bgk,gkn->bgn", xg_lo, lo.astype(x.dtype).reshape(hg, G, N),
                    preferred_element_type=jnp.float32)
    ph = jnp.einsum("bgk,gkn->bgn", xg_hi, hi.astype(x.dtype).reshape(hg, G, N),
                    preferred_element_type=jnp.float32)
    return (jnp.sum(pl * s[None, :hg].astype(jnp.float32), axis=1)
            + jnp.sum(ph * s[None, hg:].astype(jnp.float32), axis=1))


def v_w8a8_mxu(x, w):
    """Dynamic activation quant + s8xs8->s32 MXU dot, group partials scaled.

    y = sx * sum_G s[G,:] * (xq_G @ q_G)   (int32 partials)
    """
    q, s = w
    sx = jnp.max(jnp.abs(x)) / 127.0
    xq = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)
    xg = xq.reshape(1, K // G, G)
    qg = q.reshape(K // G, G, N)
    partials = jnp.einsum("bgk,gkn->bgn", xg, qg,
                          preferred_element_type=jnp.int32)
    y = jnp.sum(partials.astype(jnp.float32) * s[None].astype(jnp.float32), axis=1)
    return y * sx.astype(jnp.float32)


def v_w8a8_flat(x, w):
    """w8a8 with a SINGLE flat s8 dot (no group partials): per-out scale only.

    Upper bound for int8 MXU bandwidth (numerics = per-tensor weight scale).
    """
    q, s = w
    sx = jnp.max(jnp.abs(x)) / 127.0
    xq = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(xq, q, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    return y.astype(jnp.float32) * (sx * s[0])[None].astype(jnp.float32)


def v_w4a8_flat(x, w):
    """Packed int4 → int8 nibbles (no scale mult, no float convert) → two
    flat s8×s8 MXU dots → one post-scale. Exact for per-channel scales."""
    p, s = w
    half = K // 2
    sx = jnp.max(jnp.abs(x)) / 127.0
    xq = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)
    p32 = p.astype(jnp.int32)
    lo = (jnp.bitwise_xor(jnp.bitwise_and(p32, 15), 8) - 8).astype(jnp.int8)
    hi = jnp.right_shift(p32, 4).astype(jnp.int8)
    dims = (((1,), (0,)), ((), ()))
    acc = (jax.lax.dot_general(xq[:, :half], lo, dims, preferred_element_type=jnp.int32)
           + jax.lax.dot_general(xq[:, half:], hi, dims, preferred_element_type=jnp.int32))
    return acc.astype(jnp.float32) * (sx * s[0].astype(jnp.float32))[None]


def v_w4a8_flat_i8shift(x, w):
    """Same but nibble extraction in int8 domain (shift-based sign extend)."""
    p, s = w
    half = K // 2
    sx = jnp.max(jnp.abs(x)) / 127.0
    xq = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)
    lo = jnp.right_shift(jnp.left_shift(p, 4), 4)
    hi = jnp.right_shift(p, 4)
    dims = (((1,), (0,)), ((), ()))
    acc = (jax.lax.dot_general(xq[:, :half], lo, dims, preferred_element_type=jnp.int32)
           + jax.lax.dot_general(xq[:, half:], hi, dims, preferred_element_type=jnp.int32))
    return acc.astype(jnp.float32) * (sx * s[0].astype(jnp.float32))[None]


def v_w4a8_group(x, w):
    """W4A8 with EXACT group-32 scales: int8 MXU partials per group pair?
    (expected slow — control for the einsum lowering)."""
    p, s = w
    half = K // 2
    hg = half // G
    sx = jnp.max(jnp.abs(x)) / 127.0
    xq = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)
    p32 = p.astype(jnp.int32)
    lo = (jnp.bitwise_xor(jnp.bitwise_and(p32, 15), 8) - 8).astype(jnp.int8)
    hi = jnp.right_shift(p32, 4).astype(jnp.int8)
    pl = jnp.einsum("bgk,gkn->bgn", xq[:, :half].reshape(1, hg, G),
                    lo.reshape(hg, G, N), preferred_element_type=jnp.int32)
    ph = jnp.einsum("bgk,gkn->bgn", xq[:, half:].reshape(1, hg, G),
                    hi.reshape(hg, G, N), preferred_element_type=jnp.int32)
    y = (jnp.sum(pl.astype(jnp.float32) * s[None, :hg].astype(jnp.float32), axis=1)
         + jnp.sum(ph.astype(jnp.float32) * s[None, hg:].astype(jnp.float32), axis=1))
    return y * sx


def v_readonly_int8(x, w):
    """Pure-read ceiling: just reduce the int8 bytes (no dequant, no dot)."""
    q, s = w
    return jnp.sum(q, dtype=jnp.int32).reshape(1, 1) * jnp.float32(1e-9) + jnp.zeros((1, N), jnp.float32)


def v_int8_bitcast(x, w):
    """int8→f32 via exponent-bias bit trick (no int→float convert):
    f32 bits 0x4B000000 | (q+128) == 8388608 + q + 128 exactly."""
    q, s = w
    u = (q.astype(jnp.uint8).astype(jnp.uint32) ^ 128) | jnp.uint32(0x4B000000)
    wf = jax.lax.bitcast_convert_type(u, jnp.float32) - (8388608.0 + 128.0)
    wd = (wf.astype(x.dtype).reshape(K // G, G, N) * s[:, None, :]).reshape(K, N)
    return jax.lax.dot_general(x, wd, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def v_int4_bitcast(x, w):
    """Packed int4 → bf16 via mantissa bit trick: bf16 bits 0x4300 | n ==
    128 + n for n in [0,16); two halves, no integer widening to i32."""
    p, s = w
    half = K // 2
    hg = half // G
    u16 = p.astype(jnp.uint8).astype(jnp.uint16)
    # Two's-complement nibble n = q mod 16; (n ^ 8) = q + 8 (offset-binary)
    # for every q in [-8, 8). bf16 bits 0x4300 | m == 128 + m exactly for
    # m in [0, 128) (7 mantissa bits at exponent 2^7), so the dequantized
    # value is bitcast(0x4300 | (n^8)) - 136 with NO int→float convert.
    lo_bits = ((u16 & jnp.uint16(0x000F)) ^ jnp.uint16(8)) | jnp.uint16(0x4300)
    hi_bits = (((u16 >> 4) & jnp.uint16(0x000F)) ^ jnp.uint16(8)) | jnp.uint16(0x4300)
    lo_f = jax.lax.bitcast_convert_type(lo_bits, jnp.bfloat16) - 136.0
    hi_f = jax.lax.bitcast_convert_type(hi_bits, jnp.bfloat16) - 136.0
    w_lo = (lo_f.astype(x.dtype).reshape(hg, G, N) * s[:hg, None, :]).reshape(half, N)
    w_hi = (hi_f.astype(x.dtype).reshape(hg, G, N) * s[hg:, None, :]).reshape(half, N)
    dims = (((1,), (0,)), ((), ()))
    return (jax.lax.dot_general(x[:, :half], w_lo, dims, preferred_element_type=jnp.float32)
            + jax.lax.dot_general(x[:, half:], w_hi, dims, preferred_element_type=jnp.float32))


def v_fp8(x, w):
    """fp8 e4m3 storage, convert fused into dot, group scales on weights."""
    q, s = w
    wd = (q.astype(x.dtype).reshape(K // G, G, N) * s[:, None, :]).reshape(K, N)
    return jax.lax.dot_general(x, wd, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnums=(0, 1))
def _make_weights_jit(kind, L, key):
    ks = jax.random.split(key, 2)
    s = (jax.random.uniform(ks[1], (L, K // G, N)) * 0.01 + 0.001).astype(jnp.bfloat16)
    if kind == "int8":
        q = jax.random.bits(ks[0], (L, K, N), jnp.uint8).astype(jnp.int8)
    elif kind == "int4packed":
        q = jax.random.bits(ks[0], (L, K // 2, N), jnp.uint8).astype(jnp.int8)
    elif kind == "int4native":
        q = (jax.random.bits(ks[0], (L, K, N), jnp.uint8) % 15).astype(jnp.int8) - 7
        q = q.astype(jnp.int4)
    elif kind == "fp8":
        q = (jax.random.bits(ks[0], (L, K, N), jnp.uint8).astype(jnp.bfloat16)
             * 0.01).astype(jnp.float8_e4m3fn)
    else:
        raise ValueError(kind)
    return q, s


def make_weights(kind, L, key):
    q, s = _make_weights_jit(kind, L, key)
    per_layer = {"int8": K * N, "int4packed": K // 2 * N,
                 "int4native": K * N // 2, "fp8": K * N}[kind]
    return (q, s), L * (per_layer + s[0].size * 2)


def v_w4a8_groupmult(x, w):
    """W4A8 keeping group granularity: nibble -> int8, multiply by a small
    per-group int multiplier m[G,o] (in i32 domain before narrowing), flat
    s8 dot, post-scale by per-channel s_col. Implied weight =
    q4 * m[G,o] * s_col[o] ~= q4 * s[G,o] with m = round(s/s_col) in [1,15].
    Here m is random int8 [1,15] (cost model only)."""
    p, s = w
    half = K // 2
    hg = half // G
    sx = jnp.max(jnp.abs(x)) / 127.0
    xq = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)
    m = (jnp.abs(s.astype(jnp.int32)) % 15 + 1).astype(jnp.int32)  # [K//G, N]
    p32 = p.astype(jnp.int32)
    lo = (jnp.bitwise_xor(jnp.bitwise_and(p32, 15), 8) - 8)
    hi = jnp.right_shift(p32, 4)
    lo8 = (lo.reshape(hg, G, N) * m[:hg, None, :]).reshape(half, N).astype(jnp.int8)
    hi8 = (hi.reshape(hg, G, N) * m[hg:, None, :]).reshape(half, N).astype(jnp.int8)
    dims = (((1,), (0,)), ((), ()))
    acc = (jax.lax.dot_general(xq[:, :half], lo8, dims, preferred_element_type=jnp.int32)
           + jax.lax.dot_general(xq[:, half:], hi8, dims, preferred_element_type=jnp.int32))
    return acc.astype(jnp.float32) * (sx * 0.01)


def v_w4a8_wrap(x, w):
    """W4A8 with the int8 wrap-trick: NO widen/narrow relayouts.

    p*16 (wrapping s8 multiply) == 16*lo_signed; p - (p&15) == 16*hi_signed.
    y = (dot(xq_lo, p*16) + dot(xq_hi, p - (p&15))) >> 4, all s8 MXU dots.
    """
    p, s = w
    half = K // 2
    sx = jnp.max(jnp.abs(x)) / 127.0
    xq = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)
    lo16 = p * jnp.int8(16)
    hi16 = p & jnp.int8(-16)   # high nibble in place == 16*hi_signed
    dims = (((1,), (0,)), ((), ()))
    acc = (jax.lax.dot_general(xq[:, :half], lo16, dims, preferred_element_type=jnp.int32)
           + jax.lax.dot_general(xq[:, half:], hi16, dims, preferred_element_type=jnp.int32))
    return (acc >> 4).astype(jnp.float32) * (sx * 0.01)


def v_w4a8_mask2(x, w):
    """Offset-nibble packing (low nibble stored as lo+8): unpack is pure
    byte-wise AND/SUB — no shifts, no widening, no bitcasts.

      lo_op = (p & 15) - 8      (exact signed low nibble)
      hi_op = p & 0xF0          (== 16*hi; fold 1/16 into the f32 scale)
    """
    p, s = w
    half = K // 2
    sx = jnp.max(jnp.abs(x)) / 127.0
    xq = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)
    lo_op = (p & jnp.int8(15)) - jnp.int8(8)
    hi_op = p & jnp.int8(-16)
    dims = (((1,), (0,)), ((), ()))
    acc_lo = jax.lax.dot_general(xq[:, :half], lo_op, dims,
                                 preferred_element_type=jnp.int32)
    acc_hi = jax.lax.dot_general(xq[:, half:], hi_op, dims,
                                 preferred_element_type=jnp.int32)
    y = acc_lo.astype(jnp.float32) + acc_hi.astype(jnp.float32) * 0.0625
    return y * (sx * 0.01)


def v_w4a8_mask3(x, w):
    """Offset packing, 3-dot form: low-nibble dot uses p RAW (no unpack op
    at all); the contamination 16*hi rides along and is cancelled by the
    hi-mask dot. Only ONE derived operand (the mask).

      dot(x_lo, p) = S_lo+8·sum(x_lo) + 16·C     (C = Σ x_lo·hi)
      dot(x_lo, m) = 16·C ;  dot(x_hi, m) = 16·S_hi
    """
    p, s = w
    half = K // 2
    sx = jnp.max(jnp.abs(x)) / 127.0
    xq = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)
    x_lo, x_hi = xq[:, :half], xq[:, half:]
    m = p & jnp.int8(-16)
    dims = (((1,), (0,)), ((), ()))
    d_raw = jax.lax.dot_general(x_lo, p, dims, preferred_element_type=jnp.int32)
    d_lom = jax.lax.dot_general(x_lo, m, dims, preferred_element_type=jnp.int32)
    d_him = jax.lax.dot_general(x_hi, m, dims, preferred_element_type=jnp.int32)
    corr = 8 * jnp.sum(x_lo.astype(jnp.int32), axis=1, keepdims=True)
    y = ((d_raw - d_lom - corr).astype(jnp.float32)
         + d_him.astype(jnp.float32) * 0.0625)
    return y * (sx * 0.01)


def _w4a8_pallas_mask_call(x, p, block_out=3584, block_in_packed=2048):
    """Pallas kernel for offset-nibble packing: byte AND/SUB unpack in VMEM,
    two s8 MXU dots; HBM traffic = packed bytes only."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = x.shape[0]
    half = K // 2
    sx = jnp.max(jnp.abs(x)) / 127.0
    xq = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)

    def kernel(x_lo_ref, x_hi_ref, p_ref, lo_ref, hi_ref, acc_lo, acc_hi):
        @pl.when(pl.program_id(1) == 0)
        def _init():
            acc_lo[...] = jnp.zeros_like(acc_lo)
            acc_hi[...] = jnp.zeros_like(acc_hi)
        pp = p_ref[...]
        lo_op = (pp & jnp.int8(15)) - jnp.int8(8)
        hi_op = pp & jnp.int8(-16)
        acc_lo[...] += jnp.dot(x_lo_ref[...], lo_op,
                               preferred_element_type=jnp.int32)
        acc_hi[...] += jnp.dot(x_hi_ref[...], hi_op,
                               preferred_element_type=jnp.int32)
        lo_ref[...] = acc_lo[...]
        hi_ref[...] = acc_hi[...]

    grid = (N // block_out, half // block_in_packed)
    lo, hi = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((b, block_in_packed), lambda j, k: (0, k)),
            pl.BlockSpec((b, block_in_packed), lambda j, k: (0, k)),
            pl.BlockSpec((block_in_packed, block_out), lambda j, k: (k, j)),
        ],
        out_specs=[pl.BlockSpec((b, block_out), lambda j, k: (0, j))] * 2,
        out_shape=[jax.ShapeDtypeStruct((b, N), jnp.int32)] * 2,
        scratch_shapes=[pltpu.VMEM((b, block_out), jnp.int32)] * 2,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * K * N, bytes_accessed=p.size + x.nbytes,
            transcendentals=0),
    )(xq[:, :half], xq[:, half:], p)
    y = lo.astype(jnp.float32) + hi.astype(jnp.float32) * 0.0625
    return y * (sx * 0.01)


def v_w4a8_pallas_mask(x, w):
    p, s = w
    return _w4a8_pallas_mask_call(x, p)


def _w4a8_pallas_mask3_call(x, p, block_out=3584, block_in_packed=2048):
    """Pallas 3-dot kernel for offset-nibble packing. Mosaic legalizes int8
    AND but not int8 add/sub/shift/mul — so the ONLY byte op is the mask;
    the low-nibble value rides in via dot(x_lo, p_raw) and its contamination
    (16*hi + 8 offset) is cancelled with the mask dot and a row-sum, both in
    i32/f32 domain:

      dot(x_lo, p) - dot(x_lo, m) - 8*sum(x_lo) == Σ x_lo·lo_signed
      dot(x_hi, m) == 16 · Σ x_hi·hi_signed
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = x.shape[0]
    half = K // 2
    sx = jnp.max(jnp.abs(x)) / 127.0
    xq = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)

    def kernel(x_lo_ref, x_hi_ref, p_ref, lo_ref, hi_ref, acc_lo, acc_hi):
        @pl.when(pl.program_id(1) == 0)
        def _init():
            acc_lo[...] = jnp.zeros_like(acc_lo)
            acc_hi[...] = jnp.zeros_like(acc_hi)
        pp = p_ref[...]
        m = pp & jnp.int8(-16)
        xl = x_lo_ref[...]
        acc_lo[...] += (jnp.dot(xl, pp, preferred_element_type=jnp.int32)
                        - jnp.dot(xl, m, preferred_element_type=jnp.int32))
        acc_hi[...] += jnp.dot(x_hi_ref[...], m,
                               preferred_element_type=jnp.int32)
        lo_ref[...] = acc_lo[...]
        hi_ref[...] = acc_hi[...]

    grid = (N // block_out, half // block_in_packed)
    lo, hi = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((b, block_in_packed), lambda j, k: (0, k)),
            pl.BlockSpec((b, block_in_packed), lambda j, k: (0, k)),
            pl.BlockSpec((block_in_packed, block_out), lambda j, k: (k, j)),
        ],
        out_specs=[pl.BlockSpec((b, block_out), lambda j, k: (0, j))] * 2,
        out_shape=[jax.ShapeDtypeStruct((b, N), jnp.int32)] * 2,
        scratch_shapes=[pltpu.VMEM((b, block_out), jnp.int32)] * 2,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=3 * b * K * N, bytes_accessed=p.size + x.nbytes,
            transcendentals=0),
    )(xq[:, :half], xq[:, half:], p)
    corr = 8 * jnp.sum(xq[:, :half].astype(jnp.int32), axis=1, keepdims=True)
    y = (lo - corr).astype(jnp.float32) + hi.astype(jnp.float32) * 0.0625
    return y * (sx * 0.01)


def v_w4a8_pallas_mask3(x, w):
    p, s = w
    return _w4a8_pallas_mask3_call(x, p, block_out=1792, block_in_packed=2048)


def make_mask3_variant(block_out, block_in_packed, pad_rows=0):
    def v(x, w):
        p, s = w
        if pad_rows:
            x = jnp.concatenate(
                [x, jnp.zeros((pad_rows - x.shape[0], K), x.dtype)])
            return _w4a8_pallas_mask3_call(x, p, block_out=block_out,
                                           block_in_packed=block_in_packed)[:1]
        return _w4a8_pallas_mask3_call(x, p, block_out=block_out,
                                       block_in_packed=block_in_packed)
    return v


def _w4a8_pallas_call(x, p, block_out=512, block_in_packed=1024):
    """Pallas kernel: wrap-trick unpack + two s8 MXU dots, int32 out."""
    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = x.shape[0]
    half = K // 2
    sx = jnp.max(jnp.abs(x)) / 127.0
    xq = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)

    def kernel(x_lo_ref, x_hi_ref, p_ref, o_ref, acc_ref):
        @pl.when(pl.program_id(1) == 0)
        def _init():
            acc_ref[...] = jnp.zeros_like(acc_ref)
        pp = p_ref[...]
        # Mosaic has no int8 multiply/shift; build lo16 = (p << 4) bytewise
        # via an i32 reinterpret (shift + mask never cross byte boundaries
        # after masking), and hi16 = p & 0xF0 is a pure byte mask.
        p32 = pltpu.bitcast(pp, jnp.int32)
        lo32 = jnp.left_shift(p32, 4) & jnp.int32(-252645136)  # 0xF0F0F0F0
        lo16 = pltpu.bitcast(lo32, jnp.int8)
        hi16 = pp & jnp.int8(-16)
        acc_ref[...] += (
            jnp.dot(x_lo_ref[...], lo16, preferred_element_type=jnp.int32)
            + jnp.dot(x_hi_ref[...], hi16, preferred_element_type=jnp.int32))
        o_ref[...] = acc_ref[...]

    grid = (N // block_out, half // block_in_packed)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((b, block_in_packed), lambda j, k: (0, k)),
            pl.BlockSpec((b, block_in_packed), lambda j, k: (0, k)),
            pl.BlockSpec((block_in_packed, block_out), lambda j, k: (k, j)),
        ],
        out_specs=pl.BlockSpec((b, block_out), lambda j, k: (0, j)),
        out_shape=jax.ShapeDtypeStruct((b, N), jnp.int32),
        scratch_shapes=[pltpu.VMEM((b, block_out), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * K * N, bytes_accessed=p.size + x.nbytes,
            transcendentals=0),
    )(xq[:, :half], xq[:, half:], p)
    return (out >> 4).astype(jnp.float32) * (sx * 0.01)


def v_w4a8_pallas(x, w):
    p, s = w
    return _w4a8_pallas_call(x, p)


def make_w4a8_pallas_variant(block_out, block_in_packed):
    def v(x, w):
        p, s = w
        return _w4a8_pallas_call(x, p, block_out=block_out,
                                 block_in_packed=block_in_packed)
    return v


VARIANTS = {
    "int8_weightscale": (v_int8_weightscale, "int8"),
    "int8_partialscale": (v_int8_partialscale, "int8"),
    "int8_bitcast": (v_int8_bitcast, "int8"),
    "int4_current": (v_int4_current, "int4packed"),
    "int4_partial": (v_int4_partial, "int4packed"),
    "int4_bitcast": (v_int4_bitcast, "int4packed"),
    "int4_native": (v_int4_native, "int4native"),
    "int4_native_partial": (v_int4_native_partial, "int4native"),
    "w8a8_mxu": (v_w8a8_mxu, "int8"),
    "w8a8_flat": (v_w8a8_flat, "int8"),
    "w4a8_flat": (v_w4a8_flat, "int4packed"),
    "w4a8_wrap": (v_w4a8_wrap, "int4packed"),
    "w4a8_mask2": (v_w4a8_mask2, "int4packed"),
    "w4a8_mask3": (v_w4a8_mask3, "int4packed"),
    "w4a8_pallas_mask": (v_w4a8_pallas_mask, "int4packed"),
    "w4a8_pallas_mask3": (v_w4a8_pallas_mask3, "int4packed"),
    "w4a8_pallas_mask3_o896_k2048": (make_mask3_variant(896, 2048), "int4packed"),
    "w4a8_pallas_mask3_o1792_k1024": (make_mask3_variant(1792, 1024), "int4packed"),
    "w4a8_pallas_mask3_o896_k1024": (make_mask3_variant(896, 1024), "int4packed"),
    "w4a8_pallas_mask3_pad8": (make_mask3_variant(896, 2048, pad_rows=8), "int4packed"),
    "w4a8_pallas_mask3_pad8_o1792": (make_mask3_variant(1792, 2048, pad_rows=8), "int4packed"),
    "w4a8_pallas": (v_w4a8_pallas, "int4packed"),
    "w4a8_pallas_o1792_k2048": (make_w4a8_pallas_variant(1792, 2048), "int4packed"),
    "w4a8_pallas_o1792_k1024": (make_w4a8_pallas_variant(1792, 1024), "int4packed"),
    "w4a8_pallas_o3584_k2048": (make_w4a8_pallas_variant(3584, 2048), "int4packed"),
    "w4a8_pallas_o896_k2048": (make_w4a8_pallas_variant(896, 2048), "int4packed"),
    "w4a8_pallas_o512_k2048": (make_w4a8_pallas_variant(512, 2048), "int4packed"),
    "w4a8_flat_i8shift": (v_w4a8_flat_i8shift, "int4packed"),
    "w4a8_group": (v_w4a8_group, "int4packed"),
    "w4a8_groupmult": (v_w4a8_groupmult, "int4packed"),
    "fp8": (v_fp8, "fp8"),
    "readonly_int8": (v_readonly_int8, "int8"),
}


def measure(name, step, kind):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, K), jnp.bfloat16)
    fn = scan_matvec(step)
    times = {}
    bytes_per_layer = 0
    for L in (L_LO, L_HI):
        w, nbytes = make_weights(kind, L, key)
        bytes_per_layer = nbytes // L
        try:
            np.asarray(fn(x, w))  # compile + warm
        except Exception as e:  # noqa: BLE001
            print(f"{name:24s} FAILED: {type(e).__name__}: {str(e)[:120]}", flush=True)
            return
        t = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(fn(x, w))
            t.append(time.perf_counter() - t0)
        times[L] = min(t)
        del w  # free HBM before allocating the next stack
    marginal = (times[L_HI] - times[L_LO]) / ((L_HI - L_LO) * M_REPEATS)
    gbps = bytes_per_layer / marginal / 1e9
    print(f"{name:24s} {marginal*1e6:9.1f} us/layer   {gbps:7.1f} GB/s effective",
          flush=True)


def main():
    global M_REPEATS
    p = argparse.ArgumentParser()
    p.add_argument("--variants", default=",".join(VARIANTS))
    p.add_argument("--repeats", type=int, default=M_REPEATS,
                   help="fori_loop repeats; raise if results exceed roofline "
                        "(signal must dominate ~10ms tunnel jitter)")
    args = p.parse_args()
    M_REPEATS = args.repeats
    print(f"device: {jax.devices()[0].platform}, shapes K={K} N={N} G={G}, "
          f"M={M_REPEATS}")
    for name in args.variants.split(","):
        step, kind = VARIANTS[name]
        measure(name, step, kind)


if __name__ == "__main__":
    main()
