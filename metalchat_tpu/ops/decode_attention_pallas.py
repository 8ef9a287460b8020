"""Pallas decode attention (single-token GQA over a dense KV cache).

Replaces the reference's decode-path chain bmm→scale→mask→softmax→bmm
(nn/attention.h:161-206) with one kernel: the scores row never exists in
HBM, the softmax is the online (running max/sum) formulation, and the KV
cache is read exactly once per step. GQA is exploited MXU-side: all
`groups = nh/nkv` query heads that share a KV head are batched into one
[groups, hd] × [hd, block_t] matmul (the reference materializes
repeat_interleave copies of KV instead — transform.h:80-90), and ALL kv
heads run in one grid step as a batched dot_general — the r2 kernel's
(b, n_kv, T/block) grid spent ~10 µs/layer of per-grid-step overhead at
short fills (315 µs/step on the 8B trace); the (b, T/block) grid cuts the
step count 8×.

Layouts (Mosaic block rules: last two block dims must be ÷(8,128) or equal
to the array dims):
  q        [B, n_kv, groups, hd]   — heads are kv-major, so the groups for
                                     kv-head h are one contiguous block
  k, v     [B, n_kv, T, hd]        — the cache-native head-major layout
  scales   [B, n_kv, T]            — int8-KV per-position scales, FLAT (a
    trailing size-1 lane dim is 128×-padded by XLA tiling — measured ~1.3
    ms/step of padded layout-conversion copies on the 8B decode trace).
    k-scales are applied to the score rows / v-scales to the probability
    rows LANE-wise — algebraically identical to scaling K/V (the scale is
    constant along head_dim) and cheaper than a sublane-broadcast multiply.

Variants:
  * bf16 KV — `decode_attention`
  * int8 KV — `decode_attention_quantized` (dequantization fused; halves
    cache HBM traffic)
  * `*_stacked` — read layer `l` of a [L, ...] stacked cache directly via a
    scalar-prefetched index (no per-layer slice is ever materialized).

Per-row valid lengths arrive via scalar prefetch, so rows of a continuous
batch sit at different positions (the engine's per-slot decode). The
sliding window is also a dynamic scalar (-1 = global), letting Gemma's
alternating local/global layers share one compiled kernel inside the layer
loop. KV blocks entirely beyond a row's length (or before its window) are
skipped before their DMA is issued (`_block_clamp`).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
LANES = 128


def _decode_kernel(
    lengths_ref,   # SMEM [B]
    window_ref,    # SMEM [1] — sliding window, -1 = global attention
    q_ref,         # [1, n_kv, groups, hd]
    k_ref,         # [1(,1), n_kv, block_t, hd]
    v_ref,
    o_ref,         # [1, n_kv, groups, hd]
    m_ref,         # VMEM [n_kv, groups, LANES]
    l_ref,
    acc_ref,       # VMEM [n_kv, groups, hd]
    *,
    block_t: int,
    scale: float,
    quantized: bool,
    k_scale_ref=None,  # [1(,1), n_kv, block_t]
    v_scale_ref=None,
):
    b = pl.program_id(0)
    t = pl.program_id(1)
    length = lengths_ref[b]
    window = window_ref[0]
    is_global = window < 0

    @pl.when(t == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    start = t * block_t
    in_range = start < length
    in_range &= is_global | (start + block_t > length - 1 - window)

    nkv, groups, hd = q_ref.shape[-3:]

    def scales_row(scale_ref):
        sc = scale_ref[...].astype(jnp.float32)
        return sc.reshape(nkv, 1, sc.shape[-1])  # [n_kv, 1, block_t]

    @pl.when(in_range)
    def _run():
        q = q_ref[...].astype(jnp.float32).reshape(nkv, groups, hd)
        k = k_ref[...].astype(jnp.float32).reshape(nkv, block_t, hd)
        # All kv heads in one batched MXU call: [n_kv, groups, block_t].
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
        if quantized:
            s = s * scales_row(k_scale_ref)  # k-scale constant along hd

        kv_pos = start + jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        ok = kv_pos < length
        ok &= is_global | (kv_pos > length - 1 - window)
        s = jnp.where(ok, s, MASK_VALUE)

        m_prev = m_ref[:, :, :1]
        l_prev = l_ref[:, :, :1]
        m_curr = jnp.max(s, axis=2, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next)                    # [n_kv, groups, block_t]
        l_next = alpha * l_prev + jnp.sum(p, axis=2, keepdims=True)
        m_ref[...] = jnp.broadcast_to(m_next, m_ref.shape)
        l_ref[...] = jnp.broadcast_to(l_next, l_ref.shape)

        v = v_ref[...].astype(jnp.float32).reshape(nkv, block_t, hd)
        if quantized:
            p = p * scales_row(v_scale_ref)  # v-scale constant along hd
        o_curr = jax.lax.dot_general(
            p, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        acc_ref[...] = acc_ref[...] * alpha + o_curr

    @pl.when(t == pl.num_programs(1) - 1)
    def _finish():
        l = l_ref[:, :, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[...] = (acc_ref[...] * l_inv).astype(o_ref.dtype).reshape(o_ref.shape)


@functools.partial(jax.jit, static_argnames=("scale", "block_t", "interpret"))
def decode_attention(
    q: jax.Array,        # [B, nh, hd]
    k: jax.Array,        # [B, n_kv, T, hd]
    v: jax.Array,
    lengths: jax.Array,  # [B] int32 — valid cache lengths (q is at length-1)
    *,
    scale: float,
    window=None,         # sliding window (dynamic scalar ok); None = global
    block_t: int = 256,
    interpret: Optional[bool] = None,
) -> jax.Array:
    return _decode_call(q, k, v, None, None, lengths, scale=scale, window=window,
                        block_t=block_t, interpret=interpret)


@functools.partial(jax.jit, static_argnames=("scale", "block_t", "interpret"))
def decode_attention_quantized(
    q: jax.Array,
    k: jax.Array,          # int8 [B, n_kv, T, hd]
    v: jax.Array,
    k_scale: jax.Array,    # f32 [B, n_kv, T]
    v_scale: jax.Array,
    lengths: jax.Array,
    *,
    scale: float,
    window=None,
    block_t: int = 256,
    interpret: Optional[bool] = None,
) -> jax.Array:
    return _decode_call(q, k, v, k_scale, v_scale, lengths, scale=scale,
                        window=window, block_t=block_t, interpret=interpret)


def _block_clamp(tt, lens, win, bb, block_t):
    """Clamp a KV block index to the row's live [window_lo, length) range.

    Out-of-range grid steps map to a boundary block: Mosaic skips the DMA
    when the block index repeats, so the unfilled tail of the cache (and the
    region below a sliding window) is never streamed — the kernel's
    `in_range` predicate already skips the compute for those steps.
    """
    length = lens[bb]
    upper = jnp.maximum(length - 1, 0) // block_t
    low = jnp.where(win[0] < 0, 0,
                    jnp.maximum(length - 1 - win[0], 0) // block_t)
    return jnp.clip(tt, low, upper)


def _decode_call(q, k, v, ks, vs, lengths, *, scale, window, block_t, interpret):
    from metalchat_tpu.ops import resolve_interpret

    interpret = resolve_interpret(interpret)
    b, nh, hd = q.shape
    _, nkv, t_max, _ = k.shape
    groups = nh // nkv
    block_t = min(block_t, t_max)
    assert t_max % block_t == 0, (t_max, block_t)
    quantized = ks is not None

    grid = (b, t_max // block_t)
    # Heads are kv-major: head index = kv_head * groups + g.
    q4 = q.reshape(b, nkv, groups, hd)

    def kv_map(bb, tt, lens, win):
        return (bb, 0, _block_clamp(tt, lens, win, bb, block_t), 0)

    def scale_map(bb, tt, lens, win):
        return (bb, 0, _block_clamp(tt, lens, win, bb, block_t))

    in_specs = [
        pl.BlockSpec((1, nkv, groups, hd), lambda bb, tt, *_: (bb, 0, 0, 0)),
        pl.BlockSpec((1, nkv, block_t, hd), kv_map),
        pl.BlockSpec((1, nkv, block_t, hd), kv_map),
    ]
    args = [q4, k, v]
    if quantized:
        in_specs += [
            pl.BlockSpec((1, nkv, block_t), scale_map),
            pl.BlockSpec((1, nkv, block_t), scale_map),
        ]
        args += [ks, vs]

    if window is None:
        window_arr = jnp.full((1,), -1, jnp.int32)
    else:  # python int or traced scalar (per-layer value inside the loop)
        window_arr = jnp.asarray(window, jnp.int32).reshape(1)

    kernel = functools.partial(
        _decode_kernel_dispatch, block_t=block_t, scale=scale, quantized=quantized
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, nkv, groups, hd), q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, nkv, groups, hd),
                                   lambda bb, tt, *_: (bb, 0, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((nkv, groups, LANES), jnp.float32),
                pltpu.VMEM((nkv, groups, LANES), jnp.float32),
                pltpu.VMEM((nkv, groups, hd), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(lengths.astype(jnp.int32), window_arr, *args)
    return out.reshape(b, nh, hd)


@functools.partial(jax.jit, static_argnames=("scale", "block_t", "interpret"))
def decode_attention_stacked(
    q, k, v, layer, lengths, *, scale, window=None, block_t: int = 256,
    interpret: Optional[bool] = None,
):
    """Decode attention reading layer `layer` of a STACKED cache directly.

    k/v: [L, B, n_kv, T, hd]. The layer index rides scalar prefetch into the
    BlockSpec index maps, so no per-layer slice of the cache is ever
    materialized (feeding a `lax.scan`-sliced layer to a Pallas call costs a
    full copy of the slice — measured ~160 us/step on the 8B decode trace).
    """
    return _decode_call_stacked(q, k, v, None, None, layer, lengths,
                                scale=scale, window=window, block_t=block_t,
                                interpret=interpret)


@functools.partial(jax.jit, static_argnames=("scale", "block_t", "interpret"))
def decode_attention_quantized_stacked(
    q, k, v, k_scale, v_scale, layer, lengths, *, scale, window=None,
    block_t: int = 256, interpret: Optional[bool] = None,
):
    """int8-KV variant of `decode_attention_stacked`; scales [L, B, n_kv, T]."""
    return _decode_call_stacked(q, k, v, k_scale, v_scale, layer, lengths,
                                scale=scale, window=window, block_t=block_t,
                                interpret=interpret)


def _decode_call_stacked(q, k, v, ks, vs, layer, lengths, *, scale, window,
                         block_t, interpret):
    from metalchat_tpu.ops import resolve_interpret

    interpret = resolve_interpret(interpret)
    b, nh, hd = q.shape
    L, _, nkv, t_max, _ = k.shape
    groups = nh // nkv
    block_t = min(block_t, t_max)
    assert t_max % block_t == 0, (t_max, block_t)
    quantized = ks is not None

    grid = (b, t_max // block_t)
    q4 = q.reshape(b, nkv, groups, hd)

    def kv_map(bb, tt, lens, win, lay):
        return (lay[0], bb, 0, _block_clamp(tt, lens, win, bb, block_t), 0)

    def scale_map(bb, tt, lens, win, lay):
        return (lay[0], bb, 0, _block_clamp(tt, lens, win, bb, block_t))

    in_specs = [
        pl.BlockSpec((1, nkv, groups, hd), lambda bb, tt, *_: (bb, 0, 0, 0)),
        pl.BlockSpec((1, 1, nkv, block_t, hd), kv_map),
        pl.BlockSpec((1, 1, nkv, block_t, hd), kv_map),
    ]
    args = [q4, k, v]
    if quantized:
        in_specs += [
            pl.BlockSpec((1, 1, nkv, block_t), scale_map),
            pl.BlockSpec((1, 1, nkv, block_t), scale_map),
        ]
        args += [ks, vs]

    if window is None:
        window_arr = jnp.full((1,), -1, jnp.int32)
    else:
        window_arr = jnp.asarray(window, jnp.int32).reshape(1)
    layer_arr = jnp.asarray(layer, jnp.int32).reshape(1)

    kernel = functools.partial(
        _decode_kernel_dispatch, block_t=block_t, scale=scale, quantized=quantized
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, nkv, groups, hd), q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, nkv, groups, hd),
                                   lambda bb, tt, *_: (bb, 0, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((nkv, groups, LANES), jnp.float32),
                pltpu.VMEM((nkv, groups, LANES), jnp.float32),
                pltpu.VMEM((nkv, groups, hd), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(lengths.astype(jnp.int32), window_arr, layer_arr, *args)
    return out.reshape(b, nh, hd)


def _decode_kernel_dispatch(lengths_ref, window_ref, *refs, block_t, scale, quantized):
    if len(refs) > (9 if quantized else 7):  # stacked call: drop the layer ref
        refs = refs[1:]
    if quantized:
        q_ref, k_ref, v_ref, ks_ref, vs_ref, o_ref, m_ref, l_ref, acc_ref = refs
        _decode_kernel(
            lengths_ref, window_ref, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
            block_t=block_t, scale=scale, quantized=True,
            k_scale_ref=ks_ref, v_scale_ref=vs_ref,
        )
    else:
        q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref = refs
        _decode_kernel(
            lengths_ref, window_ref, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
            block_t=block_t, scale=scale, quantized=False,
        )


# ------------------------------------------------------------------ fused
# attention + KV-quantize + cache-write (the decode step's per-layer cache
# update folded into the attention kernel).


def _quantize_row(x):
    """In-kernel mirror of cache.quantize_kv over the last axis.

    x f32 [nkv, hd] → (int8 [nkv, hd], f32 scale [nkv, 1]). Same op order
    as quantize_kv so the fused path is bit-identical to quantize-then-
    attend (tests/test_decode_attention.py)."""
    absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    scale = absmax / 127.0
    inv = jnp.where(scale == 0.0, 0.0, 1.0 / scale)
    q = jnp.clip(jnp.round(x * inv), -127, 127).astype(jnp.int8)
    return q, scale


def _decode_update_kernel(
    lengths_ref,   # SMEM [B] — INCLUDING the new token (q sits at length-1)
    window_ref,    # SMEM [1]
    layer_ref,     # SMEM [1]
    q_ref,         # [1, n_kv, groups, hd]
    kn_ref,        # [1, n_kv, hd] — the new K row (post-rope, unquantized)
    vn_ref,
    k_ref,         # [1, 1, n_kv, block_t, hd] int8 cache block
    v_ref,
    ks_ref,        # [1, 1, n_kv, block_t] f32
    vs_ref,
    o_ref,         # [1, n_kv, groups, hd]
    ck_ref,        # aliased cache outputs — every grid step maps to the
    cv_ref,        #   block holding `pos`; written once (same revisited-
    csk_ref,       #   block pattern as o_ref, flushed at the row's end)
    csv_ref,
    m_ref, l_ref, acc_ref,
    *,
    block_t: int,
    scale: float,
):
    b = pl.program_id(0)
    t = pl.program_id(1)
    length = lengths_ref[b]
    window = window_ref[0]
    is_global = window < 0
    pos = jnp.maximum(length - 1, 0)
    pos_block = pos // block_t

    @pl.when(t == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    start = t * block_t
    in_range = start < length
    in_range &= is_global | (start + block_t > length - 1 - window)
    is_pos_blk = t == pos_block

    nkv, groups, hd = q_ref.shape[-3:]

    # Quantize the incoming row (tiny VPU work; recomputed per visited
    # block — cheaper than a cross-step carry). Integer values kept in f32
    # registers: the merge below must run in 32-bit — Mosaic only supports
    # non-no-op minor-dim insertion (the broadcasts) for 32-bit types.
    kn = kn_ref[...].astype(jnp.float32).reshape(nkv, hd)
    vn = vn_ref[...].astype(jnp.float32).reshape(nkv, hd)
    qk_new, sk_new = _quantize_row(kn)    # f32 codes (exact ints), f32 scale
    qv_new, sv_new = _quantize_row(vn)

    @pl.when(in_range)
    def _run():
        q = q_ref[...].astype(jnp.float32).reshape(nkv, groups, hd)
        k_blk = k_ref[...].astype(jnp.float32).reshape(nkv, block_t, hd)
        v_blk = v_ref[...].astype(jnp.float32).reshape(nkv, block_t, hd)
        ks_row = ks_ref[...].astype(jnp.float32).reshape(nkv, block_t)
        vs_row = vs_ref[...].astype(jnp.float32).reshape(nkv, block_t)

        # The cache block holds STALE bytes at `pos`; rather than merging
        # the new row into the full [nkv, block_t, hd] block (4 full-block
        # wheres per visited step — measured ~3 µs/layer), the new token
        # enters at SCORE level: its column of s is recomputed from a tiny
        # batched q·k_new dot, and its V contribution is added as an outer
        # product after zeroing the stale column. The stale bytes never
        # influence the output; the block merge happens once, at the write.
        s = jax.lax.dot_general(
            q, k_blk, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
        s = s * ks_row.reshape(nkv, 1, block_t)

        kv_pos = start + jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        col = kv_pos == pos                         # new-token column (only
        s_new = jax.lax.dot_general(                # nonzero in pos block)
            q, qk_new[:, None, :],                  # rhs [B, 1, K] — the
            (((2,), (2,)), ((0,), (0,))),           # vector-like shape
            preferred_element_type=jnp.float32,     # Mosaic's dot supports
        ) * (scale * sk_new.reshape(nkv, 1, 1))     # → [nkv, groups, 1]
        s = jnp.where(col, s_new, s)

        ok = kv_pos < length
        ok &= is_global | (kv_pos > length - 1 - window)
        s = jnp.where(ok, s, MASK_VALUE)

        m_prev = m_ref[:, :, :1]
        l_prev = l_ref[:, :, :1]
        m_curr = jnp.max(s, axis=2, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next)
        l_next = alpha * l_prev + jnp.sum(p, axis=2, keepdims=True)
        m_ref[...] = jnp.broadcast_to(m_next, m_ref.shape)
        l_ref[...] = jnp.broadcast_to(l_next, l_ref.shape)

        colf = col.astype(jnp.float32)
        row = jax.lax.broadcasted_iota(jnp.int32, (nkv, block_t), 1)
        sub = is_pos_blk & (row == pos - start)           # [nkv, block_t]
        vs_use = jnp.where(sub, jnp.broadcast_to(sv_new, vs_row.shape), vs_row)
        p = p * vs_use.reshape(nkv, 1, block_t)
        p_pos = jnp.sum(p * colf, axis=2)                 # [nkv, groups]
        o_curr = jax.lax.dot_general(
            p * (1.0 - colf), v_blk, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) + p_pos[:, :, None] * qv_new[:, None, :]
        acc_ref[...] = acc_ref[...] * alpha + o_curr

        # Write the updated pos block back through the aliased outputs
        # (their index maps pin the pos block for every t, so this write
        # persists in VMEM and flushes once at the row's last step).
        @pl.when(is_pos_blk)
        def _write():
            row3 = jax.lax.broadcasted_iota(jnp.int32, (nkv, block_t, hd), 1)
            sel3 = row3 == pos - start
            k_use = jnp.where(sel3, qk_new[:, None, :], k_blk)
            v_use = jnp.where(sel3, qv_new[:, None, :], v_blk)
            ks_use = jnp.where(sub, jnp.broadcast_to(sk_new, ks_row.shape),
                               ks_row)
            ck_ref[...] = k_use.astype(ck_ref.dtype).reshape(ck_ref.shape)
            cv_ref[...] = v_use.astype(cv_ref.dtype).reshape(cv_ref.shape)
            csk_ref[...] = ks_use.astype(csk_ref.dtype).reshape(csk_ref.shape)
            csv_ref[...] = vs_use.astype(csv_ref.dtype).reshape(csv_ref.shape)

    @pl.when(t == pl.num_programs(1) - 1)
    def _finish():
        l = l_ref[:, :, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[...] = (acc_ref[...] * l_inv).astype(o_ref.dtype).reshape(o_ref.shape)


@functools.partial(jax.jit, static_argnames=("scale", "block_t", "interpret"))
def decode_attention_update_quantized_stacked(
    q: jax.Array,          # [B, nh, hd] (post-rope)
    k_new: jax.Array,      # [B, n_kv, hd] (post-rope, unquantized)
    v_new: jax.Array,
    k: jax.Array,          # int8 [L, B, n_kv, T, hd] — updated IN PLACE
    v: jax.Array,
    k_scale: jax.Array,    # f32 [L, B, n_kv, T]
    v_scale: jax.Array,
    layer: jax.Array,
    lengths: jax.Array,    # [B] — INCLUDING the new token
    *,
    scale: float,
    window=None,
    block_t: int = 256,
    interpret: Optional[bool] = None,
):
    """Fused decode step: quantize the new K/V row, write it into layer
    `layer` of the stacked int8 cache (aliased in-place outputs), and
    attend over the updated cache — one kernel instead of two quantize
    chains + four dynamic_update_slices + the attention call (~105 µs of
    per-layer epilogue on the 8B decode trace, docs/performance.md).

    Returns (attn [B, nh, hd], k, v, k_scale, v_scale). Numerically
    identical to update_stacked_layer_cache_quantized +
    decode_attention_quantized_stacked (same quantization op order; the
    only difference is that the new row's bytes flow from registers
    instead of HBM)."""
    from metalchat_tpu.ops import resolve_interpret

    interpret = resolve_interpret(interpret)
    b, nh, hd = q.shape
    L, _, nkv, t_max, _ = k.shape
    groups = nh // nkv
    block_t = min(block_t, t_max)
    assert t_max % block_t == 0, (t_max, block_t)

    grid = (b, t_max // block_t)
    q4 = q.reshape(b, nkv, groups, hd)

    def kv_map(bb, tt, lens, win, lay):
        return (lay[0], bb, 0, _block_clamp(tt, lens, win, bb, block_t), 0)

    def scale_map(bb, tt, lens, win, lay):
        return (lay[0], bb, 0, _block_clamp(tt, lens, win, bb, block_t))

    def pos_kv_map(bb, tt, lens, win, lay):
        return (lay[0], bb, 0, jnp.maximum(lens[bb] - 1, 0) // block_t, 0)

    def pos_scale_map(bb, tt, lens, win, lay):
        return (lay[0], bb, 0, jnp.maximum(lens[bb] - 1, 0) // block_t)

    in_specs = [
        pl.BlockSpec((1, nkv, groups, hd), lambda bb, tt, *_: (bb, 0, 0, 0)),
        pl.BlockSpec((1, nkv, hd), lambda bb, tt, *_: (bb, 0, 0)),
        pl.BlockSpec((1, nkv, hd), lambda bb, tt, *_: (bb, 0, 0)),
        pl.BlockSpec((1, 1, nkv, block_t, hd), kv_map),
        pl.BlockSpec((1, 1, nkv, block_t, hd), kv_map),
        pl.BlockSpec((1, 1, nkv, block_t), scale_map),
        pl.BlockSpec((1, 1, nkv, block_t), scale_map),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b, nkv, groups, hd), q.dtype),
        jax.ShapeDtypeStruct(k.shape, k.dtype),
        jax.ShapeDtypeStruct(v.shape, v.dtype),
        jax.ShapeDtypeStruct(k_scale.shape, k_scale.dtype),
        jax.ShapeDtypeStruct(v_scale.shape, v_scale.dtype),
    ]
    out_specs = [
        pl.BlockSpec((1, nkv, groups, hd), lambda bb, tt, *_: (bb, 0, 0, 0)),
        pl.BlockSpec((1, 1, nkv, block_t, hd), pos_kv_map),
        pl.BlockSpec((1, 1, nkv, block_t, hd), pos_kv_map),
        pl.BlockSpec((1, 1, nkv, block_t), pos_scale_map),
        pl.BlockSpec((1, 1, nkv, block_t), pos_scale_map),
    ]

    if window is None:
        window_arr = jnp.full((1,), -1, jnp.int32)
    else:
        window_arr = jnp.asarray(window, jnp.int32).reshape(1)
    layer_arr = jnp.asarray(layer, jnp.int32).reshape(1)

    kernel = functools.partial(_decode_update_kernel, block_t=block_t,
                               scale=scale)
    # Positional inputs: 3 scalar-prefetch + 7 arrays; the cache arrays
    # (positions 6..9 counting every operand) alias outputs 1..4.
    attn, k, v, k_scale, v_scale = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((nkv, groups, LANES), jnp.float32),
                pltpu.VMEM((nkv, groups, LANES), jnp.float32),
                pltpu.VMEM((nkv, groups, hd), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        input_output_aliases={6: 1, 7: 2, 8: 3, 9: 4},
        interpret=interpret,
    )(lengths.astype(jnp.int32), window_arr, layer_arr,
      q4, k_new, v_new, k, v, k_scale, v_scale)
    return attn.reshape(b, nh, hd), k, v, k_scale, v_scale
