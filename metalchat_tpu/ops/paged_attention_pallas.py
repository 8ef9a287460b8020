"""Pallas paged decode attention (INT8 KV pages + page-table indirection).

The TPU-native paged attention: physical KV pages are non-contiguous in HBM
and each sequence addresses them through a page table. Rather than manual
per-page DMA descriptors, the page lookup happens in the **BlockSpec
index_map**, which receives the scalar-prefetched page table: grid step
(b, i) DMAs exactly page ``page_table[b, i]`` — Pallas' pipelining then
double-buffers page fetches against compute automatically.

ALL kv heads run in one grid step as a batched ``dot_general`` (the same
heads-batching that took the dense kernel from 315 → 77 µs/step on the 8B
trace — a (b, h, i) grid pays ~10 µs of per-grid-step overhead per head).
Logical page indices are clamped to the row's live ``[window_lo, length)``
page range before the table lookup, so out-of-range steps repeat the
boundary page and Mosaic skips their DMA entirely (mirrors
decode_attention_pallas._block_clamp).

Online-softmax accumulation, per-row lengths, GQA group batching, dynamic
sliding window, and fused int8 dequantization all match
ops/decode_attention_pallas.py (the dense-slab variant).
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


def _paged_kernel(
    pt_ref,        # SMEM [B, MP] page table
    lengths_ref,   # SMEM [B]
    window_ref,    # SMEM [1] — -1 = global
    q_ref,         # [1, n_kv, groups, hd]
    k_ref,         # [n_kv, 1, psize, hd]  (page selected by index_map)
    v_ref,
    ks_ref,        # [1, n_kv, psize] — whole page's scales, all heads (a
    vs_ref,        #   trailing size-1 lane dim would be 128×-padded)
    o_ref,         # [1, n_kv, groups, hd]
    m_ref,         # VMEM [n_kv, groups, LANES]
    l_ref,
    acc_ref,       # VMEM [n_kv, groups, hd]
    *,
    page_size: int,
    scale: float,
):
    b = pl.program_id(0)
    i = pl.program_id(1)
    length = lengths_ref[b]
    window = window_ref[0]
    is_global = window < 0

    @pl.when(i == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    start = i * page_size
    in_range = start < length
    in_range &= is_global | (start + page_size > length - 1 - window)

    nkv, groups, hd = q_ref.shape[-3:]

    def scales_row(scale_ref):
        sc = scale_ref[...].astype(jnp.float32)
        return sc.reshape(nkv, 1, sc.shape[-1])  # [n_kv, 1, psize]

    @pl.when(in_range)
    def _run():
        q = q_ref[...].astype(jnp.float32).reshape(nkv, groups, hd)
        k = k_ref[...].astype(jnp.float32).reshape(nkv, page_size, hd)
        # All kv heads in one batched MXU call: [n_kv, groups, psize].
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
        s = s * scales_row(ks_ref)  # k-scale constant along hd → post-dot

        kv_pos = start + jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        ok = kv_pos < length
        ok &= is_global | (kv_pos > length - 1 - window)
        s = jnp.where(ok, s, MASK_VALUE)

        m_prev = m_ref[:, :, :1]
        l_prev = l_ref[:, :, :1]
        m_curr = jnp.max(s, axis=2, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next)                    # [n_kv, groups, psize]
        l_next = alpha * l_prev + jnp.sum(p, axis=2, keepdims=True)
        m_ref[...] = jnp.broadcast_to(m_next, m_ref.shape)
        l_ref[...] = jnp.broadcast_to(l_next, l_ref.shape)

        v = v_ref[...].astype(jnp.float32).reshape(nkv, page_size, hd)
        o_curr = jax.lax.dot_general(
            p * scales_row(vs_ref), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        acc_ref[...] = acc_ref[...] * alpha + o_curr

    @pl.when(i == pl.num_programs(1) - 1)
    def _finish():
        l = l_ref[:, :, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[...] = (acc_ref[...] * l_inv).astype(o_ref.dtype).reshape(o_ref.shape)


def _page_clamp(i, pt, lens, win, bb, psize, limit):
    """Clamp grid step i to the row's live page range, then look up the page.

    Out-of-range steps (past the row's length, or wholly below its sliding
    window) repeat a boundary page index, so Mosaic skips their DMA; the
    kernel's `in_range` predicate skips the compute. Sentinel/corrupt table
    entries are additionally clamped to a valid physical page."""
    length = lens[bb]
    upper = jnp.maximum(length - 1, 0) // psize
    low = jnp.where(win[0] < 0, 0,
                    jnp.maximum(length - 1 - win[0], 0) // psize)
    return jnp.minimum(pt[bb, jnp.clip(i, low, upper)], limit)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def paged_decode_attention(
    q: jax.Array,           # [B, nh, hd]
    k_pages: jax.Array,     # int8 [n_kv, P, psize, hd]
    v_pages: jax.Array,
    k_scale: jax.Array,     # f32 [P, n_kv, psize] (page-major, flat)
    v_scale: jax.Array,
    page_table: jax.Array,  # int32 [B, max_pages_per_seq]
    lengths: jax.Array,     # int32 [B]
    *,
    scale: float,
    window=None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    from metalchat_tpu.ops import resolve_interpret

    interpret = resolve_interpret(interpret)
    b, nh, hd = q.shape
    n_kv, num_pages, psize, _ = k_pages.shape
    groups = nh // n_kv
    mp = page_table.shape[1]
    q4 = q.reshape(b, n_kv, groups, hd)

    if window is None:
        window_arr = jnp.full((1,), -1, jnp.int32)
    else:
        window_arr = jnp.asarray(window, jnp.int32).reshape(1)

    limit = num_pages - 1

    def page_map(bb, i, pt, lens, win):
        return (0, _page_clamp(i, pt, lens, win, bb, psize, limit), 0, 0)

    def scales_map(bb, i, pt, lens, win):
        return (_page_clamp(i, pt, lens, win, bb, psize, limit), 0, 0)

    kernel = functools.partial(_paged_kernel, page_size=psize, scale=scale)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, n_kv, groups, hd), q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(b, mp),
            in_specs=[
                pl.BlockSpec((1, n_kv, groups, hd), lambda bb, i, *_: (bb, 0, 0, 0)),
                pl.BlockSpec((n_kv, 1, psize, hd), page_map),
                pl.BlockSpec((n_kv, 1, psize, hd), page_map),
                pl.BlockSpec((1, n_kv, psize), scales_map),
                pl.BlockSpec((1, n_kv, psize), scales_map),
            ],
            out_specs=pl.BlockSpec((1, n_kv, groups, hd),
                                   lambda bb, i, *_: (bb, 0, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((n_kv, groups, LANES), jnp.float32),
                pltpu.VMEM((n_kv, groups, LANES), jnp.float32),
                pltpu.VMEM((n_kv, groups, hd), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(page_table.astype(jnp.int32), lengths.astype(jnp.int32), window_arr,
      q4, k_pages, v_pages, k_scale, v_scale)
    return out.reshape(b, nh, hd)


def _quantize_row(x):
    """In-kernel mirror of cache.quantize_kv over the last axis (same op
    order → bit-identical to quantize-then-write)."""
    absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    scale = absmax / 127.0
    inv = jnp.where(scale == 0.0, 0.0, 1.0 / scale)
    q = jnp.clip(jnp.round(x * inv), -127, 127).astype(jnp.int8)
    return q, scale


def _paged_update_kernel(
    pt_ref,        # SMEM [B, MP]
    lengths_ref,   # SMEM [B] — INCLUDING the new token (q sits at length-1)
    window_ref,    # SMEM [1]
    layer_ref,     # SMEM [1]
    q_ref,         # [1, n_kv, groups, hd]
    kn_ref,        # [1, n_kv, hd] — new K row (post-rope, unquantized)
    vn_ref,
    k_ref,         # [1, n_kv, 1, psize, hd] int8 (page via index_map)
    v_ref,
    ks_ref,        # [1, 1, n_kv, psize]
    vs_ref,
    o_ref,         # [1, n_kv, groups, hd]
    ck_ref,        # aliased page outputs — every grid step maps to the
    cv_ref,        #   page holding `pos`; written at the pos step, the
    csk_ref,       #   block persists in VMEM and flushes at the row's end
    csv_ref,
    m_ref, l_ref, acc_ref,
    *,
    page_size: int,
    scale: float,
):
    b = pl.program_id(0)
    i = pl.program_id(1)
    length = lengths_ref[b]
    window = window_ref[0]
    is_global = window < 0
    pos = jnp.maximum(length - 1, 0)
    pos_page = pos // page_size

    @pl.when(i == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    start = i * page_size
    in_range = start < length
    in_range &= is_global | (start + page_size > length - 1 - window)
    is_pos_pg = i == pos_page

    nkv, groups, hd = q_ref.shape[-3:]

    # Quantize the incoming row in-register (recomputed per visited page —
    # cheaper than a cross-step carry; same 32-bit merge discipline as the
    # dense fused kernel, decode_attention_pallas._decode_update_kernel).
    kn = kn_ref[...].astype(jnp.float32).reshape(nkv, hd)
    vn = vn_ref[...].astype(jnp.float32).reshape(nkv, hd)
    qk_new, sk_new = _quantize_row(kn)
    qv_new, sv_new = _quantize_row(vn)

    @pl.when(in_range)
    def _run():
        q = q_ref[...].astype(jnp.float32).reshape(nkv, groups, hd)
        k_blk = k_ref[...].astype(jnp.float32).reshape(nkv, page_size, hd)
        v_blk = v_ref[...].astype(jnp.float32).reshape(nkv, page_size, hd)
        ks_row = ks_ref[...].astype(jnp.float32).reshape(nkv, page_size)
        vs_row = vs_ref[...].astype(jnp.float32).reshape(nkv, page_size)

        # The page holds STALE bytes at `pos`: the new token enters at
        # SCORE level (recomputed column from a tiny q·k_new dot + outer-
        # product V contribution); the page merge happens once, at the
        # aliased write below.
        s = jax.lax.dot_general(
            q, k_blk, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
        s = s * ks_row.reshape(nkv, 1, page_size)

        kv_pos = start + jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        col = kv_pos == pos
        s_new = jax.lax.dot_general(
            q, qk_new[:, None, :],
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * (scale * sk_new.reshape(nkv, 1, 1))
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
        row = jax.lax.broadcasted_iota(jnp.int32, (nkv, page_size), 1)
        sub = is_pos_pg & (row == pos - start)
        vs_use = jnp.where(sub, jnp.broadcast_to(sv_new, vs_row.shape), vs_row)
        p = p * vs_use.reshape(nkv, 1, page_size)
        p_pos = jnp.sum(p * colf, axis=2)
        o_curr = jax.lax.dot_general(
            p * (1.0 - colf), v_blk, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) + p_pos[:, :, None] * qv_new[:, None, :]
        acc_ref[...] = acc_ref[...] * alpha + o_curr

        @pl.when(is_pos_pg)
        def _write():
            row3 = jax.lax.broadcasted_iota(jnp.int32, (nkv, page_size, hd), 1)
            sel3 = row3 == pos - start
            k_use = jnp.where(sel3, qk_new[:, None, :], k_blk)
            v_use = jnp.where(sel3, qv_new[:, None, :], v_blk)
            ks_use = jnp.where(sub, jnp.broadcast_to(sk_new, ks_row.shape),
                               ks_row)
            ck_ref[...] = k_use.astype(ck_ref.dtype).reshape(ck_ref.shape)
            cv_ref[...] = v_use.astype(cv_ref.dtype).reshape(cv_ref.shape)
            csk_ref[...] = ks_use.astype(csk_ref.dtype).reshape(csk_ref.shape)
            csv_ref[...] = vs_use.astype(csv_ref.dtype).reshape(csv_ref.shape)

    @pl.when(i == pl.num_programs(1) - 1)
    def _finish():
        l = l_ref[:, :, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[...] = (acc_ref[...] * l_inv).astype(o_ref.dtype).reshape(o_ref.shape)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def paged_decode_attention_update_stacked(
    q: jax.Array,           # [B, nh, hd] (post-rope)
    k_new: jax.Array,       # [B, n_kv, hd] (post-rope, unquantized)
    v_new: jax.Array,
    k_pages: jax.Array,     # int8 [L, n_kv, P(+1), psize, hd] — IN PLACE
    v_pages: jax.Array,
    k_scale: jax.Array,     # f32 [L, P(+1), n_kv, psize]
    v_scale: jax.Array,
    page_table: jax.Array,  # int32 [B, max_pages_per_seq]
    lengths: jax.Array,     # int32 [B] — INCLUDING the new token
    layer: jax.Array,       # scalar int32
    *,
    scale: float,
    window=None,
    interpret: Optional[bool] = None,
):
    """Fused paged decode step: quantize the new K/V row, write it into its
    page (aliased in-place outputs pinned to the page holding `pos` — the
    pattern proven by decode_attention_update_quantized_stacked), and attend
    over the updated pages — one kernel replacing the chained per-row page
    DUS writes + the attention call (the write chain is what made the 1B
    paged fast path a regression vs its own scan path, SERVE_r04 'open').

    Rows whose pos page-table entry is the sentinel write into the reserved
    garbage page (the clamp in the write index map), mirroring
    update_stacked_paged_cache. Returns
    (attn [B, nh, hd], k_pages, v_pages, k_scale, v_scale)."""
    from metalchat_tpu.ops import resolve_interpret

    interpret = resolve_interpret(interpret)
    b, nh, hd = q.shape
    L, n_kv, num_pages, psize, _ = k_pages.shape
    groups = nh // n_kv
    mp = page_table.shape[1]
    q4 = q.reshape(b, n_kv, groups, hd)

    if window is None:
        window_arr = jnp.full((1,), -1, jnp.int32)
    else:
        window_arr = jnp.asarray(window, jnp.int32).reshape(1)
    layer_arr = jnp.asarray(layer, jnp.int32).reshape(1)

    limit = num_pages - 1

    def page_map(bb, i, pt, lens, win, lay):
        return (lay[0], 0, _page_clamp(i, pt, lens, win, bb, psize, limit), 0, 0)

    def scales_map(bb, i, pt, lens, win, lay):
        return (lay[0], _page_clamp(i, pt, lens, win, bb, psize, limit), 0, 0)

    def _wpage(bb, pt, lens):
        pos = jnp.maximum(lens[bb] - 1, 0)
        return jnp.minimum(pt[bb, pos // psize], limit)

    def pos_page_map(bb, i, pt, lens, win, lay):
        return (lay[0], 0, _wpage(bb, pt, lens), 0, 0)

    def pos_scales_map(bb, i, pt, lens, win, lay):
        return (lay[0], _wpage(bb, pt, lens), 0, 0)

    kernel = functools.partial(_paged_update_kernel, page_size=psize,
                               scale=scale)
    out_shape = [
        jax.ShapeDtypeStruct((b, n_kv, groups, hd), q.dtype),
        jax.ShapeDtypeStruct(k_pages.shape, k_pages.dtype),
        jax.ShapeDtypeStruct(v_pages.shape, v_pages.dtype),
        jax.ShapeDtypeStruct(k_scale.shape, k_scale.dtype),
        jax.ShapeDtypeStruct(v_scale.shape, v_scale.dtype),
    ]
    out_specs = [
        pl.BlockSpec((1, n_kv, groups, hd), lambda bb, i, *_: (bb, 0, 0, 0)),
        pl.BlockSpec((1, n_kv, 1, psize, hd), pos_page_map),
        pl.BlockSpec((1, n_kv, 1, psize, hd), pos_page_map),
        pl.BlockSpec((1, 1, n_kv, psize), pos_scales_map),
        pl.BlockSpec((1, 1, n_kv, psize), pos_scales_map),
    ]
    # Positional operands: 4 scalar-prefetch + 7 arrays; the page arrays
    # (operands 7..10) alias outputs 1..4.
    attn, k_pages, v_pages, k_scale, v_scale = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(b, mp),
            in_specs=[
                pl.BlockSpec((1, n_kv, groups, hd), lambda bb, i, *_: (bb, 0, 0, 0)),
                pl.BlockSpec((1, n_kv, hd), lambda bb, i, *_: (bb, 0, 0)),
                pl.BlockSpec((1, n_kv, hd), lambda bb, i, *_: (bb, 0, 0)),
                pl.BlockSpec((1, n_kv, 1, psize, hd), page_map),
                pl.BlockSpec((1, n_kv, 1, psize, hd), page_map),
                pl.BlockSpec((1, 1, n_kv, psize), scales_map),
                pl.BlockSpec((1, 1, n_kv, psize), scales_map),
            ],
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((n_kv, groups, LANES), jnp.float32),
                pltpu.VMEM((n_kv, groups, LANES), jnp.float32),
                pltpu.VMEM((n_kv, groups, hd), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        input_output_aliases={7: 1, 8: 2, 9: 3, 10: 4},
        interpret=interpret,
    )(page_table.astype(jnp.int32), lengths.astype(jnp.int32), window_arr,
      layer_arr, q4, k_new, v_new, k_pages, v_pages, k_scale, v_scale)
    return attn.reshape(b, nh, hd), k_pages, v_pages, k_scale, v_scale


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def paged_decode_attention_stacked(
    q: jax.Array,           # [B, nh, hd]
    k_pages: jax.Array,     # int8 [L, n_kv, P(+1), psize, hd]
    v_pages: jax.Array,
    k_scale: jax.Array,     # f32 [L, P(+1), n_kv, psize]
    v_scale: jax.Array,
    page_table: jax.Array,  # int32 [B, max_pages_per_seq]
    lengths: jax.Array,     # int32 [B]
    layer: jax.Array,       # scalar int32
    *,
    scale: float,
    window=None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """`paged_decode_attention` reading layer `layer` of the STACKED page
    pool directly (scalar-prefetched index — same reason as the dense
    `decode_attention_*_stacked` variants: a per-layer slice fed from a
    `lax.scan` materializes the whole slice per step; the decode fast
    path's fori_loop + index-map read streams only the visited pages)."""
    from metalchat_tpu.ops import resolve_interpret

    interpret = resolve_interpret(interpret)
    b, nh, hd = q.shape
    L, n_kv, num_pages, psize, _ = k_pages.shape
    groups = nh // n_kv
    mp = page_table.shape[1]
    q4 = q.reshape(b, n_kv, groups, hd)

    if window is None:
        window_arr = jnp.full((1,), -1, jnp.int32)
    else:
        window_arr = jnp.asarray(window, jnp.int32).reshape(1)
    layer_arr = jnp.asarray(layer, jnp.int32).reshape(1)

    limit = num_pages - 1

    def page_map(bb, i, pt, lens, win, lay):
        return (lay[0], 0, _page_clamp(i, pt, lens, win, bb, psize, limit), 0, 0)

    def scales_map(bb, i, pt, lens, win, lay):
        return (lay[0], _page_clamp(i, pt, lens, win, bb, psize, limit), 0, 0)

    def _kernel(pt_ref, lengths_ref, window_ref, layer_ref, *refs,
                page_size, scale):
        _paged_kernel(pt_ref, lengths_ref, window_ref, *refs,
                      page_size=page_size, scale=scale)

    kernel = functools.partial(_kernel, page_size=psize, scale=scale)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, n_kv, groups, hd), q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(b, mp),
            in_specs=[
                pl.BlockSpec((1, n_kv, groups, hd), lambda bb, i, *_: (bb, 0, 0, 0)),
                pl.BlockSpec((1, n_kv, 1, psize, hd), page_map),
                pl.BlockSpec((1, n_kv, 1, psize, hd), page_map),
                pl.BlockSpec((1, 1, n_kv, psize), scales_map),
                pl.BlockSpec((1, 1, n_kv, psize), scales_map),
            ],
            out_specs=pl.BlockSpec((1, n_kv, groups, hd),
                                   lambda bb, i, *_: (bb, 0, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((n_kv, groups, LANES), jnp.float32),
                pltpu.VMEM((n_kv, groups, LANES), jnp.float32),
                pltpu.VMEM((n_kv, groups, hd), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(page_table.astype(jnp.int32), lengths.astype(jnp.int32), window_arr,
      layer_arr, q4, k_pages, v_pages, k_scale, v_scale)
    return out.reshape(b, nh, hd)
