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
