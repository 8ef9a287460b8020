"""Pallas paged decode attention (INT8 KV pages + page-table indirection).

The TPU-native paged attention: physical KV pages are non-contiguous in HBM
and each sequence addresses them through a page table. Rather than manual
per-page DMA descriptors, the page lookup happens in the **BlockSpec
index_map**, which receives the scalar-prefetched page table: grid step
(b, h, i) DMAs exactly page ``page_table[b, i]`` — Pallas' pipelining then
double-buffers page fetches against compute automatically.

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
    q_ref,         # [1, 1, groups, hd]
    k_ref,         # [1, 1, psize, hd]  (page selected by index_map)
    v_ref,
    ks_ref,        # [1, n_kv, psize] — whole page's scales, all heads (a
    vs_ref,        #   trailing size-1 lane dim would be 128×-padded)
    o_ref,         # [1, 1, groups, hd]
    m_ref,
    l_ref,
    acc_ref,
    *,
    page_size: int,
    scale: float,
):
    b = pl.program_id(0)
    h = pl.program_id(1)
    i = pl.program_id(2)
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

    def head_row(scale_ref):
        # [1, n_kv, psize] → kv-head h's scales as a [1, psize] lane vector.
        all_heads = scale_ref[0].astype(jnp.float32)
        sel = jax.lax.broadcasted_iota(jnp.int32, all_heads.shape, 0) == h
        return jnp.sum(jnp.where(sel, all_heads, 0.0), axis=0, keepdims=True)

    @pl.when(in_range)
    def _run():
        q = q_ref[0, 0].astype(jnp.float32)                      # [groups, hd]
        k = k_ref[0, 0].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale                                                # [groups, psize]
        s = s * head_row(ks_ref)  # k-scale constant along hd → post-dot

        kv_pos = start + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        ok = kv_pos < length
        ok &= is_global | (kv_pos > length - 1 - window)
        s = jnp.where(ok, s, MASK_VALUE)

        m_prev = m_ref[:, :1]
        l_prev = l_ref[:, :1]
        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next)
        l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_ref[...] = jnp.broadcast_to(m_next, m_ref.shape)
        l_ref[...] = jnp.broadcast_to(l_next, l_ref.shape)

        v = v_ref[0, 0].astype(jnp.float32)
        acc_ref[...] = acc_ref[...] * alpha + jnp.dot(
            p * head_row(vs_ref), v, preferred_element_type=jnp.float32
        )

    @pl.when(i == pl.num_programs(2) - 1)
    def _finish():
        l = l_ref[:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, 0] = (acc_ref[...] * l_inv).astype(o_ref.dtype)


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
    interpret: bool = False,
) -> jax.Array:
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

    def page_map(bb, h, i, pt, lens, win):
        # Clamp sentinel/out-of-range entries to a valid page; masked anyway.
        return (h, jnp.minimum(pt[bb, i], limit), 0, 0)

    def scales_map(bb, h, i, pt, lens, win):
        return (jnp.minimum(pt[bb, i], limit), 0, 0)

    kernel = functools.partial(_paged_kernel, page_size=psize, scale=scale)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, n_kv, groups, hd), q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(b, n_kv, mp),
            in_specs=[
                pl.BlockSpec((1, 1, groups, hd), lambda bb, h, i, *_: (bb, h, 0, 0)),
                pl.BlockSpec((1, 1, psize, hd), page_map),
                pl.BlockSpec((1, 1, psize, hd), page_map),
                pl.BlockSpec((1, n_kv, psize), scales_map),
                pl.BlockSpec((1, n_kv, psize), scales_map),
            ],
            out_specs=pl.BlockSpec((1, 1, groups, hd), lambda bb, h, i, *_: (bb, h, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((groups, LANES), jnp.float32),
                pltpu.VMEM((groups, LANES), jnp.float32),
                pltpu.VMEM((groups, hd), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(page_table.astype(jnp.int32), lengths.astype(jnp.int32), window_arr,
      q4, k_pages, v_pages, k_scale, v_scale)
    return out.reshape(b, nh, hd)
