"""KV caches.

TPU-native re-design of the reference's `sink_cache` (nn/cache.h:96-232):
instead of mutating preallocated Metal buffers with clone/roll kernels, the
cache is an immutable pytree threaded through the jitted step function and
updated with `lax.dynamic_update_slice`; under `jax.jit` with buffer donation
the update happens in place on device. Variants:

  * `KVCache`        — dense [L, B, n_kv, S_max, head_dim] keys/values
    (head-major: the layout Pallas attention kernels and paged KV use).
  * `QuantizedKVCache` — int8 payload + per-(token, head) float scales
    (beyond the reference; halves HBM traffic at decode).
  * sink/sliding eviction — bulk `roll_kv_cache` (amortized over `shift`
    generated tokens) replacing the reference's per-overflow roll kernel
    (cache.h:186-204).

The paged cache for continuous batching lives in `engine/paged.py`.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from metalchat_tpu.config import ModelConfig


@jax.tree_util.register_dataclass
@dataclass
class KVCache:
    """Dense per-layer KV cache; leaves stacked over layers on axis 0."""

    k: jax.Array  # [L, B, n_kv_heads, S_max, head_dim]
    v: jax.Array

    @classmethod
    def create(
        cls,
        config: ModelConfig,
        batch_size: int,
        max_seq_len: Optional[int] = None,
        dtype: jnp.dtype = jnp.bfloat16,
    ) -> "KVCache":
        shape = (
            config.num_layers,
            batch_size,
            config.num_kv_heads,
            max_seq_len or config.max_seq_len,
            config.head_dim,
        )
        return cls(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))

    @property
    def max_seq_len(self) -> int:
        return self.k.shape[3]

    @property
    def batch_size(self) -> int:
        return self.k.shape[1]

    def layer(self, idx) -> Tuple[jax.Array, jax.Array]:
        return self.k[idx], self.v[idx]

    def replace(self, **kw) -> "KVCache":
        return dataclasses.replace(self, **kw)


def _write_rows(cache: jax.Array, new: jax.Array, start_pos: jax.Array) -> jax.Array:
    """dynamic_update_slice at a shared scalar or per-row offset.

    cache [B, n_kv, S_max(, head_dim)]; new [B, n_kv, S(, head_dim)] —
    rank 3 for scale planes, rank 4 for payload. start_pos scalar or [B]
    (per-row offsets are the continuous-batching engine's slot positions).
    """
    start_pos = jnp.asarray(start_pos, jnp.int32)
    zero = jnp.zeros((), jnp.int32)
    tail = (zero,) * (cache.ndim - 3)
    if start_pos.ndim == 0:
        return jax.lax.dynamic_update_slice(
            cache, new, (zero, zero, start_pos) + tail)

    def one(row_cache, row_new, pos):
        return jax.lax.dynamic_update_slice(row_cache, row_new, (zero, pos) + tail)

    return jax.vmap(one)(cache, new, start_pos)


def update_layer_cache(
    cache_k: jax.Array,
    cache_v: jax.Array,
    k: jax.Array,
    v: jax.Array,
    start_pos: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Write new K/V at [.., start_pos:start_pos+S, ..] for one layer.

    cache_k/v: [B, n_kv, S_max, head_dim]; k/v arrive model-natural as
    [B, S, n_kv, head_dim] and are transposed head-major here. The analog of
    the reference's clone-kernel cache write (cache.h:133-151), but in-place
    via donation instead of a copy kernel. `start_pos` may be per-row [B].
    """
    k = jnp.swapaxes(k, 1, 2).astype(cache_k.dtype)
    v = jnp.swapaxes(v, 1, 2).astype(cache_v.dtype)
    return _write_rows(cache_k, k, start_pos), _write_rows(cache_v, v, start_pos)


@jax.tree_util.register_dataclass
@dataclass
class QuantizedKVCache:
    """INT8 KV cache: payload + per-(position, head) scales.

    Quantization is symmetric per (batch, position, kv-head): one f32 scale
    per stored vector. Beyond the reference (which stores bf16 KV only) —
    halves decode HBM traffic, the dominant cost at long context.
    """

    k: jax.Array        # int8 [L, B, n_kv, S_max, head_dim]
    v: jax.Array        # int8
    k_scale: jax.Array  # f32  [L, B, n_kv, S_max] — flat, NO trailing
    v_scale: jax.Array  # f32    singleton (a size-1 lane dim is 128×-padded
                        #        by XLA's (8,128) tiling: 1 MB → 128 MB at 8B,
                        #        plus per-step layout-conversion copies)

    @classmethod
    def create(
        cls,
        config: ModelConfig,
        batch_size: int,
        max_seq_len: Optional[int] = None,
        dtype: jnp.dtype = jnp.int8,  # signature parity with KVCache.create
    ) -> "QuantizedKVCache":
        s = max_seq_len or config.max_seq_len
        shape = (config.num_layers, batch_size, config.num_kv_heads, s, config.head_dim)
        sshape = shape[:-1]
        return cls(
            k=jnp.zeros(shape, jnp.int8),
            v=jnp.zeros(shape, jnp.int8),
            k_scale=jnp.zeros(sshape, jnp.float32),
            v_scale=jnp.zeros(sshape, jnp.float32),
        )

    @property
    def max_seq_len(self) -> int:
        return self.k.shape[3]

    @property
    def batch_size(self) -> int:
        return self.k.shape[1]


def quantize_kv(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Symmetric int8 quantization over the head_dim axis.

    x: [..., S, head_dim] → (int8 payload, f32 scales [..., S]).
    """
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = absmax / 127.0
    inv = jnp.where(scale == 0.0, 0.0, 1.0 / scale)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) * inv), -127, 127).astype(jnp.int8)
    return q, scale[..., 0]


def dequantize_kv(q: jax.Array, scale: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    """q int8 [..., S, head_dim] · scale f32 [..., S] → dtype."""
    return (q.astype(jnp.float32) * scale[..., None]).astype(dtype)


def update_layer_cache_quantized(
    cache_k: jax.Array,
    cache_v: jax.Array,
    k_scale: jax.Array,
    v_scale: jax.Array,
    k: jax.Array,
    v: jax.Array,
    start_pos: jax.Array,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Quantize new K/V (arriving [B, S, n_kv, hd]) and write head-major
    payload + scales at start_pos (scalar or per-row [B])."""
    qk, sk = quantize_kv(jnp.swapaxes(k, 1, 2))
    qv, sv = quantize_kv(jnp.swapaxes(v, 1, 2))
    return (
        _write_rows(cache_k, qk, start_pos),
        _write_rows(cache_v, qv, start_pos),
        _write_rows(k_scale, sk, start_pos),
        _write_rows(v_scale, sv, start_pos),
    )


def _write_rows_stacked(
    cache: jax.Array,      # [L, B, n_kv, S_max(, head_dim)]
    new: jax.Array,        # [B, n_kv, S(, head_dim)]
    layer: jax.Array,      # scalar int32
    start_pos: jax.Array,  # scalar or [B]
) -> jax.Array:
    """Write one layer's rows into the STACKED cache (decode fast path:
    the cache is a loop carry, updated in place under donation, so the
    per-layer slice never exists as a separate buffer)."""
    layer = jnp.asarray(layer, jnp.int32)
    start_pos = jnp.asarray(start_pos, jnp.int32)
    zero = jnp.zeros((), jnp.int32)
    tail = (zero,) * (cache.ndim - 4)
    if start_pos.ndim == 0:
        return jax.lax.dynamic_update_slice(
            cache, new[None], (layer, zero, zero, start_pos) + tail)

    # Per-row positions: B chained single-row DUS ops, NOT a vmapped DUS.
    # A vmap over the batch axis makes XLA's layout assignment prefer a
    # B-outermost cache layout for the batched-DUS fusion while the Pallas
    # attention kernels need the default layout — inserting TWO full-cache
    # layout-conversion copies per layer iteration (measured: the dense
    # serve burst ran ~3x slower per dispatch than paged, SERVE_r03 "open";
    # ~550 MB of copy traffic per 8B layer step). B is static, so the
    # unrolled writes stay in place under donation like the scalar path.
    out = cache
    for b in range(new.shape[0]):
        bi = jnp.asarray(b, jnp.int32)
        out = jax.lax.dynamic_update_slice(
            out, new[b][None, None], (layer, bi, zero, start_pos[b]) + tail)
    return out


def update_stacked_layer_cache(cache_k, cache_v, k, v, layer, start_pos):
    """Stacked-cache analog of `update_layer_cache`: k/v arrive
    [B, S, n_kv, hd] and are written head-major at [layer, :, :, start_pos]."""
    k = jnp.swapaxes(k, 1, 2).astype(cache_k.dtype)
    v = jnp.swapaxes(v, 1, 2).astype(cache_v.dtype)
    return (_write_rows_stacked(cache_k, k, layer, start_pos),
            _write_rows_stacked(cache_v, v, layer, start_pos))


def update_stacked_layer_cache_quantized(
    cache_k, cache_v, k_scale, v_scale, k, v, layer, start_pos
):
    """Quantize new K/V and write payload + scales into the stacked cache."""
    qk, sk = quantize_kv(jnp.swapaxes(k, 1, 2))
    qv, sv = quantize_kv(jnp.swapaxes(v, 1, 2))
    return (
        _write_rows_stacked(cache_k, qk, layer, start_pos),
        _write_rows_stacked(cache_v, qv, layer, start_pos),
        _write_rows_stacked(k_scale, sk, layer, start_pos),
        _write_rows_stacked(v_scale, sv, layer, start_pos),
    )


def update_stacked_paged_cache(
    k_pages, v_pages, k_scale, v_scale,   # [L, nkv, P+1, ps, hd] / [L, P+1, nkv, ps]
    k, v,                 # [B, 1, n_kv, hd] new rows (model-natural layout)
    layer,                # scalar int32
    page, offset,         # int32 [B] — physical page / in-page offset per row
):
    """Decode-path paged cache write: quantize one new K/V row per batch row
    and write it into layer `layer` of the STACKED page pool with chained
    per-row dynamic_update_slices (B is static — same no-vmap discipline as
    `_write_rows_stacked`; a batched scatter earns a layout flip).

    Rows whose page is the sentinel write into the reserved garbage page
    (PagedKVCache.create allocates P+1 physical pages), mirroring the scan
    path's mode="drop" scatter semantics."""
    qk, sk = quantize_kv(jnp.swapaxes(k, 1, 2))   # [B, nkv, 1, hd] / [B, nkv, 1]
    qv, sv = quantize_kv(jnp.swapaxes(v, 1, 2))
    layer = jnp.asarray(layer, jnp.int32)
    zero = jnp.zeros((), jnp.int32)
    nkv, hd = qk.shape[1], qk.shape[3]
    for b in range(k.shape[0]):
        pg, off = page[b], offset[b]
        k_pages = jax.lax.dynamic_update_slice(
            k_pages, qk[b].reshape(1, nkv, 1, 1, hd),
            (layer, zero, pg, off, zero))
        v_pages = jax.lax.dynamic_update_slice(
            v_pages, qv[b].reshape(1, nkv, 1, 1, hd),
            (layer, zero, pg, off, zero))
        k_scale = jax.lax.dynamic_update_slice(
            k_scale, sk[b].reshape(1, 1, -1, 1), (layer, pg, zero, off))
        v_scale = jax.lax.dynamic_update_slice(
            v_scale, sv[b].reshape(1, 1, -1, 1), (layer, pg, zero, off))
    return k_pages, v_pages, k_scale, v_scale


def roll_kv_cache(cache, num_sink: int, shift: int):
    """Attention-sinks eviction: keep slots [0, num_sink), roll the rest left
    by `shift`, clearing the tail for reuse.

    The reference's sink_cache does this with a per-overflow `roll` kernel
    (cache.h:186-204); here it is one jitted concatenate per eviction event,
    and evictions are **bulk** (shift ≫ 1) so the O(S) data movement is
    amortized over `shift` generated tokens instead of paid per token.
    Evicted keys keep their original rope phases (the StreamingLLM-style
    degraded-fidelity trade the reference makes too, SURVEY.md §5).
    """
    import functools as _functools

    @_functools.partial(jax.jit, static_argnames=("sink", "n"))
    def _roll(arr, sink: int, n: int):
        head = arr[:, :, :, :sink]
        body = arr[:, :, :, sink + n :]
        tail = jnp.zeros_like(arr[:, :, :, : n])
        return jnp.concatenate([head, body, tail], axis=3)

    if isinstance(cache, QuantizedKVCache):
        return QuantizedKVCache(
            k=_roll(cache.k, sink=num_sink, n=shift),
            v=_roll(cache.v, sink=num_sink, n=shift),
            k_scale=_roll(cache.k_scale, sink=num_sink, n=shift),
            v_scale=_roll(cache.v_scale, sink=num_sink, n=shift),
        )
    return KVCache(
        k=_roll(cache.k, sink=num_sink, n=shift),
        v=_roll(cache.v, sink=num_sink, n=shift),
    )


# ---------------------------------------------------------------- paged KV

@jax.tree_util.register_dataclass
@dataclass
class PagedKVCache:
    """INT8 paged KV pages + page table (leaves stacked over layers)."""

    k_pages: jax.Array    # int8 [L, n_kv, num_pages, page_size, hd]
    v_pages: jax.Array
    k_scale: jax.Array    # f32  [L, num_pages, n_kv, page_size] — page-major
    v_scale: jax.Array    #      and flat (no trailing singleton: lane padding;
                          #      page-major so a Mosaic block (1, n_kv, psize)
                          #      has valid last-two dims)
    page_table: jax.Array  # int32 [B, max_pages_per_seq]
    lengths: jax.Array     # int32 [B] — logical sequence lengths

    @classmethod
    def create(
        cls,
        config: ModelConfig,
        *,
        num_pages: int,
        page_size: int = 256,
        max_slots: int = 8,
        max_pages_per_seq: Optional[int] = None,
    ) -> "PagedKVCache":
        # Ceil: a page table must COVER max_seq_len even when it isn't a
        # page_size multiple (matches engine/serving.py's sizing — a floor
        # here silently under-covers e.g. max_seq_len=384 at page_size=256).
        mps = max_pages_per_seq or -(-config.max_seq_len // page_size)
        # One RESERVED garbage page at index `num_pages` (the engine's
        # sentinel value): writes routed to an unallocated page-table slot
        # land there harmlessly instead of clamping onto a live page, and
        # clamped sentinel READS pull masked garbage instead of a real
        # sequence's KV. The allocator only ever hands out [0, num_pages).
        shape = (config.num_layers, config.num_kv_heads, num_pages + 1,
                 page_size, config.head_dim)
        sshape = (config.num_layers, num_pages + 1, config.num_kv_heads,
                  page_size)
        return cls(
            k_pages=jnp.zeros(shape, jnp.int8),
            v_pages=jnp.zeros(shape, jnp.int8),
            k_scale=jnp.zeros(sshape, jnp.float32),
            v_scale=jnp.zeros(sshape, jnp.float32),
            page_table=jnp.zeros((max_slots, mps), jnp.int32),
            lengths=jnp.zeros((max_slots,), jnp.int32),
        )

    @property
    def page_size(self) -> int:
        return self.k_pages.shape[3]

    @property
    def num_pages(self) -> int:
        return self.k_pages.shape[2]

    @property
    def max_slots(self) -> int:
        return self.page_table.shape[0]

    @property
    def max_pages_per_seq(self) -> int:
        return self.page_table.shape[1]

    def replace(self, **kw) -> "PagedKVCache":
        return dataclasses.replace(self, **kw)


def write_paged_layer(
    k_pages: jax.Array,   # [n_kv, P, psize, hd] int8
    v_pages: jax.Array,
    k_scale: jax.Array,   # [P, n_kv, psize] f32
    v_scale: jax.Array,
    k_new: jax.Array,     # [B, S, n_kv, hd] (bf16/f32 — quantized here)
    v_new: jax.Array,
    pages: jax.Array,     # int32 [B, S] physical page per new position
    offsets: jax.Array,   # int32 [B, S] offset within the page
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Quantize + scatter new K/V into their pages (one layer)."""
    qk, sk = quantize_kv(k_new)   # [B, S, n_kv, hd], [B, S, n_kv]
    qv, sv = quantize_kv(v_new)
    b, s = pages.shape
    flat_pages = pages.reshape(-1)
    flat_offs = offsets.reshape(-1)
    # Values indexed [n_kv, B*S, ...] to align with (axis1, axis2) indexers.
    def put(pages_arr, vals):
        vals = jnp.swapaxes(vals.reshape(b * s, vals.shape[2], vals.shape[3]), 0, 1)
        return pages_arr.at[:, flat_pages, flat_offs].set(
            vals.astype(pages_arr.dtype), mode="drop"
        )

    def put_scale(scale_arr, vals):  # scale_arr [P, n_kv, psize], vals [B,S,n_kv]
        # Advanced indices on dims 0 and 2 with a slice between: numpy rules
        # move the indexed axes first → value shape [B*S, n_kv].
        return scale_arr.at[flat_pages, :, flat_offs].set(
            vals.reshape(b * s, -1).astype(scale_arr.dtype), mode="drop"
        )

    return (
        put(k_pages, qk), put(v_pages, qv),
        put_scale(k_scale, sk), put_scale(v_scale, sv),
    )


def gather_pages_dense(
    pages: jax.Array,       # [n_kv, P, psize, X]
    page_table: jax.Array,  # [B, max_pages]
) -> jax.Array:
    """Dense gather of each sequence's pages → [B, n_kv, max_pages*psize, X]
    (the XLA/test fallback path; the Pallas kernel never materializes this).

    Sentinel (out-of-range) page-table entries are clamped — NOT filled with
    NaN (jnp.take's default), which would poison masked attention through
    0·NaN — the garbage rows are masked by length instead."""
    gathered = jnp.take(pages, page_table, axis=1, mode="clip")  # [n_kv, B, mp, psize, X]
    n_kv, b, mp, psize, x = gathered.shape
    return jnp.transpose(gathered, (1, 0, 2, 3, 4)).reshape(b, n_kv, mp * psize, x)


def gather_page_scales(
    scales: jax.Array,      # [P, n_kv, psize]
    page_table: jax.Array,  # [B, max_pages]
) -> jax.Array:
    """Dense gather of per-page KV scales → [B, n_kv, max_pages*psize]
    (XLA/test fallback matching `gather_pages_dense`; clamped like it)."""
    g = jnp.take(scales, page_table, axis=0, mode="clip")  # [B, mp, n_kv, psize]
    b, mp, n_kv, psize = g.shape
    return jnp.transpose(g, (0, 2, 1, 3)).reshape(b, n_kv, mp * psize)


def positions_to_pages(
    page_table: jax.Array,  # [B, max_pages]
    positions: jax.Array,   # [B, S] logical positions
    page_size: int,
) -> Tuple[jax.Array, jax.Array]:
    """(physical page, in-page offset) for logical positions."""
    idx = positions // page_size
    pages = jnp.take_along_axis(page_table, idx, axis=1)
    return pages, positions % page_size
