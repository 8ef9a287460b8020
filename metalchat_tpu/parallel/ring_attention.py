"""Ring attention — context parallelism with compute/communication overlap.

Long-context attention with the KV cache sharded over a sequence axis: each
chip holds a KV shard, computes partial attention for its queries, and
rotates its shard to the next chip with `jax.lax.ppermute` while computing —
after N-1 rotations every query has seen every KV block, at point-to-point
ICI cost fully overlappable with the matmuls. The online-softmax statistics
(m, l) make the tiled accumulation exact.

The reference has no sequence parallelism of any kind (SURVEY.md §5
long-context: its only tools are sink-cache eviction and sliding windows);
this is the from-scratch TPU-native capability for contexts that exceed one
chip's HBM.

Usage (inside shard_map over a mesh with a sequence axis, e.g. "sp"):

    out = shard_map(
        lambda q, k, v: ring_attention(q, k, v, axis_name="sp", scale=s),
        mesh=mesh,
        in_specs=(P(None, "sp", None, None),   # q   [B, S, nh, hd] seq-sharded
                  P(None, None, "sp", None),   # k   [B, nkv, S, hd]
                  P(None, None, "sp", None)),  # v
        out_specs=P(None, "sp", None, None),
    )(q, k, v)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _block_attention(q, k, v, q_pos, kv_pos, scale):
    """Partial attention of q against one KV block → (acc, m, l) statistics.

    q [B, S, nh, hd]; k/v [B, nkv, T, hd]; positions are global ids.
    Returns f32 acc [B, S, nh, hd], m/l [B, S, nh, 1].
    """
    b, s, nh, hd = q.shape
    nkv = k.shape[1]
    groups = nh // nkv
    qg = q.reshape(b, s, nkv, groups, hd)
    scores = jnp.einsum(
        "bskgd,bktd->bkgst", qg, k, preferred_element_type=jnp.float32
    ) * scale
    mask = kv_pos[None, None, None, None, :] <= q_pos[None, None, None, :, None]
    scores = jnp.where(mask, scores, MASK_VALUE)

    m = jnp.max(scores, axis=-1, keepdims=True)                  # [b,kv,g,s,1]
    p = jnp.exp(scores - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    acc = jnp.einsum(
        "bkgst,bktd->bkgsd", p, v.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    # reshape stats to [b, s, nh, ...]
    acc = jnp.transpose(acc, (0, 3, 1, 2, 4)).reshape(b, s, nh, hd)
    m = jnp.transpose(m, (0, 3, 1, 2, 4)).reshape(b, s, nh, 1)
    l = jnp.transpose(l, (0, 3, 1, 2, 4)).reshape(b, s, nh, 1)
    return acc, m, l


def ring_attention(
    q: jax.Array,        # [B, S_local, nh, hd] — this shard's queries
    k: jax.Array,        # [B, nkv, T_local, hd] — this shard's KV block
    v: jax.Array,
    axis_name: str,
    *,
    scale: float,
    causal: bool = True,
) -> jax.Array:
    """Exact attention over sequence-sharded KV via ring rotation."""
    n = jax.lax.psum(1, axis_name)
    my_idx = jax.lax.axis_index(axis_name)
    b, s_loc, nh, hd = q.shape
    t_loc = k.shape[2]

    q_pos = my_idx * s_loc + jnp.arange(s_loc, dtype=jnp.int32)
    if not causal:
        q_pos = jnp.full((s_loc,), jnp.iinfo(jnp.int32).max, jnp.int32)

    perm = [(i, (i + 1) % n) for i in range(n)]

    def step(carry, block_idx):
        acc, m, l, k_blk, v_blk = carry
        src = (my_idx - block_idx) % n          # origin shard of current block
        kv_pos = src * t_loc + jnp.arange(t_loc, dtype=jnp.int32)

        blk_acc, blk_m, blk_l = _block_attention(q, k_blk, v_blk, q_pos, kv_pos, scale)

        m_next = jnp.maximum(m, blk_m)
        alpha = jnp.exp(m - m_next)
        beta = jnp.exp(blk_m - m_next)
        acc = acc * alpha + blk_acc * beta
        l = l * alpha + blk_l * beta

        # Rotate the KV block to the next chip (overlaps with next compute).
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        return (acc, m_next, l, k_blk, v_blk), None

    init = (
        jnp.zeros((b, s_loc, nh, hd), jnp.float32),
        jnp.full((b, s_loc, nh, 1), -jnp.inf, jnp.float32),
        jnp.zeros((b, s_loc, nh, 1), jnp.float32),
        k,
        v,
    )
    (acc, m, l, _, _), _ = jax.lax.scan(
        step, init, jnp.arange(n, dtype=jnp.int32)
    )
    l = jnp.where(l == 0.0, 1.0, l)
    return (acc / l).astype(q.dtype)


def context_parallel_attention(
    q: jax.Array,  # [B, S, nh, hd] (sharded over axis via shard_map caller)
    k: jax.Array,
    v: jax.Array,
    mesh,
    axis_name: str = "sp",
    *,
    scale: float,
    causal: bool = True,
):
    """Convenience shard_map wrapper for a mesh with a sequence axis."""
    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    return shard_map(
        lambda qq, kk, vv: ring_attention(qq, kk, vv, axis_name, scale=scale,
                                          causal=causal),
        mesh=mesh,
        in_specs=(P(None, axis_name, None, None),
                  P(None, None, axis_name, None),
                  P(None, None, axis_name, None)),
        out_specs=P(None, axis_name, None, None),
        check_rep=False,
    )(q, k, v)
