"""Tensor-parallel Pallas fast decode: shard_map around models.decode.

The single-chip decode headline runs through hand-written stacked Pallas
kernels (`models/decode.py`); GSPMD cannot partition those custom calls, so
the tensor-parallel execution of the SAME kernels is expressed manually with
`shard_map` (the scaling-book recipe, made explicit):

  * column-parallel wq/wk/wv/w1/w3 read the replicated hidden state and
    produce local head / FFN shards — no communication;
  * attention is communication-free: the KV cache is sharded over kv-heads
    and GQA query groups are co-located with their kv head (contiguous
    head-chunk sharding aligns q chunks with kv chunks whenever
    num_kv_heads % tp == 0, since nh/tp is then a multiple of the group
    size nh/nkv);
  * row-parallel wo/w2 produce partial sums joined by one psum of the
    [B, H] hidden row per matvec — 2 tiny ICI collectives per layer;
  * the embedding is vocab-sharded (masked local gather + psum); the
    lm_head is vocab-sharded with the logits returned sharded on the vocab
    axis (the outer jit / sampler consumes them under GSPMD).

Numerics note: activation quantization (W8A8/W4A8) for the ROW-parallel
matvecs runs per shard — each device scales its own slice of the
contraction. That is a deliberately finer-grained scheme than single-chip
per-token scaling (never coarser, measured equal-or-lower quant error);
column-parallel matvecs see the full replicated row and are bit-identical
to single-chip. Dense (bf16/f32) models are exact up to float summation
order in the psum.

Reference analog: none — the reference is single-device (SURVEY.md §2.9);
this satisfies BASELINE config 3 (8B tensor-sharded v5e-8) with the same
kernel code path that produced the single-chip headline.
"""

from __future__ import annotations

from dataclasses import replace
from functools import partial
from typing import Any, Dict, Optional

import jax
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from metalchat_tpu.cache import KVCache, PagedKVCache, QuantizedKVCache
from metalchat_tpu.config import ModelConfig
from metalchat_tpu.parallel.mesh import (
    cache_partition_specs,
    param_partition_specs,
)
from metalchat_tpu.quant.quantize import QuantizedTensor


def supports_tp_fast_decode(params: Dict[str, Any], config: ModelConfig,
                            mesh: Mesh) -> bool:
    """Whether the shard_map fast-decode path can run this model/mesh.

    Requires: heads, kv-heads and FFN width divisible by tp (kv-head
    co-location is what keeps attention communication-free) and no biases
    (they must be added once, after the psum). Both dense-stacked and
    paged caches ride the path (the step is built with the matching
    `paged=` flag), and MoE models qualify on tp-only meshes (experts'
    FFN width sharded over tp; see `moe_ok` below). Fused wqkv/w13 leaves qualify when
    `shard_params` tp-block-permuted them (QuantizedTensor.fuse_tp == tp —
    each contiguous tp chunk is then a self-contained local fusion);
    unpermuted fused leaves would hand each shard a chunk mixing whole-q
    with whole-k rows and are rejected."""
    tp = mesh.shape.get("tp", 1)
    layers = params.get("layers", {})

    def quant_ok(leaf) -> bool:
        # Row-parallel GROUPED quantized leaves can't ride this path: the
        # group structure (and int4 packing) runs along the sharded
        # contraction axis with shard-local semantics only guaranteed for
        # per-channel scales (+ pack_chunks repack, shard_params).
        from metalchat_tpu.quant.quantize import LoraLinear

        if isinstance(leaf, LoraLinear):
            return quant_ok(leaf.base)
        if isinstance(leaf, QuantizedTensor):
            return leaf.act_bits == 8 and leaf.group_size == leaf.in_features
        return True

    def fused_ok(name: str) -> bool:
        leaf = layers.get(name)
        if leaf is None:
            return True
        return isinstance(leaf, QuantizedTensor) and leaf.fuse_tp == tp

    def moe_ok() -> bool:
        # MoE rides the shard_map path with every expert's FFN width
        # sharded over tp (column-parallel w1/w3, row-parallel w2 — the
        # existing post-FFN psum covers the expert sum too; the router is
        # replicated so all shards route identically). Expert-parallel
        # (ep) meshes keep the GSPMD path: the fast path holds all
        # experts' tp-shards per device.
        if not config.num_experts:
            return True
        from metalchat_tpu.models.decode import _moe_ok

        return _moe_ok(params, config) and mesh.shape.get("ep", 1) == 1

    return (
        tp > 1
        and config.num_heads % tp == 0
        and config.num_kv_heads % tp == 0
        and config.intermediate_size % tp == 0
        and config.vocab_size % tp == 0
        and not config.use_bias
        and moe_ok()
        and fused_ok("wqkv")
        and fused_ok("w13")
        and all(quant_ok(leaf) for leaf in layers.values())
    )


def _local_config(config: ModelConfig, tp: int) -> ModelConfig:
    return replace(
        config,
        num_heads=config.num_heads // tp,
        num_kv_heads=config.num_kv_heads // tp,
        intermediate_size=config.intermediate_size // tp,
    )


def _localize_quant_metadata(tree: Any) -> Any:
    """Fix static `group_size` on row-sharded per-channel leaves.

    Inside shard_map a row-parallel QuantizedTensor's q array is the LOCAL
    shard (in/tp) while group_size still says the full in_features; the
    per-channel layout is identifiable by its [.., 1, out] scales, and
    per-channel semantics are restored by group_size = local in_features
    (scales don't vary along the contraction, so per-shard partial dots +
    one psum are exact)."""

    def fix(leaf):
        if not isinstance(leaf, QuantizedTensor):
            return leaf
        if leaf.scales.shape[-2] == 1 and leaf.group_size != leaf.in_features:
            leaf = replace(leaf, group_size=leaf.in_features)
        if leaf.pack_chunks != 1:
            # The local byte shard of a chunk-packed tensor IS one standard
            # half-split packing of its own logical in-range.
            leaf = replace(leaf, pack_chunks=1)
        if leaf.fuse_tp != 1:
            # The local chunk of a tp-block-permuted fused leaf IS one
            # standard [q_i|k_i|v_i] fused layout for the LOCAL config.
            leaf = replace(leaf, fuse_tp=1)
        return leaf

    return jax.tree.map(fix, tree,
                        is_leaf=lambda x: isinstance(x, QuantizedTensor))


def _paged_tp_cache_specs(axis: str) -> PagedKVCache:
    """shard_map PartitionSpecs for a PagedKVCache under tensor parallelism.

    The page POOLS shard over kv-heads on tp (pages [L, nkv, P, ps, hd] —
    the kv-head axis splits cleanly and GQA co-location already holds);
    page tables / lengths / token rows stay REPLICATED, including over any
    dp axis. Rows are deliberately NOT dp-sharded here: the pool has no
    batch axis, so dp-sharding rows would let each dp replica's pool
    diverge on the other replicas' page writes — replicating the (tiny)
    per-row matvec work keeps every replica's pool bit-identical and
    composable with the GSPMD prefill path, at the cost of each device
    reading all B rows' pages (KV reads are small next to the tp-sharded
    weight stream that bounds decode)."""
    return PagedKVCache(
        k_pages=P(None, axis, None, None, None),   # [L, nkv, P, ps, hd]
        v_pages=P(None, axis, None, None, None),
        k_scale=P(None, None, axis, None),         # [L, P, nkv, ps]
        v_scale=P(None, None, axis, None),
        page_table=P(None, None),
        lengths=P(None),
    )


def make_tp_decode_step(
    params: Dict[str, Any],
    config: ModelConfig,
    mesh: Mesh,
    *,
    cache_quantized: bool = True,
    axis: str = "tp",
    paged: bool = False,
):
    """Build `step(params, cache, tokens, start_pos) -> (logits, cache)`
    running the stacked-Pallas decode under shard_map on `mesh`.

    `params` must be the SHARDED tree (from `shard_params` — whose int4
    repack changes QuantizedTensor pack_chunks metadata, and in_specs must
    match that treedef); it is only inspected for structure/leaf kinds.
    tokens/start_pos are sharded over dp when the mesh has a dp axis; logits
    return vocab-sharded on tp (global shape [B, s, V]).

    paged=True takes a PagedKVCache instead of a dense stacked cache and
    runs `paged_decode_attention_stacked` + per-row page writes inside the
    same shard_map body (see `_paged_tp_cache_specs` for the row-replication
    trade)."""
    if not supports_tp_fast_decode(params, config, mesh):
        raise ValueError("model/mesh combination not eligible for tp fast "
                         "decode (see supports_tp_fast_decode)")
    tp = mesh.shape[axis]
    dp = "dp" if "dp" in mesh.shape else None
    local_cfg = _local_config(config, tp)

    pspecs = param_partition_specs(params, config, mesh)
    if paged:
        cspecs = _paged_tp_cache_specs(axis)
        tok_spec = P(None, None)   # rows replicated — see _paged_tp_cache_specs
        pos_spec = P(None)
        out_spec = (P(None, None, axis), cspecs)
    else:
        cspecs = cache_partition_specs(mesh, cache_quantized,
                                       config.num_kv_heads)
        tok_spec = P(dp, None)
        pos_spec = P(dp)
        out_spec = (P(dp, None, axis), cspecs)

    def body(params, cache, tokens, start_pos):
        from metalchat_tpu.models.decode import decode_step

        params = _localize_quant_metadata(params)
        return decode_step(params, cache, tokens, start_pos, local_cfg,
                           tp_axis=axis)

    step = shard_map(
        body, mesh=mesh,
        in_specs=(pspecs, cspecs, tok_spec, pos_spec),
        out_specs=out_spec,
        check_rep=False,
    )
    return step


def tp_decode_forward_fn(
    params: Dict[str, Any],
    config: ModelConfig,
    mesh: Mesh,
    *,
    cache_quantized: bool = True,
    axis: str = "tp",
    paged: bool = False,
):
    """Engine `forward_fn`: tp-Pallas fast decode for single-token steps,
    GSPMD `forward` (XLA path) for prefill and anything else.

    This is how the SPMD serving engine gets the Pallas decode path under
    tensor parallelism: the burst/decode programs route through shard_map
    while prefill keeps the GSPMD path (jnp ops XLA partitions fine). For
    paged caches (paged=True) prefill additionally pins allow_pallas=False —
    the paged scatter/gather XLA formulation is what GSPMD can partition."""
    from metalchat_tpu.models.transformer import forward

    tp_step = make_tp_decode_step(params, config, mesh,
                                  cache_quantized=cache_quantized, axis=axis,
                                  paged=paged)

    def fwd(p, cache, tokens, start_pos):
        if paged:
            if tokens.shape[1] == 1 and isinstance(cache, PagedKVCache):
                return tp_step(p, cache, tokens, start_pos)
            return forward(p, cache, tokens, start_pos, config,
                           fast_decode=False, allow_pallas=False)
        if (tokens.shape[1] == 1
                and isinstance(cache, (KVCache, QuantizedKVCache))):
            return tp_step(p, cache, tokens, start_pos)
        return forward(p, cache, tokens, start_pos, config, fast_decode=False)

    return fwd
