"""Device mesh + sharding rules (tensor / data parallel).

Design per the scaling-book recipe: pick a mesh, annotate shardings on the
params/cache pytrees, let XLA's SPMD partitioner insert and overlap the
collectives (all-gather for column-parallel outputs consumed row-parallel,
reduce-scatter/psum after row-parallel matmuls). Axes:

  * ``dp`` — data parallel over the batch (requests are independent).
  * ``tp`` — tensor parallel: attention heads and FFN width sharded; the KV
    cache is sharded over kv-heads so decode attention is communication-free
    (GQA co-location), and only the o-proj/FFN reductions touch ICI.

On a multi-host pod slice `jax.distributed.initialize` + the same code give
DCN+ICI meshes (`make_mesh(allow_multihost=True)` uses all global devices).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from metalchat_tpu.cache import KVCache, QuantizedKVCache
from metalchat_tpu.config import ModelConfig


def make_mesh(
    tp: Optional[int] = None,
    dp: int = 1,
    ep: int = 1,
    devices=None,
) -> Mesh:
    """Build a ("dp", "ep", "tp") mesh (ep omitted when 1).

    Defaults: tp = all devices / (dp·ep). The expert axis shards MoE expert
    weights; dense weights treat ep like extra dp (replicated)."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if tp is None:
        tp = n // (dp * ep)
    if dp * ep * tp != n:
        raise ValueError(f"dp*ep*tp = {dp}*{ep}*{tp} != {n} devices")
    if ep > 1:
        return Mesh(np.asarray(devices).reshape(dp, ep, tp),
                    axis_names=("dp", "ep", "tp"))
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def _check_divisibility(config: ModelConfig, tp: int) -> None:
    for name, value in (
        ("num_heads", config.num_heads),
        ("intermediate_size", config.intermediate_size),
    ):
        if value % tp:
            raise ValueError(f"{name}={value} not divisible by tp={tp}")


def _check_ep(config: ModelConfig, ep: int) -> None:
    if not config.num_experts:
        raise ValueError("mesh has an ep axis but the model has no experts")
    if config.num_experts % ep:
        raise ValueError(
            f"num_experts={config.num_experts} not divisible by ep={ep}")


def param_shardings(config: ModelConfig, mesh: Mesh) -> Dict[str, Any]:
    """PartitionSpec tree matching models.transformer param layout.

    Column-parallel: wq/wk/wv (out-features = heads·hd on ``tp``), w1/w3.
    Row-parallel: wo, w2 (in-features on ``tp`` → psum of partial outputs).
    Embedding/lm_head sharded on the vocab axis; norms replicated.
    """
    tp = mesh.shape["tp"]
    ep_axis = "ep" if "ep" in mesh.shape and mesh.shape["ep"] > 1 else None
    if tp > 1:
        _check_divisibility(config, tp)
    if ep_axis:
        _check_ep(config, mesh.shape["ep"])
    # GQA co-location: shard KV projections/cache over kv-heads when they
    # divide tp; otherwise replicate KV and shard only Q heads (the standard
    # trade when kv_heads < chips — attention stays communication-free).
    kv_spec = P(None, None, "tp") if config.num_kv_heads % tp == 0 else P(None, None, None)
    # Vocab sharding needs divisibility; odd vocabs replicate (the embedding
    # is read-mostly and the lm_head matmul still shards on its input).
    vocab_axis = "tp" if config.vocab_size % tp == 0 else None
    specs = {
        "embed": P(vocab_axis, None),     # [V, H] — vocab sharded
        "final_norm": P(None),
        "lm_head": P(None, vocab_axis),   # [H, V] — vocab-parallel logits
        "layers": {
            "attn_norm": P(None, None),
            "ffn_norm": P(None, None),
            "wq": P(None, None, "tp"),
            "wqkv": P(None, None, "tp"),
            "w13": P(None, None, "tp"),
            "wk": kv_spec,
            "wv": kv_spec,
            "wo": P(None, "tp", None),
            "w1": P(None, None, "tp"),
            "w3": P(None, None, "tp"),
            "w2": P(None, "tp", None),
        },
        "rope": {"cos": P(None, None), "sin": P(None, None)},
    }
    if config.num_experts:
        # Expert FFN [L, E, H, F]/[L, E, F, H]: experts over ep, FFN width
        # over tp (composable); router replicated.
        specs["layers"]["router"] = P(None, None, None)
        specs["layers"]["w1"] = P(None, ep_axis, None, "tp")
        specs["layers"]["w3"] = P(None, ep_axis, None, "tp")
        specs["layers"]["w2"] = P(None, ep_axis, "tp", None)
    # Optional per-config leaves (Gemma).
    for extra in ("q_norm", "k_norm", "post_attn_norm", "post_ffn_norm"):
        specs["layers"][extra] = P(None, None)
    for extra in ("cos_local", "sin_local"):
        specs["rope"][extra] = P(None, None)

    def to_sharding(spec):
        return NamedSharding(mesh, spec)

    return jax.tree.map(to_sharding, specs, is_leaf=lambda x: isinstance(x, P))


def cache_partition_specs(mesh: Mesh, quantized: bool = False,
                          num_kv_heads: Optional[int] = None):
    """KV cache [L, B, n_kv, S, hd] PartitionSpecs: batch on dp, kv-heads on
    tp (replicated over tp when kv-heads don't divide it — matching
    param_shardings)."""
    tp = mesh.shape["tp"]
    dp = "dp" if "dp" in mesh.shape else None
    head_axis = "tp" if (num_kv_heads is None or num_kv_heads % tp == 0) else None
    kv = P(None, dp, head_axis, None, None)
    if quantized:
        sc = P(None, dp, head_axis, None)  # [L,B,nkv,S]
        return QuantizedKVCache(k=kv, v=kv, k_scale=sc, v_scale=sc)
    return KVCache(k=kv, v=kv)


def cache_shardings(mesh: Mesh, quantized: bool = False, num_kv_heads: Optional[int] = None):
    specs = cache_partition_specs(mesh, quantized, num_kv_heads)
    return jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                        is_leaf=lambda x: isinstance(x, P))


def _prune_to(tree: Dict[str, Any], reference: Dict[str, Any], default=None) -> Dict[str, Any]:
    """Prune the spec tree to the params structure; unknown keys (biases,
    model-specific extras) fall back to `default` (replicated)."""
    out = {}
    for key, value in reference.items():
        spec = tree.get(key, default)
        if isinstance(value, dict):
            out[key] = _prune_to(spec if isinstance(spec, dict) else {}, value, default)
        else:
            out[key] = spec
    return out


def param_partition_specs(params: Dict[str, Any], config: ModelConfig,
                          mesh: Mesh) -> Dict[str, Any]:
    """Params-structured tree of raw PartitionSpecs (shard_map in_specs /
    device placement both derive from this).

    QuantizedTensor leaves inherit the dense leaf's LOGICAL ([in, out]) spec,
    remapped onto their physical storage: transposed tensors swap the last
    two spec entries for q, grouped scales follow q's orientation, and
    per-channel scales ([.., 1, out]) shard only the out axis. LoRA adaptors
    are replicated — rank is tiny and replication keeps the adaptor matmuls
    collective-free."""
    from metalchat_tpu.quant.quantize import LoraLinear, QuantizedTensor

    shardings = _prune_to(param_shardings(config, mesh), params,
                          default=NamedSharding(mesh, P()))

    def expand(spec, leaf):
        if isinstance(leaf, LoraLinear):
            return LoraLinear(base=expand(spec, leaf.base), a=P(),
                              b=P(), scale=leaf.scale)
        if isinstance(leaf, QuantizedTensor):
            p = list(spec.spec) if isinstance(spec, NamedSharding) else []
            p += [None] * (leaf.q.ndim - len(p))
            lead, in_s, out_s = p[:-2], p[-2], p[-1]
            q_spec = P(*lead, out_s, in_s) if leaf.transposed else P(*lead, in_s, out_s)
            if leaf.group_size == leaf.in_features:   # scales [.., 1, out]
                s_spec = P(*lead, None, out_s)
            elif leaf.transposed:                     # scales [.., out, in/g]
                s_spec = P(*lead, out_s, in_s)
            else:                                     # scales [.., in/g, out]
                s_spec = P(*lead, in_s, out_s)
            return QuantizedTensor(
                q=q_spec, scales=s_spec,
                bits=leaf.bits, group_size=leaf.group_size,
                transposed=leaf.transposed, act_bits=leaf.act_bits,
                pack_chunks=leaf.pack_chunks, fuse_tp=leaf.fuse_tp,
            )
        return spec.spec if isinstance(spec, NamedSharding) else spec

    def walk(spec, ref):
        if isinstance(ref, dict):
            return {k: walk(spec[k], v) for k, v in ref.items()}
        return expand(spec, ref)

    return walk(shardings, params)


def shard_params(params: Dict[str, Any], config: ModelConfig, mesh: Mesh) -> Dict[str, Any]:
    """Place a parameter tree onto the mesh with TP shardings
    (see `param_partition_specs` for the layout rules).

    int4 act8 leaves whose PACKED axis lands on a sharded mesh axis are
    re-packed to per-chunk half-split first (`repack_int4_chunks`): default
    half-split packing pairs byte j with logical rows (j, j+in/2), so a
    contiguous byte shard of it decodes to non-contiguous logical rows —
    the row-parallel matvec would contract each device's activation slice
    against the wrong weights.

    Fused-projection (wqkv/w13) QuantizedTensor leaves get their out axis
    BLOCK-PERMUTED (`models.fuse.permute_fused_tp`) so each contiguous tp
    chunk holds that shard's [q_i|k_i|v_i] / [gate_i|up_i] segments — the
    layout that makes the shard_map tp fast decode see a standard local
    fused leaf. Matching fused biases are permuted identically. Consumers
    read the blocking from `QuantizedTensor.fuse_tp` (split_fused), so the
    GSPMD paths stay correct on the permuted global array too. Dense
    (unquantized) fused leaves are left as-is: GSPMD never needed the
    permutation and they don't ride the shard_map path."""
    from metalchat_tpu.quant.quantize import QuantizedTensor, repack_int4_chunks

    specs = param_partition_specs(params, config, mesh)
    tp = mesh.shape.get("tp", 1)

    def axis_size(names) -> int:
        if names is None:
            return 1
        if isinstance(names, str):
            names = (names,)
        size = 1
        for n in names:
            size *= mesh.shape[n]
        return size

    def prepare(leaf, spec, name=None):
        from dataclasses import replace

        from metalchat_tpu.models.fuse import fused_segments, permute_fused_tp
        from metalchat_tpu.quant.quantize import LoraLinear

        if isinstance(leaf, LoraLinear):
            return replace(leaf, base=prepare(leaf.base, spec.base))
        if (name in ("wqkv", "w13") and tp > 1
                and isinstance(leaf, QuantizedTensor)):
            segs = fused_segments(name, config)
            if not any(s % tp for s in segs):
                leaf = permute_fused_tp(leaf, segs, tp)
        if (isinstance(leaf, QuantizedTensor) and leaf.bits == 4
                and leaf.act_bits == 8):
            packed_axis = -1 if leaf.transposed else -2
            entries = list(spec.q) if isinstance(spec, QuantizedTensor) else []
            entries += [None] * (leaf.q.ndim - len(entries))
            t = axis_size(entries[packed_axis])
            if t > 1:
                return repack_int4_chunks(leaf, t)
        return leaf

    def permute_bias(layers: Dict[str, Any]) -> Dict[str, Any]:
        """Fused biases follow their (permuted) weight's blocked layout."""
        from metalchat_tpu.models.fuse import _blocked_order, fused_segments

        out = dict(layers)
        for name in ("wqkv", "w13"):
            bias = out.get(name + "_b")
            w = out.get(name)
            if (bias is not None
                    and getattr(w, "fuse_tp", 1) == tp and tp > 1):
                order = _blocked_order(fused_segments(name, config), tp)
                out[name + "_b"] = jnp.take(bias, jnp.asarray(order), axis=-1)
        return out

    def walk(leaf, spec):
        if isinstance(leaf, dict):
            return {k: walk_named(k, v, spec[k]) for k, v in leaf.items()}
        return prepare(leaf, spec)

    def walk_named(name, leaf, spec):
        if isinstance(leaf, dict):
            return walk(leaf, spec)
        return prepare(leaf, spec, name)

    params = walk(params, specs)
    if "layers" in params:
        params = dict(params, layers=permute_bias(params["layers"]))
    # Unflatten the shardings onto the (possibly repacked) params treedef:
    # repacking changed QuantizedTensor pack_chunks METADATA, so the spec
    # tree's own treedef no longer matches, but the leaf order does.
    flat = [NamedSharding(mesh, s) for s in jax.tree.leaves(
        specs, is_leaf=lambda x: isinstance(x, P))]
    shardings = jax.tree.unflatten(jax.tree.structure(params), flat)
    return jax.device_put(params, shardings)


def paged_cache_partition_specs(mesh: Mesh, num_kv_heads: Optional[int] = None):
    """PagedKVCache PartitionSpecs: kv-heads on tp (pages are a global pool,
    replicated over dp — the page TABLES are per-row host state and shard
    with the batch on dp, which is what makes multi-host paged serving
    work: each dp rank only ever indexes its own rows)."""
    from metalchat_tpu.cache import PagedKVCache

    tp = mesh.shape["tp"]
    dp = "dp" if "dp" in mesh.shape else None
    head_axis = "tp" if (num_kv_heads is None or num_kv_heads % tp == 0) else None
    return PagedKVCache(
        k_pages=P(None, head_axis, None, None, None),   # [L, nkv, P, ps, hd]
        v_pages=P(None, head_axis, None, None, None),
        k_scale=P(None, None, head_axis, None),         # [L, P, nkv, ps]
        v_scale=P(None, None, head_axis, None),
        page_table=P(dp, None),
        lengths=P(dp),
    )


def shard_cache(cache, mesh: Mesh):
    from metalchat_tpu.cache import PagedKVCache

    if isinstance(cache, PagedKVCache):
        specs = paged_cache_partition_specs(mesh, cache.k_pages.shape[1])
        shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                                 is_leaf=lambda x: isinstance(x, P))
        return jax.device_put(cache, shardings)
    quantized = isinstance(cache, QuantizedKVCache)
    num_kv = cache.k.shape[2]
    return jax.device_put(cache, cache_shardings(mesh, quantized, num_kv))
