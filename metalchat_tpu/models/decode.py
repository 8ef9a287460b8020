"""Decode fast path: fori_loop over layers with STACKED weights and cache.

`forward`'s `lax.scan` formulation is right for prefill (MXU-bound, XLA
fuses the per-layer weight slices into the dots) but wrong for decode once
Pallas kernels enter: a Pallas operand sliced out of a scan xs is
materialized — a full extra read+write of every weight and KV layer per
step (measured on the 8B W4A8 trace: matmul fusions at ~2x the HBM read
floor plus ~500 us/step of cache-slice copies; benchmarks/profile_decode.py).

This path instead loops a layer index over closure-captured stacked arrays:

  * quantized matvecs → `ops.a8_matvec_pallas.quant_matvec_stacked`
    (scalar-prefetched layer index → the kernel streams the right HBM rows
    directly; transposed row-contiguous tiles; s8×s8→s32 on the MXU),
  * attention → `decode_attention_*_stacked` (same trick for the KV cache),
  * the cache is a loop carry updated with one dynamic_update_slice per
    layer (in place under donation),
  * everything small (norms, biases, rope rows, residuals) stays XLA.

Semantically identical to `forward` at S == 1 (tests/test_decode_path.py);
`forward` routes here automatically. Dense weights, group-quantized weights
and LoRA leaves take fused XLA formulations inside the same loop; MoE
expert FFNs ride the same stacked kernels through a flattened
(layer, expert) index (`_moe_ffn_decode`) — every model family decodes
through this path.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from metalchat_tpu.cache import (
    KVCache,
    PagedKVCache,
    QuantizedKVCache,
    dequantize_kv,
    gather_page_scales,
    gather_pages_dense,
    positions_to_pages,
    update_stacked_layer_cache,
    update_stacked_layer_cache_quantized,
    update_stacked_paged_cache,
)
from metalchat_tpu.config import ModelConfig
from metalchat_tpu.ops import use_pallas, xla as ops
from metalchat_tpu.ops.a8_matvec_pallas import (
    choose_block_out,
    quant_matvec_stacked_fused,
)
from metalchat_tpu.ops.decode_attention_pallas import (
    decode_attention_quantized_stacked,
    decode_attention_stacked,
    decode_attention_update_quantized_stacked,
)
from metalchat_tpu.ops.ffn_block_pallas import (
    ffn_block_shapes_ok,
    ffn_block_stacked,
)
from metalchat_tpu.ops.paged_attention_pallas import (
    paged_decode_attention_stacked,
    paged_decode_attention_update_stacked,
)
from metalchat_tpu.quant.quantize import (
    LoraLinear,
    QuantizedTensor,
    linear,
    lookup_embedding,
    quant_matmul,
)


def _slice_layer(arr: jax.Array, l: jax.Array) -> jax.Array:
    return jax.lax.dynamic_index_in_dim(arr, l, 0, keepdims=False)


def _slice_qt(qt: QuantizedTensor, l: jax.Array) -> QuantizedTensor:
    import dataclasses

    return dataclasses.replace(
        qt, q=_slice_layer(qt.q, l), scales=_slice_layer(qt.scales, l))


def _kernel_ok(qt: QuantizedTensor) -> bool:
    """The Pallas matvec covers act8 per-channel transposed storage.

    Lane alignment: the packed byte axis must be a multiple of 128 — for
    int4 that is in/2 (so in % 256), for int8 just in % 128 (Gemma's 1152-
    wide contractions are 128- but not 256-aligned)."""
    k = qt.q.shape[-1]
    return (
        qt.act_bits == 8
        and qt.pack_chunks == 1
        and qt.transposed
        and qt.group_size == qt.in_features
        and choose_block_out(qt.out_features, k) is not None
        and k % 128 == 0
    )


def _linear_l(x: jax.Array, leaf: Any, l: jax.Array) -> jax.Array:
    """x [B, in] through layer `l` of a stacked linear leaf.

    Dispatch mirrors quant/quantize.py `linear` but never materializes a
    weight slice for the Pallas path; activation quantization and the
    post-scale run inside the kernel (one dispatch per matvec).
    """
    if isinstance(leaf, LoraLinear):
        y = _linear_l(x, leaf.base, l)
        adapt = (x @ _slice_layer(leaf.a, l)) @ _slice_layer(leaf.b, l)
        return y + adapt * jnp.asarray(leaf.scale, y.dtype)
    if isinstance(leaf, QuantizedTensor):
        if leaf.q.ndim == 3 and _kernel_ok(leaf) and use_pallas():
            return quant_matvec_stacked_fused(x, leaf.q, leaf.scales, l,
                                              bits=leaf.bits)
        return quant_matmul(x, _slice_qt(leaf, l))
    return x @ _slice_layer(leaf, l)


def _lm_head(x: jax.Array, leaf: Any) -> jax.Array:
    """Final projection (2-D, unstacked). Routes the act8 schemes through the
    same Pallas kernel via a leading unit layer axis; int4 per-channel
    lm_head otherwise pays the 2x-floor XLA 3-dot (651 vs 321 us/step
    measured)."""
    if (isinstance(leaf, QuantizedTensor) and leaf.q.ndim == 2
            and _kernel_ok(leaf) and use_pallas()):
        return quant_matvec_stacked_fused(x, leaf.q[None], leaf.scales[None],
                                          0, bits=leaf.bits)
    return linear(x, leaf)


def _expert_linear_l(x: jax.Array, leaf: Any, flat_idx: jax.Array) -> jax.Array:
    """x [T, in] through expert `flat_idx` (= l·E + e) of a [L, E, ...]
    expert-stacked leaf.

    Quantized act8 leaves ride the SAME stacked Pallas matvec as dense
    layers — the kernel's scalar-prefetched index just addresses the
    flattened [L·E, out, k] stack (the VERDICT r4 #5 '(layer, expert)
    index' trick); everything else falls back to the sliced XLA
    contraction."""
    import dataclasses

    if isinstance(leaf, QuantizedTensor):
        if leaf.q.ndim == 4 and _kernel_ok(leaf) and use_pallas():
            q = leaf.q.reshape((-1,) + leaf.q.shape[-2:])
            s = leaf.scales.reshape((-1,) + leaf.scales.shape[-2:])
            return quant_matvec_stacked_fused(x, q, s, flat_idx,
                                              bits=leaf.bits)
        q = leaf.q.reshape((-1,) + leaf.q.shape[2:])
        s = leaf.scales.reshape((-1,) + leaf.scales.shape[2:])
        qt = dataclasses.replace(leaf, q=_slice_layer(q, flat_idx),
                                 scales=_slice_layer(s, flat_idx))
        return quant_matmul(x, qt)
    flat = leaf.reshape((-1,) + leaf.shape[2:])
    return x @ _slice_layer(flat, flat_idx)


def _moe_ffn_decode(h: jax.Array, layers: Dict[str, Any], l: jax.Array,
                    config: ModelConfig) -> jax.Array:
    """Sparse-MoE FFN for decode rows h [T, H] at layer `l`.

    Router stays XLA (tiny). Two expert formulations, chosen statically by
    which reads less HBM — the only cost that matters at matvec sizes:

      * **sparse** (T·K ≤ E/2): per-(row, choice) expert matvecs — reads
        only the routed experts' weights (B=1 chat decode: topk of E);
      * **dense-over-experts** (otherwise): every expert processes all
        rows, gates select — reads each expert once, which is less than
        T·K per-pair reads at serving batch sizes (and is exact either
        way; mirrors models/moe.py `_moe_dense`).
    """
    t = h.shape[0]
    e, k = config.num_experts, config.num_experts_per_tok
    router = _slice_layer(layers["router"], l)          # [H, E]
    logits = h.astype(jnp.float32) @ router.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    gate_vals, idx = jax.lax.top_k(probs, k)            # [T, K]
    gate_vals = gate_vals / jnp.sum(gate_vals, axis=-1, keepdims=True)

    def act(g):
        return (jax.nn.gelu(g, approximate=True)
                if config.hidden_act == "gelu_tanh" else jax.nn.silu(g))

    def expert_ffn(rows, flat_e):
        gate = act(_expert_linear_l(rows, layers["w1"], flat_e))
        if "w3" in layers:
            gate = gate * _expert_linear_l(rows, layers["w3"], flat_e)
        return _expert_linear_l(gate, layers["w2"], flat_e)

    le = l * e
    if t * k <= e // 2:
        y = jnp.zeros_like(h)
        for row in range(t):
            x_row = jax.lax.dynamic_slice_in_dim(h, row, 1, 0)
            contrib = jnp.zeros_like(x_row)
            for j in range(k):
                out = expert_ffn(x_row, le + idx[row, j])
                contrib = contrib + gate_vals[row, j].astype(h.dtype) * out
            y = jax.lax.dynamic_update_slice_in_dim(y, contrib, row, 0)
        return y
    gates = jnp.zeros((t, e), jnp.float32).at[
        jnp.arange(t)[:, None], idx].set(gate_vals)
    y = jnp.zeros_like(h)
    for ex in range(e):
        out = expert_ffn(h, le + ex)
        y = y + gates[:, ex:ex + 1].astype(h.dtype) * out
    return y


def _moe_ok(params: Dict[str, Any], config: ModelConfig) -> bool:
    """MoE models ride the fast path when their expert leaves are stacked
    [L, E, ...] (dense or QuantizedTensor)."""
    if not config.num_experts:
        return True
    layers = params.get("layers", {})
    if "router" not in layers:
        return False

    def ok(leaf) -> bool:
        if isinstance(leaf, QuantizedTensor):
            return leaf.q.ndim == 4
        return getattr(leaf, "ndim", 0) == 4

    return all(ok(layers[n]) for n in ("w1", "w2", "w3") if n in layers)


def params_partitioned(params) -> bool:
    """True when any CONCRETE param leaf is sharded across >1 device.

    Tracers can't be inspected (returns False for them) — jit-level callers
    must gate at construction time instead (engine/generate do)."""
    for leaf in jax.tree.leaves(params):
        if isinstance(leaf, jax.core.Tracer) or not isinstance(leaf, jax.Array):
            continue
        sharding = getattr(leaf, "sharding", None)
        if sharding is not None and not sharding.is_fully_replicated:
            return True
    return False


def supports_fast_decode(params: Dict[str, Any], cache, config: ModelConfig,
                         tokens: jax.Array) -> bool:

    # Multi-token windows up to 16 ride the same stacked-matvec path with
    # rows flattened to [B*s] (weights are still read once per window, so a
    # speculative-verify window costs ~one decode step instead of the XLA
    # prefill path's fused-dequant matmuls at half the bandwidth); decode
    # attention takes the XLA branch for s > 1. Larger windows are MXU
    # territory — the flash-attention prefill path wins there.
    #
    # GSPMD-sharded params + Pallas kernels don't compose (GSPMD cannot
    # partition the custom calls — it would replicate the weight reads);
    # sharded execution of this path goes through
    # `parallel.tp_decode.make_tp_decode_step` (shard_map) instead, so
    # eager sharded callers fall back to the partitionable XLA path here.
    if use_pallas() and params_partitioned(params):
        return False
    # Paged caches ride the fast path for single-token steps (the stacked
    # paged-attention kernel + per-row page writes); multi-token windows
    # keep the scan path (its scatter handles [B, S] position grids).
    paged_ok = tokens.shape[1] == 1 or not isinstance(cache, PagedKVCache)
    return (
        tokens.shape[1] <= 16
        and paged_ok
        and _moe_ok(params, config)
    )


def _tp_lookup_embedding(tokens: jax.Array, embed: Any, axis: str) -> jax.Array:
    """Vocab-sharded embedding lookup inside shard_map: each shard owns rows
    [i·V_l, (i+1)·V_l); out-of-shard ids gather row 0 (clipped) and are
    zeroed, then one psum assembles the full embedding."""
    v_local = embed.q.shape[0] if isinstance(embed, QuantizedTensor) else embed.shape[0]
    start = jax.lax.axis_index(axis) * v_local
    local_ids = jnp.clip(tokens - start, 0, v_local - 1)
    x = lookup_embedding(local_ids, embed)
    valid = (tokens >= start) & (tokens < start + v_local)
    x = jnp.where(valid[..., None], x, jnp.zeros((), x.dtype))
    return jax.lax.psum(x, axis)


def decode_step(
    params: Dict[str, Any],
    cache,
    tokens: jax.Array,     # int32 [B, 1]
    start_pos: jax.Array,  # scalar or [B]
    config: ModelConfig,
    *,
    tp_axis: str = None,
):
    """One decode step over a short window; same contract as `forward`.

    s == 1 is the per-token hot path (Pallas attention kernels); 1 < s ≤ 16
    is the speculative-verify / chunked-decode window — matvecs flatten the
    window into [B·s] rows through the SAME stacked Pallas kernels (one
    weight read per window), attention takes the XLA branch with a causal
    window mask.

    tp_axis: set by `parallel.tp_decode.make_tp_decode_step` when this
    function runs INSIDE shard_map over a tensor-parallel mesh axis. The
    caller passes a LOCAL config (heads / kv-heads / intermediate divided
    by tp) and locally-shaped param/cache shards; this function then adds
    the manual collectives GSPMD would have inserted: a psum after each
    row-parallel matvec (wo, w2) and around the vocab-sharded embedding.
    Attention is communication-free (KV heads co-located with their GQA
    query groups) and the column-parallel matvecs read the replicated
    hidden state — the scaling-book TP recipe, executed through the SAME
    Pallas kernels as single-chip decode."""
    b, s = tokens.shape
    if tp_axis is not None and config.use_bias:
        raise NotImplementedError(
            "tp fast decode adds biases after psum; use_bias models take "
            "the GSPMD XLA path")
    start_pos = jnp.asarray(start_pos, jnp.int32)
    offsets = start_pos if start_pos.ndim == 1 else jnp.broadcast_to(start_pos, (b,))
    positions = offsets[:, None] + jnp.arange(s, dtype=jnp.int32)[None, :]

    layers = params["layers"]
    rope = params.get("rope", {})
    quantized = isinstance(cache, QuantizedKVCache)
    nh, nkv, hd = config.num_heads, config.num_kv_heads, config.head_dim
    eps, mu = config.rms_norm_eps, config.norm_weight_offset
    scale = config.query_scale if config.query_scale is not None else hd**-0.5
    L = config.num_layers

    if tp_axis is not None:
        x = _tp_lookup_embedding(tokens, params["embed"], tp_axis)
        x = x.astype(params["final_norm"].dtype)
    else:
        x = lookup_embedding(tokens, params["embed"]).astype(params["final_norm"].dtype)
    if config.embedding_scale is not None:
        x = x * jnp.asarray(config.embedding_scale, x.dtype)
    if config.position_embedding == "learned":
        x = x + params["pos_emb"][positions].astype(x.dtype)
    x = x.reshape(b * s, -1)  # flat rows — matvecs are row-independent

    # Rope rows for the window's positions, gathered once (selected per
    # layer for Gemma's local/global alternation).
    if config.position_embedding == "rope":
        cos_g = rope["cos"][positions]  # [B, s, hd/2]
        sin_g = rope["sin"][positions]
        cos_l = rope.get("cos_local")
        cos_l = cos_l[positions] if cos_l is not None else None
        sin_l = rope["sin_local"][positions] if cos_l is not None else None

    is_global = jnp.asarray(
        [config.layer_is_global(i) for i in range(L)])

    paged = isinstance(cache, PagedKVCache)
    if paged:
        leaves = (cache.k_pages, cache.v_pages, cache.k_scale, cache.v_scale)
        psize = cache.page_size
        page_table = cache.page_table
        kv_len = page_table.shape[1] * psize
    elif quantized:
        leaves = (cache.k, cache.v, cache.k_scale, cache.v_scale)
        kv_len = leaves[0].shape[3]
    else:
        leaves = (cache.k, cache.v)
        kv_len = leaves[0].shape[3]

    def norm(h, name, l):
        w = _slice_layer(layers[name], l)
        if config.norm_type == "layernorm":
            return ops.layer_norm(h, w, _slice_layer(layers[name + "_b"], l),
                                  eps=eps)
        return ops.rms_norm(h, w, eps=eps, offset=mu)

    def biased(y, name, l):
        if config.use_bias and name in layers:
            return y + _slice_layer(layers[name], l)
        return y

    # Mosaic head-dim gates: the FUSED update kernels' vector-like dots
    # don't lower at sub-lane head dims (tpu.reshape 8x64 -> 8x1x64
    # "unsupported shape cast" on chip at hd=64 — e.g. llama32_1b). The
    # PLAIN stacked attention kernels have no such dots and lower fine at
    # hd=64 (probed BIT-EXACT vs interpret on chip at llama32_1b geometry,
    # late r5) — those models keep kernel attention with the separate
    # cache update instead of dropping all the way to the XLA attention
    # branch. Interpret mode (CPU tests) has no Mosaic and keeps full
    # kernel coverage at tiny head dims.
    from metalchat_tpu.ops import resolve_interpret

    import os as _os_attn

    interp = resolve_interpret(None)
    hd_fused_ok = hd % 128 == 0 or interp
    hd_plain_ok = hd % 64 == 0 or interp
    if _os_attn.environ.get("METALCHAT_ATTN_KERNEL") == "plain":
        hd_fused_ok = False  # force the plain branch (CPU-testable)
    if paged:
        use_kernel_attn = s == 1 and use_pallas() and hd_fused_ok
        use_plain_kernel_attn = False
    else:
        kv_ok = kv_len % min(256, kv_len) == 0 and kv_len >= 128
        use_kernel_attn = s == 1 and use_pallas() and hd_fused_ok and kv_ok
        use_plain_kernel_attn = (s == 1 and use_pallas() and kv_ok
                                 and not hd_fused_ok and hd_plain_ok)

    fuse_norms = use_pallas() and config.norm_type != "layernorm"
    # Pre-shape the norm stacks ONCE: the fused matvec wants [L, 1, in]
    # operands, and reshaping inside the layer loop copies the whole stack
    # per iteration (92 µs/step for the two norms on the 8B r4 trace).
    norms3 = {}
    if fuse_norms:
        for _n in ("attn_norm", "ffn_norm"):
            _leaf = layers.get(_n)
            if _leaf is not None and not isinstance(_leaf, (QuantizedTensor, LoraLinear)):
                norms3[_n] = _leaf[:, None, :]

    # Merged post-attention block kernel (wo + residual + ffn-norm + w13 +
    # act + w2 + residual in ONE pallas_call): two launches/layer fewer and
    # every XLA epilogue between the three matvecs gone. Eligibility mirrors
    # the single-matvec fast path, narrowed to the llama-style layer shape
    # (no biases / post-norms / MoE / tp — tp needs a psum between wo and
    # w13, which a single kernel cannot host).
    #
    # MEASURED NEUTRAL-TO-NEGATIVE on the 8B W4A8 headline and therefore
    # OPT-IN (METALCHAT_FFN_BLOCK=1): the merged call traces at 4320 µs/step
    # vs 4266 for the three separate kernels (bench 183.7 vs 185.3 tok/s) —
    # per-call dispatch cost is already negligible for many-tile matvec
    # grids, and the phase-pinned next-phase tiles fetch early without
    # buying pipeline overlap. Kept because it is the proven scaffold for
    # shapes where launch cost DOES dominate (benchmarks/
    # launch_overhead_bench.py: the 16-step w2 grid alone gains 1.47× when
    # merged) and is fully tested (tests/test_ffn_block.py).
    import os as _os

    def _ffn_leaf_ok(name):
        leaf = layers.get(name)
        return (isinstance(leaf, QuantizedTensor) and leaf.q.ndim == 3
                and _kernel_ok(leaf))

    use_ffn_block = (
        use_pallas() and fuse_norms and tp_axis is None
        and _os.environ.get("METALCHAT_FFN_BLOCK", "0") == "1"
        and not config.use_bias and not config.use_post_norms
        and not config.num_experts and "ffn_norm" in norms3
        and "w13" in layers
        and all(_ffn_leaf_ok(n) for n in ("wo", "w13", "w2"))
        and len({layers[n].bits for n in ("wo", "w13", "w2")}) == 1
        and getattr(layers["w13"], "fuse_tp", 1) == 1
        and ffn_block_shapes_ok(
            layers["wo"].q.shape[1], layers["w13"].q.shape[1] // 2,
            layers["wo"].q.shape[2], layers["w13"].q.shape[2],
            layers["w2"].q.shape[2])
    )

    def body(l, carry):
        x, leaves = carry

        def norm_linear(x_res, name, norm_name, cache={}):
            """layers[name] @ rmsnorm(x_res): the pre-norm runs INSIDE the
            Pallas matvec when the leaf qualifies (same f32 stats + bf16
            rounding as norm-outside, up to ±1 ulp of reduction-order noise
            in the mean — tools/validate_kernels.py; ~60 µs/step of norm
            dispatches gone at 8B). Ineligible leaves fall back to one
            shared normed activation."""
            leaf = layers[name]
            if (fuse_norms and norm_name in norms3
                    and isinstance(leaf, QuantizedTensor)
                    and leaf.q.ndim == 3 and _kernel_ok(leaf)):
                return quant_matvec_stacked_fused(
                    x_res, leaf.q, leaf.scales, l, bits=leaf.bits,
                    norm_stack=norms3[norm_name], norm_eps=eps,
                    norm_offset=mu)
            if norm_name not in cache:
                cache[norm_name] = norm(x_res, norm_name, l)
            return _linear_l(cache[norm_name], leaf, l)

        if "wqkv" in layers:
            from metalchat_tpu.models.fuse import split_fused

            qkv = biased(norm_linear(x, "wqkv", "attn_norm"), "wqkv_b", l)
            q, k, v = split_fused(
                qkv, (nh * hd, nkv * hd, nkv * hd),
                blocks=getattr(layers["wqkv"], "fuse_tp", 1))
        else:
            q = biased(norm_linear(x, "wq", "attn_norm"), "wq_b", l)
            k = biased(norm_linear(x, "wk", "attn_norm"), "wk_b", l)
            v = biased(norm_linear(x, "wv", "attn_norm"), "wv_b", l)
        q = q.reshape(b, s, nh, hd)
        k = k.reshape(b, s, nkv, hd)
        v = v.reshape(b, s, nkv, hd)

        if config.use_qk_norm:
            q = ops.rms_norm(q, _slice_layer(layers["q_norm"], l), eps=eps, offset=mu)
            k = ops.rms_norm(k, _slice_layer(layers["k_norm"], l), eps=eps, offset=mu)

        if config.position_embedding == "rope":
            if cos_l is not None:
                g = is_global[l]
                cos = jnp.where(g, cos_g, cos_l)
                sin = jnp.where(g, sin_g, sin_l)
            else:
                cos, sin = cos_g, sin_g
            q = ops.apply_rope_rows(q, cos, sin)
            k = ops.apply_rope_rows(k, cos, sin)

        window = None
        if config.sliding_window is not None:
            window = jnp.where(is_global[l], -1, config.sliding_window)

        lengths = offsets + s
        if paged:
            # Stacked paged fast path: the FUSED kernel quantizes the new
            # K/V row, writes it into its page (aliased in-place outputs
            # pinned to the page holding pos) and attends in ONE call —
            # the chained per-row page DUS writes it replaces were what
            # made the 1B paged path a regression vs its own scan path
            # (SERVE_r04 'open'); the scan path additionally materializes
            # each layer's page-pool slice per Pallas call, a full extra
            # cache read+write per step.
            if use_kernel_attn:
                attn, *new_leaves = paged_decode_attention_update_stacked(
                    q[:, 0], k[:, 0], v[:, 0], *leaves, page_table,
                    lengths, l, scale=scale, window=window)
                new_leaves = tuple(new_leaves)
            else:
                pg, off = positions_to_pages(page_table, positions, psize)
                new_leaves = update_stacked_paged_cache(
                    *leaves, k, v, l, pg[:, 0], off[:, 0])
                kp, vp, ksc, vsc = (_slice_layer(a, l) for a in new_leaves)
                keys = dequantize_kv(gather_pages_dense(kp, page_table),
                                     gather_page_scales(ksc, page_table),
                                     x.dtype)
                values = dequantize_kv(gather_pages_dense(vp, page_table),
                                       gather_page_scales(vsc, page_table),
                                       x.dtype)
                valid = lengths[:, None, None]
                mask = ops.causal_mask(positions, kv_len, valid)
                if config.sliding_window is not None:
                    sliding = ops.causal_mask(positions, kv_len, valid,
                                              config.sliding_window)
                    mask = jnp.where(is_global[l], mask, sliding)
                attn = ops.attention(q, keys, values, mask, scale=scale)
        elif use_kernel_attn and quantized:
            # Fused path: quantize + cache-write + attention in ONE kernel
            # (aliased in-place outputs) — the separate update would cost
            # two quantize chains + four DUS per layer (~105 µs/step at 8B,
            # docs/performance.md).
            block_t = min(256, kv_len)
            attn, *new_leaves = decode_attention_update_quantized_stacked(
                q[:, 0], k[:, 0], v[:, 0], *leaves, l, lengths,
                scale=scale, window=window, block_t=block_t)
            new_leaves = tuple(new_leaves)
        elif quantized:
            ck, cv, sk, sv = leaves
            new_leaves = update_stacked_layer_cache_quantized(
                ck, cv, sk, sv, k, v, l, start_pos)
        else:
            new_leaves = update_stacked_layer_cache(*leaves, k, v, l, start_pos)

        if paged or (use_kernel_attn and quantized):
            pass  # attn computed above
        elif use_kernel_attn or use_plain_kernel_attn:
            block_t = min(256, kv_len)
            if quantized:
                # hd=64 models: fused update doesn't lower (gate above);
                # plain kernel attention over the separately-updated cache.
                attn = decode_attention_quantized_stacked(
                    q[:, 0], *new_leaves, l, lengths, scale=scale,
                    window=window, block_t=block_t)
            else:
                attn = decode_attention_stacked(
                    q[:, 0], *new_leaves, l, lengths, scale=scale,
                    window=window, block_t=block_t)
        else:
            if quantized:
                ck, cv, sk, sv = new_leaves
                keys = dequantize_kv(_slice_layer(ck, l), _slice_layer(sk, l), x.dtype)
                values = dequantize_kv(_slice_layer(cv, l), _slice_layer(sv, l), x.dtype)
            else:
                keys = _slice_layer(new_leaves[0], l)
                values = _slice_layer(new_leaves[1], l)
            valid = lengths[:, None, None]
            mask = ops.causal_mask(positions, kv_len, valid)
            if config.sliding_window is not None:
                sliding = ops.causal_mask(positions, kv_len, valid,
                                          config.sliding_window)
                mask = jnp.where(is_global[l], mask, sliding)
            attn = ops.attention(q, keys, values, mask, scale=scale)

        if use_ffn_block:
            x = ffn_block_stacked(
                attn.reshape(b * s, nh * hd), x,
                layers["wo"].q, layers["wo"].scales, norms3["ffn_norm"],
                layers["w13"].q, layers["w13"].scales,
                layers["w2"].q, layers["w2"].scales, l,
                bits=layers["wo"].bits,
                act="gelu_tanh" if config.hidden_act == "gelu_tanh" else "silu",
                eps=eps, offset=mu)
            return x, new_leaves

        attn = biased(_linear_l(attn.reshape(b * s, nh * hd), layers["wo"], l),
                      "wo_b", l)
        if tp_axis is not None:   # row-parallel wo: sum the partial outputs
            attn = jax.lax.psum(attn, tp_axis)
        if config.use_post_norms:
            attn = ops.rms_norm(attn, _slice_layer(layers["post_attn_norm"], l),
                                eps=eps, offset=mu)
        x = x + attn

        if config.num_experts:
            ffn = _moe_ffn_decode(norm(x, "ffn_norm", l), layers, l, config)
        elif "w13" in layers:
            from metalchat_tpu.models.fuse import split_fused

            fused = biased(norm_linear(x, "w13", "ffn_norm"), "w13_b", l)
            f_half = fused.shape[-1] // 2
            gate, up = split_fused(
                fused, (f_half, f_half),
                blocks=getattr(layers["w13"], "fuse_tp", 1))
            gate = (jax.nn.gelu(gate, approximate=True)
                    if config.hidden_act == "gelu_tanh" else jax.nn.silu(gate))
            ffn = _linear_l(gate * up, layers["w2"], l)
        elif config.ffn_type == "mlp":
            gate = biased(norm_linear(x, "w1", "ffn_norm"), "w1_b", l)
            gate = (jax.nn.gelu(gate, approximate=True)
                    if config.hidden_act == "gelu_tanh" else jax.nn.silu(gate))
            ffn = biased(_linear_l(gate, layers["w2"], l), "w2_b", l)
        else:
            gate = norm_linear(x, "w1", "ffn_norm")
            gate = (jax.nn.gelu(gate, approximate=True)
                    if config.hidden_act == "gelu_tanh" else jax.nn.silu(gate))
            ffn = _linear_l(gate * norm_linear(x, "w3", "ffn_norm"),
                            layers["w2"], l)
        if tp_axis is not None:   # row-parallel w2
            ffn = jax.lax.psum(ffn, tp_axis)
        if config.use_post_norms:
            ffn = ops.rms_norm(ffn, _slice_layer(layers["post_ffn_norm"], l),
                               eps=eps, offset=mu)
        x = x + ffn
        return x, new_leaves

    x, leaves = jax.lax.fori_loop(0, L, body, (x, leaves))

    if config.norm_type == "layernorm":
        x = ops.layer_norm(x, params["final_norm"], params["final_norm_b"], eps=eps)
    else:
        x = ops.rms_norm(x, params["final_norm"], eps=eps, offset=mu)
    logits = _lm_head(x, params["lm_head"]).astype(jnp.float32).reshape(b, s, -1)

    if paged:
        new_cache = PagedKVCache(*leaves, page_table=cache.page_table,
                                 lengths=cache.lengths)
    elif quantized:
        new_cache = QuantizedKVCache(*leaves)
    else:
        new_cache = KVCache(*leaves)
    return logits, new_cache
