"""Generic decoder-only transformer, TPU-first.

Replaces the reference's `nn::llama3` / `nn::gemma3` module trees
(nn/llama.h:43-135, nn/gemma.h:24-146) with a single functional forward over
a parameter pytree:

  * per-layer weights are **stacked on a leading layer axis** and the block
    loop is a `lax.scan` — one trace/compile of the block regardless of
    depth, the idiomatic XLA formulation (the reference re-encodes ~20
    kernels × 16 layers per token on the CPU; here the whole step is one
    compiled program).
  * all linear weights are stored **[in, out]-major** so every matmul hits
    the MXU without layout churn.
  * Gemma-3 specifics (q/k-norm, post-norms, embedding scale, alternating
    sliding/global attention with two rope tables — nn/gemma.h:61-146) are
    driven by `ModelConfig` flags and a per-layer `is_global` vector, selected
    with `jnp.where` inside the scan (compiler-friendly, no Python branching).

Param tree layout (dotted safetensors names map 1:1 via io.loaders):

  params = {
    "embed":      [V, H],
    "layers": {   # every leaf [L, ...]
      "attn_norm": [L, H], "wq": [L, H, nh*hd], "wk": [L, H, nkv*hd],
      "wv": [L, H, nkv*hd], "wo": [L, nh*hd, H],
      ("q_norm"/"k_norm": [L, hd])  ("post_attn_norm"/"post_ffn_norm": [L, H])
      "ffn_norm": [L, H], "w1": [L, H, F], "w3": [L, H, F], "w2": [L, F, H],
    },
    "final_norm": [H],
    "lm_head":    [H, V],
    "rope":       {"cos"/"sin": [S_max, hd/2], ("cos_local"/"sin_local")},
  }
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple, Union

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
    update_layer_cache,
    update_layer_cache_quantized,
    write_paged_layer,
)
from metalchat_tpu.config import ModelConfig
from metalchat_tpu.ops import use_pallas, xla as ops
from metalchat_tpu.ops.decode_attention_pallas import (
    decode_attention,
    decode_attention_quantized,
)
from metalchat_tpu.ops.flash_attention_pallas import flash_attention
from metalchat_tpu.ops.paged_attention_pallas import paged_decode_attention
from metalchat_tpu.quant.quantize import linear, lookup_embedding


def _choose_block(length: int, preferred: int = 256) -> Optional[int]:
    """Largest kernel block size dividing `length` (None → XLA fallback)."""
    for candidate in (preferred, 128):
        if candidate <= length and length % candidate == 0:
            return candidate
    return None

Params = Dict[str, Any]
Cache = Union[KVCache, QuantizedKVCache, PagedKVCache]


def _norm(x, layer_or_params, name: str, config: ModelConfig):
    """rmsnorm (Llama/Gemma) or layernorm (GPT-2) by config.norm_type."""
    w = layer_or_params[name]
    if config.norm_type == "layernorm":
        return ops.layer_norm(x, w, layer_or_params[name + "_b"], eps=config.rms_norm_eps)
    return ops.rms_norm(x, w, eps=config.rms_norm_eps, offset=config.norm_weight_offset)


def _biased(y, layer, name: str, config: ModelConfig):
    if config.use_bias and name in layer:
        return y + layer[name]
    return y


def make_rope_tables(config: ModelConfig, max_seq_len: Optional[int] = None) -> Dict[str, jax.Array]:
    """Precompute rope cos/sin (global + optional Gemma local tables)."""
    s = max_seq_len or config.max_seq_len
    cos, sin = ops.precompute_rope(config.head_dim, s, config.rope_theta, config.rope_scaling)
    tables = {"cos": cos, "sin": sin}
    if config.rope_local_theta is not None:
        cos_l, sin_l = ops.precompute_rope(config.head_dim, s, config.rope_local_theta)
        tables["cos_local"] = cos_l
        tables["sin_local"] = sin_l
    return tables


def _layer_step(
    x: jax.Array,
    layer: Params,
    cache_slices: Tuple[jax.Array, ...],
    is_global: jax.Array,
    *,
    config: ModelConfig,
    rope: Dict[str, jax.Array],
    positions: jax.Array,
    offsets: jax.Array,   # [B] per-row start positions
    start_pos: jax.Array,  # scalar, or [B] when S == 1
    quantized_cache: bool,
    page_table: Optional[jax.Array] = None,  # [B, max_pages] (paged cache)
    allow_pallas: bool = True,
) -> Tuple[jax.Array, Tuple[jax.Array, ...]]:
    b, s, hidden = x.shape
    nh, nkv, hd = config.num_heads, config.num_kv_heads, config.head_dim
    eps, mu = config.rms_norm_eps, config.norm_weight_offset

    h = _norm(x, layer, "attn_norm", config)
    if "wqkv" in layer:  # fused projection (models/fuse.py)
        from metalchat_tpu.models.fuse import split_fused

        qkv = _biased(linear(h, layer["wqkv"]), layer, "wqkv_b", config)
        q, k, v = split_fused(qkv, (nh * hd, nkv * hd, nkv * hd),
                              blocks=getattr(layer["wqkv"], "fuse_tp", 1))
        q, k, v = (q.reshape(b, s, nh, hd), k.reshape(b, s, nkv, hd),
                   v.reshape(b, s, nkv, hd))
    else:
        q = _biased(linear(h, layer["wq"]), layer, "wq_b", config).reshape(b, s, nh, hd)
        k = _biased(linear(h, layer["wk"]), layer, "wk_b", config).reshape(b, s, nkv, hd)
        v = _biased(linear(h, layer["wv"]), layer, "wv_b", config).reshape(b, s, nkv, hd)

    if config.use_qk_norm:
        q = ops.rms_norm(q, layer["q_norm"], eps=eps, offset=mu)
        k = ops.rms_norm(k, layer["k_norm"], eps=eps, offset=mu)

    if config.position_embedding == "rope":
        # Per-layer rope table choice (Gemma local vs global theta).
        cos, sin = rope["cos"], rope["sin"]
        if "cos_local" in rope:
            cos = jnp.where(is_global, cos, rope["cos_local"])
            sin = jnp.where(is_global, sin, rope["sin_local"])
        q = ops.apply_rope(q, cos, sin, positions)
        k = ops.apply_rope(k, cos, sin, positions)

    paged = page_table is not None
    if paged:
        psize = cache_slices[0].shape[2]
        pages, offs = positions_to_pages(page_table, positions, psize)
        new_slices = write_paged_layer(*cache_slices, k, v, pages, offs)
        kv_len = page_table.shape[1] * psize
    elif quantized_cache:
        ck, cv, sk, sv = update_layer_cache_quantized(*cache_slices, k, v, start_pos)
        new_slices = (ck, cv, sk, sv)
        kv_len = ck.shape[2]
    else:
        ck, cv = update_layer_cache(*cache_slices, k, v, start_pos)
        new_slices = (ck, cv)
        kv_len = ck.shape[2]
    scale = config.query_scale if config.query_scale is not None else hd**-0.5

    # Per-layer dynamic window: -1 = global (selected inside the scan).
    window = None
    if config.sliding_window is not None:
        window = jnp.where(is_global, -1, config.sliding_window)

    block_t = _choose_block(kv_len)
    pallas_ok = use_pallas() and allow_pallas
    if paged and pallas_ok and s == 1 and _choose_block(cache_slices[0].shape[2]) == cache_slices[0].shape[2]:
        kp, vp, ksc, vsc = new_slices
        attn = paged_decode_attention(
            q[:, 0], kp, vp, ksc, vsc, page_table, offsets + 1,
            scale=scale, window=window,
        )[:, None]
    elif not paged and pallas_ok and s == 1 and block_t is not None:
        # Fused decode attention; the quantized variant reads int8 KV directly.
        lengths = offsets + 1
        if quantized_cache:
            attn = decode_attention_quantized(
                q[:, 0], ck, cv, sk, sv, lengths, scale=scale, window=window,
                block_t=block_t,
            )[:, None]
        else:
            attn = decode_attention(
                q[:, 0], ck, cv, lengths, scale=scale, window=window, block_t=block_t,
            )[:, None]
    else:
        if paged:
            kp, vp, ksc, vsc = new_slices
            keys = dequantize_kv(gather_pages_dense(kp, page_table),
                                 gather_page_scales(ksc, page_table), x.dtype)
            values = dequantize_kv(gather_pages_dense(vp, page_table),
                                   gather_page_scales(vsc, page_table), x.dtype)
        elif quantized_cache:
            keys = dequantize_kv(ck, sk, x.dtype)
            values = dequantize_kv(cv, sv, x.dtype)
        else:
            keys, values = ck, cv
        block_q = _choose_block(s)
        if pallas_ok and s > 1 and block_t is not None and block_q is not None:
            attn = flash_attention(
                q, keys, values, start_pos, scale=scale, window=window,
                block_q=block_q, block_k=block_t,
            )
        else:
            valid = (offsets + s)[:, None, None]
            mask = ops.causal_mask(positions, kv_len, valid)
            if config.sliding_window is not None:
                sliding = ops.causal_mask(positions, kv_len, valid, config.sliding_window)
                mask = jnp.where(is_global, mask, sliding)
            attn = ops.attention(q, keys, values, mask, scale=scale)
    attn = _biased(linear(attn.reshape(b, s, nh * hd), layer["wo"]), layer, "wo_b", config)
    if config.use_post_norms:
        attn = ops.rms_norm(attn, layer["post_attn_norm"], eps=eps, offset=mu)
    x = x + attn

    h = _norm(x, layer, "ffn_norm", config)
    aux = jnp.zeros((), jnp.float32)
    if config.num_experts:
        from metalchat_tpu.models.moe import moe_ffn

        ffn, aux = moe_ffn(h, layer, config)
    elif "w13" in layer:  # fused gate/up (models/fuse.py)
        from metalchat_tpu.models.fuse import split_fused

        fused = _biased(linear(h, layer["w13"]), layer, "w13_b", config)
        f_half = fused.shape[-1] // 2
        gate, up = split_fused(fused, (f_half, f_half),
                               blocks=getattr(layer["w13"], "fuse_tp", 1))
        gate = (jax.nn.gelu(gate, approximate=True)
                if config.hidden_act == "gelu_tanh" else jax.nn.silu(gate))
        ffn = linear(gate * up, layer["w2"])
    elif config.ffn_type == "mlp":
        gate = _biased(linear(h, layer["w1"]), layer, "w1_b", config)
        gate = jax.nn.gelu(gate, approximate=True) if config.hidden_act == "gelu_tanh" else jax.nn.silu(gate)
        ffn = _biased(linear(gate, layer["w2"]), layer, "w2_b", config)
    else:
        ffn = ops.swiglu(h, layer["w1"], layer["w3"], layer["w2"], config.hidden_act, matmul=linear)
    if config.use_post_norms:
        ffn = ops.rms_norm(ffn, layer["post_ffn_norm"], eps=eps, offset=mu)
    x = x + ffn
    return x, (new_slices, aux)


def run_layers(
    x: jax.Array,
    layers: Params,                      # stacked leaves [L_local, ...]
    cache_leaves: Tuple[jax.Array, ...],
    is_global: jax.Array,                # [L_local]
    *,
    config: ModelConfig,
    rope: Dict[str, jax.Array],
    positions: jax.Array,
    offsets: jax.Array,
    start_pos: jax.Array,
    quantized_cache: bool,
    page_table: Optional[jax.Array] = None,
    remat: bool = False,
    allow_pallas: bool = True,
) -> Tuple[jax.Array, Tuple[jax.Array, ...], jax.Array]:
    """Scan `_layer_step` over a stack of layers (the shared layer loop of
    `forward` and the pipeline-parallel stage executor).

    Returns (x, new_cache_leaves, aux) — aux is the per-layer MoE
    load-balancing loss [L_local] (zeros for dense layers)."""

    def scan_fn(carry, xs):
        layer, slices, layer_global = xs
        return _layer_step(
            carry, layer, slices, layer_global,
            config=config, rope=rope, positions=positions, offsets=offsets,
            start_pos=start_pos, quantized_cache=quantized_cache,
            page_table=page_table, allow_pallas=allow_pallas,
        )

    if remat:
        scan_fn = jax.checkpoint(scan_fn)
    x, (new_leaves, aux) = jax.lax.scan(
        scan_fn, x, (layers, cache_leaves, is_global))
    return x, new_leaves, aux


def embed_tokens(params: Params, tokens: jax.Array, positions: jax.Array,
                 config: ModelConfig) -> jax.Array:
    """Token embedding (+ scale / learned positions) → activations."""
    x = lookup_embedding(tokens, params["embed"]).astype(params["final_norm"].dtype)
    if config.embedding_scale is not None:
        x = x * jnp.asarray(config.embedding_scale, x.dtype)
    if config.position_embedding == "learned":
        x = x + params["pos_emb"][positions].astype(x.dtype)
    return x


def final_logits(params: Params, x: jax.Array, config: ModelConfig) -> jax.Array:
    """Final norm + lm head → f32 logits."""
    if config.norm_type == "layernorm":
        x = ops.layer_norm(x, params["final_norm"], params["final_norm_b"],
                           eps=config.rms_norm_eps)
    else:
        x = ops.rms_norm(x, params["final_norm"], eps=config.rms_norm_eps,
                         offset=config.norm_weight_offset)
    return linear(x, params["lm_head"]).astype(jnp.float32)


def forward(
    params: Params,
    cache: Cache,
    tokens: jax.Array,
    start_pos: jax.Array,
    config: ModelConfig,
    *,
    remat: bool = False,
    with_aux: bool = False,
    fast_decode: bool = True,
    differentiable: bool = False,
    allow_pallas: bool = True,
):
    """One model step (prefill when S>1, decode when S==1).

    tokens: int32 [B, S]; start_pos: scalar int32 — the write offset into the
    cache (all rows share it; the batching engine uses per-row offsets via its
    paged path). Returns (float32 logits [B, S, V], updated cache).

    remat=True checkpoints each layer of the scan (recompute activations in
    the backward pass — the standard memory/FLOPs trade for training).
    with_aux=True additionally returns the mean MoE load-balancing loss
    (0.0 for dense models) for the training objective.
    differentiable=True forces the XLA attention path (the Pallas kernels
    define no VJP) — set by the training loss; inference never needs it.
    """
    b, s = tokens.shape
    start_pos = jnp.asarray(start_pos, jnp.int32)

    from metalchat_tpu.models.decode import decode_step, supports_fast_decode

    if (fast_decode and not remat and not differentiable
            and supports_fast_decode(params, cache, config, tokens)):
        logits, new_cache = decode_step(params, cache, tokens, start_pos, config)
        if with_aux:
            return logits, new_cache, jnp.zeros((), jnp.float32)
        return logits, new_cache
    # Per-row start_pos with S > 1 is the batched multi-slot prefill shape
    # (each row is its own chunk at its own offset): cache writes
    # (_write_rows / positions_to_pages), masks and the flash kernel all
    # take per-row offsets.
    offsets = start_pos if start_pos.ndim == 1 else jnp.broadcast_to(start_pos, (b,))
    positions = offsets[:, None] + jnp.arange(s, dtype=jnp.int32)[None, :]

    # Activation dtype follows the (always-dense) final norm weight.
    x = embed_tokens(params, tokens, positions, config)

    is_global = jnp.asarray(
        [config.layer_is_global(i) for i in range(config.num_layers)]
    )

    paged = isinstance(cache, PagedKVCache)
    quantized = isinstance(cache, QuantizedKVCache)
    if paged:
        cache_leaves = (cache.k_pages, cache.v_pages, cache.k_scale, cache.v_scale)
        page_table = cache.page_table
    else:
        page_table = None
        if quantized:
            cache_leaves = (cache.k, cache.v, cache.k_scale, cache.v_scale)
        else:
            cache_leaves = (cache.k, cache.v)

    x, new_leaves, aux = run_layers(
        x, params["layers"], cache_leaves, is_global,
        config=config, rope=params["rope"], positions=positions,
        offsets=offsets, start_pos=start_pos, quantized_cache=quantized,
        page_table=page_table, remat=remat,
        allow_pallas=allow_pallas and not differentiable,
    )

    logits = final_logits(params, x, config)

    if paged:
        new_cache: Cache = PagedKVCache(*new_leaves, page_table=cache.page_table,
                                        lengths=cache.lengths)
    elif quantized:
        new_cache = QuantizedKVCache(*new_leaves)
    else:
        new_cache = KVCache(*new_leaves)
    if with_aux:
        return logits, new_cache, jnp.mean(aux)
    return logits, new_cache


def init_random_params(
    config: ModelConfig,
    seed: int = 0,
    dtype: jnp.dtype = jnp.bfloat16,
    max_seq_len: Optional[int] = None,
) -> Params:
    """Random-initialized parameter tree (tests / benchmarks without weights)."""
    key = jax.random.PRNGKey(seed)
    keys = iter(jax.random.split(key, 16))
    h, f = config.hidden_size, config.intermediate_size
    nh, nkv, hd, L = config.num_heads, config.num_kv_heads, config.head_dim, config.num_layers

    def dense(k, *shape, std=0.02):
        return (jax.random.normal(k, shape, jnp.float32) * std).astype(dtype)

    layers = {
        "attn_norm": jnp.ones((L, h), dtype),
        "wq": dense(next(keys), L, h, nh * hd),
        "wk": dense(next(keys), L, h, nkv * hd),
        "wv": dense(next(keys), L, h, nkv * hd),
        "wo": dense(next(keys), L, nh * hd, h),
        "ffn_norm": jnp.ones((L, h), dtype),
        "w1": dense(next(keys), L, h, f),
        "w3": dense(next(keys), L, h, f),
        "w2": dense(next(keys), L, f, h),
    }
    if config.ffn_type == "mlp":
        del layers["w3"]
    if config.num_experts:
        e = config.num_experts
        layers["router"] = dense(next(keys), L, h, e)
        layers["w1"] = dense(next(keys), L, e, h, f)
        layers["w3"] = dense(next(keys), L, e, h, f)
        layers["w2"] = dense(next(keys), L, e, f, h)
    if config.use_qk_norm:
        layers["q_norm"] = jnp.ones((L, hd), dtype)
        layers["k_norm"] = jnp.ones((L, hd), dtype)
    if config.use_post_norms:
        layers["post_attn_norm"] = jnp.ones((L, h), dtype)
        layers["post_ffn_norm"] = jnp.ones((L, h), dtype)
    if config.norm_type == "layernorm":
        layers["attn_norm_b"] = jnp.zeros((L, h), dtype)
        layers["ffn_norm_b"] = jnp.zeros((L, h), dtype)
    if config.use_bias:
        layers["wq_b"] = jnp.zeros((L, nh * hd), dtype)
        layers["wk_b"] = jnp.zeros((L, nkv * hd), dtype)
        layers["wv_b"] = jnp.zeros((L, nkv * hd), dtype)
        layers["wo_b"] = jnp.zeros((L, h), dtype)
        layers["w1_b"] = jnp.zeros((L, f), dtype)
        layers["w2_b"] = jnp.zeros((L, h), dtype)

    embed = dense(next(keys), config.vocab_size, h)
    params: Params = {
        "embed": embed,
        "layers": layers,
        "final_norm": jnp.ones((h,), dtype),
        "lm_head": embed.T if config.tie_word_embeddings else dense(next(keys), h, config.vocab_size),
        "rope": make_rope_tables(config, max_seq_len),
    }
    if config.norm_type == "layernorm":
        params["final_norm_b"] = jnp.zeros((h,), dtype)
    if config.position_embedding == "learned":
        params["pos_emb"] = dense(next(keys), max_seq_len or config.max_seq_len, h)
    return params
