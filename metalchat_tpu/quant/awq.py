"""AWQ-style activation-aware scale folding (per-channel quantization aid).

Per-channel int4 (the W4A8 MXU scheme) loses accuracy vs group-32 because a
few salient input channels set every output channel's quantization step.
AWQ's observation (Lin et al., 2023, arXiv:2306.00978): scale the weight
rows of salient channels UP (and the incoming activation DOWN) before
quantization — exactly equivalence-preserving in f32, but it redistributes
quantization error away from the channels that matter and balances the
per-token int8 activation quantization at the same time.

All four folds used here are EXACT (model output unchanged before
quantization), with no runtime cost — the inverse scale is absorbed into an
adjacent parameter:

  * wq/wk/wv rows ⇐ attention rmsnorm weight (h → h/s, W → s·W)
  * w1/w3 rows    ⇐ ffn rmsnorm weight
  * wo rows       ⇐ wv output columns (attention is linear in V; GQA
    replication handled by averaging the stat over the query-head group)
  * w2 rows       ⇐ w3 output columns (swiglu: silu(w1 h) ⊙ (w3 h) is
    linear in the w3 branch)

Column scalings of wv/w3 are themselves absorbed exactly by their own
per-output-channel quantization scales, so only the error-redistributing
row scalings have any quantization effect. The reference has no analog
(its int8 path is groupwise dequant-then-matmul, quantization/linear.h).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from metalchat_tpu.config import ModelConfig
from metalchat_tpu.ops import xla as ops


def calibration_stats(
    params: Dict[str, Any],
    config: ModelConfig,
    tokens: jax.Array,  # int32 [B, S] calibration batch
    tap=None,
) -> Dict[str, np.ndarray]:
    """Per-input-channel activation statistics at each foldable projection.

    Walks the dense (unquantized) model layer by layer with the same XLA
    ops as `_layer_step`, recording the four tap points. Returns
    {"qkv": [L, ...], "wo": [L, ...], "w13": [L, ...], "w2": [L, ...]}.

    `tap(h [B, S, in]) -> np.ndarray` customizes the statistic; the default
    is mean |h| per channel (AWQ saliency). GPTQ passes a second-moment tap
    (`hessian_tap`, quant/gptq.py) to collect layer Hessians H = XᵀX.
    """
    if config.num_experts:
        raise NotImplementedError("AWQ calibration: dense FFN models only")
    from metalchat_tpu.models.transformer import embed_tokens

    b, s = tokens.shape
    nh, nkv, hd = config.num_heads, config.num_kv_heads, config.head_dim
    eps, mu = config.rms_norm_eps, config.norm_weight_offset
    positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None, :], (b, s))
    valid = jnp.full((b, 1, 1), s, jnp.int32)

    x = embed_tokens(params, tokens, positions, config).astype(jnp.float32)
    layers = params["layers"]

    if tap is None:
        def tap(h):  # mean |h| over batch and sequence → per-channel saliency
            return np.asarray(jnp.mean(jnp.abs(h.astype(jnp.float32)),
                                       axis=(0, 1)))

    def norm(h, w, bias=None):
        if config.norm_type == "layernorm":
            return ops.layer_norm(h, w, bias, eps=eps)
        return ops.rms_norm(h, w, eps=eps, offset=mu)

    stats: Dict[str, list] = {"qkv": [], "wo": [], "w13": [], "w2": []}
    for l in range(config.num_layers):
        layer = jax.tree.map(lambda a: a[l], layers)
        is_global = config.layer_is_global(l)

        h = norm(x, layer["attn_norm"], layer.get("attn_norm_b"))
        stats["qkv"].append(tap(h))
        q = (h @ layer["wq"]).reshape(b, s, nh, hd)
        k = (h @ layer["wk"]).reshape(b, s, nkv, hd)
        v = (h @ layer["wv"]).reshape(b, s, nkv, hd)
        if config.use_qk_norm:
            q = ops.rms_norm(q, layer["q_norm"], eps=eps, offset=mu)
            k = ops.rms_norm(k, layer["k_norm"], eps=eps, offset=mu)
        if config.position_embedding == "rope":
            cos, sin = params["rope"]["cos"], params["rope"]["sin"]
            if "cos_local" in params["rope"] and not is_global:
                cos, sin = params["rope"]["cos_local"], params["rope"]["sin_local"]
            q = ops.apply_rope(q, cos, sin, positions)
            k = ops.apply_rope(k, cos, sin, positions)
        scale = (config.query_scale if config.query_scale is not None
                 else hd ** -0.5)
        mask = ops.causal_mask(positions, s, valid)
        if config.sliding_window is not None and not is_global:
            mask = ops.causal_mask(positions, s, valid, config.sliding_window)
        attn = ops.attention(q, jnp.swapaxes(k, 1, 2), jnp.swapaxes(v, 1, 2),
                             mask, scale=scale)
        attn = attn.reshape(b, s, nh * hd)
        stats["wo"].append(tap(attn))
        attn = attn @ layer["wo"]
        if config.use_post_norms:
            attn = norm(attn, layer["post_attn_norm"])
        x = x + attn

        h = norm(x, layer["ffn_norm"], layer.get("ffn_norm_b"))
        stats["w13"].append(tap(h))
        if config.ffn_type == "mlp":
            gate = h @ layer["w1"]
            act = (jax.nn.gelu(gate, approximate=True)
                   if config.hidden_act == "gelu_tanh" else jax.nn.silu(gate))
            stats["w2"].append(tap(act))
            ffn = act @ layer["w2"]
        else:
            gate = h @ layer["w1"]
            gate = (jax.nn.gelu(gate, approximate=True)
                    if config.hidden_act == "gelu_tanh" else jax.nn.silu(gate))
            prod = gate * (h @ layer["w3"])
            stats["w2"].append(tap(prod))
            ffn = prod @ layer["w2"]
        if config.use_post_norms:
            ffn = norm(ffn, layer["post_ffn_norm"])
        x = x + ffn

    return {k: np.stack(v) for k, v in stats.items()}


def _saliency_scale(stat: np.ndarray, alpha: float) -> np.ndarray:
    """s = |x|^α, normalized to geometric mean 1 (keeps magnitudes sane)."""
    s = np.maximum(stat.astype(np.float64), 1e-8) ** alpha
    s = s / np.exp(np.mean(np.log(s), axis=-1, keepdims=True))
    return np.clip(s, 1e-4, 1e4).astype(np.float32)


def awq_fold(
    params: Dict[str, Any],
    config: ModelConfig,
    stats: Dict[str, np.ndarray],
    alpha: float = 0.5,
) -> Dict[str, Any]:
    """Return a new parameter tree with saliency scales folded in (exact).

    Quantize the result with `quantize_params(..., group_size=None)` — the
    folds specifically target per-channel schemes (group-32 already has
    local scales)."""
    nh, nkv, hd = config.num_heads, config.num_kv_heads, config.head_dim
    groups = nh // nkv
    layers = dict(params["layers"])

    def f32(a):
        return np.asarray(jnp.asarray(a, jnp.float32))

    dtype = np.asarray(params["layers"]["attn_norm"]).dtype

    s_qkv = _saliency_scale(stats["qkv"], alpha)    # [L, h]
    s_w13 = _saliency_scale(stats["w13"], alpha)    # [L, h]
    s_w2 = _saliency_scale(stats["w2"], alpha)      # [L, f]
    # GQA: wo input channels replicate each kv-head's V across `groups`
    # query heads — the fold must use ONE scale per (kv-head, dim), shared
    # by the whole group, so average the saliency over the group.
    s_wo_full = _saliency_scale(stats["wo"], alpha)  # [L, nh*hd]
    L = s_wo_full.shape[0]
    s_v = s_wo_full.reshape(L, nkv, groups, hd).mean(axis=2)   # [L, nkv, hd]
    s_wo = np.repeat(s_v, groups, axis=1).reshape(L, nh * hd)  # replicated

    out_layers = dict(layers)
    out_layers["attn_norm"] = (f32(layers["attn_norm"]) / s_qkv).astype(dtype)
    if "attn_norm_b" in layers:
        out_layers["attn_norm_b"] = (f32(layers["attn_norm_b"]) / s_qkv).astype(dtype)
    for name in ("wq", "wk", "wv"):
        out_layers[name] = (f32(layers[name]) * s_qkv[:, :, None]).astype(dtype)
    # wv output columns absorb 1/s_v; wo rows absorb s.
    out_layers["wv"] = (f32(out_layers["wv"])
                        / s_v.reshape(L, 1, nkv * hd)).astype(dtype)
    out_layers["wo"] = (f32(layers["wo"]) * s_wo[:, :, None]).astype(dtype)

    out_layers["ffn_norm"] = (f32(layers["ffn_norm"]) / s_w13).astype(dtype)
    if "ffn_norm_b" in layers:
        out_layers["ffn_norm_b"] = (f32(layers["ffn_norm_b"]) / s_w13).astype(dtype)
    out_layers["w1"] = (f32(layers["w1"]) * s_w13[:, :, None]).astype(dtype)
    if "w3" in layers:
        w3 = f32(layers["w3"]) * s_w13[:, :, None]
        # w3 output columns absorb 1/s_w2; w2 rows absorb s_w2 (swiglu is
        # linear in the w3 branch). No w3 → (GPT-2 MLP) skip the w2 fold:
        # gelu is not channel-scale-equivariant.
        out_layers["w3"] = (w3 / s_w2[:, None, :]).astype(dtype)
        out_layers["w2"] = (f32(layers["w2"]) * s_w2[:, :, None]).astype(dtype)

    out = dict(params)
    out["layers"] = out_layers
    return out


def awq_quantize_params(
    params: Dict[str, Any],
    config: ModelConfig,
    calibration_tokens: jax.Array,
    *,
    bits: int = 4,
    act_bits: int = 8,
    alpha: float = 0.5,
    clip_search: bool = True,
    **quant_kw,
) -> Dict[str, Any]:
    """calibrate → fold → per-channel quantize, in one call."""
    from metalchat_tpu.quant.quantize import quantize_params

    stats = calibration_stats(params, config, calibration_tokens)
    folded = awq_fold(params, config, stats, alpha=alpha)
    return quantize_params(folded, bits=bits, group_size=None,
                           act_bits=act_bits, clip_search=clip_search,
                           **quant_kw)
