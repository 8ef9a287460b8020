"""Perplexity harness — quantization quality measurement.

BASELINE.md's quality gate is "ppl Δ vs bf16 ≈ 0 at matched bit-width"
(config 2). The reference has no perplexity tooling at all; this provides
teacher-forced NLL/perplexity over token streams and the Δ between two
parameter trees (e.g. bf16 vs int8/int4 of the same checkpoint).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from metalchat_tpu.cache import KVCache, QuantizedKVCache
from metalchat_tpu.config import ModelConfig
from metalchat_tpu.models.transformer import Params, forward


def token_nll(
    params: Params,
    config: ModelConfig,
    tokens: jax.Array,          # int32 [B, S]
    mask: Optional[jax.Array] = None,  # bool [B, S-1] — positions to score
    quantized_kv: bool = False,  # score through the int8 KV cache path
) -> jax.Array:
    """Mean negative log-likelihood of tokens[:, 1:] under teacher forcing."""
    b, s = tokens.shape
    if quantized_kv:
        cache = QuantizedKVCache.create(config, b, s)
    else:
        cache = KVCache.create(config, b, s, dtype=params["final_norm"].dtype)
    logits, _ = forward(params, cache, tokens, 0, config)
    logprobs = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    targets = tokens[:, 1:]
    picked = jnp.take_along_axis(logprobs, targets[..., None], axis=-1)[..., 0]
    if mask is None:
        return -jnp.mean(picked)
    mask = mask.astype(jnp.float32)
    return -jnp.sum(picked * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def perplexity(params: Params, config: ModelConfig, tokens, mask=None) -> float:
    tokens = jnp.asarray(tokens, jnp.int32)
    return float(jnp.exp(token_nll(params, config, tokens, mask)))


def perplexity_delta(
    reference_params: Params,
    candidate_params: Params,
    config: ModelConfig,
    token_batches: Sequence,
) -> Dict[str, float]:
    """Compare two parameter trees over a token corpus.

    Returns {"reference", "candidate", "delta", "delta_pct"} — the
    quantization acceptance metric (BASELINE config 2: Δ within the
    reference INT8 envelope).
    """
    ref_nll = []
    cand_nll = []
    for batch in token_batches:
        batch = jnp.asarray(batch, jnp.int32)
        ref_nll.append(float(token_nll(reference_params, config, batch)))
        cand_nll.append(float(token_nll(candidate_params, config, batch)))
    ref = float(np.exp(np.mean(ref_nll)))
    cand = float(np.exp(np.mean(cand_nll)))
    return {
        "reference": ref,
        "candidate": cand,
        "delta": cand - ref,
        "delta_pct": 100.0 * (cand - ref) / ref,
    }
