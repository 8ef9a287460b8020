"""AWQ-style scale folding + MSE clip search (quant/awq.py).

The folds must be EXACT on the dense model (pure reparameterization), and
the folded-then-quantized per-channel-int4 model must beat plain
per-channel int4 on the real fixture's held-out corpus.
"""

from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from metalchat_tpu.cache import KVCache
from metalchat_tpu.config import LlamaConfig, load_config
from metalchat_tpu.io.loaders import load_params
from metalchat_tpu.io.safetensors import open_safetensors
from metalchat_tpu.models import forward, init_random_params
from metalchat_tpu.quant.awq import awq_fold, awq_quantize_params, calibration_stats
from metalchat_tpu.quant.ppl import token_nll
from metalchat_tpu.quant.quantize import quantize, quantize_params

FIXTURE = Path(__file__).parent / "fixtures" / "pyllama_10m"


def test_awq_fold_is_exact():
    cfg = LlamaConfig(vocab_size=128, hidden_size=64, intermediate_size=160,
                      num_layers=3, num_heads=8, num_kv_heads=2, head_dim=16,
                      max_seq_len=128, tie_word_embeddings=False)
    params = init_random_params(cfg, seed=5, dtype=jnp.float32)
    toks = jax.random.randint(jax.random.PRNGKey(0), (2, 48), 0, 128)
    stats = calibration_stats(params, cfg, toks)
    assert stats["qkv"].shape == (3, 64)
    assert stats["wo"].shape == (3, 128)
    assert stats["w2"].shape == (3, 160)
    folded = awq_fold(params, cfg, stats, alpha=0.5)

    def logits(p):
        cache = KVCache.create(cfg, 2, 64, dtype=jnp.float32)
        out, _ = jax.jit(forward, static_argnames="config")(
            p, cache, toks[:, :32], 0, cfg)
        return np.asarray(out)

    a, b = logits(params), logits(folded)
    assert np.abs(a - b).max() < 2e-4 * np.abs(a).max()


def test_clip_search_reduces_reconstruction_error():
    rng = np.random.default_rng(0)
    # Heavy-tailed rows: absmax scales are far from MSE-optimal.
    w = rng.standard_normal((128, 64)).astype(np.float32)
    w[rng.integers(0, 128, 8), :] *= 12.0
    from metalchat_tpu.quant.quantize import dequantize

    plain = quantize(w, bits=4, group_size=None)
    clipped = quantize(w, bits=4, group_size=None, clip_search=True)
    err_plain = float(((np.asarray(dequantize(plain, jnp.float32)) - w) ** 2).sum())
    err_clip = float(((np.asarray(dequantize(clipped, jnp.float32)) - w) ** 2).sum())
    assert err_clip < err_plain


@pytest.fixture(scope="module")
def fixture_model():
    cfg = load_config(FIXTURE / "config.json")
    doc = open_safetensors(FIXTURE / "model.safetensors")
    params = load_params(doc, cfg, dtype=jnp.float32, max_seq_len=512)
    ev = np.load(FIXTURE / "eval_tokens.npy").astype(np.int32)
    return cfg, params, ev


def test_awq_improves_per_channel_int4(fixture_model):
    cfg, params, ev = fixture_model
    tokens = jnp.asarray(ev[: 8 * 384].reshape(8, 384))
    calib = jnp.asarray(ev[8 * 384 : 12 * 384].reshape(4, 384))

    plain = quantize_params(params, bits=4, group_size=None, act_bits=8)
    awq = awq_quantize_params(params, cfg, calib, bits=4, act_bits=8)

    nll = jax.jit(lambda p, t: token_nll(p, cfg, t))
    ppl_plain = float(np.exp(nll(plain, tokens)))
    ppl_awq = float(np.exp(nll(awq, tokens)))
    # The mitigation must recover real ground on the true model.
    assert ppl_awq < ppl_plain, (ppl_awq, ppl_plain)
