"""Perplexity harness + profiling utils tests."""

import numpy as np

import jax.numpy as jnp

from metalchat_tpu.models import init_random_params
from metalchat_tpu.quant import quantize_params
from metalchat_tpu.quant.ppl import perplexity, perplexity_delta, token_nll
from metalchat_tpu.utils import Meter, get_logger, named_scope

from test_model import TINY_LLAMA


def test_perplexity_uniform_bound():
    """A random model's ppl is near vocab size; a peaked one is lower."""
    cfg = TINY_LLAMA
    params = init_random_params(cfg, seed=50, dtype=jnp.float32)
    tokens = np.random.default_rng(0).integers(0, cfg.vocab_size, (2, 24))
    ppl = perplexity(params, cfg, tokens)
    assert 0 < ppl < 10 * cfg.vocab_size
    # Masked scoring restricted to a subset changes the value.
    mask = np.zeros((2, 23), bool)
    mask[:, :5] = True
    ppl_masked = perplexity(params, cfg, tokens, jnp.asarray(mask))
    assert ppl_masked != ppl


def test_ppl_delta_int8_small():
    """INT8 quantization must not blow up perplexity (BASELINE config 2)."""
    cfg = TINY_LLAMA
    params = init_random_params(cfg, seed=51, dtype=jnp.float32)
    qparams = quantize_params(params, bits=8, group_size=8)
    batches = [np.random.default_rng(i).integers(0, cfg.vocab_size, (1, 16))
               for i in range(2)]
    report = perplexity_delta(params, qparams, cfg, batches)
    assert set(report) == {"reference", "candidate", "delta", "delta_pct"}
    assert abs(report["delta_pct"]) < 5.0


def test_meter():
    m = Meter()
    m.start()
    m.record_request(0.1, 10)
    m.record_request(0.3, 20)
    m.record_request(None, 5)
    m.stop()
    s = m.summary()
    assert s["requests"] == 3 and s["total_tokens"] == 35
    assert s["ttft_p50"] in (0.1, 0.3)
    assert "tokens_per_sec" in s


def test_named_scope_and_logger():
    logger = get_logger("test")
    logger.info("hello")
    with named_scope("layer0"):
        x = jnp.ones(3) + 1
    assert float(x[0]) == 2.0
