"""Flash prefill attention kernel vs XLA reference (interpret mode)."""

import numpy as np
import pytest

import jax.numpy as jnp

from metalchat_tpu.ops import xla as xops
from metalchat_tpu.ops.flash_attention_pallas import flash_attention


def _mk(b, s, t, nh, nkv, hd, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, s, nh, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, nkv, t, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, nkv, t, hd)), jnp.float32)
    return q, k, v


def _ref(q, k, v, start, scale, window=None):
    b, s, nh, hd = q.shape
    t = k.shape[2]
    positions = jnp.asarray(np.arange(start, start + s)[None].repeat(b, 0), jnp.int32)
    mask = xops.causal_mask(positions, t, start + s, window)
    return np.asarray(xops.attention(q, k, v, mask, scale=scale))


def test_prefill_from_zero():
    q, k, v = _mk(2, 64, 64, 8, 4, 32)
    got = np.asarray(
        flash_attention(q, k, v, 0, scale=0.125, block_q=16, block_k=16, interpret=True)
    )
    np.testing.assert_allclose(got, _ref(q, k, v, 0, 0.125), rtol=2e-5, atol=2e-5)


def test_chunked_prefill_with_history():
    """q chunk starts mid-cache; history tokens must be attended."""
    b, s, t = 1, 32, 128
    q, k, v = _mk(b, s, t, 4, 2, 16, seed=1)
    start = 48
    got = np.asarray(
        flash_attention(q, k, v, start, scale=0.2, block_q=16, block_k=32, interpret=True)
    )
    np.testing.assert_allclose(got, _ref(q, k, v, start, 0.2), rtol=2e-5, atol=2e-5)


def test_sliding_window_prefill():
    q, k, v = _mk(1, 64, 64, 2, 2, 16, seed=2)
    got = np.asarray(
        flash_attention(q, k, v, 0, scale=0.2, window=16, block_q=16, block_k=16,
                        interpret=True)
    )
    np.testing.assert_allclose(got, _ref(q, k, v, 0, 0.2, window=16), rtol=2e-5, atol=2e-5)


def test_kv_len_restriction():
    """kv_len trims the scanned cache (grid shrinks, results identical)."""
    q, k, v = _mk(1, 32, 256, 4, 4, 16, seed=3)
    full = np.asarray(
        flash_attention(q, k, v, 0, scale=0.1, block_q=16, block_k=32, interpret=True)
    )
    trimmed = np.asarray(
        flash_attention(q, k, v, 0, scale=0.1, block_q=16, block_k=32, kv_len=64,
                        interpret=True)
    )
    np.testing.assert_allclose(trimmed, full, rtol=1e-6, atol=1e-6)
