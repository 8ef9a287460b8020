"""Attention-sinks (rolling) cache tests (reference: nn/cache.h sink_cache)."""

import numpy as np

import jax.numpy as jnp

from metalchat_tpu.cache import KVCache, QuantizedKVCache, roll_kv_cache
from metalchat_tpu.engine import generate_stream
from metalchat_tpu.models import init_random_params
from metalchat_tpu.sampling import SamplerConfig

from test_model import TINY_LLAMA


def test_roll_kv_cache_layout():
    cfg = TINY_LLAMA
    cache = KVCache.create(cfg, 1, 16, dtype=jnp.float32)
    # Fill slot s with value s along the position axis.
    k = jnp.broadcast_to(
        jnp.arange(16, dtype=jnp.float32)[None, None, None, :, None], cache.k.shape
    )
    cache = KVCache(k=k, v=k)
    rolled = roll_kv_cache(cache, num_sink=2, shift=4)
    got = np.asarray(rolled.k)[0, 0, 0, :, 0]
    # sinks [0,1] kept; [6..15] moved to [2..11]; tail zeroed
    expect = np.array([0, 1, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 0, 0, 0, 0], np.float32)
    np.testing.assert_array_equal(got, expect)


def test_roll_quantized_cache():
    cfg = TINY_LLAMA
    cache = QuantizedKVCache.create(cfg, 1, 8)
    rolled = roll_kv_cache(cache, num_sink=1, shift=2)
    assert rolled.k.shape == cache.k.shape
    assert rolled.k_scale.dtype == cache.k_scale.dtype


def test_generation_past_cache_length():
    """With sink_tokens set, streaming decode runs past the cache window."""
    cfg = TINY_LLAMA
    params = init_random_params(cfg, seed=71, dtype=jnp.float32)
    cache = KVCache.create(cfg, 1, 16, dtype=jnp.float32)
    tokens = list(
        generate_stream(params, cfg, [1, 2, 3, 4], max_new_tokens=40,
                        sampler=SamplerConfig.greedy(), cache=cache, sink_tokens=2)
    )
    assert len(tokens) == 40  # 4 + 40 >> 16-slot cache

    # Without sinks the stream stops at the window.
    cache = KVCache.create(cfg, 1, 16, dtype=jnp.float32)
    tokens = list(
        generate_stream(params, cfg, [1, 2, 3, 4], max_new_tokens=40,
                        sampler=SamplerConfig.greedy(), cache=cache)
    )
    assert len(tokens) < 40
