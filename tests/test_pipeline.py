"""Pipeline-parallel tests (8-device CPU mesh): the GPipe stage executor
must be exact vs the single-device forward — logits AND every cache slot."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from metalchat_tpu.cache import KVCache, QuantizedKVCache
from metalchat_tpu.config import LlamaConfig
from metalchat_tpu.models import forward, init_random_params
from metalchat_tpu.parallel.pipeline import (
    make_pipeline_forward,
    make_pp_mesh,
    shard_cache_pp,
    shard_params_pp,
)

CFG = LlamaConfig(
    vocab_size=128,
    hidden_size=64,
    intermediate_size=128,
    num_layers=4,
    num_heads=4,
    num_kv_heads=2,
    head_dim=16,
    rope_theta=10000.0,
    max_seq_len=64,
    tie_word_embeddings=False,
)


def ref_step(params, cache, tokens, start_pos):
    return jax.jit(forward, static_argnames="config")(
        params, cache, tokens, start_pos, config=CFG)


@pytest.mark.parametrize("pp,dp,n_mb", [(4, 1, 2), (2, 1, 1), (2, 2, 2)])
def test_pipeline_prefill_matches_forward(cpu_devices, pp, dp, n_mb):
    params = init_random_params(CFG, seed=0, dtype=jnp.float32)
    b, s = 4, 8
    tokens = jnp.asarray(
        np.random.default_rng(0).integers(0, 128, (b, s)), jnp.int32)

    ref_logits, ref_cache = ref_step(
        params, KVCache.create(CFG, b, 32, dtype=jnp.float32), tokens, 0)

    mesh = make_pp_mesh(pp=pp, dp=dp, devices=cpu_devices[: pp * dp])
    pf = make_pipeline_forward(CFG, mesh, n_microbatches=n_mb)
    got_logits, got_cache = jax.jit(pf)(
        shard_params_pp(params, mesh),
        shard_cache_pp(KVCache.create(CFG, b, 32, dtype=jnp.float32), mesh),
        tokens, jnp.asarray(0, jnp.int32),
    )
    np.testing.assert_allclose(np.asarray(got_logits), np.asarray(ref_logits),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_cache.k), np.asarray(ref_cache.k),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_cache.v), np.asarray(ref_cache.v),
                               atol=1e-5)


def test_pipeline_decode_with_per_row_offsets(cpu_devices):
    """Prefill through the pipeline, then decode steps with per-row offsets."""
    params = init_random_params(CFG, seed=1, dtype=jnp.float32)
    b = 4
    rng = np.random.default_rng(1)
    prompt = jnp.asarray(rng.integers(0, 128, (b, 6)), jnp.int32)

    mesh = make_pp_mesh(pp=4, dp=1, devices=cpu_devices[:4])
    pf = jax.jit(make_pipeline_forward(CFG, mesh, n_microbatches=2))

    ref_cache = KVCache.create(CFG, b, 32, dtype=jnp.float32)
    ref_logits, ref_cache = ref_step(params, ref_cache, prompt, 0)

    pcache = shard_cache_pp(KVCache.create(CFG, b, 32, dtype=jnp.float32), mesh)
    pparams = shard_params_pp(params, mesh)
    logits, pcache = pf(pparams, pcache, prompt, jnp.asarray(0, jnp.int32))

    next_tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)[:, None]
    offsets = jnp.full((b,), 6, jnp.int32)
    for step in range(3):
        ref_logits, ref_cache = ref_step(params, ref_cache, next_tok, offsets)
        logits, pcache = pf(pparams, pcache, next_tok, offsets)
        np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                                   atol=2e-4)
        next_tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)[:, None]
        offsets = offsets + 1


def test_pipeline_quantized_kv(cpu_devices):
    params = init_random_params(CFG, seed=2, dtype=jnp.float32)
    b, s = 2, 8
    tokens = jnp.asarray(
        np.random.default_rng(2).integers(0, 128, (b, s)), jnp.int32)

    ref_logits, _ = ref_step(
        params, QuantizedKVCache.create(CFG, b, 32), tokens, 0)

    mesh = make_pp_mesh(pp=2, dp=1, devices=cpu_devices[:2])
    pf = make_pipeline_forward(CFG, mesh, n_microbatches=2)
    got_logits, _ = jax.jit(pf)(
        shard_params_pp(params, mesh),
        shard_cache_pp(QuantizedKVCache.create(CFG, b, 32), mesh),
        tokens, jnp.asarray(0, jnp.int32),
    )
    np.testing.assert_allclose(np.asarray(got_logits), np.asarray(ref_logits),
                               atol=2e-4)


def test_pipeline_divisibility_guards(cpu_devices):
    mesh = make_pp_mesh(pp=3, dp=1, devices=cpu_devices[:3])
    with pytest.raises(ValueError, match="not divisible by pp"):
        make_pipeline_forward(CFG, mesh)
