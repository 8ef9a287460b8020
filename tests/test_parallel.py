"""Mesh/sharding tests on the 8-device CPU mesh (the fake backend the
reference lacks — SURVEY.md §4 TPU-build implication (a))."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from metalchat_tpu.cache import KVCache
from metalchat_tpu.config import LlamaConfig
from metalchat_tpu.models import forward, init_random_params
from metalchat_tpu.parallel import make_mesh, shard_cache, shard_params

TP_CFG = LlamaConfig(
    vocab_size=128,
    hidden_size=64,
    intermediate_size=128,
    num_layers=2,
    num_heads=8,
    num_kv_heads=4,
    head_dim=8,
    rope_theta=10000.0,
    max_seq_len=64,
    tie_word_embeddings=False,
)


def test_make_mesh_shapes(cpu_devices):
    mesh = make_mesh(tp=4, dp=2)
    assert mesh.shape == {"dp": 2, "tp": 4}
    mesh = make_mesh()  # all devices on tp
    assert mesh.shape == {"dp": 1, "tp": 8}
    with pytest.raises(ValueError):
        make_mesh(tp=3, dp=2)


def test_tp_divisibility_guard(cpu_devices):
    mesh = make_mesh(tp=8, dp=1)
    cfg = TP_CFG.replace(num_heads=6, num_kv_heads=3)
    params = init_random_params(cfg, dtype=jnp.float32)
    with pytest.raises(ValueError, match="num_heads"):
        shard_params(params, cfg, mesh)


@pytest.mark.parametrize("tp,dp", [(4, 2), (8, 1), (2, 2)])
def test_sharded_forward_matches_single_device(cpu_devices, tp, dp):
    """TP+DP sharded forward must be numerically identical to unsharded."""
    cfg = TP_CFG
    params = init_random_params(cfg, seed=3, dtype=jnp.float32)
    tokens = jnp.asarray(np.random.default_rng(0).integers(0, 128, (2, 6)), jnp.int32)

    cache = KVCache.create(cfg, 2, 16, dtype=jnp.float32)
    ref_logits, ref_cache = jax.jit(forward, static_argnames="config")(
        params, cache, tokens, 0, config=cfg
    )

    mesh = make_mesh(tp=tp, dp=dp, devices=cpu_devices[: tp * dp])
    sharded_params = shard_params(params, cfg, mesh)
    sharded_cache = shard_cache(KVCache.create(cfg, 2, 16, dtype=jnp.float32), mesh)
    logits, new_cache = jax.jit(forward, static_argnames="config")(
        sharded_params, sharded_cache, tokens, 0, config=cfg
    )
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(new_cache.k), np.asarray(ref_cache.k), rtol=2e-5, atol=2e-5
    )
    # Weights must actually be distributed: each shard holds 1/tp of wq.
    wq = sharded_params["layers"]["wq"]
    assert len(wq.sharding.device_set) == tp * dp
    shard_shape = wq.sharding.shard_shape(wq.shape)
    assert shard_shape[-1] == wq.shape[-1] // tp


def test_sharded_decode_steps(cpu_devices):
    """Prefill + decode steps run under sharding and match unsharded decode."""
    cfg = TP_CFG
    params = init_random_params(cfg, seed=5, dtype=jnp.float32)
    prompt = jnp.asarray([[3, 1, 4, 1, 5]], jnp.int32)

    from metalchat_tpu.engine import generate

    cache = KVCache.create(cfg, 1, 16, dtype=jnp.float32)
    ref = np.asarray(generate(params, cfg, prompt, max_new_tokens=5, cache=cache))

    mesh = make_mesh(tp=4, dp=1, devices=cpu_devices[:4])
    sp = shard_params(params, cfg, mesh)
    sc = shard_cache(KVCache.create(cfg, 1, 16, dtype=jnp.float32), mesh)
    got = np.asarray(generate(sp, cfg, prompt, max_new_tokens=5, cache=sc))
    np.testing.assert_array_equal(got, ref)
