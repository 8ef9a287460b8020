"""Fused-projection tests: exactness of the QKV / gate-up fusion for dense,
group-quantized, and W4A8 trees, plus TP-sharded fused forward."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from metalchat_tpu.cache import KVCache
from metalchat_tpu.config import GPT2Config, LlamaConfig
from metalchat_tpu.models import forward, init_random_params
from metalchat_tpu.models.fuse import fuse_projections
from metalchat_tpu.quant.quantize import dequantize, quantize_params

CFG = LlamaConfig(
    vocab_size=128,
    hidden_size=64,
    intermediate_size=128,
    num_layers=2,
    num_heads=4,
    num_kv_heads=2,
    head_dim=16,
    rope_theta=10000.0,
    max_seq_len=64,
    tie_word_embeddings=False,
)


def logits_of(params, tokens, cfg=CFG):
    cache = KVCache.create(cfg, tokens.shape[0], 32, dtype=jnp.float32)
    out, _ = jax.jit(forward, static_argnames="config")(
        params, cache, tokens, 0, config=cfg)
    return np.asarray(out)


def tokens_for(cfg=CFG, b=2, s=8, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).integers(0, cfg.vocab_size, (b, s)),
        jnp.int32)


def test_fuse_dense_exact():
    params = init_random_params(CFG, seed=0, dtype=jnp.float32)
    fused = fuse_projections(params, CFG)
    assert "wqkv" in fused["layers"] and "wq" not in fused["layers"]
    assert "w13" in fused["layers"] and "w3" not in fused["layers"]
    t = tokens_for()
    np.testing.assert_allclose(
        logits_of(fused, t), logits_of(params, t), atol=1e-4)


@pytest.mark.parametrize("kw", [
    dict(bits=8, group_size=32),
    dict(bits=4, group_size=32),
    dict(bits=4, group_size=None, act_bits=8),
])
def test_fuse_quantized_exact_vs_unfused(kw):
    params = quantize_params(init_random_params(CFG, seed=1, dtype=jnp.float32), **kw)
    fused = fuse_projections(params, CFG)
    qkv = fused["layers"]["wqkv"]
    # The fused dequantized weight is exactly the concat of the parts.
    parts = [dequantize(params["layers"][n], jnp.float32) for n in ("wq", "wk", "wv")]
    np.testing.assert_array_equal(
        np.asarray(dequantize(qkv, jnp.float32)),
        np.concatenate([np.asarray(p) for p in parts], axis=-1))
    t = tokens_for(seed=2)
    np.testing.assert_allclose(
        logits_of(fused, t), logits_of(params, t), atol=2e-3)


def test_fuse_skips_lora():
    from metalchat_tpu.train import attach_lora

    params = attach_lora(init_random_params(CFG, seed=3, dtype=jnp.float32),
                         rank=4, targets=("wq",))
    fused = fuse_projections(params, CFG)
    # wq carries an adaptor → QKV fusion must be skipped, FFN fusion proceeds.
    assert "wqkv" not in fused["layers"] and "wq" in fused["layers"]
    assert "w13" in fused["layers"]


def test_fuse_gpt2_biases():
    cfg = GPT2Config(
        vocab_size=96, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=4, num_kv_heads=4, head_dim=8, max_seq_len=32,
        norm_type="layernorm", position_embedding="learned", ffn_type="mlp",
        use_bias=True, hidden_act="gelu_tanh",
    )
    params = init_random_params(cfg, seed=4, dtype=jnp.float32, max_seq_len=32)
    # give the biases distinguishable values
    params["layers"]["wq_b"] = params["layers"]["wq_b"] + 0.1
    params["layers"]["wk_b"] = params["layers"]["wk_b"] - 0.2
    fused = fuse_projections(params, cfg)
    assert "wqkv" in fused["layers"] and "wqkv_b" in fused["layers"]
    assert "w13" not in fused["layers"]  # mlp ffn keeps w1/w2
    t = tokens_for(cfg, seed=5)
    np.testing.assert_allclose(
        logits_of(fused, t, cfg), logits_of(params, t, cfg), atol=1e-4)


def test_fused_tp_sharded_forward(cpu_devices):
    from metalchat_tpu.parallel import make_mesh, shard_cache, shard_params

    params = fuse_projections(
        init_random_params(CFG, seed=6, dtype=jnp.float32), CFG)
    t = tokens_for(seed=6)
    ref = logits_of(params, t)

    mesh = make_mesh(tp=4, dp=2, devices=cpu_devices)
    sp = shard_params(params, CFG, mesh)
    cache = shard_cache(KVCache.create(CFG, 2, 32, dtype=jnp.float32), mesh)
    got, _ = jax.jit(forward, static_argnames="config")(
        sp, cache, t, 0, config=CFG)
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4)
