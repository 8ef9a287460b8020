"""Model forward tests against the independent numpy oracle.

The analog of the reference's integration decode tests (test_llama.cc,
test_gemma.cc) but weight-free: random small models, exact-math oracle
(BASELINE.md config 1: token-exact numerics oracle on the CPU path).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from metalchat_tpu.cache import KVCache, QuantizedKVCache
from metalchat_tpu.config import Gemma3Config, LlamaConfig, RopeScaling
from metalchat_tpu.io.loaders import load_params, permute_qk_meta_to_hf, save_params
from metalchat_tpu.io.safetensors import SafetensorsDocument, save_safetensors
from metalchat_tpu.models import forward, init_random_params

import oracle

TINY_LLAMA = LlamaConfig(
    vocab_size=97,
    hidden_size=32,
    intermediate_size=64,
    num_layers=3,
    num_heads=4,
    num_kv_heads=2,
    head_dim=8,
    rope_theta=10000.0,
    max_seq_len=64,
    tie_word_embeddings=True,
)

TINY_GEMMA = Gemma3Config(
    vocab_size=89,
    hidden_size=24,
    intermediate_size=48,
    num_layers=4,
    num_heads=2,
    num_kv_heads=1,
    head_dim=12,
    rope_theta=1_000_000.0,
    rope_local_theta=10_000.0,
    sliding_window=8,
    sliding_window_pattern=2,
    max_seq_len=64,
    norm_weight_offset=1.0,
    use_qk_norm=True,
    use_post_norms=True,
    embedding_scale=24**0.5,
    hidden_act="gelu_tanh",
    query_scale=0.1,
)


def _params_and_tensors(cfg, seed=0):
    params = init_random_params(cfg, seed=seed, dtype=jnp.float32)
    tensors = save_params(params, cfg)
    return params, tensors


@pytest.mark.parametrize("cfg", [TINY_LLAMA, TINY_GEMMA], ids=["llama", "gemma3"])
def test_prefill_matches_oracle(cfg):
    params, tensors = _params_and_tensors(cfg)
    tokens = np.array([[3, 14, 15, 88, 65, 35], [8, 9, 7, 9, 3, 2]], np.int32)
    cache = KVCache.create(cfg, batch_size=2, max_seq_len=32, dtype=jnp.float32)
    logits, _ = jax.jit(forward, static_argnames="config")(
        params, cache, jnp.asarray(tokens), 0, config=cfg
    )
    expect = oracle.forward(tensors, cfg, tokens)
    np.testing.assert_allclose(np.asarray(logits), expect, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("cfg", [TINY_LLAMA, TINY_GEMMA], ids=["llama", "gemma3"])
def test_incremental_decode_matches_prefill(cfg):
    """KV-cache path: feeding tokens one at a time must equal one prefill."""
    params, _ = _params_and_tensors(cfg, seed=1)
    tokens = np.array([[5, 11, 2, 33, 8]], np.int32)
    step = jax.jit(forward, static_argnames="config")

    cache = KVCache.create(cfg, 1, 16, dtype=jnp.float32)
    full_logits, _ = step(params, cache, jnp.asarray(tokens), 0, config=cfg)

    cache = KVCache.create(cfg, 1, 16, dtype=jnp.float32)
    per_step = []
    for t in range(tokens.shape[1]):
        logits, cache = step(params, cache, jnp.asarray(tokens[:, t : t + 1]), t, config=cfg)
        per_step.append(np.asarray(logits[:, 0]))
    np.testing.assert_allclose(
        np.stack(per_step, axis=1), np.asarray(full_logits), rtol=1e-4, atol=1e-4
    )


def test_chunked_prefill_matches_full():
    """Prefill in two chunks (engine-style) equals one-shot prefill."""
    cfg = TINY_LLAMA
    params, _ = _params_and_tensors(cfg, seed=2)
    tokens = jnp.asarray(np.array([[1, 2, 3, 4, 5, 6, 7, 8]], np.int32))
    step = jax.jit(forward, static_argnames="config")

    cache = KVCache.create(cfg, 1, 16, dtype=jnp.float32)
    full, _ = step(params, cache, tokens, 0, config=cfg)

    cache = KVCache.create(cfg, 1, 16, dtype=jnp.float32)
    a, cache = step(params, cache, tokens[:, :5], 0, config=cfg)
    b, cache = step(params, cache, tokens[:, 5:], 5, config=cfg)
    np.testing.assert_allclose(
        np.concatenate([np.asarray(a), np.asarray(b)], axis=1),
        np.asarray(full),
        rtol=1e-4,
        atol=1e-4,
    )


def test_quantized_kv_cache_close_to_dense():
    cfg = TINY_LLAMA
    params, _ = _params_and_tensors(cfg, seed=3)
    tokens = jnp.asarray(np.array([[4, 8, 15, 16, 23, 42]], np.int32))
    step = jax.jit(forward, static_argnames="config")

    dense, _ = step(params, KVCache.create(cfg, 1, 16, dtype=jnp.float32),
                    tokens, 0, config=cfg)
    quant, _ = step(params, QuantizedKVCache.create(cfg, 1, 16), tokens, 0, config=cfg)
    dense, quant = np.asarray(dense), np.asarray(quant)
    # int8 KV introduces ~1% relative error; logits must stay close and the
    # greedy token identical on a random model.
    np.testing.assert_allclose(quant, dense, rtol=0.1, atol=0.1)
    np.testing.assert_array_equal(quant.argmax(-1), dense.argmax(-1))


def test_gemma_sliding_window_matters():
    """Positions beyond the sliding window must be ignored on local layers."""
    cfg = TINY_GEMMA.replace(sliding_window=4, sliding_window_pattern=999)  # all local
    params, tensors = _params_and_tensors(cfg, seed=4)
    tokens = np.array([[1, 2, 3, 4, 5, 6, 7, 8, 9, 10]], np.int32)
    cache = KVCache.create(cfg, 1, 32, dtype=jnp.float32)
    logits, _ = jax.jit(forward, static_argnames="config")(
        params, cache, jnp.asarray(tokens), 0, config=cfg
    )
    expect = oracle.forward(tensors, cfg, tokens)
    np.testing.assert_allclose(np.asarray(logits), expect, rtol=2e-4, atol=2e-4)

    # Receptive field with stacking is L*(window-1); with one layer a token
    # outside the window cannot influence the last position's logits.
    cfg1 = cfg.replace(num_layers=1)
    params1, _ = _params_and_tensors(cfg1, seed=4)

    def last_logits(toks):
        cache = KVCache.create(cfg1, 1, 32, dtype=jnp.float32)
        out, _ = jax.jit(forward, static_argnames="config")(
            params1, cache, jnp.asarray(toks), 0, config=cfg1
        )
        return np.asarray(out)[:, -1]

    tokens2 = tokens.copy()
    tokens2[0, 0] = 77
    np.testing.assert_allclose(last_logits(tokens), last_logits(tokens2), rtol=1e-5, atol=1e-5)
    # ...and perturbing inside the window must change them.
    tokens3 = tokens.copy()
    tokens3[0, -2] = 77
    assert np.abs(last_logits(tokens) - last_logits(tokens3)).max() > 1e-4


def test_checkpoint_roundtrip(tmp_path):
    """save_params → safetensors → load_params reproduces the forward."""
    cfg = TINY_LLAMA.replace(tie_word_embeddings=False)
    params, tensors = _params_and_tensors(cfg, seed=5)
    path = tmp_path / "model.safetensors"
    save_safetensors(path, {k: np.asarray(v, np.float32) for k, v in tensors.items()})

    doc = SafetensorsDocument.open(path)
    loaded = load_params(doc, cfg, dtype=jnp.float32)

    tokens = jnp.asarray(np.array([[10, 20, 30]], np.int32))
    step = jax.jit(forward, static_argnames="config")
    a, _ = step(params, KVCache.create(cfg, 1, 8, dtype=jnp.float32), tokens, 0, config=cfg)
    b, _ = step(loaded, KVCache.create(cfg, 1, 8, dtype=jnp.float32), tokens, 0, config=cfg)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_meta_checkpoint_load(tmp_path):
    """Meta-format names + interleaved rope layout load to the same params."""
    cfg = TINY_LLAMA
    params, tensors = _params_and_tensors(cfg, seed=6)

    def hf_to_meta_qk(w, heads):  # inverse of permute_qk_meta_to_hf
        out_dim, in_dim = w.shape
        hd = out_dim // heads
        return (
            w.reshape(heads, 2, hd // 2, in_dim).transpose(0, 2, 1, 3).reshape(out_dim, in_dim)
        )

    meta = {}
    for name, arr in tensors.items():
        arr = np.asarray(arr, np.float32)
        m = name
        m = m.replace("model.embed_tokens.weight", "tok_embeddings.weight")
        m = m.replace("model.norm.weight", "norm.weight")
        if ".self_attn.q_proj." in m:
            arr = hf_to_meta_qk(arr, cfg.num_heads)
        if ".self_attn.k_proj." in m:
            arr = hf_to_meta_qk(arr, cfg.num_kv_heads)
        m = (
            m.replace("model.layers.", "layers.")
            .replace("self_attn.q_proj", "attention.wq")
            .replace("self_attn.k_proj", "attention.wk")
            .replace("self_attn.v_proj", "attention.wv")
            .replace("self_attn.o_proj", "attention.wo")
            .replace("mlp.gate_proj", "feed_forward.w1")
            .replace("mlp.down_proj", "feed_forward.w2")
            .replace("mlp.up_proj", "feed_forward.w3")
            .replace("input_layernorm", "attention_norm")
            .replace("post_attention_layernorm", "ffn_norm")
        )
        meta[m] = arr
    path = tmp_path / "consolidated.00.safetensors"
    save_safetensors(path, meta)

    doc = SafetensorsDocument.open(path)
    loaded = load_params(doc, cfg, dtype=jnp.float32, source="meta")
    for key in ("wq", "wk", "wv", "wo"):
        np.testing.assert_allclose(
            np.asarray(loaded["layers"][key]),
            np.asarray(params["layers"][key]),
            rtol=1e-6, atol=1e-7,
        )


def test_permute_qk_roundtrip():
    w = np.random.default_rng(0).standard_normal((16, 8)).astype(np.float32)
    p = permute_qk_meta_to_hf(w, num_heads=2)
    assert p.shape == w.shape
    assert not np.allclose(p, w)
    # involution check via explicit inverse
    hd = 8
    inv = p.reshape(2, 2, hd // 2, 8).transpose(0, 2, 1, 3).reshape(16, 8)
    np.testing.assert_array_equal(inv, w)
