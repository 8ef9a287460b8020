"""Cross-framework logits parity: our forward vs HuggingFace transformers
(torch CPU, random weights) for Llama and Gemma-3 — the strongest available
correctness oracle without real checkpoints."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from metalchat_tpu.cache import KVCache
from metalchat_tpu.config import Gemma3Config, LlamaConfig
from metalchat_tpu.io.loaders import load_params
from metalchat_tpu.io.safetensors import SafetensorsDocument, save_safetensors
from metalchat_tpu.models import forward

torch = pytest.importorskip("torch")


def _save_state(model, path):
    tensors = {
        name: param.detach().numpy()
        for name, param in model.state_dict().items()
        if "rotary_emb" not in name
    }
    save_safetensors(path, tensors)


def _run_ours(cfg, path, tokens, source="hf"):
    params = load_params(SafetensorsDocument.open(path), cfg, dtype=jnp.float32)
    cache = KVCache.create(cfg, 1, tokens.shape[1] + 4, dtype=jnp.float32)
    logits, _ = jax.jit(forward, static_argnames="config")(
        params, cache, jnp.asarray(tokens, jnp.int32), 0, config=cfg
    )
    return np.asarray(logits)


def test_llama_matches_transformers(tmp_path):
    from transformers import LlamaConfig as HFConfig, LlamaForCausalLM

    hf_cfg = HFConfig(
        vocab_size=160, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=64, rope_theta=10000.0,
        rms_norm_eps=1e-5, attention_bias=False, mlp_bias=False,
        tie_word_embeddings=False,
    )
    torch.manual_seed(1)
    model = LlamaForCausalLM(hf_cfg).eval()
    path = tmp_path / "model.safetensors"
    _save_state(model, path)

    cfg = LlamaConfig(
        vocab_size=160, hidden_size=64, intermediate_size=128, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=16, rope_theta=10000.0,
        rope_scaling=None, max_seq_len=64, tie_word_embeddings=False,
    )
    tokens = np.array([[3, 141, 59, 26, 5]], np.int64)
    with torch.no_grad():
        expect = model(torch.from_numpy(tokens)).logits.numpy()
    got = _run_ours(cfg, path, tokens)
    np.testing.assert_allclose(got, expect, rtol=2e-3, atol=2e-3)


def test_gemma3_matches_transformers(tmp_path):
    try:
        from transformers import Gemma3TextConfig, Gemma3ForCausalLM
    except ImportError:
        pytest.skip("transformers lacks Gemma3")

    hf_cfg = Gemma3TextConfig(
        vocab_size=150, hidden_size=48, intermediate_size=96,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=64,
        rope_theta=1_000_000.0, rope_local_base_freq=10_000.0,
        sliding_window=8, sliding_window_pattern=2, rms_norm_eps=1e-6,
        query_pre_attn_scalar=16, attention_bias=False,
        attn_implementation="eager",
    )
    torch.manual_seed(2)
    model = Gemma3ForCausalLM(hf_cfg).eval()
    path = tmp_path / "model.safetensors"
    _save_state(model, path)

    cfg = Gemma3Config(
        vocab_size=150, hidden_size=48, intermediate_size=96, num_layers=4,
        num_heads=4, num_kv_heads=2, head_dim=16,
        rope_theta=1_000_000.0, rope_local_theta=10_000.0,
        sliding_window=8, sliding_window_pattern=2, rms_norm_eps=1e-6,
        max_seq_len=64, tie_word_embeddings=True,
        norm_weight_offset=1.0, use_qk_norm=True, use_post_norms=True,
        embedding_scale=48 ** 0.5, hidden_act="gelu_tanh",
        query_scale=16 ** -0.5,
    )
    tokens = np.array([[7, 23, 149, 42, 3, 11, 90, 2]], np.int64)
    with torch.no_grad():
        expect = model(torch.from_numpy(tokens)).logits.numpy()
    got = _run_ours(cfg, path, tokens)
    np.testing.assert_allclose(got, expect, rtol=5e-3, atol=5e-3)
