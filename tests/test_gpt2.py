"""GPT-2 family tests with a *cross-framework* oracle: HuggingFace
transformers' GPT2LMHeadModel (torch CPU, random weights) must produce the
same logits through our loader + forward."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from metalchat_tpu.cache import KVCache
from metalchat_tpu.config import GPT2Config, config_from_dict
from metalchat_tpu.io.loaders import load_gpt2_params
from metalchat_tpu.io.safetensors import SafetensorsDocument, save_safetensors
from metalchat_tpu.models import forward, init_random_params

GPT2_TINY = {
    "architectures": ["GPT2LMHeadModel"],
    "model_type": "gpt2",
    "n_embd": 48,
    "n_head": 4,
    "n_layer": 2,
    "n_positions": 64,
    "n_inner": None,
    "vocab_size": 120,
    "layer_norm_epsilon": 1e-5,
    "bos_token_id": 119,
    "eos_token_id": 119,
}


def test_gpt2_config():
    cfg = config_from_dict(GPT2_TINY)
    assert isinstance(cfg, GPT2Config)
    assert cfg.norm_type == "layernorm"
    assert cfg.position_embedding == "learned"
    assert cfg.ffn_type == "mlp" and cfg.use_bias
    assert cfg.intermediate_size == 4 * 48
    assert cfg.num_kv_heads == cfg.num_heads


@pytest.fixture(scope="module")
def hf_gpt2(tmp_path_factory):
    torch = pytest.importorskip("torch")
    from transformers import GPT2Config as HFConfig, GPT2LMHeadModel

    hf_cfg = HFConfig(
        vocab_size=120, n_positions=64, n_embd=48, n_layer=2, n_head=4,
        activation_function="gelu_new", resid_pdrop=0.0, embd_pdrop=0.0,
        attn_pdrop=0.0,
    )
    torch.manual_seed(0)
    model = GPT2LMHeadModel(hf_cfg).eval()
    tensors = {
        name.replace("transformer.", ""): param.detach().numpy()
        for name, param in model.state_dict().items()
        if not name.endswith(".attn.bias") and not name.endswith(".attn.masked_bias")
    }
    path = tmp_path_factory.mktemp("gpt2") / "model.safetensors"
    save_safetensors(path, tensors)
    return model, path


def test_gpt2_matches_transformers(hf_gpt2):
    torch = pytest.importorskip("torch")
    model, path = hf_gpt2
    cfg = config_from_dict(GPT2_TINY)
    params = load_gpt2_params(SafetensorsDocument.open(path), cfg, dtype=jnp.float32)

    tokens = np.array([[5, 17, 42, 99, 3, 7]], np.int64)
    with torch.no_grad():
        expect = model(torch.from_numpy(tokens)).logits.numpy()

    cache = KVCache.create(cfg, 1, 16, dtype=jnp.float32)
    logits, _ = jax.jit(forward, static_argnames="config")(
        params, cache, jnp.asarray(tokens, jnp.int32), 0, config=cfg
    )
    np.testing.assert_allclose(np.asarray(logits), expect, rtol=2e-3, atol=2e-3)


def test_gpt2_incremental_decode(hf_gpt2):
    """KV-cached decode equals one-shot prefill for the GPT-2 arch too."""
    _, path = hf_gpt2
    cfg = config_from_dict(GPT2_TINY)
    params = load_gpt2_params(SafetensorsDocument.open(path), cfg, dtype=jnp.float32)
    tokens = jnp.asarray([[5, 17, 42, 99]], jnp.int32)
    step = jax.jit(forward, static_argnames="config")

    full, _ = step(params, KVCache.create(cfg, 1, 16, dtype=jnp.float32),
                   tokens, 0, config=cfg)
    cache = KVCache.create(cfg, 1, 16, dtype=jnp.float32)
    per = []
    for t in range(4):
        lg, cache = step(params, cache, tokens[:, t : t + 1], t, config=cfg)
        per.append(np.asarray(lg[:, 0]))
    np.testing.assert_allclose(np.stack(per, 1), np.asarray(full), rtol=1e-4, atol=1e-4)


def test_gpt2_generate():
    cfg = config_from_dict(GPT2_TINY)
    params = init_random_params(cfg, seed=9, dtype=jnp.float32)
    from metalchat_tpu.engine import generate

    cache = KVCache.create(cfg, 1, 32, dtype=jnp.float32)
    out = generate(params, cfg, jnp.asarray([[1, 2, 3]], jnp.int32),
                   max_new_tokens=5, cache=cache)
    assert np.asarray(out).shape == (1, 5)


def test_gpt2_vocab_merges_parity(tmp_path):
    """vocab.json + merges.txt loader vs HF `tokenizers` ByteLevel BPE."""
    from tokenizers import Tokenizer, models, pre_tokenizers, decoders

    from metalchat_tpu.text.loaders import load_gpt2_vocab
    from metalchat_tpu.text.gpt2 import gpt2_encode

    # Construct a tiny byte-level vocab: 256 bytes + a few merges.
    byte_tokens = [gpt2_encode(bytes([b])) for b in range(256)]
    vocab = {tok: i for i, tok in enumerate(byte_tokens)}
    merges = [("h", "e"), ("l", "l"), ("he", "ll"), ("hell", "o"), ("Ġ", "w")]
    for left, right in merges:
        vocab[left + right] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)

    (tmp_path / "vocab.json").write_text(json.dumps(vocab))
    (tmp_path / "merges.txt").write_text(
        "#version: 0.2\n" + "\n".join(f"{l} {r}" for l, r in merges)
    )

    oracle = Tokenizer(models.BPE.from_file(
        str(tmp_path / "vocab.json"), str(tmp_path / "merges.txt")
    ))
    oracle.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    oracle.decoder = decoders.ByteLevel()

    ours = load_gpt2_vocab(tmp_path / "vocab.json", tmp_path / "merges.txt")
    for text in ["hello world", "he llo", "x", "  spaces  ", "héllo"]:
        assert ours.encode(text) == oracle.encode(text).ids, text
