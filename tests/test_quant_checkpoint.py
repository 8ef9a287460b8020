"""Quantized checkpoint round-trips (native + reference QLoRA dialect)."""

import numpy as np

import jax
import jax.numpy as jnp

from metalchat_tpu.cache import KVCache
from metalchat_tpu.io.safetensors import SafetensorsDocument, save_safetensors
from metalchat_tpu.models import forward, init_random_params
from metalchat_tpu.quant import LoraLinear, QuantizedTensor, quantize_params
from metalchat_tpu.quant.checkpoint import (
    export_quantized,
    load_quantized,
    load_reference_qlora,
)

from test_model import TINY_LLAMA


def _logits(params, cfg, tokens):
    cache = KVCache.create(cfg, 1, 16, dtype=jnp.float32)
    out, _ = jax.jit(forward, static_argnames="config")(
        params, cache, tokens, 0, config=cfg
    )
    return np.asarray(out)


def test_native_roundtrip(tmp_path):
    cfg = TINY_LLAMA.replace(tie_word_embeddings=False)
    params = init_random_params(cfg, seed=21, dtype=jnp.float32)
    qparams = quantize_params(params, bits=4, group_size=8, quantize_lm_head=True,
                              quantize_embed=True)
    tensors, meta = export_quantized(qparams, cfg)
    path = tmp_path / "model.q.safetensors"
    save_safetensors(path, tensors, metadata=meta)

    doc = SafetensorsDocument.open(path)
    assert doc.metadata["bits"] == "4"
    loaded = load_quantized(doc, cfg, dtype=jnp.float32)
    assert isinstance(loaded["layers"]["wq"], QuantizedTensor)
    assert loaded["layers"]["wq"].bits == 4

    tokens = jnp.asarray([[7, 3, 9, 1]], jnp.int32)
    np.testing.assert_allclose(
        _logits(loaded, cfg, tokens), _logits(qparams, cfg, tokens), rtol=1e-4, atol=1e-4
    )


def test_reference_qlora_dialect(tmp_path):
    """Build a checkpoint in the reference's internal QLoRA naming and load it."""
    cfg = TINY_LLAMA.replace(tie_word_embeddings=False)
    rng = np.random.default_rng(5)
    L, H, F = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size
    nh, nkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    g, rank = 8, 4

    def qw(out_dim, in_dim):
        q = rng.integers(-127, 128, (out_dim, in_dim)).astype(np.int8)
        s = (rng.random((out_dim, in_dim // g)) * 0.01 + 0.001).astype(np.float32)
        return q, s

    tensors = {}
    dims = {
        "attention.wq": (nh * hd, H), "attention.wk": (nkv * hd, H),
        "attention.wv": (nkv * hd, H), "attention.wo": (H, nh * hd),
        "feed_forward.w1": (F, H), "feed_forward.w2": (H, F), "feed_forward.w3": (F, H),
    }
    for i in range(L):
        for name, (o, inn) in dims.items():
            q, s = qw(o, inn)
            p = f"layers.{i}.{name}"
            tensors[p + ".weight"] = q
            tensors[p + ".scales"] = s
            tensors[p + ".adaptor.A.weight"] = rng.standard_normal((rank, inn)).astype(np.float32) * 0.01
            tensors[p + ".adaptor.B.weight"] = rng.standard_normal((o, rank)).astype(np.float32) * 0.01
        tensors[f"layers.{i}.attention_norm.weight"] = np.ones(H, np.float32)
        tensors[f"layers.{i}.ffn_norm.weight"] = np.ones(H, np.float32)
    eq = rng.integers(-127, 128, (cfg.vocab_size, H)).astype(np.int8)
    es = (rng.random((cfg.vocab_size, H // g)) * 0.01 + 0.001).astype(np.float32)
    tensors["tok_embeddings.weight"] = eq
    tensors["tok_embeddings.scales"] = es
    oq, os_ = qw(cfg.vocab_size, H)
    tensors["output.weight"] = oq
    tensors["output.scales"] = os_
    tensors["norm.weight"] = np.ones(H, np.float32)

    path = tmp_path / "qlora.safetensors"
    save_safetensors(path, tensors)
    doc = SafetensorsDocument.open(path)
    params = load_reference_qlora(doc, cfg, group_size=g, dtype=jnp.float32)

    wq = params["layers"]["wq"]
    assert isinstance(wq, LoraLinear) and wq.scale == 2.0
    assert wq.base.q.shape == (L, H, nh * hd)          # transposed to [in, out]
    assert wq.base.scales.shape == (L, H // g, nh * hd)
    assert wq.a.shape == (L, H, rank) and wq.b.shape == (L, rank, nh * hd)
    assert isinstance(params["lm_head"], QuantizedTensor)

    # Forward runs and produces finite logits.
    tokens = jnp.asarray([[1, 2, 3]], jnp.int32)
    out = _logits(params, cfg, tokens)
    assert np.isfinite(out).all()

    # Dequantized wq row 0 must equal q·scale of the source checkpoint.
    from metalchat_tpu.quant import dequantize
    deq = np.asarray(dequantize(wq.base, jnp.float32))[0]   # [in, out]
    src_q = tensors["layers.0.attention.wq.weight"].astype(np.float32)  # [out, in]
    src_s = np.repeat(tensors["layers.0.attention.wq.scales"], g, axis=1)  # [out, in]
    np.testing.assert_allclose(deq, (src_q * src_s).T, rtol=1e-6, atol=1e-7)


def test_tied_output_uses_quantized_embedding(tmp_path):
    cfg = TINY_LLAMA
    rng = np.random.default_rng(6)
    g = 8
    L, H = cfg.num_layers, cfg.hidden_size
    nh, nkv, hd, F = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim, cfg.intermediate_size
    tensors = {}
    dims = {
        "attention.wq": (nh * hd, H), "attention.wk": (nkv * hd, H),
        "attention.wv": (nkv * hd, H), "attention.wo": (H, nh * hd),
        "feed_forward.w1": (F, H), "feed_forward.w2": (H, F), "feed_forward.w3": (F, H),
    }
    for i in range(L):
        for name, (o, inn) in dims.items():
            p = f"layers.{i}.{name}"
            tensors[p + ".weight"] = rng.integers(-8, 8, (o, inn)).astype(np.int8)
            tensors[p + ".scales"] = np.ones((o, inn // g), np.float32) * 0.01
            tensors[p + ".adaptor.A.weight"] = np.zeros((2, inn), np.float32)
            tensors[p + ".adaptor.B.weight"] = np.zeros((o, 2), np.float32)
        tensors[f"layers.{i}.attention_norm.weight"] = np.ones(H, np.float32)
        tensors[f"layers.{i}.ffn_norm.weight"] = np.ones(H, np.float32)
    tensors["tok_embeddings.weight"] = rng.integers(-8, 8, (cfg.vocab_size, H)).astype(np.int8)
    tensors["tok_embeddings.scales"] = np.ones((cfg.vocab_size, H // g), np.float32) * 0.01
    tensors["norm.weight"] = np.ones(H, np.float32)

    path = tmp_path / "tied.safetensors"
    save_safetensors(path, tensors)
    params = load_reference_qlora(SafetensorsDocument.open(path), cfg, group_size=g,
                                  dtype=jnp.float32)
    lm = params["lm_head"]
    assert isinstance(lm, QuantizedTensor)
    assert lm.q.shape == (H, cfg.vocab_size)
    out = _logits(params, cfg, jnp.asarray([[1, 2]], jnp.int32))
    assert np.isfinite(out).all()
