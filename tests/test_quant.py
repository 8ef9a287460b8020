"""Quantization tests (reference: test_quantization.cc:63-99 QLoRA inference;
here weight-free with exactness checks against the dequantized dense path)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from metalchat_tpu.cache import KVCache
from metalchat_tpu.models import forward, init_random_params
from metalchat_tpu.quant import (
    LoraLinear,
    QuantizedTensor,
    dequantize,
    linear,
    lookup_embedding,
    quant_matmul,
    quantize,
    quantize_params,
)
from metalchat_tpu.quant.quantize import _pack_int4, _unpack_int4

from test_model import TINY_LLAMA


def _w(shape, seed=0):
    return np.random.default_rng(seed).standard_normal(shape).astype(np.float32)


def test_int4_pack_unpack_exact():
    rng = np.random.default_rng(1)
    w4 = rng.integers(-8, 8, (64, 16)).astype(np.int8)
    packed = _pack_int4(w4)
    assert packed.shape == (32, 16)
    unpacked = np.asarray(_unpack_int4(jnp.asarray(packed)))
    np.testing.assert_array_equal(unpacked, w4)


@pytest.mark.parametrize("bits,tol", [(8, 0.006), (4, 0.1)])
def test_quantize_dequantize_error(bits, tol):
    w = _w((128, 64))
    qt = quantize(w, bits=bits, group_size=32)
    deq = np.asarray(dequantize(qt, jnp.float32))
    err = np.abs(deq - w).max() / np.abs(w).max()
    assert err < tol
    # scale shape: one per (group, out)
    assert qt.scales.shape == (128 // 32, 64)


@pytest.mark.parametrize("bits", [8, 4])
def test_quant_matmul_exact_vs_dequant(bits):
    """The fused groupwise contraction must equal dequant-then-matmul."""
    w = _w((64, 48), seed=2)
    x = jnp.asarray(_w((5, 64), seed=3))
    qt = quantize(w, bits=bits, group_size=16)
    fused = np.asarray(quant_matmul(x, qt))
    deq = np.asarray(x @ dequantize(qt, jnp.float32))
    np.testing.assert_allclose(fused, deq, rtol=2e-5, atol=2e-5)


def test_lora_linear():
    w = _w((32, 24), seed=4)
    qt = quantize(w, bits=8, group_size=8)
    a = jnp.asarray(_w((32, 4), seed=5))
    b = jnp.asarray(_w((4, 24), seed=6))
    x = jnp.asarray(_w((3, 32), seed=7))
    ll = LoraLinear(base=qt, a=a, b=b, scale=2.0)
    got = np.asarray(linear(x, ll))
    expect = np.asarray(quant_matmul(x, qt)) + 2.0 * np.asarray((x @ a) @ b)
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-5)


def test_quantized_embedding_lookup():
    embed = _w((50, 32), seed=8)
    params = {"embed": jnp.asarray(embed), "layers": {}, "lm_head": None}
    qp = quantize_params(
        {"embed": jnp.asarray(embed), "layers": {}, "lm_head": jnp.zeros((2, 2))},
        bits=8, group_size=8, targets=(), quantize_embed=True,
    )
    tokens = jnp.asarray([[0, 7, 49]])
    got = np.asarray(lookup_embedding(tokens, qp["embed"]), np.float32)
    np.testing.assert_allclose(got, embed[np.asarray(tokens)], rtol=0.02, atol=0.02)


@pytest.mark.parametrize("bits", [8, 4])
def test_quantized_model_forward(bits):
    """INT8/INT4 model produces logits close to dense; same greedy tokens."""
    cfg = TINY_LLAMA
    params = init_random_params(cfg, seed=9, dtype=jnp.float32)
    qparams = quantize_params(params, bits=bits, group_size=8)
    assert isinstance(qparams["layers"]["wq"], QuantizedTensor)
    # Stacked layer axis preserved.
    assert qparams["layers"]["wq"].q.shape[0] == cfg.num_layers

    tokens = jnp.asarray([[3, 1, 4, 1, 5, 9, 2, 6]], jnp.int32)
    step = jax.jit(forward, static_argnames="config")
    dense, _ = step(params, KVCache.create(cfg, 1, 16, dtype=jnp.float32), tokens, 0, config=cfg)
    quant, _ = step(qparams, KVCache.create(cfg, 1, 16, dtype=jnp.float32), tokens, 0, config=cfg)
    dense, quant = np.asarray(dense), np.asarray(quant)
    rel = np.abs(quant - dense).max() / np.abs(dense).max()
    assert rel < (0.05 if bits == 8 else 0.4)
    np.testing.assert_array_equal(quant[:, -1].argmax(-1), dense[:, -1].argmax(-1))


def test_quantize_rejects_bad_args():
    with pytest.raises(ValueError, match="bits"):
        quantize(_w((8, 8)), bits=3)
    with pytest.raises(ValueError, match="divisible"):
        quantize(_w((10, 8)), bits=8, group_size=4)
