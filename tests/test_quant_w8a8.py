"""W8A8 / W4A8 execution scheme tests.

The act_bits=8 scheme runs the contraction as s8×s8→s32 on the MXU with a
single post-scale (per-token activation scale ⊗ per-channel weight scale) —
measured at the HBM read ceiling on v5e (benchmarks/quant_microbench.py).
Correctness contract tested here:
  * bit-exact vs the manual int reference (same xq → same int32 accumulate),
  * close to the float weight-only product (activation-quant error bounded),
  * requantize_per_channel stays within the source tensor's quant envelope,
  * end-to-end model forward with act-quantized params stays close to the
    groupwise-exact forward.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from metalchat_tpu.config import LlamaConfig
from metalchat_tpu.models import forward, init_random_params
from metalchat_tpu.cache import KVCache
from metalchat_tpu.quant.quantize import (
    QuantizedTensor,
    _act_quantize,
    dequantize,
    quant_matmul,
    quantize,
    quantize_params,
    requantize_per_channel,
    with_orientation,
)


def rand_w(k, i, o):
    return np.asarray(jax.random.normal(jax.random.PRNGKey(k), (i, o)) * 0.05)


@pytest.mark.parametrize("bits", [8, 4])
@pytest.mark.parametrize("transposed", [False, True])
def test_a8_matmul_bit_exact_vs_manual(bits, transposed):
    w = rand_w(0, 64, 96)
    qt = quantize(w, bits=bits, group_size=None, act_bits=8, transposed=transposed)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 64), jnp.float32)

    got = quant_matmul(x, qt)

    # Manual reference: same activation quant, integer matmul in fp64.
    xq, sx = _act_quantize(x)
    qvals = np.asarray(dequantize(with_orientation(qt, False), jnp.float32))
    s_col = np.asarray(qt.scales, np.float64).reshape(-1)  # [out]
    int_w = np.round(qvals / s_col[None, :]).astype(np.int64)  # recover int grid
    acc = np.asarray(xq, np.int64) @ int_w
    want = acc * np.asarray(sx, np.float64) * s_col[None, :]
    np.testing.assert_allclose(np.asarray(got, np.float64), want, rtol=1e-6)


@pytest.mark.parametrize("bits", [8, 4])
def test_a8_close_to_weight_only(bits):
    w = rand_w(2, 128, 64)
    x = jax.random.normal(jax.random.PRNGKey(3), (4, 128), jnp.float32)
    qt = quantize(w, bits=bits, group_size=None, act_bits=8)
    exact = np.asarray(x @ dequantize(qt, jnp.float32))
    got = np.asarray(quant_matmul(x, qt))
    # Activation int8 adds <1% relative error at these magnitudes.
    scale = np.abs(exact).max()
    assert np.abs(got - exact).max() < 0.02 * scale


def test_per_channel_weight_only_path_still_works():
    """act_bits=None + per-channel scales goes through the normal fused path."""
    w = rand_w(4, 64, 48)
    for bits in (8, 4):
        qt = quantize(w, bits=bits, group_size=None)
        x = jax.random.normal(jax.random.PRNGKey(5), (2, 64), jnp.float32)
        got = np.asarray(quant_matmul(x, qt))
        want = np.asarray(x @ dequantize(qt, jnp.float32))
        np.testing.assert_allclose(got, want, atol=1e-4 * max(1, np.abs(want).max()))


def test_requantize_per_channel_envelope():
    """group-32 int4 → per-channel int8: added error ≪ the int4 quant error."""
    w = rand_w(6, 256, 64)
    qt4 = quantize(w, bits=4, group_size=32)
    w4 = np.asarray(dequantize(qt4, jnp.float32))
    int4_err = np.abs(w4 - w).max()

    turbo = requantize_per_channel(qt4, bits=8)
    assert turbo.act_bits == 8 and turbo.group_size == turbo.in_features
    w_turbo = np.asarray(dequantize(turbo, jnp.float32))
    requant_err = np.abs(w_turbo - w4).max()
    assert requant_err < 0.35 * int4_err, (requant_err, int4_err)


def test_model_forward_a8_close_to_groupwise():
    cfg = LlamaConfig(
        vocab_size=96, hidden_size=64, intermediate_size=128, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=16, max_seq_len=32,
        tie_word_embeddings=False,
    )
    params = init_random_params(cfg, seed=0, dtype=jnp.float32)
    tokens = jnp.asarray(
        np.random.default_rng(0).integers(0, 96, (2, 12)), jnp.int32)

    def logits(p):
        cache = KVCache.create(cfg, 2, 16, dtype=jnp.float32)
        out, _ = jax.jit(forward, static_argnames="config")(
            p, cache, tokens, 0, config=cfg)
        return np.asarray(out)

    base = logits(params)
    group = logits(quantize_params(params, bits=8, group_size=32))
    a8 = logits(quantize_params(params, bits=8, group_size=None, act_bits=8))

    group_err = np.abs(group - base).max()
    a8_err = np.abs(a8 - base).max()
    # W8A8 is allowed modestly more error than weight-only groupwise, but
    # both must stay in the same envelope relative to logit magnitudes.
    mag = np.abs(base).max()
    assert a8_err < 0.05 * mag, (a8_err, group_err, mag)


def test_a8_batched_and_3d_inputs():
    w = rand_w(7, 32, 40)
    qt = quantize(w, bits=8, group_size=None, act_bits=8)
    x = jax.random.normal(jax.random.PRNGKey(8), (2, 5, 32), jnp.float32)
    got = np.asarray(quant_matmul(x, qt))
    want = np.asarray(x @ dequantize(qt, jnp.float32))
    assert got.shape == (2, 5, 40)
    assert np.abs(got - want).max() < 0.02 * np.abs(want).max()


def test_a8_checkpoint_roundtrip(tmp_path):
    """Per-channel + act_bits tensors survive the native checkpoint format."""
    from metalchat_tpu.io.safetensors import open_safetensors, save_safetensors
    from metalchat_tpu.quant.checkpoint import export_quantized, load_quantized

    cfg = LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=8, max_seq_len=32,
        tie_word_embeddings=False,
    )
    params = quantize_params(
        init_random_params(cfg, seed=1, dtype=jnp.float32),
        bits=4, group_size=None, act_bits=8, quantize_lm_head=True,
    )
    tensors, meta = export_quantized(params, cfg)
    assert meta["group_size"] == "channel" and meta["act_bits"] == "8"
    path = tmp_path / "model.safetensors"
    save_safetensors(str(path), tensors, metadata=meta)

    loaded = load_quantized(open_safetensors(str(path)), cfg, dtype=jnp.float32)
    for name in ("wq", "w1"):
        src, dst = params["layers"][name], loaded["layers"][name]
        assert dst.act_bits == 8 and dst.group_size == dst.in_features
        np.testing.assert_array_equal(
            np.asarray(dequantize(src, jnp.float32)),
            np.asarray(dequantize(dst, jnp.float32)))
    lm = loaded["lm_head"]
    assert lm.act_bits == 8
    np.testing.assert_array_equal(
        np.asarray(dequantize(params["lm_head"], jnp.float32)),
        np.asarray(dequantize(lm, jnp.float32)))


def test_zero_row_activation_guard():
    w = rand_w(9, 32, 16)
    qt = quantize(w, bits=8, group_size=None, act_bits=8)
    x = jnp.zeros((1, 32), jnp.float32)
    got = np.asarray(quant_matmul(x, qt))
    assert np.all(got == 0.0) and np.all(np.isfinite(got))


def test_quantized_gemma3_forward_finite():
    """Gemma-3 arch switches (qk-norm, post-norms, sliding windows) work with
    directly-initialized quantized params (bench config gemma3-4b-int8)."""
    from metalchat_tpu.cache import QuantizedKVCache
    from metalchat_tpu.config import Gemma3Config
    from metalchat_tpu.quant.quantize import init_random_quantized_params

    cfg = Gemma3Config.gemma3_1b(
        max_seq_len=64, vocab_size=256, hidden_size=64, intermediate_size=128,
        num_layers=4, num_heads=4, num_kv_heads=2, head_dim=32,
        sliding_window=16, embedding_scale=8.0, query_scale=None)
    params = init_random_quantized_params(cfg, bits=8, group_size=None,
                                          act_bits=8, max_seq_len=64)
    assert "q_norm" in params["layers"] and "post_ffn_norm" in params["layers"]
    cache = QuantizedKVCache.create(cfg, 1, 64)
    toks = jnp.arange(8, dtype=jnp.int32)[None]
    logits, cache = jax.jit(forward, static_argnames="config")(
        params, cache, toks, 0, cfg)
    assert logits.shape == (1, 8, 256) and bool(jnp.isfinite(logits).all())
    logits2, _ = jax.jit(forward, static_argnames="config")(
        params, cache, toks[:, :1], 8, cfg)
    assert logits2.shape == (1, 1, 256) and bool(jnp.isfinite(logits2).all())


def test_gemma3_presets_construct():
    from metalchat_tpu.config import Gemma3Config

    for preset in (Gemma3Config.gemma3_1b, Gemma3Config.gemma3_4b):
        cfg = preset(max_seq_len=128)
        assert cfg.max_seq_len == 128
        assert cfg.use_qk_norm and cfg.use_post_norms
        assert cfg.sliding_window and cfg.sliding_window_pattern == 6


@pytest.mark.parametrize("transposed", [False, True])
def test_w4a8_mask3_and_unpack_paths_bitexact(transposed):
    """The 3-dot mask formulation (decode, rows<=128) and the 2-dot unpack
    formulation (prefill) are the SAME integer arithmetic — outputs must be
    bit-identical for identical rows."""
    w = rand_w(11, 128, 64)
    qt = quantize(w, bits=4, group_size=None, act_bits=8, transposed=transposed)
    x = rand_w(12, 1, 128)
    y_decode = np.asarray(quant_matmul(x, qt))              # rows=1 → mask3
    y_prefill = np.asarray(quant_matmul(jnp.tile(x, (200, 1)), qt))  # 2-dot
    np.testing.assert_array_equal(y_prefill[0], y_decode[0])
    np.testing.assert_array_equal(y_prefill[199], y_decode[0])
