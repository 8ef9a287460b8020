"""GPTQ error-compensated rounding tests.

Correctness bar: (1) the compensated rounding lands on the same int grid and
round-trips through the standard per-channel execution path; (2) on a layer
with correlated inputs it achieves LOWER output error ‖XW - XW_q‖ than
round-to-nearest with the same scales (the whole point of the method);
(3) the params-level driver produces a tree the model can run.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from metalchat_tpu.quant.gptq import (
    gptq_quantize,
    gptq_quantize_params,
    gptq_rounding,
    hessian_tap,
)
from metalchat_tpu.quant.quantize import (
    QuantizedTensor,
    dequantize,
    quant_matmul,
    quantize,
)


def _correlated_inputs(rng, n, in_f):
    """Calibration inputs with strong channel correlations + scale spread
    (the regime where compensation matters)."""
    base = rng.standard_normal((n, in_f // 4))
    mix = rng.standard_normal((in_f // 4, in_f))
    x = base @ mix + 0.1 * rng.standard_normal((n, in_f))
    return (x * np.exp(rng.standard_normal(in_f) * 0.8)).astype(np.float32)


@pytest.mark.parametrize("bits", [4, 8])
def test_gptq_beats_rtn_on_output_error(bits):
    rng = np.random.default_rng(0)
    in_f, out_f, n = 64, 48, 512
    x = _correlated_inputs(rng, n, in_f)
    w = rng.standard_normal((in_f, out_f)).astype(np.float32) * 0.05
    h = x.T.astype(np.float64) @ x.astype(np.float64)

    qt_gptq = gptq_quantize(w, h, bits=bits, clip_search=False)
    qt_rtn = quantize(w, bits=bits, group_size=None, act_bits=8)

    y = x @ w
    err_gptq = np.linalg.norm(y - x @ np.asarray(dequantize(qt_gptq, jnp.float32)))
    err_rtn = np.linalg.norm(y - x @ np.asarray(dequantize(qt_rtn, jnp.float32)))
    assert err_gptq < err_rtn * 0.95, (err_gptq, err_rtn)


def test_gptq_identity_hessian_equals_rtn():
    """With H = I (uncorrelated, unit-variance inputs) the compensation
    cancels layer-wise and GPTQ degenerates to plain RTN."""
    rng = np.random.default_rng(1)
    w = rng.standard_normal((32, 16)).astype(np.float64) * 0.1
    scales = np.abs(w).max(axis=0) / 7.0
    q = gptq_rounding(w, scales, np.eye(32), qmax=7.0, act_order=False,
                      damp=1e-12)
    rtn = np.clip(np.round(w / scales), -7, 7)
    np.testing.assert_array_equal(q, rtn)


def test_gptq_tensor_runs_standard_path():
    """The produced QuantizedTensor matmuls like any per-channel act8 leaf."""
    rng = np.random.default_rng(2)
    in_f, out_f = 64, 48
    x = _correlated_inputs(rng, 256, in_f)
    w = rng.standard_normal((in_f, out_f)).astype(np.float32) * 0.05
    qt = gptq_quantize(w, x.T.astype(np.float64) @ x.astype(np.float64), bits=4)
    assert isinstance(qt, QuantizedTensor)
    assert qt.act_bits == 8 and qt.group_size == in_f
    assert qt.scales.shape == (1, out_f)
    got = np.asarray(quant_matmul(jnp.asarray(x[:8]), qt))
    # Exact reference: same per-token int8 activation quantization, dense
    # f32 dot against the dequantized weight.
    from metalchat_tpu.quant.quantize import _act_quantize

    xq, sx = _act_quantize(jnp.asarray(x[:8]))
    want = (np.asarray(xq, np.float32) * np.asarray(sx)) @ np.asarray(
        dequantize(qt, jnp.float32))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_hessian_tap_shape():
    h = jnp.asarray(np.random.default_rng(3).standard_normal((2, 5, 16)),
                    jnp.float32)
    H = hessian_tap(h)
    assert H.shape == (16, 16)
    np.testing.assert_allclose(H, H.T, rtol=1e-6)


def test_gptq_quantize_params_end_to_end():
    """Driver quantizes a tiny model; forward still runs and ppl-proxy
    (logit error) is finite and close to the dense model."""
    from metalchat_tpu.cache import KVCache
    from metalchat_tpu.models import forward, init_random_params
    from test_model import TINY_LLAMA

    cfg = TINY_LLAMA
    params = init_random_params(cfg, seed=7, dtype=jnp.float32)
    calib = jnp.asarray(
        np.random.default_rng(4).integers(0, cfg.vocab_size, (2, 32)), jnp.int32)

    qparams = gptq_quantize_params(params, cfg, calib, bits=4, awq_alpha=0.35)
    assert isinstance(qparams["layers"]["wq"], QuantizedTensor)
    assert qparams["layers"]["wq"].q.shape[0] == cfg.num_layers

    prompt = calib[:1, :16]
    cache = KVCache.create(cfg, 1, 64, dtype=jnp.float32)
    ref, _ = jax.jit(forward, static_argnames="config")(
        params, cache, prompt, 0, config=cfg)
    cache = KVCache.create(cfg, 1, 64, dtype=jnp.float32)
    got, _ = jax.jit(forward, static_argnames="config")(
        qparams, cache, prompt, 0, config=cfg)
    assert np.isfinite(np.asarray(got)).all()
    # int4 noise bound: top-1 agreement on most positions.
    agree = (np.asarray(got)[0].argmax(-1) == np.asarray(ref)[0].argmax(-1)).mean()
    assert agree > 0.5, agree


def test_refit_improves_hessian_objective():
    """refit_iters>0 must never raise the layer-output error
    (w - q·s)ᵀH(w - q·s): gptq_quantize scores every candidate the
    round/refit alternation visits per output channel and keeps the best,
    so this is an invariant by construction (not a seed-dependent
    property of the alternation, which alone can regress — ADVICE r3)."""
    from metalchat_tpu.quant.gptq import _channel_scales, _refit_scales

    rng = np.random.default_rng(1)
    in_f, out_f, n = 64, 48, 512
    x = _correlated_inputs(rng, n, in_f)
    w = (rng.standard_normal((in_f, out_f)) * 0.05).astype(np.float64)
    h = x.T.astype(np.float64) @ x.astype(np.float64)

    def obj(q, s):
        e = w - q * s
        return float(np.einsum("io,ij,jo->", e, h, e))

    s0 = _channel_scales(w, 7.0, True)
    q0 = gptq_rounding(w.copy(), s0, h.copy(), qmax=7.0).astype(np.float64)
    s1 = _refit_scales(w, q0, h, s0)
    assert obj(q0, s1) <= obj(q0, s0) + 1e-9

    qt0 = gptq_quantize(w, h, bits=4, refit_iters=0)
    qt2 = gptq_quantize(w, h, bits=4, refit_iters=2)

    def tensor_obj(qt):
        wq = np.asarray(dequantize(qt), np.float64)
        e = w - wq
        return float(np.einsum("io,ij,jo->", e, h, e))

    assert tensor_obj(qt2) <= tensor_obj(qt0) + 1e-9
    # Still a valid per-channel tensor on the standard execution path.
    assert qt2.bits == 4 and qt2.act_bits == 8
