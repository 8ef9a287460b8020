"""GPTQ-style error-compensated rounding for per-channel quantization.

Round-to-nearest quantizes every weight independently; GPTQ (Frantar et al.,
2022, arXiv:2210.17323) quantizes input channels sequentially and folds each
channel's rounding error into the not-yet-quantized channels, weighted by the
inverse Hessian of the layer's calibration activations (H = XᵀX) — the
second-order-optimal update that keeps the LAYER OUTPUT (not the weights)
close to the dense model. It needs no gradient, composes with the AWQ scale
fold (quant/awq.py) — fold first, then compensate the remaining error — and
changes nothing at runtime: the output is an ordinary per-channel
QuantizedTensor on the same W4A8/W8A8 MXU execution path.

The reference's quality posture is groupwise RTN only
(/root/reference/include/metalchat/quantization/linear.h:16-56); GPTQ is the
error-compensation pass it lacks.

Quality (10M fixture, tools/quality_gate.py): per-channel int4 RTN+clip is
+2.9% ppl; AWQ+clip +2.4%; GPTQ composes on top and is selected by the gate
when it wins (QUALITY.md has the current table).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from metalchat_tpu.config import ModelConfig
from metalchat_tpu.quant.quantize import (
    QuantizedTensor,
    _pack_int4,
    auto_orient,
)

# Which calibration tap (quant/awq.py calibration_stats) feeds each target
# leaf — wq/wk/wv share the post-attn-norm activations, w1/w3 the
# post-ffn-norm ones.
_TAP_OF = {"wq": "qkv", "wk": "qkv", "wv": "qkv",
           "wo": "wo", "w1": "w13", "w3": "w13", "w2": "w2"}


def hessian_tap(h: jax.Array) -> np.ndarray:
    """Second-moment tap for `calibration_stats`: H = XᵀX over (batch, seq)."""
    h32 = h.astype(jnp.float32)
    flat = h32.reshape(-1, h32.shape[-1])
    return np.asarray(flat.T @ flat, np.float64)


def _channel_scales(w: np.ndarray, qmax: float, clip_search: bool) -> np.ndarray:
    """Per-output-channel symmetric scales [out] (absmax or MSE-clip grid)."""
    absmax = np.abs(w).max(axis=0)
    scales = absmax / qmax
    if not clip_search:
        return scales.astype(np.float64)
    best_err = np.full(scales.shape, np.inf)
    best = scales.copy()
    for ratio in np.linspace(1.0, 0.5, 11):
        s = scales * ratio
        inv = np.where(s == 0.0, 0.0, 1.0 / s)
        q = np.clip(np.round(w * inv), -qmax, qmax)
        err = ((q * s - w) ** 2).sum(axis=0)
        take = err < best_err
        best = np.where(take, s, best)
        best_err = np.minimum(err, best_err)
    return best.astype(np.float64)


def gptq_rounding(
    w: np.ndarray,        # f32/f64 [in, out]
    scales: np.ndarray,   # f64 [out]
    hessian: np.ndarray,  # f64 [in, in] — XᵀX from calibration
    *,
    qmax: float,
    act_order: bool = True,
    damp: float = 0.01,
) -> np.ndarray:
    """Sequential compensated rounding; returns int8 values on the qmax grid.

    Classic GPTQ recursion with the upper-Cholesky factor U of H⁻¹ (H⁻¹ =
    UᵀU): channel i rounds, its scaled error err = (wᵢ - qᵢs)/U[i,i]
    propagates into channels j>i as w[j] -= U[i,j]·err. act_order processes
    channels by decreasing Hessian diagonal (largest-impact first), the
    standard accuracy tweak.
    """
    w = np.array(w, np.float64)
    H = np.array(hessian, np.float64)
    n = w.shape[0]
    assert H.shape == (n, n), (H.shape, w.shape)

    dead = np.diag(H) <= 0
    if dead.any():
        H[dead, dead] = 1.0
        w[dead, :] = 0.0

    if act_order:
        perm = np.argsort(-np.diag(H), kind="stable")
        w = w[perm]
        H = H[perm][:, perm]

    H[np.diag_indices(n)] += damp * float(np.mean(np.diag(H)))
    try:
        hinv = np.linalg.inv(H)
        u = np.linalg.cholesky(hinv).T  # upper: H⁻¹ = UᵀU
    except np.linalg.LinAlgError:
        # Pathological calibration (rank-deficient beyond damping): fall back
        # to plain RTN rather than crash — identity factor does no updates.
        u = np.eye(n)

    inv_s = np.where(scales == 0.0, 0.0, 1.0 / scales)
    q_out = np.zeros_like(w)
    for i in range(n):
        q = np.clip(np.round(w[i] * inv_s), -qmax, qmax)
        q_out[i] = q
        err = (w[i] - q * scales) / u[i, i]
        if i + 1 < n:
            w[i + 1:] -= np.outer(u[i, i + 1:], err)

    if act_order:
        q_unperm = np.zeros_like(q_out)
        q_unperm[perm] = q_out
        q_out = q_unperm
    return q_out.astype(np.int8)


def _refit_scales(w: np.ndarray, q: np.ndarray, hessian: np.ndarray,
                  scales: np.ndarray) -> np.ndarray:
    """Least-squares per-channel scale refit under the calibration Hessian.

    Given fixed integer codes q, the layer-output error for channel c is
    (w_c - s·q_c)ᵀ H (w_c - s·q_c), minimized at s* = q_cᵀHw_c / q_cᵀHq_c.
    The initial scales were chosen for round-to-nearest MSE BEFORE the GPTQ
    compensation shifted the effective weights — refitting after rounding
    recovers that mismatch. Only ever applied before a re-round or as the
    final step, so the compensation always matches the scales in use."""
    H = np.asarray(hessian, np.float64)
    hq = H @ q
    num = np.einsum("io,io->o", q, H @ w)
    den = np.einsum("io,io->o", q, hq)
    good = den > 0
    out = np.where(good, num / np.where(good, den, 1.0), scales)
    # A refit scale ≤0 (degenerate channel) would flip signs — keep the old.
    return np.where(out > 0, out, scales)


def gptq_quantize(
    w: np.ndarray | jax.Array,   # [in, out] dense weight
    hessian: np.ndarray,         # [in, in]
    *,
    bits: int = 4,
    act_bits: Optional[int] = 8,
    clip_search: bool = True,
    act_order: bool = True,
    damp: float = 0.01,
    refit_iters: int = 0,
    scales_dtype=jnp.float32,
) -> QuantizedTensor:
    """GPTQ-quantize one [in, out] weight to a per-channel QuantizedTensor
    (drop-in for `quantize(..., group_size=None)` on the same MXU path).

    refit_iters > 0 alternates compensated rounding with the Hessian
    least-squares scale refit (round → refit → round …). Each refit is
    exactly optimal given fixed codes, but the re-round half-step is a
    heuristic that can regress individual channels (measured: seed-dependent
    ±0.5% on the Hessian objective) — so every (q, scales) candidate the
    alternation visits is scored per output channel against the calibration
    objective (w_c − s·q_c)ᵀH(w_c − s·q_c) and the best one per channel
    ships. Refit is therefore never-worse than refit_iters=0 by
    construction (the first candidate, round→refit, already ≤ the plain
    rounding per channel)."""
    w = np.asarray(w, np.float64)
    in_features, out_features = w.shape
    qmax = 127.0 if bits == 8 else 7.0
    scales = _channel_scales(w, qmax, clip_search)
    q = gptq_rounding(w, scales, hessian, qmax=qmax, act_order=act_order,
                      damp=damp)
    if refit_iters:
        H = np.asarray(hessian, np.float64)

        def channel_obj(qf: np.ndarray, s: np.ndarray) -> np.ndarray:
            e = w - qf * s
            return np.einsum("io,io->o", e, H @ e)

        scales = _refit_scales(w, q.astype(np.float64), hessian, scales)
        best_q, best_s = q, scales
        best_obj = channel_obj(q.astype(np.float64), scales)
        for _ in range(refit_iters):
            q = gptq_rounding(w, scales, hessian, qmax=qmax,
                              act_order=act_order, damp=damp)
            scales = _refit_scales(w, q.astype(np.float64), hessian, scales)
            obj = channel_obj(q.astype(np.float64), scales)
            take = obj < best_obj
            best_q = np.where(take[None, :], q, best_q).astype(np.int8)
            best_s = np.where(take, scales, best_s)
            best_obj = np.minimum(obj, best_obj)
        q, scales = best_q, best_s
    if bits == 4:
        q = _pack_int4(q)
    return auto_orient(QuantizedTensor(
        q=jnp.asarray(q),
        scales=jnp.asarray(scales[None, :], scales_dtype),  # [1, out]
        bits=bits,
        group_size=in_features,
        transposed=False,
        act_bits=act_bits,
    ))


def gptq_quantize_params(
    params: Dict[str, Any],
    config: ModelConfig,
    calibration_tokens: jax.Array,
    *,
    bits: int = 4,
    act_bits: Optional[int] = 8,
    awq_alpha: Optional[float] = None,
    clip_search: bool = True,
    act_order: bool = True,
    damp: float = 0.01,
    refit_iters: int = 0,
    targets=("wq", "wk", "wv", "wo", "w1", "w2", "w3"),
) -> Dict[str, Any]:
    """Calibrate → (optional AWQ fold) → GPTQ-quantize the target leaves.

    awq_alpha folds AWQ saliency scales first (exact transform), then the
    Hessians are collected on the FOLDED model so the compensation matches
    the weights actually being rounded.
    """
    from metalchat_tpu.quant.awq import awq_fold, calibration_stats

    if awq_alpha is not None:
        stats = calibration_stats(params, config, calibration_tokens)
        params = awq_fold(params, config, stats, alpha=awq_alpha)

    hess = calibration_stats(params, config, calibration_tokens,
                             tap=hessian_tap)

    out = dict(params)
    layers = dict(params["layers"])
    for name in targets:
        if name not in layers:
            continue
        stacked = np.asarray(jnp.asarray(layers[name], jnp.float32))
        qs, ss = [], []
        for l in range(config.num_layers):
            qt = gptq_quantize(
                stacked[l], hess[_TAP_OF[name]][l], bits=bits,
                act_bits=act_bits, clip_search=clip_search,
                act_order=act_order, damp=damp, refit_iters=refit_iters,
            )
            qs.append(np.asarray(qt.q))
            ss.append(np.asarray(qt.scales))
        proto = qt  # metadata identical across layers
        layers[name] = QuantizedTensor(
            q=jnp.asarray(np.stack(qs)),
            scales=jnp.asarray(np.stack(ss)),
            bits=proto.bits,
            group_size=proto.group_size,
            transposed=proto.transposed,
            act_bits=proto.act_bits,
        )
    out["layers"] = layers
    return out
