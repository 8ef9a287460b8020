"""Pure-XLA reference ops.

These are the TPU-native analogs of the reference's Metal kernels
(SURVEY.md §2.3): where the reference hand-writes rmsnorm/rope/softmax/bmm
shaders, XLA fuses the jnp formulations below into large MXU-friendly
computations. They double as the numerics oracle the Pallas kernels are
tested against, and they fix the reference's known numerics gap (its softmax
has no max-subtraction — kernel/softmax.metal:24-88).

All reductions and softmax statistics run in float32 regardless of the
activation dtype (bf16 on TPU).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from metalchat_tpu.config import RopeScaling

# -0.7 * float32 max: additive mask that never yields NaN through exp.
MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def rms_norm(
    x: jax.Array,
    weight: jax.Array,
    *,
    eps: float = 1e-5,
    offset: float = 0.0,
) -> jax.Array:
    """RMS normalization (reference: kernel/rmsnorm.metal:28-98).

    `offset` restores the Gemma residual-weight convention: the effective
    scale is ``offset + weight`` (reference nn/attention.h:47-51, mu=1.0).
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    return (normed * (offset + weight.astype(jnp.float32))).astype(dtype)


def layer_norm(
    x: jax.Array, weight: jax.Array, bias: jax.Array, *, eps: float = 1e-5
) -> jax.Array:
    """Classic LayerNorm (GPT-2 family; f32 statistics)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    normed = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (normed * weight.astype(jnp.float32) + bias.astype(jnp.float32)).astype(dtype)


def scale_rope_freqs(freqs: jax.Array, scaling: RopeScaling) -> jax.Array:
    """Llama-3.1 rope frequency scaling (reference: nn/embedding.h:133-157)."""
    low_wavelen = scaling.original_max_position_embeddings / scaling.low_freq_factor
    high_wavelen = scaling.original_max_position_embeddings / scaling.high_freq_factor
    wavelen = 2.0 * jnp.pi / freqs
    # Smooth interpolation between the scaled and unscaled regimes.
    smooth = (scaling.original_max_position_embeddings / wavelen - scaling.low_freq_factor) / (
        scaling.high_freq_factor - scaling.low_freq_factor
    )
    scaled = jnp.where(
        wavelen < high_wavelen,
        freqs,
        jnp.where(
            wavelen > low_wavelen,
            freqs / scaling.factor,
            (1.0 - smooth) / scaling.factor * freqs + smooth * freqs,
        ),
    )
    return scaled


def precompute_rope(
    head_dim: int,
    max_seq_len: int,
    theta: float,
    scaling: Optional[RopeScaling] = None,
) -> Tuple[jax.Array, jax.Array]:
    """cos/sin tables ``[max_seq_len, head_dim//2]`` in float32.

    The reference recomputes a windowed table on the GPU when the position
    range misses (nn/embedding.h:159-198); with a static table indexed by
    position ids the recompute vanishes.
    """
    exponents = jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim
    freqs = 1.0 / (theta**exponents)
    if scaling is not None:
        freqs = scale_rope_freqs(freqs, scaling)
    angles = jnp.outer(jnp.arange(max_seq_len, dtype=jnp.float32), freqs)
    return jnp.cos(angles), jnp.sin(angles)


def apply_rope(
    x: jax.Array, cos: jax.Array, sin: jax.Array, positions: jax.Array
) -> jax.Array:
    """HF-style half-split rotation (reference: kernel/rope.metal:29-103).

    x: [B, S, n_heads, head_dim]; cos/sin: [max_seq, head_dim//2];
    positions: [B, S] absolute position ids.
    """
    dtype = x.dtype
    c = cos[positions][:, :, None, :]  # [B, S, 1, hd/2]
    s = sin[positions][:, :, None, :]
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    rotated = jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)
    return rotated.astype(dtype)


def apply_rope_rows(
    x: jax.Array, cos: jax.Array, sin: jax.Array
) -> jax.Array:
    """`apply_rope` with pre-gathered per-position rows.

    x: [B, S, n_heads, head_dim]; cos/sin: [B, S, head_dim//2] (the decode
    fast path gathers the rows once per step and reuses them across layers,
    selecting local/global tables per layer without re-gathering).
    """
    dtype = x.dtype
    c = cos[:, :, None, :].astype(jnp.float32)
    s = sin[:, :, None, :].astype(jnp.float32)
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    rotated = jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)
    return rotated.astype(dtype)


def attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: jax.Array,
    *,
    scale: float,
) -> jax.Array:
    """GQA attention over a (padded) KV buffer.

    Replaces the reference's bmm → scalar_mul → add_broadcast(mask) →
    softmax → bmm chain (nn/attention.h:161-206) with one fused einsum
    formulation; the KV-head repeat_interleave of the reference becomes a
    grouped einsum (no materialized copy).

      q:    [B, S, n_heads, head_dim]
      k, v: [B, n_kv_heads, T, head_dim]  (head-major cache layout)
      mask: [B, S, T] or [1, S, T] boolean — True where attention is allowed.
    """
    b, s, n_heads, head_dim = q.shape
    n_kv, t = k.shape[1], k.shape[2]
    groups = n_heads // n_kv

    qg = q.reshape(b, s, n_kv, groups, head_dim)
    # scores: [B, n_kv, groups, S, T], accumulated in f32 on the MXU.
    scores = jnp.einsum(
        "bskgd,bktd->bkgst", qg, k, preferred_element_type=jnp.float32
    )
    scores = scores * scale
    scores = jnp.where(mask[:, None, None, :, :], scores, MASK_VALUE)
    weights = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bkgst,bktd->bskgd",
        weights.astype(v.dtype),
        v,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(b, s, n_heads, head_dim).astype(q.dtype)


def causal_mask(
    positions: jax.Array,
    kv_len: int,
    kv_valid_len: jax.Array,
    sliding_window: Optional[int] = None,
) -> jax.Array:
    """Boolean attention mask ``[B, S, kv_len]``.

    Fuses the reference's `make_causal_mask` / `make_sliding_causal_mask`
    (nn/attention.h:283-325) and cache-validity masking into index math:
    allowed iff kv_pos ≤ q_pos, kv_pos < valid length, and (if sliding)
    kv_pos > q_pos - window.
    """
    kv_pos = jnp.arange(kv_len, dtype=jnp.int32)[None, None, :]
    q_pos = positions[:, :, None]
    ok = (kv_pos <= q_pos) & (kv_pos < kv_valid_len)
    if sliding_window is not None:
        ok &= kv_pos > q_pos - sliding_window
    return ok


def swiglu(x, w1, w3, w2, act: str, matmul=None) -> jax.Array:
    """Gated feed-forward: w2(act(x·w1) ⊙ (x·w3)) (reference: transformer.h:53-59).

    Weights are [in, out]-major so the matmuls hit the MXU without transposes.
    `matmul` lets the caller substitute the quantized-linear dispatch.
    """
    if matmul is None:
        matmul = lambda a, w: a @ w  # noqa: E731
    gate = matmul(x, w1)
    if act == "silu":
        gate = jax.nn.silu(gate)
    elif act == "gelu_tanh":
        gate = jax.nn.gelu(gate, approximate=True)
    else:
        raise ValueError(f"unknown activation {act!r}")
    return matmul(gate * matmul(x, w3), w2)
