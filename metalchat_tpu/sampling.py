"""Token samplers — fully on-device.

Re-design of the reference sampler stack (nn/sampling.h:22-315): the
reference composes `topk → nucleus → multinomial` as separate lazy-tensor
stages, with top-k on the *CPU* (a device sync mid-pipeline,
sampling.h:249-257) and multinomial via a custom PCG32 inverse-CDF kernel.
Here the whole pipeline is one fused jit region on device: temperature,
top-k mask (`lax.top_k`), nucleus mask (sort + exclusive-cumsum), and a
Gumbel-max categorical draw (`jax.random.categorical`) — zero host syncs.

The `SamplerConfig` defaults mirror the reference's default chain
(sampling.h:304-315: topk(max(50,k)) → nucleus(T=0.6, p=0.9) → multinomial).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

_NEG = -jnp.inf


@dataclass(frozen=True)
class SamplerConfig:
    """Static sampling configuration (hashable → usable as a jit static arg).

    Beyond the reference's chain: min_p filtering and repetition /
    frequency / presence penalties (applied against the token history —
    pass `history` to `sample`)."""

    temperature: float = 0.6
    top_k: int = 50
    top_p: float = 0.9
    min_p: float = 0.0                  # keep tokens with p >= min_p·p_max
    repetition_penalty: float = 1.0     # >1 penalizes seen tokens (CTRL-style)
    frequency_penalty: float = 0.0      # per-occurrence additive penalty
    presence_penalty: float = 0.0       # one-time additive penalty

    @staticmethod
    def greedy() -> "SamplerConfig":
        return SamplerConfig(temperature=0.0, top_k=0, top_p=1.0)

    @property
    def is_greedy(self) -> bool:
        return self.temperature <= 0.0

    @property
    def penalizes(self) -> bool:
        return (self.repetition_penalty != 1.0 or self.frequency_penalty != 0.0
                or self.presence_penalty != 0.0)


def top_k_mask(logits: jax.Array, k: int) -> jax.Array:
    """Keep the k largest logits per row, -inf elsewhere
    (device-side replacement for the reference's CPU partial_sort top-k)."""
    if k <= 0 or k >= logits.shape[-1]:
        return logits
    vals, _ = jax.lax.top_k(logits, k)
    threshold = vals[..., -1:]
    return jnp.where(logits >= threshold, logits, _NEG)


def top_p_mask(logits: jax.Array, p: float) -> jax.Array:
    """Nucleus filtering (reference: sampling.h:183-200, sort→cumsum→scatter).

    Keeps the smallest prefix of descending-probability tokens whose mass
    reaches `p` (the token that crosses the boundary is kept, matching the
    exclusive-cumsum convention).
    """
    if p >= 1.0:
        return logits
    sorted_logits = jnp.sort(logits, axis=-1, descending=True)
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    exclusive = cum - probs
    # Logit value of the last kept (sorted) position per row.
    keep_sorted = exclusive < p
    idx = jnp.sum(keep_sorted, axis=-1, keepdims=True) - 1
    cutoff = jnp.take_along_axis(sorted_logits, idx, axis=-1)
    return jnp.where(logits >= cutoff, logits, _NEG)


def min_p_mask(logits: jax.Array, min_p: float) -> jax.Array:
    """Keep tokens whose probability is ≥ min_p × p(argmax) — a scale-free
    tail cut that adapts to the distribution's confidence."""
    if min_p <= 0.0:
        return logits
    probs = jax.nn.softmax(logits, axis=-1)
    cutoff = jnp.max(probs, axis=-1, keepdims=True) * min_p
    return jnp.where(probs >= cutoff, logits, _NEG)


def apply_penalties(
    logits: jax.Array,        # [B, V]
    history: jax.Array,       # int32 [B, T] token ids already in the context
    config: SamplerConfig,
    history_mask: Optional[jax.Array] = None,  # [B, T] 1=real token
) -> jax.Array:
    """Repetition (CTRL), frequency, and presence penalties from history.

    Counts are computed with a scatter-add over the vocab (no host sync);
    padded history positions are excluded via `history_mask`.
    """
    if not config.penalizes:
        return logits
    b, v = logits.shape
    ones = jnp.ones(history.shape, jnp.float32)
    if history_mask is not None:
        ones = ones * history_mask.astype(jnp.float32)
    counts = jnp.zeros((b, v), jnp.float32).at[
        jnp.arange(b)[:, None], history].add(ones)
    seen = counts > 0.0

    out = logits.astype(jnp.float32)
    if config.repetition_penalty != 1.0:
        r = config.repetition_penalty
        out = jnp.where(seen, jnp.where(out > 0, out / r, out * r), out)
    out = out - counts * config.frequency_penalty
    out = out - seen.astype(jnp.float32) * config.presence_penalty
    return out


def sample(
    logits: jax.Array,
    key: Optional[jax.Array],
    config: SamplerConfig = SamplerConfig(),
    history: Optional[jax.Array] = None,
    history_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Draw next-token ids [B] from logits [B, V]."""
    logits = logits.astype(jnp.float32)
    if history is not None and config.penalizes:
        logits = apply_penalties(logits, history, config, history_mask)
    if config.is_greedy:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / config.temperature
    logits = top_k_mask(logits, config.top_k)
    logits = top_p_mask(logits, config.top_p)
    logits = min_p_mask(logits, config.min_p)
    assert key is not None, "stochastic sampling requires a PRNG key"
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


def sample_batched(
    logits: jax.Array,       # [B, V]
    key: jax.Array,
    temperature: jax.Array,  # [B] — <= 0 means greedy for that row
    top_k: jax.Array,        # [B] int32 — 0 disables
    top_p: jax.Array,        # [B] — >= 1 disables
) -> jax.Array:
    """Per-row sampling with *dynamic* per-request parameters.

    The continuous-batching engine mixes requests with different sampler
    settings in one decode step; everything is computed from one descending
    sort per row (top-k via rank threshold, top-p via exclusive cumsum) —
    fully on device, no per-request dispatch.
    """
    b, v = logits.shape
    logits = logits.astype(jnp.float32)
    greedy = temperature <= 0.0
    safe_t = jnp.where(greedy, 1.0, temperature)[:, None]
    scaled = logits / safe_t
    argmax = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    def truncated(_) -> jax.Array:
        # SORT-FREE truncation (ADVICE r2: the previous formulation paid
        # three full-vocab sorts — tens of ms at Gemma's 262k vocab — for
        # ANY non-greedy restricted row, i.e. the default serving sampler).
        # Both truncations reduce to per-row VALUE thresholds:
        #   top-k: t_k = k-th largest of `scaled`  (keep scaled > t_k - ε)
        #   top-p: t_p = value of the crossing token under the
        #          exclusive-cumsum convention: keep x iff the probability
        #          mass STRICTLY above x is < p.
        # Each is found with a ~30-step bisection over the value range —
        # 2 masked reduces per step (bandwidth-only) instead of O(V log² V)
        # sort passes. Ties at the threshold are kept, matching the
        # `logits >= cutoff` convention of top_k_mask / top_p_mask.
        probs = jax.nn.softmax(scaled, axis=-1)
        row_min = jnp.min(scaled, axis=-1) - 1.0
        row_max = jnp.max(scaled, axis=-1)

        k = jnp.where(top_k <= 0, v, top_k)
        p = jnp.minimum(top_p, 1.0)
        restrict_p = p < 1.0

        def body(_, carry):
            lo_k, hi_k, lo_p, hi_p = carry
            mid_k = 0.5 * (lo_k + hi_k)
            mid_p = 0.5 * (lo_p + hi_p)
            above_k = jnp.sum(scaled > mid_k[:, None], axis=-1)
            mass_p = jnp.sum(jnp.where(scaled > mid_p[:, None], probs, 0.0),
                             axis=-1)
            # count(mid) < k → threshold is lower; mass(mid) < p → lower.
            lo_k = jnp.where(above_k < k, lo_k, mid_k)
            hi_k = jnp.where(above_k < k, mid_k, hi_k)
            lo_p = jnp.where(mass_p < p, lo_p, mid_p)
            hi_p = jnp.where(mass_p < p, mid_p, hi_p)
            return lo_k, hi_k, lo_p, hi_p

        lo_k, _, lo_p, _ = jax.lax.fori_loop(
            0, 30, body, (row_min, row_max, row_min, row_max))
        keep = scaled > lo_k[:, None]
        keep &= jnp.where(restrict_p[:, None], scaled > lo_p[:, None], True)
        # Never mask out the argmax (k >= 1 and the exclusive convention
        # always keep it; guards float-bisection corner cases).
        keep = keep.at[jnp.arange(b), argmax].set(True)
        masked = jnp.where(keep, scaled, _NEG)
        return jax.random.categorical(key, masked, axis=-1).astype(jnp.int32)

    def untruncated(_) -> jax.Array:
        return jax.random.categorical(key, scaled, axis=-1).astype(jnp.int32)

    # Rows that are greedy or pure-temperature skip the bisection entirely
    # (lax.cond, runtime branch).
    needs_trunc = jnp.any(~greedy & ((top_k > 0) | (top_p < 1.0)))
    drawn = jax.lax.cond(
        jnp.any(~greedy),
        lambda _: jax.lax.cond(needs_trunc, truncated, untruncated, _),
        lambda _: argmax,
        operand=None,
    )
    return jnp.where(greedy, argmax, drawn)


def multinomial(probs: jax.Array, key: jax.Array) -> jax.Array:
    """Inverse-CDF multinomial over probabilities (reference:
    kernel/multinomial.metal:17-123 binary-search sampler). Provided for
    parity; `sample` uses the Gumbel-max trick instead."""
    cum = jnp.cumsum(probs, axis=-1)
    u = jax.random.uniform(key, probs.shape[:-1] + (1,), dtype=probs.dtype)
    u = u * cum[..., -1:]
    return jnp.sum(cum < u, axis=-1).astype(jnp.int32)
