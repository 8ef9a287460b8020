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
        sorted_logits = jnp.sort(scaled, axis=-1, descending=True)
        ranks = jnp.argsort(jnp.argsort(scaled, axis=-1, descending=True),
                            axis=-1)

        # top-k: keep ranks < k (k<=0 → keep all)
        k = jnp.where(top_k <= 0, v, top_k)[:, None]
        keep = ranks < k

        # top-p over the sorted distribution
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        exclusive = jnp.cumsum(probs, axis=-1) - probs
        keep_sorted = exclusive < jnp.minimum(top_p, 1.0)[:, None]
        n_keep = jnp.maximum(jnp.sum(keep_sorted, axis=-1, keepdims=True), 1)
        keep &= ranks < n_keep

        masked = jnp.where(keep, scaled, _NEG)
        return jax.random.categorical(key, masked, axis=-1).astype(jnp.int32)

    def untruncated(_) -> jax.Array:
        return jax.random.categorical(key, scaled, axis=-1).astype(jnp.int32)

    # The sorted path costs three full-vocab sorts per step (tens of ms at
    # Gemma's 262k vocab — it dominated the serve-mode decode step). Rows
    # that are greedy or pure-temperature never need the sort; skip it at
    # RUNTIME (lax.cond, not a trace-time branch) whenever no row in the
    # batch restricts its support.
    needs_sort = jnp.any(~greedy & ((top_k > 0) | (top_p < 1.0)))
    drawn = jax.lax.cond(
        jnp.any(~greedy),
        lambda _: jax.lax.cond(needs_sort, truncated, untruncated, _),
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
