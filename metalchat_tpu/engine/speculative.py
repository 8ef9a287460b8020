"""Speculative decoding: a small draft model proposes, the target verifies.

Latency optimization for single-stream decode (beyond the reference's
capability surface): the draft autoregressively proposes `n_draft` tokens,
the target scores the whole window in ONE forward (prefill-shaped — MXU
utilization instead of matvecs), and the longest verified prefix is
accepted. Greedy mode accepts while the draft token equals the target's
argmax — output is **exactly** the target's greedy decode. Sampled mode
uses Leviathan-style rejection sampling, whose marginal distribution is
exactly the target's (tests/test_speculative.py checks both).

KV-cache discipline (both caches are standard framework caches, no rewind
op needed): entries past the accepted length are stale but harmless — all
attention paths mask by per-row length. The draft cache inherently lags one
token (the last proposal's key is never written), so each draft phase
begins with a 2-token window [prev_last, last] that backfills the possibly
missing key and overwrites one known-good key with the same value.

Host loop + jitted steps: each iteration syncs once to branch on the
accept count; with a capable draft, each sync emits up to n_draft tokens
(vs one for plain decode).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from metalchat_tpu.cache import KVCache
from metalchat_tpu.config import ModelConfig
from metalchat_tpu.models.transformer import forward


@functools.partial(jax.jit, static_argnames=("config",))
def _fwd(params, cache, tokens, start_pos, config):
    return forward(params, cache, tokens, start_pos, config)


def _sample(logits, key, temperature: float):
    if temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return jax.random.categorical(key, logits / temperature, axis=-1).astype(jnp.int32)


def _softmax_t(logits, temperature: float):
    if temperature == 0.0:
        # Degenerate: point mass on the argmax.
        return jax.nn.one_hot(jnp.argmax(logits, -1), logits.shape[-1],
                              dtype=jnp.float32)
    return jax.nn.softmax(logits.astype(jnp.float32) / temperature, axis=-1)


def breakeven_accept_rate(
    step_ratio: float,
    n_draft: int = 4,
    verify_rel: float = 1.16,
    sync_rel: float = 0.0,
) -> Optional[float]:
    """Per-draft accept rate α at which speculative decoding breaks even.

    All costs in units of one target decode step: a round costs
    (n_draft−1)·(step_ratio + sync_rel) + verify_rel + sync_rel and emits
    E(α) = Σ_{i=0}^{n_draft−1} α^i tokens; plain decode pays 1 + sync_rel
    per token. verify_rel=1.16 is the measured ≤16-token stacked-matvec
    verify cost at 8B (docs/performance.md). Returns None when even α=1
    loses (a draft slower than the window it saves — the measured 8B/1B
    regime through a high-sync transport)."""
    cost = (n_draft - 1) * (step_ratio + sync_rel) + verify_rel + sync_rel
    need = cost / (1.0 + sync_rel)   # emitted tokens/round to break even
    if need >= n_draft:              # E(1) = n_draft is the ceiling
        return None
    if need <= 1.0:
        return 0.0
    lo, hi = 0.0, 1.0
    for _ in range(60):
        mid = (lo + hi) / 2
        e = sum(mid**i for i in range(n_draft))
        lo, hi = (mid, hi) if e < need else (lo, mid)
    return (lo + hi) / 2


def measure_step_ratio(
    target_params, target_config: ModelConfig,
    draft_params, draft_config: ModelConfig,
    *,
    seq_len: int = 256,
    steps_lo: int = 2,
    steps_hi: int = 10,
) -> float:
    """Measured t_draft / t_target for one decode step of each model.

    Repeats-marginal method (CLAUDE.md): each model runs `steps` chained
    decode steps inside ONE jitted fori_loop program, timed at two step
    counts; the difference isolates per-step cost from dispatch/sync
    latency. Costs one extra compile per model — the price of an honest
    number (the 1B/8B ratio measured 0.89 where naive size scaling
    predicts ~0.3; docs/performance.md)."""
    import time

    def step_time(params, config: ModelConfig) -> float:
        cache = KVCache.create(config, 1, seq_len,
                               dtype=params["final_norm"].dtype)
        tok = jnp.zeros((1, 1), jnp.int32)

        @functools.partial(jax.jit, static_argnames=("steps",), donate_argnums=(1,))
        def run(params, cache, steps: int):
            def body(i, carry):
                tok, cache = carry
                logits, cache = forward(params, cache, tok, i, config)
                return jnp.argmax(logits[:, -1], -1).astype(jnp.int32)[:, None], cache

            tok2, cache = jax.lax.fori_loop(
                0, steps, body, (jnp.zeros((1, 1), jnp.int32), cache))
            return tok2, cache

        def timed(steps: int, cache) -> tuple:
            t0 = time.perf_counter()
            tok2, cache = run(params, cache, steps)
            np.asarray(tok2)  # force through any async transport
            return time.perf_counter() - t0, cache

        _, cache = timed(steps_lo, cache)          # warm both programs
        _, cache = timed(steps_hi, cache)
        marginals = []
        for _ in range(3):
            lo, cache = timed(steps_lo, cache)
            hi, cache = timed(steps_hi, cache)
            marginals.append((hi - lo) / (steps_hi - steps_lo))
        # Median of three: sub-ms steps on fast backends are noise-prone
        # (a single negative marginal would make the ratio meaningless).
        return max(sorted(marginals)[1], 1e-9)

    t_target = step_time(target_params, target_config)
    t_draft = step_time(draft_params, draft_config)
    return t_draft / t_target


def speculative_generate(
    target_params,
    target_config: ModelConfig,
    draft_params,
    draft_config: ModelConfig,
    prompt: jax.Array,             # int32 [1, M]
    *,
    max_new_tokens: int,
    n_draft: int = 4,
    temperature: float = 0.0,
    max_seq_len: Optional[int] = None,
    eos_ids: Tuple[int, ...] = (),
    seed: int = 0,
    target_cache=None,
    draft_cache=None,
    _force_accept: Optional[int] = None,
) -> Tuple[np.ndarray, dict]:
    """Generate with draft/target speculative decoding (batch 1).

    Returns (tokens [n] int32, stats{"accept_rate", "iterations", ...}).
    temperature=0 → exact target greedy decode; >0 → rejection sampling
    whose output distribution equals sampling the target directly.

    `_force_accept` is a BENCHMARK-ONLY hook (benchmarks/speculative_bench):
    pretend exactly k drafts verify each round, so the full pipeline cost
    (draft matvecs + verify prefill + host sync) can be measured as a
    function of accept rate with random weights — output tokens are then
    meaningless. Real runs leave it None.
    """
    assert prompt.shape[0] == 1, "speculative decoding is a latency feature: B=1"
    m = prompt.shape[1]
    total = max_seq_len or min(target_config.max_seq_len, m + max_new_tokens + n_draft + 2)
    if target_cache is None:
        target_cache = KVCache.create(target_config, 1, total)
    if draft_cache is None:
        draft_cache = KVCache.create(draft_config, 1, total)
    key = jax.random.PRNGKey(seed)

    # Prefill both models on the prompt; sample the first token from the target.
    t_logits, target_cache = _fwd(target_params, target_cache, prompt, 0, target_config)
    _, draft_cache = _fwd(draft_params, draft_cache, prompt, 0, draft_config)
    key, k0 = jax.random.split(key)
    last = int(_sample(t_logits[0, -1], k0, temperature))

    pos = m                       # keys 0..pos-1 cached in the TARGET
    prev_last = int(prompt[0, -1])
    out = [last]
    n_accepted = 0
    n_proposed = 0
    iterations = 0

    while len(out) < max_new_tokens and pos + n_draft + 1 < total:
        if eos_ids and out[-1] in eos_ids:
            break
        iterations += 1

        # ---- draft phase: propose d_1..d_{n-1} ------------------------------
        drafts = []
        qs = []  # draft distributions (sampled mode)
        key, kd = jax.random.split(key)
        window = jnp.asarray([[prev_last, last]], jnp.int32)
        d_logits, draft_cache = _fwd(draft_params, draft_cache, window,
                                     pos - 1, draft_config)
        step_logits = d_logits[0, -1]
        for i in range(n_draft - 1):
            kd, ks = jax.random.split(kd)
            tok = int(_sample(step_logits, ks, temperature))
            drafts.append(tok)
            if temperature > 0.0:
                qs.append(_softmax_t(step_logits, temperature))
            if i < n_draft - 2:
                d_logits, draft_cache = _fwd(
                    draft_params, draft_cache,
                    jnp.asarray([[tok]], jnp.int32), pos + 1 + i, draft_config)
                step_logits = d_logits[0, -1]
        n_proposed += len(drafts)

        # ---- verify: one target forward over [last, d_1..d_{n-1}] -----------
        verify = jnp.asarray([[last] + drafts], jnp.int32)
        v_logits, target_cache = _fwd(target_params, target_cache, verify,
                                      pos, target_config)
        v_logits = v_logits[0]  # [n_draft, V]

        accepted = []
        k_acc = 0
        if _force_accept is not None:
            greedy = np.asarray(jnp.argmax(v_logits, axis=-1))
            k_acc = min(_force_accept, len(drafts))
            accepted = drafts[:k_acc]
            next_tok = int(greedy[k_acc])
        elif temperature == 0.0:
            greedy = np.asarray(jnp.argmax(v_logits, axis=-1))
            for i, d in enumerate(drafts):
                if d == int(greedy[i]):
                    accepted.append(d)
                    k_acc += 1
                else:
                    break
            next_tok = int(greedy[k_acc])
        else:
            ps = _softmax_t(v_logits, temperature)  # [n_draft, V] target dists
            next_tok = None
            for i, d in enumerate(drafts):
                key, ka = jax.random.split(key)
                p_i = float(ps[i, d])
                q_i = float(qs[i][d])
                if float(jax.random.uniform(ka)) * q_i <= p_i:
                    accepted.append(d)
                    k_acc += 1
                else:
                    # Resample from the residual max(p - q, 0).
                    resid = jnp.maximum(ps[i] - qs[i], 0.0)
                    z = float(jnp.sum(resid))
                    key, kr = jax.random.split(key)
                    if z <= 0.0:
                        next_tok = int(_sample(v_logits[i], kr, temperature))
                    else:
                        next_tok = int(jax.random.categorical(kr, jnp.log(resid + 1e-30)))
                    break
            if next_tok is None:  # all drafts accepted → bonus token
                key, kb = jax.random.split(key)
                next_tok = int(_sample(v_logits[len(drafts)], kb, temperature))

        n_accepted += k_acc
        emitted = accepted + [next_tok]
        # Advance: context grows by the emitted tokens.
        prev_last = (accepted[-1] if accepted else last)
        last = next_tok
        pos = pos + k_acc + 1
        for tok in emitted:
            out.append(tok)
            if len(out) >= max_new_tokens or (eos_ids and tok in eos_ids):
                break
        if eos_ids and out[-1] in eos_ids:
            break

    stats = {
        "iterations": iterations,
        "proposed": n_proposed,
        "accepted": n_accepted,
        "accept_rate": (n_accepted / n_proposed) if n_proposed else 0.0,
        "tokens_per_iteration": (len(out) - 1) / iterations if iterations else 0.0,
    }
    return np.asarray(out[:max_new_tokens], np.int32), stats
