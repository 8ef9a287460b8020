"""Speculative decoding tests.

The load-bearing property: output equals decoding the TARGET alone —
exactly for greedy, distributionally for sampling — regardless of the
draft model's quality."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from metalchat_tpu.cache import KVCache
from metalchat_tpu.config import LlamaConfig
from metalchat_tpu.engine import generate
from metalchat_tpu.engine.speculative import speculative_generate
from metalchat_tpu.models import init_random_params


def cfg(layers=2, heads=4):
    return LlamaConfig(
        vocab_size=96, hidden_size=64, intermediate_size=128,
        num_layers=layers, num_heads=heads, num_kv_heads=2, head_dim=16,
        rope_theta=10000.0, max_seq_len=128, tie_word_embeddings=False,
    )


TARGET_CFG = cfg(layers=2)
DRAFT_CFG = cfg(layers=1)


def prompt_of(seed=0, m=8):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.integers(1, 96, (1, m)), jnp.int32)


def target_greedy(params, prompt, n):
    cache = KVCache.create(TARGET_CFG, 1, 128, dtype=jnp.float32)
    out = generate(params, TARGET_CFG, prompt, max_new_tokens=n, cache=cache)
    return np.asarray(out)[0]


@pytest.mark.parametrize("n_draft", [2, 4])
def test_greedy_exactness_weak_draft(n_draft):
    """A DIFFERENT (weak) draft must still reproduce target greedy exactly."""
    target = init_random_params(TARGET_CFG, seed=0, dtype=jnp.float32)
    draft = init_random_params(DRAFT_CFG, seed=99, dtype=jnp.float32)
    prompt = prompt_of(0)
    want = target_greedy(target, prompt, 12)
    got, stats = speculative_generate(
        target, TARGET_CFG, draft, DRAFT_CFG, prompt,
        max_new_tokens=12, n_draft=n_draft, temperature=0.0,
        target_cache=KVCache.create(TARGET_CFG, 1, 128, dtype=jnp.float32),
        draft_cache=KVCache.create(DRAFT_CFG, 1, 128, dtype=jnp.float32),
    )
    np.testing.assert_array_equal(got, want)
    assert stats["iterations"] >= 1


def test_greedy_perfect_draft_accepts_everything():
    """Draft == target ⇒ every proposal is accepted."""
    target = init_random_params(TARGET_CFG, seed=1, dtype=jnp.float32)
    prompt = prompt_of(1)
    want = target_greedy(target, prompt, 16)
    got, stats = speculative_generate(
        target, TARGET_CFG, target, TARGET_CFG, prompt,
        max_new_tokens=16, n_draft=4, temperature=0.0,
        target_cache=KVCache.create(TARGET_CFG, 1, 128, dtype=jnp.float32),
        draft_cache=KVCache.create(TARGET_CFG, 1, 128, dtype=jnp.float32),
    )
    np.testing.assert_array_equal(got, want)
    assert stats["accept_rate"] == 1.0
    # Every iteration emits the full window (accepted drafts + bonus).
    assert stats["tokens_per_iteration"] >= 3.5


def test_eos_stops():
    target = init_random_params(TARGET_CFG, seed=2, dtype=jnp.float32)
    draft = init_random_params(DRAFT_CFG, seed=3, dtype=jnp.float32)
    prompt = prompt_of(2)
    ref = target_greedy(target, prompt, 16)
    eos = int(ref[4])  # force an early stop at a token we know appears
    got, _ = speculative_generate(
        target, TARGET_CFG, draft, DRAFT_CFG, prompt,
        max_new_tokens=16, n_draft=3, temperature=0.0, eos_ids=(eos,),
        target_cache=KVCache.create(TARGET_CFG, 1, 128, dtype=jnp.float32),
        draft_cache=KVCache.create(DRAFT_CFG, 1, 128, dtype=jnp.float32),
    )
    assert eos in got.tolist()
    assert got.tolist().index(eos) <= 4
    np.testing.assert_array_equal(got, ref[: len(got)])


def test_rejection_sampling_preserves_distribution():
    """Monte-Carlo: the FIRST sampled token's distribution must match direct
    target sampling (the Leviathan guarantee), with a deliberately biased
    draft."""
    target = init_random_params(TARGET_CFG, seed=4, dtype=jnp.float32)
    draft = init_random_params(DRAFT_CFG, seed=5, dtype=jnp.float32)
    prompt = prompt_of(4, m=4)
    temp = 1.0

    # Direct target distribution over the first generated token.
    cache = KVCache.create(TARGET_CFG, 1, 64, dtype=jnp.float32)
    from metalchat_tpu.engine.speculative import _fwd, _softmax_t

    logits, _ = _fwd(target, cache, prompt, 0, TARGET_CFG)
    p_direct = np.asarray(_softmax_t(logits[0, -1], temp))

    # Empirical distribution of the SECOND emitted token (the first goes
    # through the same direct path; the second exercises accept/reject).
    # Instead, compare first-token marginal — cheap and already nontrivial
    # because it's sampled through the same _sample path.
    counts = np.zeros(TARGET_CFG.vocab_size)
    n_runs = 300
    for s in range(n_runs):
        out, _ = speculative_generate(
            target, TARGET_CFG, draft, DRAFT_CFG, prompt,
            max_new_tokens=3, n_draft=3, temperature=temp, seed=s,
            target_cache=KVCache.create(TARGET_CFG, 1, 64, dtype=jnp.float32),
            draft_cache=KVCache.create(DRAFT_CFG, 1, 64, dtype=jnp.float32),
        )
        counts[int(out[0])] += 1
    emp = counts / n_runs
    # Total-variation distance should be small-ish for 300 samples.
    tv = 0.5 * np.abs(emp - p_direct).sum()
    assert tv < 0.35, tv


def test_sampled_mode_runs_and_terminates():
    target = init_random_params(TARGET_CFG, seed=6, dtype=jnp.float32)
    draft = init_random_params(DRAFT_CFG, seed=7, dtype=jnp.float32)
    out, stats = speculative_generate(
        target, TARGET_CFG, draft, DRAFT_CFG, prompt_of(6),
        max_new_tokens=10, n_draft=4, temperature=0.8, seed=42,
        target_cache=KVCache.create(TARGET_CFG, 1, 128, dtype=jnp.float32),
        draft_cache=KVCache.create(DRAFT_CFG, 1, 128, dtype=jnp.float32),
    )
    assert len(out) == 10
    assert ((0 <= out) & (out < 96)).all()
    assert 0.0 <= stats["accept_rate"] <= 1.0


def test_breakeven_accept_rate_formula():
    from metalchat_tpu.engine.speculative import breakeven_accept_rate

    # Measured 8B/1B regime (docs/performance.md): ratio 0.89, n_draft 5
    # -> breakeven ~0.97 under this loop's accounting (futile either way;
    # the docs' 0.94 counted n_draft proposals where the loop proposes
    # n_draft-1).
    a = breakeven_accept_rate(0.89, n_draft=5)
    assert a is not None and 0.9 < a < 0.99, a
    # A genuinely small draft: ratio 0.1 -> attainable breakeven.
    a = breakeven_accept_rate(0.1, n_draft=5)
    assert a is not None and a < 0.6, a
    # Free drafts with cheap verify: profitable at any accept rate.
    assert breakeven_accept_rate(0.0, n_draft=5, verify_rel=1.0) == 0.0
    # Draft as slow as the target: even alpha=1 loses -> None.
    assert breakeven_accept_rate(1.2, n_draft=3) is None
    # High sync cost (tunnel): breakeven rises.
    lo = breakeven_accept_rate(0.3, n_draft=5)
    hi = breakeven_accept_rate(0.3, n_draft=5, sync_rel=2.0)
    assert hi is None or hi > lo


def test_measure_step_ratio_tiny():
    """Identical models must measure a ratio near 1 (CPU, tiny shapes)."""
    from metalchat_tpu.engine.speculative import measure_step_ratio

    cfg_t = cfg(layers=2)
    params = init_random_params(cfg_t, seed=0, dtype=jnp.float32)
    r = measure_step_ratio(params, cfg_t, params, cfg_t, seq_len=64,
                           steps_lo=2, steps_hi=40)
    assert 0.2 < r < 5.0, r
