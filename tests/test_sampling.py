"""Sampler tests (reference: nn/sampling.h tiers — topk/nucleus/multinomial)."""

import numpy as np

import jax
import jax.numpy as jnp

from metalchat_tpu.sampling import (
    SamplerConfig,
    multinomial,
    sample,
    top_k_mask,
    top_p_mask,
)


def test_greedy_is_argmax():
    logits = jnp.asarray(np.random.default_rng(0).standard_normal((4, 33)))
    out = sample(logits, None, SamplerConfig.greedy())
    np.testing.assert_array_equal(np.asarray(out), np.asarray(logits).argmax(-1))


def test_top_k_mask():
    logits = jnp.asarray([[1.0, 5.0, 3.0, 2.0, 4.0]])
    masked = np.asarray(top_k_mask(logits, 2))
    assert np.isfinite(masked).sum() == 2
    assert np.isfinite(masked[0, [1, 4]]).all()
    # k >= V is the identity
    np.testing.assert_array_equal(np.asarray(top_k_mask(logits, 5)), np.asarray(logits))
    np.testing.assert_array_equal(np.asarray(top_k_mask(logits, 0)), np.asarray(logits))


def test_top_p_mask():
    # probs = [0.4, 0.3, 0.2, 0.1] after softmax of these logits
    probs = np.array([0.4, 0.3, 0.2, 0.1])
    logits = jnp.asarray(np.log(probs))[None, :]
    # p=0.5: exclusive cumsum = [0, .4, .7, .9] → keep first two (0.0<0.5, 0.4<0.5)
    masked = np.asarray(top_p_mask(logits, 0.5))
    assert np.isfinite(masked[0, :2]).all() and not np.isfinite(masked[0, 2:]).any()
    # p=1 identity
    np.testing.assert_array_equal(np.asarray(top_p_mask(logits, 1.0)), np.asarray(logits))
    # tiny p keeps exactly the argmax
    masked = np.asarray(top_p_mask(logits, 1e-6))
    assert np.isfinite(masked).sum() == 1 and np.isfinite(masked[0, 0])


def test_sampled_distribution_matches_probs():
    """Histogram of categorical draws ≈ softmax distribution (the analog of
    the reference's multinomial correctness check)."""
    probs = np.array([0.5, 0.25, 0.125, 0.125])
    logits = jnp.tile(jnp.asarray(np.log(probs)), (4096, 1))
    cfg = SamplerConfig(temperature=1.0, top_k=0, top_p=1.0)
    draws = np.asarray(sample(logits, jax.random.PRNGKey(7), cfg))
    freq = np.bincount(draws, minlength=4) / draws.size
    np.testing.assert_allclose(freq, probs, atol=0.03)


def test_temperature_sharpening():
    logits = jnp.tile(jnp.asarray([0.0, 1.0]), (2048, 1))
    hot = np.asarray(sample(logits, jax.random.PRNGKey(0), SamplerConfig(5.0, 0, 1.0)))
    cold = np.asarray(sample(logits, jax.random.PRNGKey(0), SamplerConfig(0.1, 0, 1.0)))
    assert cold.mean() > hot.mean()  # cold ≈ always argmax (=1)
    assert cold.mean() > 0.99


def test_multinomial_inverse_cdf():
    probs = jnp.tile(jnp.asarray([0.0, 0.0, 1.0, 0.0]), (16, 1))
    out = np.asarray(multinomial(probs, jax.random.PRNGKey(3)))
    np.testing.assert_array_equal(out, np.full(16, 2))


def test_default_matches_reference_chain():
    cfg = SamplerConfig()
    assert (cfg.temperature, cfg.top_k, cfg.top_p) == (0.6, 50, 0.9)


def test_min_p_mask():
    from metalchat_tpu.sampling import min_p_mask

    logits = jnp.log(jnp.asarray([[0.5, 0.3, 0.15, 0.05]]))
    masked = min_p_mask(logits, 0.2)   # cutoff = 0.5*0.2 = 0.1
    kept = np.isfinite(np.asarray(masked))[0]
    np.testing.assert_array_equal(kept, [True, True, True, False])
    # disabled
    np.testing.assert_array_equal(np.asarray(min_p_mask(logits, 0.0)),
                                  np.asarray(logits))


def test_penalties_shift_logits():
    from metalchat_tpu.sampling import SamplerConfig, apply_penalties

    logits = jnp.zeros((1, 8), jnp.float32).at[0, 2].set(1.0).at[0, 3].set(-1.0)
    history = jnp.asarray([[2, 2, 3, 7]], jnp.int32)
    cfg = SamplerConfig(repetition_penalty=2.0, frequency_penalty=0.1,
                        presence_penalty=0.5)
    out = np.asarray(apply_penalties(logits, history, cfg))
    # token 2 (positive logit, seen twice): 1/2 - 2*0.1 - 0.5 = -0.2
    np.testing.assert_allclose(out[0, 2], -0.2, atol=1e-6)
    # token 3 (negative logit): -1*2 - 0.1 - 0.5 = -2.6
    np.testing.assert_allclose(out[0, 3], -2.6, atol=1e-6)
    # unseen token unchanged
    np.testing.assert_allclose(out[0, 1], 0.0, atol=1e-6)


def test_penalties_respect_history_mask():
    from metalchat_tpu.sampling import SamplerConfig, apply_penalties

    logits = jnp.zeros((1, 8), jnp.float32)
    history = jnp.asarray([[5, 0, 0, 0]], jnp.int32)   # 0s are padding
    mask = jnp.asarray([[1, 0, 0, 0]], jnp.float32)
    cfg = SamplerConfig(presence_penalty=1.0)
    out = np.asarray(apply_penalties(logits, history, cfg, mask))
    assert out[0, 5] == -1.0 and out[0, 0] == 0.0


def test_sample_with_penalties_avoids_repeats():
    from metalchat_tpu.sampling import SamplerConfig, sample

    # token 4 dominates, but a huge presence penalty after it appears in
    # history pushes sampling elsewhere even greedily.
    logits = jnp.zeros((1, 8), jnp.float32).at[0, 4].set(3.0).at[0, 1].set(2.0)
    history = jnp.asarray([[4]], jnp.int32)
    cfg = SamplerConfig(temperature=0.0, presence_penalty=10.0)
    tok = int(sample(logits, None, cfg, history=history)[0])
    assert tok == 1
