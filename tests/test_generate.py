"""End-to-end generation tests: closed-loop scan vs streaming vs numpy oracle."""

import numpy as np

import jax.numpy as jnp

from metalchat_tpu.cache import KVCache
from metalchat_tpu.engine import generate, generate_stream
from metalchat_tpu.io.loaders import save_params
from metalchat_tpu.models import init_random_params
from metalchat_tpu.sampling import SamplerConfig

from test_model import TINY_LLAMA

import oracle


def _oracle_greedy(tensors, cfg, prompt, n):
    """Greedy decode with the independent numpy model."""
    kv = {}
    toks = np.asarray(prompt)[None, :]
    logits = oracle.forward(tensors, cfg, toks, 0, kv)
    out = []
    cur = int(logits[0, -1].argmax())
    pos = toks.shape[1]
    for _ in range(n):
        out.append(cur)
        logits = oracle.forward(tensors, cfg, np.array([[cur]]), pos, kv)
        cur = int(logits[0, -1].argmax())
        pos += 1
    return out


def test_greedy_generate_matches_oracle():
    cfg = TINY_LLAMA
    params = init_random_params(cfg, seed=11, dtype=jnp.float32)
    tensors = save_params(params, cfg)
    prompt = [5, 9, 23, 42]
    expect = _oracle_greedy(tensors, cfg, prompt, 8)

    cache = KVCache.create(cfg, 1, 32, dtype=jnp.float32)
    got = generate(
        params, cfg, jnp.asarray(prompt, jnp.int32)[None, :],
        max_new_tokens=8, cache=cache,
    )
    assert np.asarray(got)[0].tolist() == expect

    cache = KVCache.create(cfg, 1, 32, dtype=jnp.float32)
    streamed = list(
        generate_stream(params, cfg, prompt, max_new_tokens=8,
                        sampler=SamplerConfig.greedy(), cache=cache)
    )
    assert streamed == expect


def test_generate_batched_rows_independent():
    cfg = TINY_LLAMA
    params = init_random_params(cfg, seed=12, dtype=jnp.float32)
    p1 = [1, 2, 3]
    p2 = [9, 8, 7]
    cache = KVCache.create(cfg, 2, 32, dtype=jnp.float32)
    both = np.asarray(
        generate(params, cfg, jnp.asarray([p1, p2], jnp.int32),
                 max_new_tokens=6, cache=cache)
    )
    for i, p in enumerate([p1, p2]):
        cache1 = KVCache.create(cfg, 1, 32, dtype=jnp.float32)
        solo = np.asarray(
            generate(params, cfg, jnp.asarray([p], jnp.int32),
                     max_new_tokens=6, cache=cache1)
        )
        np.testing.assert_array_equal(both[i], solo[0])


def test_eos_freezes_row():
    cfg = TINY_LLAMA
    prompt = [5, 9, 23, 42]
    # Find a seed whose greedy rollout isn't a single repeated token, so an
    # EOS id with a well-defined first position exists.
    for seed in range(11, 40):
        params = init_random_params(cfg, seed=seed, dtype=jnp.float32)
        tensors = save_params(params, cfg)
        expect = _oracle_greedy(tensors, cfg, prompt, 8)
        firsts = [i for i in range(1, 8) if expect[i] not in expect[:i]]
        if firsts:
            break
    else:
        raise AssertionError("no varied greedy rollout found")
    j = firsts[0]
    eos = expect[j]

    cache = KVCache.create(cfg, 1, 32, dtype=jnp.float32)
    got = np.asarray(
        generate(params, cfg, jnp.asarray(prompt, jnp.int32)[None, :],
                 max_new_tokens=8, cache=cache, eos_ids=(eos,))
    )[0]
    assert got[j] == eos
    assert (got[j:] == eos).all()  # frozen after EOS

    cache = KVCache.create(cfg, 1, 32, dtype=jnp.float32)
    streamed = list(
        generate_stream(params, cfg, prompt, max_new_tokens=8,
                        sampler=SamplerConfig.greedy(), eos_ids=(eos,), cache=cache)
    )
    assert streamed == expect[: j + 1]  # stops right after emitting EOS
