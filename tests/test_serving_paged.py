"""Paged-mode continuous batching: parity with dense, growth, OOM handling."""

import numpy as np
import pytest

import jax.numpy as jnp

from metalchat_tpu.engine.serving import ContinuousBatchingEngine, Request
from metalchat_tpu.models import init_random_params
from metalchat_tpu.sampling import SamplerConfig

from test_model import TINY_LLAMA


@pytest.fixture(scope="module")
def model():
    cfg = TINY_LLAMA.replace(max_seq_len=64)
    params = init_random_params(cfg, seed=61, dtype=jnp.float32)
    return cfg, params


def test_paged_matches_dense_engine(model):
    cfg, params = model
    prompts = [[1, 2, 3, 4, 5], [9, 8, 7], [4, 4, 4, 4]]

    dense = ContinuousBatchingEngine(params, cfg, max_slots=3, max_seq_len=64,
                                     quantized_kv=True)
    reqs_a = [Request(prompt=p, max_new_tokens=6) for p in prompts]
    out_a = dense.run(reqs_a)

    paged = ContinuousBatchingEngine(params, cfg, max_slots=3, max_seq_len=64,
                                     cache_mode="paged", page_size=8)
    reqs_b = [Request(prompt=p, max_new_tokens=6) for p in prompts]
    out_b = paged.run(reqs_b)

    for ra, rb in zip(reqs_a, reqs_b):
        # Both paths store int8 KV; greedy rollouts agree.
        assert out_a[ra.request_id].tokens == out_b[rb.request_id].tokens


def test_page_growth_across_boundaries(model):
    """Decode crosses several page boundaries (page_size 4, 20+ tokens)."""
    cfg, params = model
    engine = ContinuousBatchingEngine(params, cfg, max_slots=1, max_seq_len=64,
                                      cache_mode="paged", page_size=4)
    req = Request(prompt=[1, 2, 3], max_new_tokens=18)
    out = engine.run([req])
    completion = out[req.request_id]
    assert completion.finish_reason == "length"
    assert len(completion.tokens) == 18
    # pages were all freed at completion
    assert engine.allocator.free_pages == engine.num_pages


def test_kv_oom_contained(model):
    """A request that outgrows the page pool finishes with kv_oom; a small
    one completes fine afterwards (containment + page recycling)."""
    cfg, params = model
    engine = ContinuousBatchingEngine(params, cfg, max_slots=2, max_seq_len=64,
                                      cache_mode="paged", page_size=4, num_pages=4)
    big = Request(prompt=[1, 2, 3, 4, 5, 6], max_new_tokens=30)   # needs 9 pages
    small = Request(prompt=[7, 8], max_new_tokens=3)
    out = engine.run([big, small])
    assert out[big.request_id].finish_reason == "kv_oom"
    assert out[small.request_id].finish_reason == "length"
    assert len(out[small.request_id].tokens) == 3
    assert engine.allocator.free_pages == 4


def test_unsatisfiable_prompt_rejected(model):
    """A prompt larger than the whole pool can never run → kv_oom, no hang."""
    cfg, params = model
    engine = ContinuousBatchingEngine(params, cfg, max_slots=1, max_seq_len=64,
                                      cache_mode="paged", page_size=4, num_pages=2)
    req = Request(prompt=list(range(1, 30)), max_new_tokens=4)
    out = engine.run([req])
    assert out[req.request_id].finish_reason == "kv_oom"
    assert "pages" in out[req.request_id].error


def test_paged_decode_burst_matches_single(model):
    cfg, params = model
    prompts = [[1, 2, 3, 4, 5], [9, 8, 7], [4, 4, 4, 4]]
    single = ContinuousBatchingEngine(params, cfg, max_slots=3, max_seq_len=64,
                                      cache_mode="paged", page_size=8)
    reqs_a = [Request(prompt=p, max_new_tokens=10) for p in prompts]
    out_a = single.run(reqs_a)
    burst = ContinuousBatchingEngine(params, cfg, max_slots=3, max_seq_len=64,
                                     cache_mode="paged", page_size=8,
                                     decode_burst=8)
    reqs_b = [Request(prompt=p, max_new_tokens=10) for p in prompts]
    out_b = burst.run(reqs_b)
    for ra, rb in zip(reqs_a, reqs_b):
        assert out_a[ra.request_id].tokens == out_b[rb.request_id].tokens


def test_paged_burst_grows_pages(model):
    """Bursting across page boundaries pre-allocates the pages it needs
    (page_size 4 < burst 8)."""
    cfg, params = model
    engine = ContinuousBatchingEngine(params, cfg, max_slots=2, max_seq_len=64,
                                      cache_mode="paged", page_size=4,
                                      decode_burst=8)
    reqs = [Request(prompt=[1, 2, 3], max_new_tokens=17),
            Request(prompt=[7, 7, 7, 7, 7], max_new_tokens=13)]
    out = engine.run(reqs)
    single = ContinuousBatchingEngine(params, cfg, max_slots=2, max_seq_len=64,
                                      cache_mode="paged", page_size=4)
    reqs_s = [Request(prompt=[1, 2, 3], max_new_tokens=17),
              Request(prompt=[7, 7, 7, 7, 7], max_new_tokens=13)]
    out_s = single.run(reqs_s)
    for ra, rb in zip(reqs, reqs_s):
        assert out[ra.request_id].tokens == out_s[rb.request_id].tokens
