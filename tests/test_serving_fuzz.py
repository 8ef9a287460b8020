"""Property fuzz for the engine's ride-along-KV invariant (VERDICT r2 #9).

Non-decoding rows ride through batched decode steps writing one garbage KV
row at their prefill frontier (engine/serving.py _decode_all). The invariant:
every request's greedy tokens equal a solo batch-1 run, for ANY interleaving
of chunk sizes, bursts, page sizes, staggered arrivals, and cancels. The r2
suite pinned two configurations; this fuzzes randomized schedules across
dense and paged modes.
"""

import random

import numpy as np
import pytest

import jax.numpy as jnp

from metalchat_tpu.cache import KVCache
from metalchat_tpu.engine import generate
from metalchat_tpu.engine.serving import ContinuousBatchingEngine, Request
from metalchat_tpu.models import init_random_params

from test_model import TINY_LLAMA

MAX_SEQ = 96


@pytest.fixture(scope="module")
def model():
    cfg = TINY_LLAMA.replace(max_seq_len=MAX_SEQ)
    params = init_random_params(cfg, seed=13, dtype=jnp.float32)
    return cfg, params


def _solo(cfg, params, prompt, n):
    cache = KVCache.create(cfg, 1, MAX_SEQ, dtype=jnp.float32)
    out = generate(params, cfg, jnp.asarray([prompt], jnp.int32),
                   max_new_tokens=n, cache=cache)
    return np.asarray(out)[0].tolist()


@pytest.mark.parametrize("trial", range(6))
def test_fuzz_rider_kv_invariant(model, trial):
    cfg, params = model
    rng = random.Random(100 + trial)

    paged = trial % 2 == 1
    kw = dict(
        max_slots=rng.choice([2, 3]),
        max_seq_len=MAX_SEQ,
        prefill_chunk=rng.choice([4, 8, 16, 32]),
        decode_burst=rng.choice([1, 2, 4, 8]),
        prefill_interleave=rng.choice([1, 2, 4]),
    )
    if paged:
        kw.update(cache_mode="paged", page_size=rng.choice([4, 8, 16]))
    else:
        kw.update(quantized_kv=rng.random() < 0.5)

    engine = ContinuousBatchingEngine(params, cfg, **kw)

    n_req = rng.randint(3, 7)
    reqs = [
        Request(
            prompt=[rng.randrange(cfg.vocab_size) for _ in range(rng.randint(1, 40))],
            max_new_tokens=rng.randint(1, 12),
        )
        for _ in range(n_req)
    ]
    # Staggered arrivals: submit a few upfront, the rest mid-flight;
    # occasionally cancel one mid-decode.
    upfront = rng.randint(1, n_req)
    ids = [engine.submit(r) for r in reqs[:upfront]]
    pending = list(reqs[upfront:])
    cancel_rid = None
    steps = 0
    while engine.has_work or pending:
        engine.step()
        steps += 1
        if pending and rng.random() < 0.3:
            ids.append(engine.submit(pending.pop(0)))
        if (cancel_rid is None and steps == 7 and len(ids) >= 2
                and rng.random() < 0.5):
            cancel_rid = ids[rng.randrange(len(ids))]
            engine.cancel(cancel_rid)
        assert steps < 3000, "engine did not converge"

    for req in reqs[:len(ids)]:
        completion = engine.completion(req.request_id)
        assert completion.finished
        if req.request_id == cancel_rid:
            continue  # cancelled rows only need containment, not full output
        assert completion.error is None, completion.error
        expect = _solo(cfg, params, list(req.prompt), req.max_new_tokens)
        # int8-KV / paged modes quantize the cache: tokens may diverge from
        # the bf16-cache solo reference only if the engine's own cache mode
        # differs — compare against a solo engine run in the SAME mode.
        if kw.get("quantized_kv") or paged:
            ref_engine = ContinuousBatchingEngine(
                params, cfg, max_slots=1, max_seq_len=MAX_SEQ,
                **({"cache_mode": "paged", "page_size": kw["page_size"]}
                   if paged else {"quantized_kv": kw["quantized_kv"]}),
            )
            ref = ref_engine.run([Request(prompt=list(req.prompt),
                                          max_new_tokens=req.max_new_tokens)])
            expect = list(ref.values())[0].tokens
        assert completion.tokens == expect, (
            trial, kw, req.prompt, completion.tokens, expect)
