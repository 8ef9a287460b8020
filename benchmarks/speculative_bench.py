"""Speculative-decoding breakeven analysis on real hardware.

Speculative decoding emits E[tokens/round] = (accepted drafts + 1) per
round costing (n_draft-1) draft decode steps + one target verify pass.
Whether it beats plain decode depends only on three measured quantities:

    t_target  — one 8B W4A8 target decode step
    t_draft   — one 1B W8A8 draft decode step
    t_verify(n) — target forward over an n-token window (prefill-shaped)

all measured here with the repeats-marginal method (fori_loop over R
repeats inside ONE jitted program; the tunnel's fixed dispatch+sync latency
cancels between two repeat counts of the same executable).

Breakeven: speculative wins iff
    E[tok/round] / round_cost > 1 / t_target
with E[tok/round] = (n-1)·α + 1 for per-draft accept prob α (greedy),
round_cost = (n-1)·t_draft + t_verify(n) + t_sync.

The host-side sync per round is environment-dependent: ~28 ms through this
chip's tunnel (CLAUDE.md) — decisive here — vs O(100 µs) for a locally
attached chip; the table prints breakeven α for both. Accept rates
themselves need real weights: the trained fixture pair (tools/train_fixture
--size {10m,50m}) gives a real α for a same-corpus draft/target pair.

Usage: python benchmarks/speculative_bench.py [--n-draft 5]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _marginal_ms(fn, r_lo=16, r_hi=112, tries=3) -> float:
    """Wall of fn(reps) marginal between two repeat counts, in ms/rep.

    r_hi - r_lo must be large enough that the compute delta dominates the
    tunnel's ~25 ms dispatch jitter (bench.py uses 16 vs 144 steps)."""
    def wall(r):
        t0 = time.perf_counter()
        np.asarray(fn(r))
        return time.perf_counter() - t0

    wall(r_lo), wall(r_hi)  # compile
    lo = min(wall(r_lo) for _ in range(tries))
    hi = min(wall(r_hi) for _ in range(tries))
    return max(hi - lo, 0.0) / (r_hi - r_lo) * 1e3


def _decode_steps_fn(params, cfg, quantized):
    from metalchat_tpu.cache import KVCache, QuantizedKVCache
    from metalchat_tpu.models.transformer import forward

    cls = QuantizedKVCache if quantized else KVCache

    @functools.partial(jax.jit, static_argnames="reps")
    def run(params, reps: int):
        cache = cls.create(cfg, 1, cfg.max_seq_len)
        token = jnp.ones((1, 1), jnp.int32)

        def body(i, carry):
            token, cache = carry
            logits, cache = forward(params, cache, token, 16 + i, cfg)
            return jnp.argmax(logits[:, -1], -1).astype(jnp.int32)[:, None], cache

        token, _ = jax.lax.fori_loop(0, reps, body, (token, cache))
        return token

    return run


def _verify_fn(params, cfg, n: int):
    from metalchat_tpu.cache import QuantizedKVCache
    from metalchat_tpu.models.transformer import forward

    @functools.partial(jax.jit, static_argnames="reps")
    def run(params, reps: int):
        cache = QuantizedKVCache.create(cfg, 1, cfg.max_seq_len)
        toks = jnp.ones((1, n), jnp.int32)

        def body(i, carry):
            bias, acc = carry
            logits, _ = forward(params, cache, toks + bias, 16, cfg)
            s = jnp.sum(logits[:, -1])
            return jnp.asarray(s * 1e-30, jnp.int32), acc + s

        _, acc = jax.lax.fori_loop(
            0, reps, body, (jnp.zeros((), jnp.int32), jnp.zeros((), jnp.float32)))
        return acc

    return run


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-draft", type=int, default=5)
    ap.add_argument("--sync-ms", type=float, default=None,
                    help="per-round host sync cost; default: measured "
                         "dispatch round-trip")
    args = ap.parse_args()

    from bench import build

    tcfg, tparams, _ = build("8b-w4a8")
    dcfg, dparams, _ = build("1b-w8a8")

    t_target = _marginal_ms(lambda r: _decode_steps_fn(tparams, tcfg, True)(tparams, r))
    print(f"t_target (8B W4A8 decode step): {t_target:.2f} ms", flush=True)
    t_draft = _marginal_ms(lambda r: _decode_steps_fn(dparams, dcfg, True)(dparams, r))
    print(f"t_draft  (1B W8A8 decode step): {t_draft:.2f} ms", flush=True)

    n = args.n_draft
    vfn = _verify_fn(tparams, tcfg, n)
    t_verify = _marginal_ms(lambda r: vfn(tparams, r), r_lo=8, r_hi=56)
    print(f"t_verify (8B over {n}-token window): {t_verify:.2f} ms", flush=True)

    # Per-round host sync: one tiny dispatch round-trip, measured directly.
    one = jax.jit(lambda x: x + 1)
    np.asarray(one(jnp.zeros(8)))
    syncs = []
    for _ in range(7):
        t0 = time.perf_counter()
        np.asarray(one(jnp.zeros(8)))
        syncs.append(time.perf_counter() - t0)
    t_sync_measured = float(np.median(syncs)) * 1e3
    print(f"t_sync   (dispatch round-trip): {t_sync_measured:.2f} ms", flush=True)

    rows = []
    for sync_ms, env in ((args.sync_ms or t_sync_measured, "this tunnel"),
                         (0.2, "local chip (typical)")):
        round_cost = (n - 1) * t_draft + t_verify + sync_ms
        # Win iff ((n-1)α + 1) / round_cost > 1 / t_target
        alpha_star = (round_cost / t_target - 1.0) / (n - 1)
        speedups = {
            a: ((n - 1) * a + 1) * t_target / round_cost
            for a in (0.5, 0.7, 0.9)
        }
        rows.append({
            "env": env, "sync_ms": round(sync_ms, 2),
            "round_cost_ms": round(round_cost, 2),
            "breakeven_alpha": round(alpha_star, 3),
            "speedup_at_alpha": {str(a): round(s, 3)
                                 for a, s in speedups.items()},
        })
        print(f"[{env}] round {round_cost:.2f} ms, breakeven α = "
              f"{alpha_star:.3f}, speedup @α=0.7: {speedups[0.7]:.2f}x",
              flush=True)

    print(json.dumps({
        "metric": "speculative_breakeven",
        "n_draft": n,
        "t_target_ms": round(t_target, 3),
        "t_draft_ms": round(t_draft, 3),
        "t_verify_ms": round(t_verify, 3),
        "t_sync_measured_ms": round(t_sync_measured, 3),
        "environments": rows,
    }))


if __name__ == "__main__":
    main()
