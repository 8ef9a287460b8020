"""Paged vs dense decode attention on chip: fills × page sizes.

Times ONE decode-attention call (8B attention shape, int8 KV) for the dense
stacked-slab kernel vs the paged kernel at several cache fills and page
sizes, with the repeats-marginal method (fori_loop over R repeats inside a
single jitted program; the tunnel's fixed dispatch+sync latency cancels
between two repeat counts of the same executable).

Both kernels read the same KV bytes per step — differences are pure grid /
DMA-indirection overhead, which is what `page_size` tunes: smaller pages
mean finer allocation granularity (less memory waste for short rows) but
more grid steps and smaller DMAs.

Usage: python benchmarks/paged_bench.py [--batch 8] [--fills 256,1024,2048]
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

from metalchat_tpu.ops.decode_attention_pallas import decode_attention_quantized
from metalchat_tpu.ops.paged_attention_pallas import paged_decode_attention

# Llama-3.1-8B attention geometry.
NH, NKV, HD = 32, 8, 128
SCALE = HD ** -0.5


def _marginal_us(fn, r_lo=32, r_hi=224, tries=3) -> float:
    def wall(r):
        t0 = time.perf_counter()
        np.asarray(fn(r))
        return time.perf_counter() - t0

    wall(r_lo), wall(r_hi)  # compile
    lo = min(wall(r_lo) for _ in range(tries))
    hi = min(wall(r_hi) for _ in range(tries))
    return max(hi - lo, 0.0) / (r_hi - r_lo) * 1e6


def bench_dense(b: int, t_max: int, fill: int) -> float:
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (b, NH, HD), jnp.bfloat16)
    k = jax.random.randint(key, (b, NKV, t_max, HD), -127, 128, jnp.int8)
    v = jax.random.randint(key, (b, NKV, t_max, HD), -127, 128, jnp.int8)
    ks = jnp.full((b, NKV, t_max), 0.01, jnp.float32)
    lengths = jnp.full((b,), fill, jnp.int32)

    @functools.partial(jax.jit, static_argnames=("reps",))
    def run(q, k, v, ks, lengths, reps: int):
        def body(_, carry):
            qq, acc = carry
            o = decode_attention_quantized(qq, k, v, ks, ks, lengths,
                                           scale=SCALE)
            s = jnp.sum(o.astype(jnp.float32))
            return qq + jnp.asarray(s * 1e-30, qq.dtype), acc + s

        _, acc = jax.lax.fori_loop(0, reps, body, (q, jnp.float32(0.0)))
        return acc

    return _marginal_us(lambda r: run(q, k, v, ks, lengths, r))


def bench_paged(b: int, t_max: int, fill: int, psize: int) -> float:
    key = jax.random.PRNGKey(0)
    pages_per_seq = t_max // psize
    num_pages = b * pages_per_seq
    q = jax.random.normal(key, (b, NH, HD), jnp.bfloat16)
    kp = jax.random.randint(key, (NKV, num_pages, psize, HD), -127, 128, jnp.int8)
    vp = jax.random.randint(key, (NKV, num_pages, psize, HD), -127, 128, jnp.int8)
    sc = jnp.full((num_pages, NKV, psize), 0.01, jnp.float32)
    # Shuffled physical pages — the realistic fragmented-allocator case.
    rng = np.random.default_rng(0)
    pt = rng.permutation(num_pages).reshape(b, pages_per_seq).astype(np.int32)
    page_table = jnp.asarray(pt)
    lengths = jnp.full((b,), fill, jnp.int32)

    @functools.partial(jax.jit, static_argnames=("reps",))
    def run(q, kp, vp, sc, page_table, lengths, reps: int):
        def body(_, carry):
            qq, acc = carry
            o = paged_decode_attention(qq, kp, vp, sc, sc, page_table,
                                       lengths, scale=SCALE)
            s = jnp.sum(o.astype(jnp.float32))
            return qq + jnp.asarray(s * 1e-30, qq.dtype), acc + s

        _, acc = jax.lax.fori_loop(0, reps, body, (q, jnp.float32(0.0)))
        return acc

    return _marginal_us(lambda r: run(q, kp, vp, sc, page_table, lengths, r))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--ctx", type=int, default=2048)
    ap.add_argument("--fills", default="256,1024,2048")
    ap.add_argument("--page-sizes", default="64,128,256")
    args = ap.parse_args()

    fills = [int(x) for x in args.fills.split(",")]
    psizes = [int(x) for x in args.page_sizes.split(",")]
    rows = []
    for fill in fills:
        t_max = args.ctx
        dense = bench_dense(args.batch, t_max, fill)
        row = {"fill": fill, "batch": args.batch, "dense_us": round(dense, 1)}
        # KV bytes actually read per call (int8 K+V for `fill` positions).
        kv_bytes = 2 * args.batch * NKV * fill * HD
        row["dense_gbps"] = round(kv_bytes / dense / 1e3, 1)
        for ps in psizes:
            us = bench_paged(args.batch, t_max, fill, ps)
            row[f"paged{ps}_us"] = round(us, 1)
            row[f"paged{ps}_gbps"] = round(kv_bytes / us / 1e3, 1)
        rows.append(row)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
