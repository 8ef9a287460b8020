"""Sweep block_out for the stacked W4A8 matvec at the 8B decode shapes.

The kernel's default (~4 MB tiles) was tuned on the big FFN matvecs; the
narrow ones (wo 4096x4096, wqkv 6144x4096) run at 70-76% of the HBM floor
on the decode trace — few grid steps may be starving the DMA pipeline.

Methodology: scan over L stacked layers x fori_loop repeats, marginal
between two repeat counts of the same executable (tunnel-safe), consuming
every output column. Prints effective GB/s per (shape, block_out).
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

SHAPES = {  # name: (out, in) logical
    "wqkv": (6144, 4096),
    "wo": (4096, 4096),
    "w13": (28672, 4096),
    "w2": (4096, 14336),
    "lm_head": (128256, 4096),
}


def main() -> None:
    sys.path.insert(0, ".")
    from metalchat_tpu.ops.a8_matvec_pallas import quant_matvec_stacked_fused

    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--reps", default="2,8")
    ap.add_argument("--shapes", default="wqkv,wo,w13,w2")
    ap.add_argument("--blocks", default="256,512,768,1024,2048")
    args = ap.parse_args()
    r_lo, r_hi = map(int, args.reps.split(","))

    for name in args.shapes.split(","):
        out, in_f = SHAPES[name]
        L = args.layers if name != "lm_head" else 1
        k = in_f // 2
        key = jax.random.PRNGKey(0)
        p = jax.random.randint(key, (L, out, k), -127, 128, jnp.int8)
        s = jnp.ones((L, 1, out), jnp.float32) * 0.01
        x = jnp.ones((1, in_f), jnp.bfloat16)
        bytes_per_pass = L * out * k  # int4 packed bytes (scales negligible)

        for bo in map(int, args.blocks.split(",")):
            if out % bo or bo * k > (48 << 20):
                continue

            @functools.partial(jax.jit, static_argnames="reps")
            def run(x, p, s, reps: int):
                def outer(i, carry):
                    def body(l, acc):
                        y = quant_matvec_stacked_fused(acc[:, :in_f], p, s, l,
                                                       bits=4, block_out=bo)
                        contrib = jnp.sum(y, axis=1, keepdims=True) * 1e-30
                        return acc + contrib.astype(acc.dtype)
                    return jax.lax.fori_loop(0, L, body, carry)
                return jax.lax.fori_loop(0, reps, outer, x)

            def wall(reps: int) -> float:
                t0 = time.perf_counter()
                np.asarray(run(x, p, s, reps))
                return time.perf_counter() - t0

            wall(r_lo), wall(r_hi)
            lo = min(wall(r_lo) for _ in range(2))
            hi = min(wall(r_hi) for _ in range(2))
            dt = (hi - lo) / (r_hi - r_lo)
            gbs = bytes_per_pass / dt / 1e9
            print(f"{name:8s} out={out:6d} block_out={bo:5d}: "
                  f"{dt*1e6:8.1f} us/pass  {gbs:6.1f} GB/s eff", flush=True)


if __name__ == "__main__":
    main()
