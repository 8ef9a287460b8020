"""Measure per-pallas_call fixed overhead on the decode matvec shapes.

The r5 trace gap (docs/performance.md): step 5424 µs vs a 4642 µs HBM
floor across 161 pallas_calls/step. How much of the 782 µs is per-LAUNCH
fixed cost (dispatch + Mosaic pipeline fill/drain) rather than per-tile
DMA inefficiency? Same bytes, same tile shapes, two formulations:

  * `calls`  — one pallas_call per layer (the production decode loop),
  * `grid`   — ONE pallas_call whose grid spans all layers (layer index
               is a grid dimension; Mosaic pipelines tiles across layer
               boundaries, so per-launch cost is paid once).

Timing per CLAUDE.md: marginal between stack depths L=2 and L=10, × 30
repeats; outputs fully consumed; weights passed as args.

Measured (v5e, r5): the small shapes (wo/wqkv — 23-50 ms of marginal
work) sit inside the tunnel's dispatch-latency jitter and are not
trustworthy at M=30 (one run read a negative marginal). The two big
rows are the signal:

    w13  calls 83.6 µs/layer   grid 85.7   (≈ equal — already at floor)
    w2   calls 53.0 µs/layer   grid 36.0   (grid = the 35.8 µs DMA floor)

i.e. per-call overhead is real for many-small-tile kernels (w2: 16 grid
steps of [256, 7168]) and absorbed by pipelining when calls merge —
the motivation for ops/ffn_block_pallas.py.

Run (chip): timeout 1200 python benchmarks/launch_overhead_bench.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from metalchat_tpu.ops.a8_matvec_pallas import (
    _fused_kernel,
    _int_acc_w4,
    choose_block_out,
    quant_matvec_stacked_fused,
)

M = 30
L_LO, L_HI = 2, 10

# (name, out, in_f) — the 8B W4A8 decode matvec shapes.
SHAPES = [
    ("wo", 4096, 4096),
    ("wqkv", 6144, 4096),
    ("w13", 28672, 4096),
    ("w2", 4096, 14336),
]


def one_call_all_layers(x, p_stack, s_stack):
    """One pallas_call, grid (L, out//bo): layer rides a grid axis."""
    from metalchat_tpu.ops import resolve_interpret

    L, out, k = p_stack.shape
    b, in_f = x.shape
    bo = choose_block_out(out, k)
    base = _fused_kernel(_int_acc_w4, x.dtype)

    def kern(x_ref, p_ref, s_ref, out_ref):
        base(None, x_ref, p_ref, s_ref, out_ref)

    return pl.pallas_call(
        kern,
        grid=(L, out // bo),
        in_specs=[
            pl.BlockSpec((b, in_f), lambda l, j: (0, 0)),
            pl.BlockSpec((1, bo, k), lambda l, j: (l, j, 0)),
            pl.BlockSpec((1, 1, bo), lambda l, j: (l, 0, j)),
        ],
        out_specs=pl.BlockSpec((b, bo), lambda l, j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((b, out), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=96 << 20,
        ),
        interpret=resolve_interpret(None),
    )(x, p_stack, s_stack)


def make_fn(variant, L):
    @jax.jit
    def fn(x, p_stack, s_stack):
        def body(i, carry):
            if variant == "grid":
                y = one_call_all_layers(carry, p_stack, s_stack)
                s = jnp.sum(y.astype(jnp.float32))
            else:
                def layer(l, acc):
                    y = quant_matvec_stacked_fused(
                        carry, p_stack, s_stack, l, bits=4)
                    return acc + jnp.sum(y.astype(jnp.float32))
                s = jax.lax.fori_loop(0, L, layer, 0.0)
            return carry + (s * 1e-30).astype(carry.dtype)

        return jax.lax.fori_loop(0, M, body, x)

    return fn


def run(variant, out, in_f, rng):
    k = in_f // 2
    times = {}
    for L in (L_LO, L_HI):
        p = jnp.asarray(rng.integers(-127, 127, (L, out, k), np.int8))
        s = jnp.asarray(rng.random((L, 1, out), np.float32) * 1e-2)
        x = jnp.asarray(rng.random((1, in_f), np.float32), jnp.bfloat16)
        fn = make_fn(variant, L)
        np.asarray(fn(x, p, s))  # compile + warm
        t0 = time.perf_counter()
        np.asarray(fn(x, p, s))
        times[L] = time.perf_counter() - t0
    bytes_marg = M * (L_HI - L_LO) * (out * k + 4 * out)
    dt = times[L_HI] - times[L_LO]
    gbps = bytes_marg / dt / 1e9
    us_per_layer = dt / (M * (L_HI - L_LO)) * 1e6
    return gbps, us_per_layer


def main():
    rng = np.random.default_rng(0)
    print(f"{'shape':>6} {'variant':>6} {'GB/s':>7} {'µs/layer':>9}")
    for name, out, in_f in SHAPES:
        for variant in ("calls", "grid"):
            gbps, us = run(variant, out, in_f, rng)
            print(f"{name:>6} {variant:>6} {gbps:7.1f} {us:9.2f}")


if __name__ == "__main__":
    main()
