"""Prototype + microbench: Pallas W4A8 matvec at decode shapes.

Hypothesis (from the round-2 trace, benchmarks/profile_decode.py): the XLA
3-dot int4 formulation runs at ~2x the HBM read floor because the derived
mask operand costs a second effective pass over the packed bytes. A Pallas
kernel that streams each packed tile into VMEM ONCE and performs two s8
MXU dots from it (biased-low `p & 0x0F` + high `p & 0xF0`, exact via one
scalar correction) should run at the read floor.

Methodology (CLAUDE.md): fori_loop over a stack of M weights, consume every
output column, marginal time between two stack depths cancels the tunnel
latency and any fixed program overhead.
"""

from __future__ import annotations

import argparse
import functools
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HBM_BW = 819e9


# ---------------------------------------------------------------- kernel

def _w4a8_kernel(l_ref, x_ref, sx_ref, p_ref, s_ref, out_ref):
    """One [half, bo] packed-int4 tile: 2 s8 MXU dots, p read once.

    Packing (quant/quantize.py:_pack_int4): byte row r = (w[r]+8) | w[r+half]<<4
    so byte = (lo+8) + 16*hi with lo+8 in [0,15] offset-binary.
      dot(x_lo, p & 15)  == Σ x_lo*(lo+8)        (all-positive s8 operand)
      dot(x_hi, p & -16) == 16 * Σ x_hi*hi       (two's-complement high nibble)
      Σ x_lo*lo == dot(x_lo, p&15) - 8*Σx_lo
    """
    x = x_ref[:]
    half = x.shape[1] // 2
    x_lo = x[:, :half]
    x_hi = x[:, half:]
    p = p_ref[0]
    lo_op = jnp.bitwise_and(p, jnp.int8(15))
    hi_op = jnp.bitwise_and(p, jnp.int8(-16))
    dims = (((1,), (0,)), ((), ()))
    acc_lo = jax.lax.dot_general(x_lo, lo_op, dims,
                                 preferred_element_type=jnp.int32)
    acc_hi = jax.lax.dot_general(x_hi, hi_op, dims,
                                 preferred_element_type=jnp.int32)
    corr = 8 * jnp.sum(x_lo.astype(jnp.int32), axis=1, keepdims=True)
    acc = (acc_lo - corr) + jax.lax.shift_right_arithmetic(acc_hi, 4)
    out_ref[:] = acc.astype(jnp.float32) * sx_ref[:] * s_ref[0]


def w4a8_matvec_stacked(xq, sx, p_stack, s_stack, layer, *, block_out=512):
    """xq int8 [B, in], sx f32 [B, 1], p_stack int8 [L, in//2, out],
    s_stack f32 [L, 1, out], layer scalar int32 → f32 [B, out]."""
    L, half, out = p_stack.shape
    b = xq.shape[0]
    grid = (out // block_out,)
    spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((b, 2 * half), lambda j, l: (0, 0)),
            pl.BlockSpec((b, 1), lambda j, l: (0, 0)),
            pl.BlockSpec((1, half, block_out), lambda j, l: (l[0], 0, j)),
            pl.BlockSpec((1, 1, block_out), lambda j, l: (l[0], 0, j)),
        ],
        out_specs=pl.BlockSpec((b, block_out), lambda j, l: (0, j)),
    )
    return pl.pallas_call(
        _w4a8_kernel,
        grid_spec=spec,
        out_shape=jax.ShapeDtypeStruct((b, out), jnp.float32),
    )(jnp.asarray(layer, jnp.int32)[None], xq, sx, p_stack, s_stack)


# 3-dot variant kept for comparison: same single-read tile, 3 MXU passes,
# only one derived operand (the mask).
def _w4a8_kernel_3dot(l_ref, x_ref, sx_ref, p_ref, s_ref, out_ref):
    x = x_ref[:]
    half = x.shape[1] // 2
    x_lo, x_hi = x[:, :half], x[:, half:]
    p = p_ref[0]
    m = jnp.bitwise_and(p, jnp.int8(-16))
    dims = (((1,), (0,)), ((), ()))
    d_raw = jax.lax.dot_general(x_lo, p, dims, preferred_element_type=jnp.int32)
    d_lom = jax.lax.dot_general(x_lo, m, dims, preferred_element_type=jnp.int32)
    d_him = jax.lax.dot_general(x_hi, m, dims, preferred_element_type=jnp.int32)
    corr = 8 * jnp.sum(x_lo.astype(jnp.int32), axis=1, keepdims=True)
    acc = (d_raw - d_lom - corr) + jax.lax.shift_right_arithmetic(d_him, 4)
    out_ref[:] = acc.astype(jnp.float32) * sx_ref[:] * s_ref[0]


def w4a8_matvec_stacked_3dot(xq, sx, p_stack, s_stack, layer, *, block_out=512):
    L, half, out = p_stack.shape
    b = xq.shape[0]
    spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(out // block_out,),
        in_specs=[
            pl.BlockSpec((b, 2 * half), lambda j, l: (0, 0)),
            pl.BlockSpec((b, 1), lambda j, l: (0, 0)),
            pl.BlockSpec((1, half, block_out), lambda j, l: (l[0], 0, j)),
            pl.BlockSpec((1, 1, block_out), lambda j, l: (l[0], 0, j)),
        ],
        out_specs=pl.BlockSpec((b, block_out), lambda j, l: (0, j)),
    )
    return pl.pallas_call(
        _w4a8_kernel_3dot,
        grid_spec=spec,
        out_shape=jax.ShapeDtypeStruct((b, out), jnp.float32),
    )(jnp.asarray(layer, jnp.int32)[None], xq, sx, p_stack, s_stack)


# Transposed-storage variant: p_t [L, out, half] — each (bo, half) tile is a
# CONTIGUOUS chunk of HBM (full rows), so the tile DMA is unstrided.
def _w4a8_kernel_t(l_ref, x_ref, sx_ref, p_ref, s_ref, out_ref):
    x = x_ref[:]
    half = x.shape[1] // 2
    x_lo, x_hi = x[:, :half], x[:, half:]
    p = p_ref[0]  # [bo, half]
    lo_op = jnp.bitwise_and(p, jnp.int8(15))
    hi_op = jnp.bitwise_and(p, jnp.int8(-16))
    dims = (((1,), (1,)), ((), ()))
    acc_lo = jax.lax.dot_general(x_lo, lo_op, dims,
                                 preferred_element_type=jnp.int32)
    acc_hi = jax.lax.dot_general(x_hi, hi_op, dims,
                                 preferred_element_type=jnp.int32)
    corr = 8 * jnp.sum(x_lo.astype(jnp.int32), axis=1, keepdims=True)
    acc = (acc_lo - corr) + jax.lax.shift_right_arithmetic(acc_hi, 4)
    out_ref[:] = acc.astype(jnp.float32) * sx_ref[:] * s_ref[0]


def w4a8_matvec_stacked_t(xq, sx, p_stack, s_stack, layer, *, block_out=512):
    """Transposed weights: p_stack [L, out, in//2], s_stack [L, 1, out]."""
    L, out, half = p_stack.shape
    b = xq.shape[0]
    spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(out // block_out,),
        in_specs=[
            pl.BlockSpec((b, 2 * half), lambda j, l: (0, 0)),
            pl.BlockSpec((b, 1), lambda j, l: (0, 0)),
            pl.BlockSpec((1, block_out, half), lambda j, l: (l[0], j, 0)),
            pl.BlockSpec((1, 1, block_out), lambda j, l: (l[0], 0, j)),
        ],
        out_specs=pl.BlockSpec((b, block_out), lambda j, l: (0, j)),
    )
    return pl.pallas_call(
        _w4a8_kernel_t,
        grid_spec=spec,
        out_shape=jax.ShapeDtypeStruct((b, out), jnp.float32),
    )(jnp.asarray(layer, jnp.int32)[None], xq, sx, p_stack, s_stack)


# Diagnostic: single raw dot (INEXACT — bench only): pure stream + 1 MXU pass.
def _w4a8_kernel_1dot_t(l_ref, x_ref, sx_ref, p_ref, s_ref, out_ref):
    x = x_ref[:]
    half = x.shape[1] // 2
    acc = jax.lax.dot_general(x[:, :half], p_ref[0], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.int32)
    out_ref[:] = acc.astype(jnp.float32) * sx_ref[:] * s_ref[0]


# i32-bitcast nibble masks: 4 bytes per VPU op instead of 1.
def _w4a8_kernel_2dot_t_i32(l_ref, x_ref, sx_ref, p_ref, s_ref, out_ref):
    x = x_ref[:]
    half = x.shape[1] // 2
    x_lo, x_hi = x[:, :half], x[:, half:]
    p = p_ref[0]
    p32 = pltpu.bitcast(p, jnp.int32)
    lo_op = pltpu.bitcast(jnp.bitwise_and(p32, jnp.int32(0x0F0F0F0F)), jnp.int8)
    hi_op = pltpu.bitcast(
        jnp.bitwise_and(p32, jnp.int32(-0x0F0F0F10)), jnp.int8)  # 0xF0F0F0F0
    dims = (((1,), (1,)), ((), ()))
    acc_lo = jax.lax.dot_general(x_lo, lo_op, dims,
                                 preferred_element_type=jnp.int32)
    acc_hi = jax.lax.dot_general(x_hi, hi_op, dims,
                                 preferred_element_type=jnp.int32)
    corr = 8 * jnp.sum(x_lo.astype(jnp.int32), axis=1, keepdims=True)
    acc = (acc_lo - corr) + jax.lax.shift_right_arithmetic(acc_hi, 4)
    out_ref[:] = acc.astype(jnp.float32) * sx_ref[:] * s_ref[0]


def _make_t_variant(kernel):
    def call(xq, sx, p_stack, s_stack, layer, *, block_out=512):
        L, out, half = p_stack.shape
        b = xq.shape[0]
        spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(out // block_out,),
            in_specs=[
                pl.BlockSpec((b, 2 * half), lambda j, l: (0, 0)),
                pl.BlockSpec((b, 1), lambda j, l: (0, 0)),
                pl.BlockSpec((1, block_out, half), lambda j, l: (l[0], j, 0)),
                pl.BlockSpec((1, 1, block_out), lambda j, l: (l[0], 0, j)),
            ],
            out_specs=pl.BlockSpec((b, block_out), lambda j, l: (0, j)),
        )
        return pl.pallas_call(
            kernel,
            grid_spec=spec,
            out_shape=jax.ShapeDtypeStruct((b, out), jnp.float32),
        )(jnp.asarray(layer, jnp.int32)[None], xq, sx, p_stack, s_stack)
    return call


w4a8_matvec_1dot_t = _make_t_variant(_w4a8_kernel_1dot_t)
w4a8_matvec_2dot_t_i32 = _make_t_variant(_w4a8_kernel_2dot_t_i32)
w4a8_matvec_3dot_t = _make_t_variant(None)  # replaced below


def _w4a8_kernel_3dot_t(l_ref, x_ref, sx_ref, p_ref, s_ref, out_ref):
    x = x_ref[:]
    half = x.shape[1] // 2
    x_lo, x_hi = x[:, :half], x[:, half:]
    p = p_ref[0]
    m = pltpu.bitcast(
        jnp.bitwise_and(pltpu.bitcast(p, jnp.int32), jnp.int32(-0x0F0F0F10)),
        jnp.int8)
    dims = (((1,), (1,)), ((), ()))
    d_raw = jax.lax.dot_general(x_lo, p, dims, preferred_element_type=jnp.int32)
    d_lom = jax.lax.dot_general(x_lo, m, dims, preferred_element_type=jnp.int32)
    d_him = jax.lax.dot_general(x_hi, m, dims, preferred_element_type=jnp.int32)
    corr = 8 * jnp.sum(x_lo.astype(jnp.int32), axis=1, keepdims=True)
    acc = (d_raw - d_lom - corr) + jax.lax.shift_right_arithmetic(d_him, 4)
    out_ref[:] = acc.astype(jnp.float32) * sx_ref[:] * s_ref[0]


w4a8_matvec_3dot_t = _make_t_variant(_w4a8_kernel_3dot_t)


# W8A8 single-dot kernel (stacked): is Pallas at the ceiling too?
def _w8a8_kernel(l_ref, x_ref, sx_ref, q_ref, s_ref, out_ref):
    acc = jax.lax.dot_general(x_ref[:], q_ref[0], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    out_ref[:] = acc.astype(jnp.float32) * sx_ref[:] * s_ref[0]


def w8a8_matvec_stacked(xq, sx, q_stack, s_stack, layer, *, block_out=512):
    L, in_f, out = q_stack.shape
    b = xq.shape[0]
    spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(out // block_out,),
        in_specs=[
            pl.BlockSpec((b, in_f), lambda j, l: (0, 0)),
            pl.BlockSpec((b, 1), lambda j, l: (0, 0)),
            pl.BlockSpec((1, in_f, block_out), lambda j, l: (l[0], 0, j)),
            pl.BlockSpec((1, 1, block_out), lambda j, l: (l[0], 0, j)),
        ],
        out_specs=pl.BlockSpec((b, block_out), lambda j, l: (0, j)),
    )
    return pl.pallas_call(
        _w8a8_kernel,
        grid_spec=spec,
        out_shape=jax.ShapeDtypeStruct((b, out), jnp.float32),
    )(jnp.asarray(layer, jnp.int32)[None], xq, sx, q_stack, s_stack)


# ---------------------------------------------------------------- harness

def numerics_check():
    """Kernel vs the XLA reference (quant_matmul) on small shapes."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from metalchat_tpu.quant.quantize import quantize, _matmul_a8, _act_quantize

    rng = np.random.default_rng(0)
    in_f, out_f, L = 512, 768, 3
    x = jnp.asarray(rng.normal(size=(1, in_f)), jnp.float32)
    xq, sx = _act_quantize(x)
    ps, ss = [], []
    refs = []
    for l in range(L):
        w = rng.normal(size=(in_f, out_f)).astype(np.float32) * 0.05
        qt = quantize(w, bits=4, group_size=None, act_bits=8)
        ps.append(qt.q)
        ss.append(qt.scales.reshape(1, out_f))
        refs.append(np.asarray(_matmul_a8(x, qt), np.float32))
    p_stack = jnp.stack(ps)
    s_stack = jnp.stack(ss)
    for l in range(L):
        got = np.asarray(w4a8_matvec_stacked(xq, sx, p_stack, s_stack, l,
                                             block_out=256))
        err = np.abs(got - refs[l]).max() / (np.abs(refs[l]).max() + 1e-9)
        print(f"  layer {l}: 2-dot rel err vs XLA ref = {err:.2e}")
        assert err < 1e-5, err
        got3 = np.asarray(w4a8_matvec_stacked_3dot(xq, sx, p_stack, s_stack, l,
                                                   block_out=256))
        err3 = np.abs(got3 - refs[l]).max() / (np.abs(refs[l]).max() + 1e-9)
        print(f"  layer {l}: 3-dot rel err vs XLA ref = {err3:.2e}")
        assert err3 < 1e-5, err3
    print("  numerics OK")


def bench_stacked(fn, xq, sx, p_stack, s_stack, lo=8, hi=None, reps=3, R=40):
    """Marginal seconds per weight-read via fori_loop over the stack.

    Trip counts lo*R vs hi*R (cycling the layer index) amplify the marginal
    work to tens of ms so the ~2 ms tunnel jitter cancels out.
    """
    L = p_stack.shape[0]
    hi = hi or L

    @functools.partial(jax.jit, static_argnames="n")
    def run(xq, sx, p_stack, s_stack, n: int):
        def body(i, acc):
            y = fn(xq, sx, p_stack, s_stack, i % L)
            return acc + jnp.sum(y)
        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

    def t(n):
        t0 = time.perf_counter()
        np.asarray(run(xq, sx, p_stack, s_stack, n))
        return time.perf_counter() - t0

    t(lo * R); t(hi * R)  # compile both
    tlo = min(t(lo * R) for _ in range(reps))
    thi = min(t(hi * R) for _ in range(reps))
    return (thi - tlo) / ((hi - lo) * R)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="w1", choices=["w1", "w2", "wqkv", "lm"])
    ap.add_argument("--stack", type=int, default=24)
    ap.add_argument("--blocks", default="256,512,1024")
    ap.add_argument("--variants", default="2dotT,2dTi32,1dotT")
    ap.add_argument("--skip-check", action="store_true")
    args = ap.parse_args()

    if not args.skip_check:
        print("numerics check (256-block):")
        numerics_check()

    shapes = {
        "w1": (4096, 14336),
        "w2": (14336, 4096),
        "wqkv": (4096, 6144),
        "lm": (4096, 128256),
    }
    in_f, out_f = shapes[args.shape]
    half = in_f // 2
    L = args.stack
    rng = np.random.default_rng(0)
    p_stack = jnp.asarray(rng.integers(-127, 128, (L, half, out_f)), jnp.int8)
    s_stack = jnp.asarray(rng.uniform(0.001, 0.01, (L, 1, out_f)), jnp.float32)
    xq = jnp.asarray(rng.integers(-127, 128, (1, in_f)), jnp.int8)
    sx = jnp.ones((1, 1), jnp.float32)
    nbytes = half * out_f + 4 * out_f
    floor = nbytes / HBM_BW
    print(f"shape {args.shape}: packed {nbytes/1e6:.1f} MB, read floor {floor*1e6:.1f} us")

    variants = {
        "2dot": (w4a8_matvec_stacked, False),
        "3dot": (w4a8_matvec_stacked_3dot, False),
        "2dotT": (w4a8_matvec_stacked_t, True),
        "2dTi32": (w4a8_matvec_2dot_t_i32, True),
        "3dotT": (w4a8_matvec_3dot_t, True),
        "1dotT": (w4a8_matvec_1dot_t, True),
    }
    p_stack_t = None
    for vname in args.variants.split(","):
        if vname == "w8a8":
            q8 = jnp.asarray(rng.integers(-127, 128, (L, in_f, out_f)), jnp.int8)
            nbytes8 = in_f * out_f + 4 * out_f
            floor8 = nbytes8 / HBM_BW
            f = functools.partial(w8a8_matvec_stacked, block_out=512)
            sec = bench_stacked(f, xq, sx, q8, s_stack, lo=8, hi=L)
            print(f"  w8a8 block_out=  512: {sec*1e6:8.1f} us "
                  f"({nbytes8/sec/1e9:6.1f} GB/s, {sec/floor8:4.2f}x floor)",
                  flush=True)
            continue
        fn, transposed = variants[vname]
        if transposed and p_stack_t is None:
            p_stack_t = jnp.asarray(np.swapaxes(np.asarray(p_stack), 1, 2).copy())
        ps = p_stack_t if transposed else p_stack
        for bo in [int(b) for b in args.blocks.split(",")]:
            if out_f % bo:
                continue
            f = functools.partial(fn, block_out=bo)
            sec = bench_stacked(f, xq, sx, ps, s_stack, lo=8, hi=L)
            print(f"  {vname:6s} block_out={bo:5d}: {sec*1e6:8.1f} us "
                  f"({nbytes/sec/1e9:6.1f} GB/s eff, {sec/floor:4.2f}x floor)",
                  flush=True)


if __name__ == "__main__":
    main()
