"""Merged post-attention block kernel: wo → +residual → ffn-norm → w13
(gate/up) → activation → w2 → +residual, in ONE pallas_call.

Why: each decode matvec pays a fixed per-dispatch cost comparable to its
HBM read (CLAUDE.md; the r5 trace's 782 µs measured-minus-floor gap is
spread over 161 pallas_calls/step). Merging the three post-attention
matvecs of a layer into one kernel removes two launches per layer AND
lets Mosaic pipeline weight tiles across the wo/w13/w2 phase boundaries
(the per-call pipeline fill/drain is paid once, not three times). The
elementwise glue between them (residual adds, rmsnorm, silu·up,
activation re-quantization) rides along on rows already in VMEM, so the
~25 µs/step of XLA epilogues between these matvecs disappears too.

Design: a single 1-D grid walks three phases —

  phase A (n_wo steps)   wo tiles;  block outputs accumulate in VMEM
  boundary (step n_wo)   x2 = x + wo_out; rmsnorm; act-quantize
  phase B (n13 steps)    PAIRED gate/up w13 tiles (two BlockSpecs over
                         the same stacked array, up's index offset by
                         n13 blocks) → h = act(gate)·up per block
  boundary               act-quantize h
  phase C (n2 steps)     w2 tiles; ffn blocks accumulate
  last step              out = x2 + ffn   (full-row output block)

All scratch stores use STATIC lane slices (per-phase-step `pl.when`
unrolled over the ≤ ~40 block indices) — Mosaic rejects narrow/unproven
dynamic lane slices, static ones are always legal. Weight tiles for
inactive phases pin a boundary block index, so no dead DMA is issued
(same revisited-block idiom as the fused attention kernel).

Numerics mirror the unmerged path op-for-op (same f32 norm stats → out-
dtype rounding → act-quant → s8 dot → f32 post-scale), with ONE
deviation: the gate activation runs in f32 (Mosaic's `logistic` rejects
bf16 vectors; f32 also skips a bf16 mid-round the unmerged path pays).
With f32 activations (the CPU test dtype) this is a no-op, so interpret
mode is bit-identical to the composed ops (tests/test_ffn_block.py);
on-chip bf16 agrees within one rounding quantum (tools/validate_chip.py).

Reference analog: none — the reference dispatches each linear separately
(nn/feed_forward.h); this is the TPU answer to its 64-op command batching
(accelerator.h:84) applied INSIDE the layer.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from metalchat_tpu.ops.a8_matvec_pallas import (
    _act_quantize_block,
    _int_acc_w4,
    _int_acc_w8,
    choose_block_out,
)

LANES = 128


def _ffn_block_kernel(
    l_ref,       # scalar prefetch [1]
    attn_ref,    # [B, H] attention output rows (pre-wo)
    x_ref,       # [B, H] residual stream entering wo
    wo_q_ref,    # [1, bo_wo, kwo]
    wo_s_ref,    # [1, 1, bo_wo]
    nw_ref,      # [1, 1, H] ffn rmsnorm weights
    g_q_ref,     # [1, bo13, k13] gate tile
    u_q_ref,     # [1, bo13, k13] up tile (same array, +n13 block offset)
    g_s_ref,     # [1, 1, bo13]
    u_s_ref,     # [1, 1, bo13]
    w2_q_ref,    # [1, bo2, k2]
    w2_s_ref,    # [1, 1, bo2]
    out_ref,     # [B, H]
    wo_acc,      # scratch [B, H] out-dtype
    x2_scr,      # scratch [B, H]
    xq_scr,      # scratch int8 [B, max(H, F)] — reused across phases
    sx_scr,      # scratch f32 [B, LANES]
    h_scr,       # scratch [B, F]
    ffn_scr,     # scratch [B, H]
    *,
    acc_fn,
    out_dtype,
    act: str,
    eps: float,
    offset: float,
    n_wo: int,
    n13: int,
    n2: int,
    bo_wo: int,
    bo13: int,
    bo2: int,
):
    j = pl.program_id(0)
    H = x_ref.shape[1]
    F = h_scr.shape[1]

    def act_fn(g):
        # f32 only: Mosaic's `logistic` lowering rejects bf16 vectors
        # ('vector.broadcast' element-type verification); the f32 compute
        # also skips the bf16 mid-rounding the unmerged path pays.
        if act == "gelu_tanh":
            return jax.nn.gelu(g, approximate=True)
        return jax.nn.silu(g)

    # ---- phase A: wo tiles ------------------------------------------------
    @pl.when(j < n_wo)
    def _wo():
        a = attn_ref[...].astype(jnp.float32)
        xq, sx = _act_quantize_block(a)
        acc = acc_fn(xq, wo_q_ref[0])
        s_col = wo_s_ref[0].reshape(1, -1).astype(jnp.float32)
        y = (acc.astype(jnp.float32) * sx * s_col).astype(out_dtype)
        for jj in range(n_wo):
            @pl.when(j == jj)
            def _store(jj=jj, y=y):
                wo_acc[:, jj * bo_wo:(jj + 1) * bo_wo] = y

    # ---- boundary: residual + ffn-norm + act-quant ------------------------
    @pl.when(j == n_wo)
    def _mid_a():
        x2 = x_ref[...] + wo_acc[...]
        x2_scr[...] = x2
        xf = x2.astype(jnp.float32)
        var = jnp.mean(jnp.square(xf), axis=1, keepdims=True)
        normed = xf * jax.lax.rsqrt(var + eps)
        w = offset + nw_ref[0].reshape(1, -1).astype(jnp.float32)
        xr = (normed * w).astype(out_dtype).astype(jnp.float32)
        xq, sx = _act_quantize_block(xr)
        xq_scr[:, :H] = xq
        sx_scr[...] = jnp.broadcast_to(sx, sx_scr.shape)

    # ---- phase B: paired gate/up w13 tiles --------------------------------
    @pl.when((j >= n_wo) & (j < n_wo + n13))
    def _w13():
        xq = xq_scr[:, :H]
        sx = sx_scr[:, :1]
        acc_g = acc_fn(xq, g_q_ref[0])
        acc_u = acc_fn(xq, u_q_ref[0])
        s_g = g_s_ref[0].reshape(1, -1).astype(jnp.float32)
        s_u = u_s_ref[0].reshape(1, -1).astype(jnp.float32)
        gate = acc_g.astype(jnp.float32) * sx * s_g
        up = acc_u.astype(jnp.float32) * sx * s_u
        h = (act_fn(gate) * up).astype(out_dtype)
        for jj in range(n13):
            @pl.when(j == n_wo + jj)
            def _store(jj=jj, h=h):
                h_scr[:, jj * bo13:(jj + 1) * bo13] = h

    # ---- boundary: act-quant of h -----------------------------------------
    @pl.when(j == n_wo + n13)
    def _mid_b():
        hf = h_scr[...].astype(jnp.float32)
        xq, sx = _act_quantize_block(hf)
        xq_scr[:, :F] = xq
        sx_scr[...] = jnp.broadcast_to(sx, sx_scr.shape)

    # ---- phase C: w2 tiles -------------------------------------------------
    @pl.when(j >= n_wo + n13)
    def _w2():
        xq = xq_scr[:, :F]
        sx = sx_scr[:, :1]
        acc = acc_fn(xq, w2_q_ref[0])
        s_col = w2_s_ref[0].reshape(1, -1).astype(jnp.float32)
        y = (acc.astype(jnp.float32) * sx * s_col).astype(out_dtype)
        for jj in range(n2):
            @pl.when(j == n_wo + n13 + jj)
            def _store(jj=jj, y=y):
                ffn_scr[:, jj * bo2:(jj + 1) * bo2] = y

    # ---- final: assemble the full-row output ------------------------------
    @pl.when(j == n_wo + n13 + n2 - 1)
    def _finish():
        out_ref[...] = x2_scr[...] + ffn_scr[...]


def ffn_block_shapes_ok(H: int, F: int, kwo: int, k13: int, k2: int) -> bool:
    """All three matvec block choices must exist and divide evenly."""
    bo_wo = choose_block_out(H, kwo)
    bo13 = choose_block_out(F, k13, tile_budget=2 << 20)
    bo2 = choose_block_out(H, k2)
    return (
        bo_wo is not None and H % bo_wo == 0
        and bo13 is not None and F % bo13 == 0
        and bo2 is not None and H % bo2 == 0
    )


@functools.partial(
    jax.jit,
    static_argnames=("bits", "act", "eps", "offset", "interpret"))
def ffn_block_stacked(
    attn: jax.Array,      # [B, H] attention output rows (pre-wo projection)
    x: jax.Array,         # [B, H] residual stream entering the wo projection
    wo_q: jax.Array,      # int8 [L, H, kwo]
    wo_s: jax.Array,      # f32 [L, 1, H]
    norm_w: jax.Array,    # [L, 1, H] — pre-shaped ffn-norm stack (hoisted)
    w13_q: jax.Array,     # int8 [L, 2F, k13] — fused gate;up rows
    w13_s: jax.Array,     # f32 [L, 1, 2F]
    w2_q: jax.Array,      # int8 [L, H, k2]
    w2_s: jax.Array,      # f32 [L, 1, H]
    layer: jax.Array,     # scalar int32
    *,
    bits: int,
    act: str,             # "silu" | "gelu_tanh"
    eps: float,
    offset: float = 0.0,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Returns the layer's post-FFN residual stream [B, H]:

        x2 = x + wo(attn);  out = x2 + w2(act(gate(x2n)) · up(x2n))

    where x2n = rmsnorm(x2) · (offset + norm_w). One pallas_call replaces
    three matvec launches plus every XLA op between them."""
    from metalchat_tpu.ops import resolve_interpret

    interpret = resolve_interpret(interpret)
    b, H = x.shape
    L, _, kwo = wo_q.shape
    _, twoF, k13 = w13_q.shape
    _, _, k2 = w2_q.shape
    F = twoF // 2
    assert attn.shape == (b, H)
    assert wo_s.shape == (L, 1, H) and w13_s.shape == (L, 1, twoF)
    assert w2_s.shape == (L, 1, H) and norm_w.shape == (L, 1, H)

    bo_wo = choose_block_out(H, kwo)
    bo13 = choose_block_out(F, k13, tile_budget=2 << 20)
    bo2 = choose_block_out(H, k2)
    assert bo_wo and H % bo_wo == 0, (H, kwo, bo_wo)
    assert bo13 and F % bo13 == 0, (F, k13, bo13)
    assert bo2 and H % bo2 == 0, (H, k2, bo2)
    n_wo, n13, n2 = H // bo_wo, F // bo13, H // bo2

    def clip(v, lo, hi):
        return jnp.clip(v, lo, hi)

    in_specs = [
        pl.BlockSpec((b, H), lambda j, l: (0, 0)),                     # attn
        pl.BlockSpec((b, H), lambda j, l: (0, 0)),                     # x
        pl.BlockSpec((1, bo_wo, kwo),
                     lambda j, l: (l[0], clip(j, 0, n_wo - 1), 0)),
        pl.BlockSpec((1, 1, bo_wo),
                     lambda j, l: (l[0], 0, clip(j, 0, n_wo - 1))),
        pl.BlockSpec((1, 1, H), lambda j, l: (l[0], 0, 0)),            # norm
        pl.BlockSpec((1, bo13, k13),
                     lambda j, l: (l[0], clip(j - n_wo, 0, n13 - 1), 0)),
        pl.BlockSpec((1, bo13, k13),
                     lambda j, l: (l[0], n13 + clip(j - n_wo, 0, n13 - 1), 0)),
        pl.BlockSpec((1, 1, bo13),
                     lambda j, l: (l[0], 0, clip(j - n_wo, 0, n13 - 1))),
        pl.BlockSpec((1, 1, bo13),
                     lambda j, l: (l[0], 0, n13 + clip(j - n_wo, 0, n13 - 1))),
        pl.BlockSpec((1, bo2, k2),
                     lambda j, l: (l[0], clip(j - n_wo - n13, 0, n2 - 1), 0)),
        pl.BlockSpec((1, 1, bo2),
                     lambda j, l: (l[0], 0, clip(j - n_wo - n13, 0, n2 - 1))),
    ]

    kernel = functools.partial(
        _ffn_block_kernel,
        acc_fn=_int_acc_w4 if bits == 4 else _int_acc_w8,
        out_dtype=x.dtype,
        act=act, eps=eps, offset=offset,
        n_wo=n_wo, n13=n13, n2=n2, bo_wo=bo_wo, bo13=bo13, bo2=bo2,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_wo + n13 + n2,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((b, H), lambda j, l: (0, 0)),
            scratch_shapes=[
                pltpu.VMEM((b, H), x.dtype),           # wo_acc
                pltpu.VMEM((b, H), x.dtype),           # x2
                pltpu.VMEM((b, max(H, F)), jnp.int8),  # xq (phase-reused)
                pltpu.VMEM((b, LANES), jnp.float32),   # sx
                pltpu.VMEM((b, F), x.dtype),           # h
                pltpu.VMEM((b, H), x.dtype),           # ffn
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, H), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=96 << 20,
        ),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1),
      attn, x, wo_q, wo_s, norm_w, w13_q, w13_q, w13_s, w13_s, w2_q, w2_s)
