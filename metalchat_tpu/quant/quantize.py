"""Blockwise weight-only quantization (INT8 / INT4) + QLoRA adaptors.

TPU-native re-design of the reference's quantization layers
(quantization/linear.h:16-56, lora.h:56-175): the reference swaps nn layers
via `replace_layer` surgery and dequantizes int8 → bf16 *then* matmuls
(dequant-then-matmul); here quantization is a **parameter-tree transform**
(`quantize_params`) and the matmul consumes the packed weights directly with
per-group scaling folded into the contraction (`quant_matmul`) — no
dequantized weight matrix is ever materialized:

    y[b,o] = Σ_G  s[G,o] · Σ_g  x[b,G,g] · q[G,g,o]

which is exactly groupwise-affine dequantization, but the inner Σ_g runs on
the MXU over int8-cast operands and only [B, n_groups, out] partials exist.
The Pallas fused kernel (ops/quant_matmul.py) implements the same contraction
with int8 HBM reads; this module is the XLA reference path and the packing
tool.

Layout: linear weights are [in, out]-major (as everywhere in this framework);
`scales` are [in/group, out]. The reference's checkpoint format stores
[out, in] int8 + [out, in/group] scales (lora.h:105-117) — the loader
transposes. INT4 packs two nibbles per byte along the `in` axis.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["q", "scales"],
    meta_fields=["bits", "group_size", "transposed", "act_bits",
                 "pack_chunks", "fuse_tp"],
)
@dataclass
class QuantizedTensor:
    """Groupwise-quantized 2-D weight (leaves may carry a leading stacked
    layer axis [L, ...] for the scan-over-layers model).

    Storage orientation (`transposed`) is a pure performance choice — groups
    always run along the logical in-features axis:
      * transposed=False: q [(L,) in(/2), out], scales [(L,) in/g, out]
      * transposed=True:  q [(L,) out, in(/2)], scales [(L,) out, in/g]
    EXCEPT per-channel tensors (group_size == in_features): their scales stay
    [(L,), 1, out] in BOTH orientations. A trailing size-1 dim would land on
    the TPU lane axis, where XLA's (8,128) tiling pads it 128× — the [L,out,1]
    layout cost ~1.3 ms/step of layout-conversion copies on the 8B decode
    trace (benchmarks/profile_decode.py, r3).
    Wide-output matvecs ([1,K]·[K,N], N≫K — FFN up-projections, lm_head)
    lower to VPU multiply-reduce with materialized broadcasts on TPU in the
    natural orientation; storing them transposed keeps the dequant fused
    (profiled on v5e: the 8B decode's dominant cost).

    ``act_bits=8`` selects the W8A8/W4A8 execution scheme: activations are
    quantized per token (dynamic symmetric int8) and the contraction runs
    natively on the MXU as s8×s8→s32 with a single post-scale — measured at
    the HBM read ceiling on v5e (~780 GB/s int8 / fastest-overall wall-clock
    for packed int4), vs ~345 GB/s for the fused-dequant bf16 dot. Exact
    post-scaling requires per-output-channel weight scales, i.e.
    ``group_size == in_features`` (n_groups == 1).
    """

    q: jax.Array
    scales: jax.Array
    bits: int = 8
    group_size: int = 32
    transposed: bool = False
    act_bits: Optional[int] = None
    # int4 packing granularity: the half-split pairing runs within each of
    # `pack_chunks` equal chunks of the in-features axis (1 = the standard
    # whole-axis half-split). Tensor-parallel placement sets this to tp for
    # row-parallel int4 leaves: a contiguous byte shard of the DEFAULT
    # packing decodes to non-contiguous logical rows (byte j pairs w[j] with
    # w[j+in/2]), which would pair the wrong weights with each device's
    # activation slice — per-chunk packing makes byte-contiguous sharding
    # and logical-row sharding coincide (parallel/mesh.py shard_params).
    pack_chunks: int = 1
    # Fused-projection tp blocking: a fused leaf (models/fuse.py wqkv/w13)
    # with fuse_tp > 1 has its out axis BLOCK-PERMUTED so each contiguous
    # 1/fuse_tp chunk holds that tp shard's [q_i|k_i|v_i] (resp.
    # [gate_i|up_i]) segments — a contiguous tp shard of the DEFAULT fused
    # layout would mix whole-q with whole-k rows. Consumers split the fused
    # output with models.fuse.split_fused(..., blocks=fuse_tp); inside
    # shard_map each LOCAL chunk is a standard fused layout
    # (parallel/tp_decode._localize_quant_metadata resets this to 1).
    fuse_tp: int = 1

    @property
    def in_features(self) -> int:
        n = self.q.shape[-1] if self.transposed else self.q.shape[-2]
        return n * 2 if self.bits == 4 else n

    @property
    def out_features(self) -> int:
        return self.q.shape[-2] if self.transposed else self.q.shape[-1]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["base", "a", "b"],
    meta_fields=["scale"],
)
@dataclass
class LoraLinear:
    """Quantized base + low-rank adaptor: y = base(x) + scale·(x·A)·B
    (reference: quantization/lora.h:56-130, defaults scale=2.0)."""

    base: Any           # QuantizedTensor or dense jax.Array [in, out]
    a: jax.Array        # [(L,) in, rank]
    b: jax.Array        # [(L,) rank, out]
    scale: float = 2.0


def _pack_int4(w4: np.ndarray) -> np.ndarray:
    """Pack int4 values [-8, 7] along the in axis, two per byte, **half-split
    with offset-binary low nibble**: byte row r holds w[r]+8 (low nibble,
    offset-binary) and w[r + in//2] (high nibble, two's complement).

    Half-split (vs. adjacent-pair packing) keeps unpacking free of sublane
    interleave/relayout on the TPU. The low nibble is stored offset-binary
    (lo+8) so the signed byte value is exactly (lo+8) + 16·hi, which makes
    the W4A8 decode path a pure-masking 3-dot MXU formulation — the packed
    byte is a valid s8 dot operand with NO unpack arithmetic at all
    (`_matmul_a8`; measured 512 vs 485 GB/s packed-effective on v5e vs the
    two's-complement wrap-trick, benchmarks/quant_microbench.py).
    """
    half = w4.shape[-2] // 2
    lo = (w4[..., :half, :] + 8) & 0x0F
    hi = (w4[..., half:, :] & 0x0F) << 4
    return (lo | hi).astype(np.int8)


def _unpack_int4(packed: jax.Array, chunks: int = 1) -> jax.Array:
    """int8 [..., in//2, out] → int8 [..., in, out] (signed nibble values).

    chunks > 1: the half-split pairing runs within each of `chunks` equal
    sub-ranges of the packed axis (QuantizedTensor.pack_chunks)."""
    lo = jnp.bitwise_and(packed, jnp.int8(15)) - jnp.int8(8)
    hi = jnp.right_shift(packed, 4)  # arithmetic: high nibble is 2's-compl.
    if chunks == 1:
        return jnp.concatenate([lo, hi], axis=-2)
    *lead, half, out = packed.shape
    hc = half // chunks
    lo = lo.reshape(*lead, chunks, hc, out)
    hi = hi.reshape(*lead, chunks, hc, out)
    return jnp.concatenate([lo, hi], axis=-2).reshape(*lead, 2 * half, out)


def repack_int4_chunks(qt: "QuantizedTensor", chunks: int) -> "QuantizedTensor":
    """Re-pack an int4 tensor to per-chunk half-split packing (see
    QuantizedTensor.pack_chunks). No numeric change — only the byte↔logical
    row pairing moves, so a contiguous 1/chunks byte shard becomes a
    self-contained half-split packing of its own logical in-range."""
    if qt.bits != 4 or chunks == qt.pack_chunks:
        return qt
    if qt.pack_chunks != 1:
        raise ValueError("repack from non-default chunking not supported")
    axis = -1 if qt.transposed else -2
    q = np.asarray(qt.q)
    if axis == -1:
        q = np.swapaxes(q, -1, -2)
    *lead, half, out = q.shape
    if half % (2 * chunks):
        raise ValueError(f"packed axis {half} not splittable into "
                         f"{chunks} half-split chunks")
    lo = ((q.astype(np.int8) & 0x0F) - 8).astype(np.int8)
    hi = (q.astype(np.int8) >> 4).astype(np.int8)
    w4 = np.concatenate([lo, hi], axis=-2)  # logical [.., in, out]
    hc = (2 * half) // chunks
    w4 = w4.reshape(*lead, chunks, hc, out)
    repacked = _pack_int4(w4).reshape(*lead, half, out)
    if axis == -1:
        repacked = np.ascontiguousarray(np.swapaxes(repacked, -1, -2))
    from dataclasses import replace as _replace

    return _replace(qt, q=jnp.asarray(repacked), pack_chunks=chunks)


def quantize(
    w: jax.Array | np.ndarray,
    bits: int = 8,
    group_size: Optional[int] = 32,
    scales_dtype=jnp.float32,
    transposed: bool = False,
    act_bits: Optional[int] = None,
    clip_search: bool = False,
) -> QuantizedTensor:
    """Symmetric groupwise quantization of an [in, out] weight (groups along
    in-features; `transposed` selects the storage orientation).

    group_size=None → per-output-channel scales (one group spanning all of
    in-features) — required for the `act_bits=8` MXU execution scheme.
    clip_search=True replaces the absmax scale with the per-group scale that
    minimizes reconstruction MSE over a clip-ratio grid (recovers a chunk of
    the per-channel-int4 loss: a few outliers otherwise set the whole
    channel's step size)."""
    if bits not in (4, 8):
        raise ValueError(f"bits must be 4 or 8, got {bits}")
    if act_bits not in (None, 8):
        raise ValueError(f"act_bits must be None or 8, got {act_bits}")
    w = np.asarray(w, np.float32)
    in_features, out_features = w.shape[-2:]
    if group_size is None:
        group_size = in_features
    if act_bits is not None and group_size != in_features:
        raise ValueError(
            "act_bits=8 needs per-channel scales (group_size=None): the MXU "
            "s8 contraction admits only a post-scale constant along in-features"
        )
    if in_features % group_size:
        raise ValueError(f"in_features={in_features} not divisible by group={group_size}")
    if bits == 4 and group_size != in_features and (in_features // 2) % group_size:
        raise ValueError(
            f"int4 needs in_features/2 divisible by group={group_size} "
            f"(half-split packing must not straddle groups), got {in_features}"
        )
    g = w.reshape(*w.shape[:-2], in_features // group_size, group_size, out_features)
    qmax = 127.0 if bits == 8 else 7.0
    absmax = np.abs(g).max(axis=-2, keepdims=True)
    scales = absmax / qmax
    if clip_search:
        best_err = np.full(scales.shape, np.inf, np.float32)
        best = scales.copy()
        for ratio in np.linspace(1.0, 0.5, 11):
            s = scales * np.float32(ratio)
            inv = np.where(s == 0.0, 0.0, 1.0 / s)
            q = np.clip(np.round(g * inv), -qmax, qmax)
            err = ((q * s - g) ** 2).sum(axis=-2, keepdims=True)
            take = err < best_err
            best = np.where(take, s, best)
            best_err = np.minimum(err, best_err)
        scales = best
    inv = np.where(scales == 0.0, 0.0, 1.0 / scales)
    q = np.clip(np.round(g * inv), -qmax, qmax).astype(np.int8)
    q = q.reshape(w.shape)
    if bits == 4:
        q = _pack_int4(q)
    sc = scales.squeeze(-2)
    if transposed:
        q = np.ascontiguousarray(np.swapaxes(q, -1, -2))
        if group_size != in_features:  # per-channel scales stay [.., 1, out]
            sc = np.ascontiguousarray(np.swapaxes(sc, -1, -2))
    return QuantizedTensor(
        q=jnp.asarray(q),
        scales=jnp.asarray(sc, scales_dtype),
        bits=bits,
        group_size=group_size,
        transposed=transposed,
        act_bits=act_bits,
    )


def dequantize(qt: QuantizedTensor, dtype=jnp.bfloat16) -> jax.Array:
    """Materialize the dense [in, out] weight (tests / the reference's
    one-time-dequant path, quantization/linear.h:50-54)."""
    if qt.transposed:
        qt = with_orientation(qt, False)
    q = _unpack_int4(qt.q, qt.pack_chunks) if qt.bits == 4 else qt.q
    shape = q.shape
    grouped = q.reshape(*shape[:-2], shape[-2] // qt.group_size, qt.group_size, shape[-1])
    deq = grouped.astype(jnp.float32) * qt.scales.astype(jnp.float32)[..., :, None, :]
    return deq.reshape(shape).astype(dtype)


def with_orientation(qt: QuantizedTensor, transposed: bool) -> QuantizedTensor:
    """Convert a QuantizedTensor's storage orientation (no numeric change).

    Per-channel scales ([.., 1, out]) are orientation-invariant — see
    QuantizedTensor docstring (lane-padding)."""
    if qt.transposed == transposed:
        return qt
    from dataclasses import replace as _replace

    per_channel = qt.group_size == qt.in_features
    return _replace(
        qt,
        q=jnp.swapaxes(qt.q, -1, -2),
        scales=qt.scales if per_channel else jnp.swapaxes(qt.scales, -1, -2),
        transposed=transposed,
    )


def auto_orient(qt: QuantizedTensor) -> QuantizedTensor:
    """Pick the storage orientation by shape: wide-output weights (out > in)
    are stored transposed (see QuantizedTensor docstring for why). act8
    tensors are ALWAYS transposed — the Pallas decode matvec streams
    row-contiguous [out, in] tiles (ops/a8_matvec_pallas.py)."""
    return with_orientation(
        qt, qt.act_bits == 8 or qt.out_features > qt.in_features)


def _act_quantize(x: jax.Array):
    """Per-token dynamic symmetric int8: x ≈ xq * sx, sx [..., 1] f32."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    sx = jnp.where(absmax == 0.0, 1.0, absmax / 127.0)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127).astype(jnp.int8)
    return xq, sx


def _matmul_a8(x: jax.Array, qt: QuantizedTensor) -> jax.Array:
    """W8A8 / W4A8: s8×s8→s32 on the MXU + one post-scale (sx ⊗ s_col).

    Measured on v5e at the HBM read ceiling (~780 GB/s int8; packed int4 is
    the fastest wall-clock of all formulations — benchmarks/quant_microbench):
    the dequant multiply/convert that bounds the bf16 paths on the VPU is
    gone entirely. Exact for per-channel scales; activation quantization is
    the (measurable, small) numeric trade — see tests/test_quant_w8a8.py.
    """
    dtype = x.dtype
    xq, sx = _act_quantize(x)
    contract_dim = 1 if qt.transposed else 0
    s_col = (qt.scales.reshape(qt.out_features)
             .astype(jnp.float32))
    dims = lambda d: (((xq.ndim - 1,), (d,)), ((), ()))  # noqa: E731
    if qt.bits == 8:
        acc = jax.lax.dot_general(xq, qt.q, dims(contract_dim),
                                  preferred_element_type=jnp.int32)
        out = acc.astype(jnp.float32) * sx * s_col
        return out.astype(dtype)

    # Half-split packed int4 with OFFSET-BINARY low nibble (lo+8 stored):
    # the signed byte value is exactly (lo+8) + 16·hi, so the raw packed
    # byte IS a valid s8 dot operand and the only derived operand is the
    # byte mask m = p & 0xF0 == 16·hi. Exact integer identities:
    #   dot(x_lo, p) - dot(x_lo, m) - 8·Σx_lo == Σ x_lo·lo
    #   dot(x_hi, m)                          == 16 · Σ x_hi·hi
    # Decode (few rows, HBM-bound): the 3-dot form above — fastest measured
    # formulation on v5e (512 GB/s packed-effective vs 485 wrap-trick / 428
    # i32-extract; MXU time is negligible at matvec shapes). Prefill (many
    # rows, MXU-bound): a 2-dot form with the low nibble unpacked bytewise
    # ((p & 15) - 8 — int8 AND/SUB fuse into the operand) to avoid the
    # third dot's 1.5× FLOPs.
    half = qt.in_features // 2
    p = qt.q
    m = jnp.bitwise_and(p, jnp.int8(-16))
    if qt.pack_chunks > 1:
        # Per-chunk half-split (pack_chunks): the byte stream is chunk-major,
        # so gather each chunk's lo/hi halves of x in that order.
        hc = qt.in_features // qt.pack_chunks
        xr = xq.reshape(*xq.shape[:-1], qt.pack_chunks, hc)
        x_lo = xr[..., : hc // 2].reshape(*xq.shape[:-1], half)
        x_hi = xr[..., hc // 2 :].reshape(*xq.shape[:-1], half)
    else:
        x_lo, x_hi = xq[..., :half], xq[..., half:]
    rows = int(np.prod(x.shape[:-1])) if x.ndim > 1 else 1
    d = dims(contract_dim)
    if rows <= 128:
        d_raw = jax.lax.dot_general(x_lo, p, d, preferred_element_type=jnp.int32)
        d_lom = jax.lax.dot_general(x_lo, m, d, preferred_element_type=jnp.int32)
        d_him = jax.lax.dot_general(x_hi, m, d, preferred_element_type=jnp.int32)
        corr = 8 * jnp.sum(x_lo.astype(jnp.int32), axis=-1, keepdims=True)
        acc_lo = d_raw - d_lom - corr
        acc_hi = d_him
    else:
        lo_op = jnp.bitwise_and(p, jnp.int8(15)) - jnp.int8(8)
        acc_lo = jax.lax.dot_general(x_lo, lo_op, d,
                                     preferred_element_type=jnp.int32)
        acc_hi = jax.lax.dot_general(x_hi, m, d,
                                     preferred_element_type=jnp.int32)
    acc = acc_lo.astype(jnp.float32) + acc_hi.astype(jnp.float32) * 0.0625
    out = acc * sx * s_col
    return out.astype(dtype)


def requantize_per_channel(
    qt: QuantizedTensor,
    bits: int = 8,
    scales_dtype=jnp.float32,
    act_bits: Optional[int] = 8,
) -> QuantizedTensor:
    """Re-quantize a groupwise tensor to per-channel scales (the layout the
    MXU `act_bits=8` scheme needs).

    Dequantizes the group-exact values and re-rounds onto the per-channel
    grid: for bits=8 the 8-bit grid absorbs group-scale variation almost
    losslessly; bits=4 halves the bytes again but per-channel int4 loses
    accuracy vs group-32 (use 8 unless HBM-capacity-bound)."""
    w = dequantize(qt, jnp.float32)
    return auto_orient(quantize(
        w, bits=bits, group_size=None, scales_dtype=scales_dtype,
        transposed=qt.transposed, act_bits=act_bits))


def quant_matmul(x: jax.Array, qt: QuantizedTensor) -> jax.Array:
    """x [..., in] @ dequant(qt) [in, out].

    Formulated so XLA fuses the int→float convert and group-scale broadcast
    straight into the dot operand (measured ~490 GB/s int8 / ~700 GB/s int4
    effective on v5e — at/near the HBM roofline; the hand-written Pallas
    kernel (ops/quant_matmul_pallas.py) is kept as a reference point but the
    XLA formulation wins). INT4 half-split packing turns unpacking into two
    shifts + two half-width matmuls with no interleave.
    """
    dtype = x.dtype
    if qt.act_bits == 8 and qt.group_size == qt.in_features and qt.q.ndim == 2:
        return _matmul_a8(x, qt)
    scales = qt.scales.astype(dtype)
    g = qt.group_size
    if qt.transposed:
        return _quant_matmul_transposed(x, qt, scales)
    if qt.bits == 8:
        q = qt.q
        in_features, out_features = q.shape[-2:]
        n_groups = in_features // g
        w = (q.astype(dtype).reshape(n_groups, g, out_features)
             * scales[..., :, None, :]).reshape(in_features, out_features)
        out = jax.lax.dot_general(
            x, w, (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return out.astype(dtype)

    # int4: two half-width dequant matmuls (half-split packing). Nibble
    # extraction in i32 — int8 vector shifts lower poorly on TPU (measured
    # 285 vs 219 GB/s effective at 8B FFN shapes).
    assert qt.pack_chunks == 1, "chunked packing is an act8/tp-only layout"
    packed = qt.q
    half, out_features = packed.shape[-2:]
    p32 = packed.astype(jnp.int32)
    lo = jnp.bitwise_and(p32, 15) - 8  # offset-binary low nibble
    hi = jnp.right_shift(p32, 4)
    if g >= qt.in_features:  # per-channel: the single group spans both halves
        half_groups, g = 1, half
        s_lo = s_hi = scales
    else:
        half_groups = half // g
        s_lo, s_hi = scales[:half_groups], scales[half_groups:]
    w_lo = (lo.astype(dtype).reshape(half_groups, g, out_features)
            * s_lo[..., :, None, :]).reshape(half, out_features)
    w_hi = (hi.astype(dtype).reshape(half_groups, g, out_features)
            * s_hi[..., :, None, :]).reshape(half, out_features)
    dims = (((x.ndim - 1,), (0,)), ((), ()))
    out = jax.lax.dot_general(x[..., :half], w_lo, dims,
                              preferred_element_type=jnp.float32)
    out = out + jax.lax.dot_general(x[..., half:], w_hi, dims,
                                    preferred_element_type=jnp.float32)
    return out.astype(dtype)


def _quant_matmul_transposed(x: jax.Array, qt: QuantizedTensor, scales) -> jax.Array:
    """quant_matmul for transposed storage: contract on the last dim of both
    operands (keeps wide-output matvecs in the fused fast path on TPU)."""
    dtype = x.dtype
    g = qt.group_size
    dims = lambda: (((x.ndim - 1,), (1,)), ((), ()))  # noqa: E731
    if g == qt.in_features:
        # Per-channel scales are stored [.., 1, out] in both orientations.
        scales = jnp.swapaxes(scales, -1, -2)  # → [.., out, 1]
    if qt.bits == 8:
        q = qt.q  # [out, in]
        out_features, in_features = q.shape[-2:]
        n_groups = in_features // g
        w = (q.astype(dtype).reshape(out_features, n_groups, g)
             * scales[..., :, :, None]).reshape(out_features, in_features)
        out = jax.lax.dot_general(x, w, dims(), preferred_element_type=jnp.float32)
        return out.astype(dtype)
    assert qt.pack_chunks == 1, "chunked packing is an act8/tp-only layout"
    packed = qt.q  # [out, in/2], half-split along in
    out_features, half = packed.shape[-2:]
    p32 = packed.astype(jnp.int32)
    lo = jnp.bitwise_and(p32, 15) - 8  # offset-binary low nibble
    hi = jnp.right_shift(p32, 4)
    if g >= qt.in_features:  # per-channel: the single group spans both halves
        half_groups, g = 1, half
        s_lo = s_hi = scales
    else:
        half_groups = half // g
        s_lo, s_hi = scales[..., :half_groups], scales[..., half_groups:]
    w_lo = (lo.astype(dtype).reshape(out_features, half_groups, g)
            * s_lo[..., :, :, None]).reshape(out_features, half)
    w_hi = (hi.astype(dtype).reshape(out_features, half_groups, g)
            * s_hi[..., :, :, None]).reshape(out_features, half)
    out = jax.lax.dot_general(x[..., :half], w_lo, dims(),
                              preferred_element_type=jnp.float32)
    out = out + jax.lax.dot_general(x[..., half:], w_hi, dims(),
                                    preferred_element_type=jnp.float32)
    return out.astype(dtype)


def linear(x: jax.Array, w) -> jax.Array:
    """Linear dispatch: dense array, QuantizedTensor, or LoraLinear.

    The runtime analog of the reference's polymorphic `basic_linear` slot
    (nn/linear.h:17-93 + replace_layer hot-swap): the pytree leaf type picks
    the implementation at trace time.
    """
    if isinstance(w, LoraLinear):
        y = linear(x, w.base)
        adapt = (x @ w.a) @ w.b
        return y + adapt * jnp.asarray(w.scale, y.dtype)
    if isinstance(w, QuantizedTensor):
        out = _maybe_pallas(x, w)
        return out if out is not None else quant_matmul(x, w)
    return x @ w


def _maybe_pallas(x: jax.Array, qt: QuantizedTensor):
    """Route decode-shaped quantized matmuls to the Pallas kernel.

    Off by default: the XLA formulation in `quant_matmul` measures faster on
    v5e (XLA fuses convert+scale into the dot at near-roofline bandwidth).
    Set METALCHAT_TPU_QUANT_KERNEL=1 to force the hand-written kernel (for
    comparison/regression benchmarking)."""
    import os

    from metalchat_tpu.ops import use_pallas
    from metalchat_tpu.ops.quant_matmul_pallas import (
        choose_block_in,
        choose_block_out,
        quant_matmul_pallas,
    )

    if not os.environ.get("METALCHAT_TPU_QUANT_KERNEL"):
        return None
    if not use_pallas() or qt.q.ndim != 2 or qt.transposed or qt.act_bits:
        return None
    if qt.pack_chunks != 1:
        return None
    lead = int(np.prod(x.shape[:-1]))
    if lead > 32:  # prefill: MXU-bound, the einsum path is fine
        return None
    block_out = choose_block_out(qt.out_features)
    block_in = choose_block_in(qt.in_features, qt.group_size)
    if block_out is None or block_in is None:
        return None
    if qt.bits == 4 and block_in % (2 * qt.group_size):
        return None
    out = quant_matmul_pallas(
        x.reshape(lead, -1), qt.q, qt.scales,
        bits=qt.bits, group_size=qt.group_size,
        block_out=block_out, block_in=block_in,
    )
    return out.reshape(*x.shape[:-1], qt.out_features)


def lookup_embedding(tokens: jax.Array, embed) -> jax.Array:
    """Embedding lookup for dense or row-quantized tables.

    Quantized layout: q int8 [V, H], scales [V, H/group] (reference
    lora_embedding, lora.h:133-175) — gather rows then dequantize just the
    gathered rows.
    """
    if isinstance(embed, QuantizedTensor):
        # Row-major table: groups run along H (axis -1 of each row).
        q = embed.q[tokens]  # [..., H] int8 (packed if int4)
        if embed.bits == 4:
            lo = jnp.bitwise_and(q, jnp.int8(15)) - jnp.int8(8)
            hi = jnp.right_shift(q, 4)
            q = jnp.concatenate([lo, hi], axis=-1)  # half-split along H
        s = embed.scales[tokens]  # [..., H/group]
        grouped = q.reshape(*q.shape[:-1], s.shape[-1], -1).astype(jnp.float32)
        return (grouped * s[..., None].astype(jnp.float32)).reshape(q.shape)
    return embed[tokens]


def init_random_quantized_params(
    config,
    *,
    bits: int = 4,
    group_size: Optional[int] = 32,
    seed: int = 0,
    scales_dtype=jnp.bfloat16,
    max_seq_len: Optional[int] = None,
    act_bits: Optional[int] = None,
    dtype=jnp.bfloat16,
):
    """Directly initialize a random *quantized* parameter tree on device.

    Benchmarks at 8B/70B scale can't afford materializing fp weights first;
    random packed bytes + small positive scales have the same memory layout
    and arithmetic cost as real quantized checkpoints. `dtype` sets the
    dense leaves (norms/embedding), i.e. the activation dtype — f32 for CPU
    tests (the CPU backend cannot execute bf16 dots).
    """
    from metalchat_tpu.models.transformer import make_rope_tables

    key = jax.random.PRNGKey(seed)
    h, f = config.hidden_size, config.intermediate_size
    nh, nkv, hd, L = (config.num_heads, config.num_kv_heads, config.head_dim,
                      config.num_layers)
    pack = 2 if bits == 4 else 1

    def qlin(k, in_f, out_f, stack=True):
        k1, k2 = jax.random.split(k)
        lead = (L,) if stack else ()
        g = in_f if group_size is None else group_size
        transposed = act_bits == 8 or out_f > in_f
        if transposed:
            q = jax.random.randint(k1, lead + (out_f, in_f // pack), -127, 128, jnp.int8)
            if g == in_f:  # per-channel scales stay [.., 1, out]
                s = (jax.random.uniform(k2, lead + (1, out_f)) * 0.01 + 0.001)
            else:
                s = (jax.random.uniform(k2, lead + (out_f, in_f // g)) * 0.01 + 0.001)
        else:
            q = jax.random.randint(k1, lead + (in_f // pack, out_f), -127, 128, jnp.int8)
            s = (jax.random.uniform(k2, lead + (in_f // g, out_f)) * 0.01 + 0.001)
        return QuantizedTensor(q=q, scales=s.astype(scales_dtype), bits=bits,
                               group_size=g, transposed=transposed,
                               act_bits=act_bits)

    keys = iter(jax.random.split(key, 12))
    layers = {
        "attn_norm": jnp.ones((L, h), dtype),
        "ffn_norm": jnp.ones((L, h), dtype),
        "wq": qlin(next(keys), h, nh * hd),
        "wk": qlin(next(keys), h, nkv * hd),
        "wv": qlin(next(keys), h, nkv * hd),
        "wo": qlin(next(keys), nh * hd, h),
        "w1": qlin(next(keys), h, f),
        "w3": qlin(next(keys), h, f),
        "w2": qlin(next(keys), f, h),
    }
    if getattr(config, "use_qk_norm", False):
        layers["q_norm"] = jnp.ones((L, hd), dtype)
        layers["k_norm"] = jnp.ones((L, hd), dtype)
    if getattr(config, "use_post_norms", False):
        layers["post_attn_norm"] = jnp.ones((L, h), dtype)
        layers["post_ffn_norm"] = jnp.ones((L, h), dtype)
    embed = (jax.random.normal(next(keys), (config.vocab_size, h)) * 0.02).astype(
        dtype
    )
    return {
        "embed": embed,
        "layers": layers,
        "final_norm": jnp.ones((h,), dtype),
        "lm_head": qlin(next(keys), h, config.vocab_size, stack=False),
        "rope": make_rope_tables(config, max_seq_len),
    }


# -- parameter-tree surgery -------------------------------------------------

_DEFAULT_TARGETS = ("wq", "wk", "wv", "wo", "w1", "w2", "w3")


def quantize_params(
    params: Dict[str, Any],
    *,
    bits: int = 8,
    group_size: Optional[int] = 32,
    targets=_DEFAULT_TARGETS,
    quantize_lm_head: bool = False,
    quantize_embed: bool = False,
    scales_dtype=jnp.float32,
    act_bits: Optional[int] = None,
    clip_search: bool = False,
) -> Dict[str, Any]:
    """Quantize selected leaves of a parameter tree.

    The analog of the reference's `replace_layer` surgery
    (layer.h:788-920 + llama3_qlora serializer adapt()): instead of swapping
    module objects under a registry, the transform rewrites pytree leaves —
    the forward dispatches on leaf type.
    """
    out = dict(params)
    out["layers"] = dict(params["layers"])
    for name in targets:
        if name in out["layers"]:
            out["layers"][name] = auto_orient(quantize(
                out["layers"][name], bits=bits, group_size=group_size,
                scales_dtype=scales_dtype, act_bits=act_bits,
                clip_search=clip_search,
            ))
    if quantize_lm_head:
        out["lm_head"] = auto_orient(quantize(
            params["lm_head"], bits=bits, group_size=group_size,
            scales_dtype=scales_dtype, act_bits=act_bits,
            clip_search=clip_search))
    if quantize_embed:
        # Row-quantized: treat [V, H] as out-major by quantizing its transpose
        # groupwise along H, then storing row-major again.
        embed = np.asarray(params["embed"], np.float32)
        v, h = embed.shape
        qt = quantize(embed.T, bits=bits, group_size=group_size, scales_dtype=scales_dtype)
        out["embed"] = QuantizedTensor(
            q=jnp.swapaxes(qt.q, -1, -2),
            scales=jnp.swapaxes(qt.scales, -1, -2),
            bits=bits,
            group_size=group_size,
        )
    return out
