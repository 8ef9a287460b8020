"""Pallas W4A8/W8A8 stacked matvec vs the XLA reference (interpret mode).

The kernel's integer output must match `_matmul_a8`'s accumulator exactly:
both are s8×s8→s32 contractions of the same operands; the int4 nibble-mask
identity (dot(x_lo, p&15) − 8Σx_lo, dot(x_hi, p&0xF0) >> 4) is exact
integer arithmetic, not an approximation.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from metalchat_tpu.ops.a8_matvec_pallas import (
    choose_block_out,
    quant_matvec_stacked,
    quant_matvec_stacked_fused,
)
from metalchat_tpu.quant.quantize import _act_quantize, quantize, quant_matmul


@pytest.mark.parametrize("bits", [4, 8])
@pytest.mark.parametrize("batch", [1, 4])
def test_matches_xla_reference(bits, batch):
    rng = np.random.default_rng(0)
    in_f, out_f, L = 512, 768, 3
    x = jnp.asarray(rng.normal(size=(batch, in_f)), jnp.float32)
    xq, sx = _act_quantize(x)
    stacked_q, stacked_s, refs = [], [], []
    for l in range(L):
        w = rng.normal(size=(in_f, out_f)).astype(np.float32) * 0.05
        qt = quantize(w, bits=bits, group_size=None, act_bits=8, transposed=True)
        stacked_q.append(qt.q)
        stacked_s.append(np.asarray(qt.scales).reshape(out_f))
        refs.append(np.asarray(quant_matmul(x, qt), np.float32))
    p_stack = jnp.stack(stacked_q)
    for l in range(L):
        acc = quant_matvec_stacked(xq, p_stack, l, bits=bits, block_out=256,
                                   interpret=True)
        got = np.asarray(acc, np.float32) * np.asarray(sx) * stacked_s[l][None]
        np.testing.assert_allclose(got, refs[l], rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("bits", [4, 8])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fused_matches_unfused(bits, dtype):
    """The in-kernel act-quantize + post-scale variant is numerically
    identical to quantize-outside + integer kernel + XLA post-scale."""
    rng = np.random.default_rng(2)
    in_f, out_f, L = 512, 768, 3
    k = in_f // 2 if bits == 4 else in_f
    p = jnp.asarray(rng.integers(-128, 128, (L, out_f, k), dtype=np.int8))
    s = jnp.asarray(rng.random((L, 1, out_f), dtype=np.float32) * 0.1)
    x = jnp.asarray(rng.standard_normal((2, in_f)), dtype)
    for l in range(L):
        xq, sx = _act_quantize(x)
        acc = quant_matvec_stacked(xq, p, l, bits=bits, block_out=256,
                                   interpret=True)
        ref = (acc.astype(jnp.float32) * sx * s[l].reshape(1, -1)).astype(dtype)
        got = quant_matvec_stacked_fused(x, p, s, l, bits=bits, block_out=256,
                                         interpret=True)
        assert got.dtype == ref.dtype
        np.testing.assert_array_equal(np.asarray(got, np.float32),
                                      np.asarray(ref, np.float32))


def test_int4_identity_exact():
    """Integer accumulator equals a direct int32 matmul of unpacked nibbles."""
    rng = np.random.default_rng(1)
    in_f, out_f = 256, 384
    w4 = rng.integers(-8, 8, (in_f, out_f)).astype(np.int8)
    half = in_f // 2
    packed = (((w4[:half] + 8) & 0x0F) | ((w4[half:] & 0x0F) << 4)).astype(np.int8)
    p_t = np.ascontiguousarray(packed.T)  # [out, in/2]
    xq = rng.integers(-127, 128, (2, in_f)).astype(np.int8)
    acc = quant_matvec_stacked(jnp.asarray(xq), jnp.asarray(p_t)[None], 0,
                               bits=4, block_out=128, interpret=True)
    want = xq.astype(np.int64) @ w4.astype(np.int64)
    np.testing.assert_array_equal(np.asarray(acc, np.int64), want)


def test_choose_block_out():
    # Tuned-table shapes (measured end-to-end on v5e, see _TUNED).
    assert choose_block_out(28672, k=2048) == 1024
    assert choose_block_out(4096, k=7168) == 256
    assert choose_block_out(4096, k=2048) == 512
    assert choose_block_out(6144, k=2048) == 768
    # Generic fallback: largest divisor fitting the tile budget.
    assert choose_block_out(14336, k=2048) == 2048
    assert choose_block_out(128256, k=2048) == 768
    assert choose_block_out(384) == 384
    assert choose_block_out(100) is None


@pytest.mark.parametrize("bits", [4, 8])
def test_fused_norm_matches_norm_outside(bits):
    """The in-kernel rmsnorm prologue is bit-identical to ops.rms_norm
    outside + the plain fused kernel (same f32 stats, same bf16 rounding)."""
    from metalchat_tpu.ops import xla as xops

    rng = np.random.default_rng(5)
    in_f, out_f, L = 512, 768, 2
    k = in_f // 2 if bits == 4 else in_f
    p = jnp.asarray(rng.integers(-128, 128, (L, out_f, k), dtype=np.int8))
    s = jnp.asarray(rng.random((L, 1, out_f), dtype=np.float32) * 0.1)
    nw = jnp.asarray(rng.random((L, in_f), dtype=np.float32), jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((2, in_f)), jnp.bfloat16)
    for mu in (0.0, 1.0):
        for l in range(L):
            h = xops.rms_norm(x, nw[l], eps=1e-5, offset=mu)
            want = quant_matvec_stacked_fused(h, p, s, l, bits=bits,
                                              block_out=256, interpret=True)
            got = quant_matvec_stacked_fused(
                x, p, s, l, bits=bits, block_out=256, interpret=True,
                norm_stack=nw[:, None, :], norm_eps=1e-5, norm_offset=mu)
            np.testing.assert_array_equal(np.asarray(got, np.float32),
                                          np.asarray(want, np.float32))
