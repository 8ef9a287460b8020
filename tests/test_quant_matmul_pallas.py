"""Pallas fused dequant-matmul vs the XLA reference path (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from metalchat_tpu.quant import quantize, dequantize
from metalchat_tpu.quant.quantize import _pack_int4, _unpack_int4
from metalchat_tpu.ops.quant_matmul_pallas import choose_block_out, quant_matmul_pallas


def _w(shape, seed=0):
    return np.random.default_rng(seed).standard_normal(shape).astype(np.float32)


def test_halfsplit_pack_roundtrip():
    rng = np.random.default_rng(0)
    w4 = rng.integers(-8, 8, (64, 16)).astype(np.int8)
    packed = _pack_int4(w4)
    assert packed.shape == (32, 16)
    lo = (packed & 0x0F).astype(np.int8) - 8  # low nibble is offset-binary
    hi = packed.astype(np.int8) >> 4
    np.testing.assert_array_equal(np.concatenate([lo, hi], axis=0), w4)
    # signed byte value == (lo+8) + 16*hi — the mask3 dot-operand identity
    np.testing.assert_array_equal(
        packed.astype(np.int32), (lo + 8) + 16 * hi.astype(np.int32))
    np.testing.assert_array_equal(np.asarray(_unpack_int4(jnp.asarray(packed))), w4)


def test_choose_block_out():
    assert choose_block_out(8192) == 512
    assert choose_block_out(640) == 128
    assert choose_block_out(100) is None


@pytest.mark.parametrize("bits", [8, 4])
@pytest.mark.parametrize("b", [1, 8])
def test_quant_matmul_pallas_matches_xla(bits, b):
    in_f, out_f, g = 256, 256, 32
    w = _w((in_f, out_f), seed=2)
    qt = quantize(w, bits=bits, group_size=g)
    x = jnp.asarray(_w((b, in_f), seed=3))

    expect = np.asarray(x @ dequantize(qt, jnp.float32))
    got = np.asarray(
        quant_matmul_pallas(
            x, qt.q, qt.scales, bits=bits, group_size=g, block_out=128, interpret=True
        )
    )
    # The kernel dequantizes to bf16 for the MXU (int values exact; the
    # scale multiply rounds) — compare within the bf16 envelope.
    rel = np.abs(got - expect).max() / np.abs(expect).max()
    assert rel < 0.01, rel

    # Reduction tiling must not change results beyond reassociation noise.
    tiled = np.asarray(
        quant_matmul_pallas(
            x, qt.q, qt.scales, bits=bits, group_size=g, block_out=128,
            block_in=128, interpret=True,
        )
    )
    np.testing.assert_allclose(tiled, got, rtol=1e-5, atol=1e-4)
