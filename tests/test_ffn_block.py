"""Merged post-attention block kernel (ops/ffn_block_pallas.py) vs the
composed single-op reference, in interpret mode.

The kernel must be BIT-identical to the composition

    x2  = x + wo(attn)
    h   = act(gate(norm(x2))) · up(norm(x2))
    out = x2 + w2(h)

built from `quant_matvec_stacked_fused` + jnp glue (same ops, same order).
Engagement inside the decode fast path is covered by
tests/test_decode_path.py::test_ffn_block_merged_*.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metalchat_tpu.ops.a8_matvec_pallas import quant_matvec_stacked_fused
from metalchat_tpu.ops.ffn_block_pallas import ffn_block_shapes_ok, ffn_block_stacked


def _make(rng, L, H, F, bits, dtype=jnp.float32):
    kw = H // 2 if bits == 4 else H
    k2 = F // 2 if bits == 4 else F
    return dict(
        wo_q=jnp.asarray(rng.integers(-127, 127, (L, H, kw), np.int8)),
        wo_s=jnp.asarray(rng.random((L, 1, H), np.float32) * 1e-2),
        w13_q=jnp.asarray(rng.integers(-127, 127, (L, 2 * F, kw), np.int8)),
        w13_s=jnp.asarray(rng.random((L, 1, 2 * F), np.float32) * 1e-2),
        w2_q=jnp.asarray(rng.integers(-127, 127, (L, H, k2), np.int8)),
        w2_s=jnp.asarray(rng.random((L, 1, H), np.float32) * 1e-2),
        nw=jnp.asarray(rng.random((L, 1, H), np.float32)).astype(dtype),
    )


def _reference(attn, x, w, layer, *, bits, act, eps, offset):
    wo_out = quant_matvec_stacked_fused(attn, w["wo_q"], w["wo_s"], layer,
                                        bits=bits)
    x2 = x + wo_out
    fused = quant_matvec_stacked_fused(
        x2, w["w13_q"], w["w13_s"], layer, bits=bits,
        norm_stack=w["nw"], norm_eps=eps, norm_offset=offset)
    f = fused.shape[-1] // 2
    gate, up = fused[:, :f], fused[:, f:]
    gate = (jax.nn.gelu(gate, approximate=True) if act == "gelu_tanh"
            else jax.nn.silu(gate))
    ffn = quant_matvec_stacked_fused(gate * up, w["w2_q"], w["w2_s"], layer,
                                     bits=bits)
    return x2 + ffn


@pytest.mark.parametrize("bits,H,F", [(8, 128, 256), (4, 256, 512)])
@pytest.mark.parametrize("act", ["silu", "gelu_tanh"])
@pytest.mark.parametrize("batch", [1, 8])
def test_ffn_block_bit_exact(bits, H, F, act, batch):
    rng = np.random.default_rng(42)
    L, eps, offset = 3, 1e-5, 0.0
    assert ffn_block_shapes_ok(H, F, H // (2 if bits == 4 else 1),
                               H // (2 if bits == 4 else 1),
                               F // (2 if bits == 4 else 1))
    w = _make(rng, L, H, F, bits)
    attn = jnp.asarray(rng.standard_normal((batch, H)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((batch, H)), jnp.float32)
    for layer in (0, L - 1):
        ref = _reference(attn, x, w, layer, bits=bits, act=act, eps=eps,
                         offset=offset)
        out = ffn_block_stacked(
            attn, x, w["wo_q"], w["wo_s"], w["nw"], w["w13_q"], w["w13_s"],
            w["w2_q"], w["w2_s"], layer, bits=bits, act=act, eps=eps,
            offset=offset)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_ffn_block_norm_offset():
    """Gemma-style (1 + w) norm weighting flows through the prologue."""
    rng = np.random.default_rng(3)
    L, H, F, bits, eps = 2, 128, 256, 8, 1e-6
    w = _make(rng, L, H, F, bits)
    attn = jnp.asarray(rng.standard_normal((2, H)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((2, H)), jnp.float32)
    ref = _reference(attn, x, w, 1, bits=bits, act="gelu_tanh", eps=eps,
                     offset=1.0)
    out = ffn_block_stacked(
        attn, x, w["wo_q"], w["wo_s"], w["nw"], w["w13_q"], w["w13_s"],
        w["w2_q"], w["w2_s"], 1, bits=bits, act="gelu_tanh", eps=eps,
        offset=1.0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
