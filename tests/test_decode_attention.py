"""Decode attention Pallas kernel vs the XLA reference (interpret mode)."""

import numpy as np
import pytest

import jax.numpy as jnp

from metalchat_tpu.cache import quantize_kv
from metalchat_tpu.ops import xla as xops
from metalchat_tpu.ops.decode_attention_pallas import (
    decode_attention,
    decode_attention_quantized,
)


def _mk(b=2, t=64, nh=8, nkv=4, hd=32, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, nh, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, nkv, t, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, nkv, t, hd)), jnp.float32)
    return q, k, v


def _xla_ref(q, k, v, lengths, scale, window=None):
    """Reference: per-row masked attention via ops.xla.attention."""
    b, nh, hd = q.shape
    t = k.shape[2]
    outs = []
    for i in range(b):
        pos = jnp.asarray([[int(lengths[i]) - 1]], jnp.int32)
        mask = xops.causal_mask(pos, t, int(lengths[i]), window)
        o = xops.attention(q[i : i + 1, None], k[i : i + 1], v[i : i + 1], mask, scale=scale)
        outs.append(np.asarray(o)[:, 0])
    return np.concatenate(outs, axis=0)


@pytest.mark.parametrize("lengths", [[64, 64], [17, 33], [1, 5]])
def test_decode_attention_matches_xla(lengths):
    q, k, v = _mk()
    scale = 32**-0.5
    got = np.asarray(
        decode_attention(q, k, v, jnp.asarray(lengths), scale=scale, block_t=16,
                         interpret=True)
    )
    expect = _xla_ref(q, k, v, lengths, scale)
    np.testing.assert_allclose(got, expect, rtol=2e-5, atol=2e-5)


def test_decode_attention_sliding_window():
    q, k, v = _mk(seed=1)
    scale = 0.2
    lengths = [40, 64]
    got = np.asarray(
        decode_attention(q, k, v, jnp.asarray(lengths), scale=scale, window=8,
                         block_t=16, interpret=True)
    )
    expect = _xla_ref(q, k, v, lengths, scale, window=8)
    np.testing.assert_allclose(got, expect, rtol=2e-5, atol=2e-5)


def test_decode_attention_quantized_kv():
    q, k, v = _mk(seed=2)
    scale = 32**-0.5
    lengths = [50, 64]
    qk, sk = quantize_kv(k)
    qv, sv = quantize_kv(v)
    got = np.asarray(
        decode_attention_quantized(
            q, qk, qv, sk, sv, jnp.asarray(lengths), scale=scale, block_t=16,
            interpret=True,
        )
    )
    # Reference on the dequantized cache.
    from metalchat_tpu.cache import dequantize_kv

    kd = dequantize_kv(qk, sk, jnp.float32)
    vd = dequantize_kv(qv, sv, jnp.float32)
    expect = _xla_ref(q, kd, vd, lengths, scale)
    np.testing.assert_allclose(got, expect, rtol=2e-4, atol=2e-4)


def test_gqa_grouping():
    """nh == nkv (MHA) and high-ratio GQA both work."""
    for nh, nkv in [(4, 4), (16, 2)]:
        q, k, v = _mk(nh=nh, nkv=nkv, seed=3)
        lengths = [30, 60]
        got = np.asarray(
            decode_attention(q, k, v, jnp.asarray(lengths), scale=0.1, block_t=32,
                             interpret=True)
        )
        expect = _xla_ref(q, k, v, lengths, 0.1)
        np.testing.assert_allclose(got, expect, rtol=2e-5, atol=2e-5)


def test_fused_update_attention_matches_reference():
    """decode_attention_update_quantized_stacked == quantize + 4 DUS +
    decode_attention_quantized_stacked, bit-exact for the cache payloads
    (same quantization op order) and to float tolerance for the attention
    output — including a row whose position sits exactly on a block
    boundary and a sliding window."""
    from metalchat_tpu.cache import update_stacked_layer_cache_quantized
    from metalchat_tpu.ops.decode_attention_pallas import (
        decode_attention_quantized_stacked,
        decode_attention_update_quantized_stacked,
    )

    rng = np.random.default_rng(0)
    L, B, nkv, T, hd, nh = 2, 3, 2, 512, 128, 4
    k = jnp.asarray(rng.integers(-127, 127, (L, B, nkv, T, hd)), jnp.int8)
    v = jnp.asarray(rng.integers(-127, 127, (L, B, nkv, T, hd)), jnp.int8)
    ks = jnp.asarray(rng.random((L, B, nkv, T)), jnp.float32) * 0.01
    vs = jnp.asarray(rng.random((L, B, nkv, T)), jnp.float32) * 0.01
    q = jnp.asarray(rng.standard_normal((B, nh, hd)), jnp.float32)
    kn = jnp.asarray(rng.standard_normal((B, 1, nkv, hd)), jnp.float32)
    vn = jnp.asarray(rng.standard_normal((B, 1, nkv, hd)), jnp.float32)
    start_pos = jnp.asarray([5, 255, 256], jnp.int32)  # incl. block edge
    lengths = start_pos + 1
    layer = jnp.asarray(1, jnp.int32)
    scale = hd**-0.5

    for window in (None, 300):
        ck, cv, sk2, sv2 = update_stacked_layer_cache_quantized(
            k, v, ks, vs, kn, vn, layer, start_pos)
        ref = decode_attention_quantized_stacked(
            q, ck, cv, sk2, sv2, layer, lengths, scale=scale, window=window,
            block_t=256)
        attn, fk, fv, fks, fvs = decode_attention_update_quantized_stacked(
            q, kn[:, 0], vn[:, 0], k, v, ks, vs, layer, lengths,
            scale=scale, window=window, block_t=256)
        np.testing.assert_allclose(np.asarray(attn), np.asarray(ref),
                                   atol=1e-5)
        np.testing.assert_array_equal(np.asarray(fk), np.asarray(ck))
        np.testing.assert_array_equal(np.asarray(fv), np.asarray(cv))
        np.testing.assert_allclose(np.asarray(fks), np.asarray(sk2))
        np.testing.assert_allclose(np.asarray(fvs), np.asarray(sv2))
