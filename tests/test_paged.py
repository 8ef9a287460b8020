"""Paged KV cache tests: allocator, scatter writes, dense-gather parity,
Pallas paged attention (interpret), and paged model forward equivalence."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from metalchat_tpu.cache import (
    KVCache,
    PagedKVCache,
    dequantize_kv,
    gather_page_scales,
    gather_pages_dense,
    positions_to_pages,
    quantize_kv,
    write_paged_layer,
)
from metalchat_tpu.engine.paged import PageAllocator
from metalchat_tpu.models import forward, init_random_params
from metalchat_tpu.ops import xla as xops
from metalchat_tpu.ops.paged_attention_pallas import paged_decode_attention

from test_model import TINY_LLAMA


def test_page_allocator():
    alloc = PageAllocator(8)
    a = alloc.allocate(0, 3)
    b = alloc.allocate(1, 4)
    assert len(set(a) | set(b)) == 7 and alloc.free_pages == 1
    with pytest.raises(MemoryError):
        alloc.allocate(2, 2)
    alloc.free_slot(0)
    assert alloc.free_pages == 4
    assert alloc.can_allocate(4) and not alloc.can_allocate(5)


def test_positions_to_pages():
    table = jnp.asarray([[7, 3, 9], [2, 4, 6]], jnp.int32)
    positions = jnp.asarray([[0, 5, 8], [4, 11, 0]], jnp.int32)
    pages, offs = positions_to_pages(table, positions, page_size=4)
    np.testing.assert_array_equal(np.asarray(pages), [[7, 3, 9], [4, 6, 2]])
    np.testing.assert_array_equal(np.asarray(offs), [[0, 1, 0], [0, 3, 0]])


def test_write_and_gather_roundtrip():
    rng = np.random.default_rng(0)
    n_kv, P, psize, hd = 2, 6, 4, 8
    kp = jnp.zeros((n_kv, P, psize, hd), jnp.int8)
    vp = jnp.zeros_like(kp)
    ks = jnp.zeros((P, n_kv, psize), jnp.float32)
    vs = jnp.zeros_like(ks)
    # One sequence (B=1), 6 tokens over pages [5, 1]
    k_new = jnp.asarray(rng.standard_normal((1, 6, n_kv, hd)), jnp.float32)
    v_new = jnp.asarray(rng.standard_normal((1, 6, n_kv, hd)), jnp.float32)
    table = jnp.asarray([[5, 1, 0]], jnp.int32)
    positions = jnp.arange(6, dtype=jnp.int32)[None, :]
    pages, offs = positions_to_pages(table, positions, psize)
    kp, vp, ks, vs = write_paged_layer(kp, vp, ks, vs, k_new, v_new, pages, offs)

    dense_k = dequantize_kv(gather_pages_dense(kp, table),
                            gather_page_scales(ks, table), jnp.float32)
    # First 6 positions must match the (int8-roundtripped) inputs.
    expect = dequantize_kv(*quantize_kv(jnp.swapaxes(k_new, 1, 2)), jnp.float32)
    np.testing.assert_allclose(np.asarray(dense_k)[:, :, :6], np.asarray(expect),
                               rtol=1e-6, atol=1e-6)


def test_write_sentinel_page_dropped():
    n_kv, P, psize, hd = 1, 2, 4, 8
    kp = jnp.zeros((n_kv, P, psize, hd), jnp.int8)
    vp, ks, vs = kp, jnp.zeros((P, n_kv, psize)), jnp.zeros((P, n_kv, psize))
    k_new = jnp.ones((1, 1, n_kv, hd), jnp.float32)
    pages = jnp.asarray([[P]], jnp.int32)  # sentinel = out of range
    offs = jnp.asarray([[0]], jnp.int32)
    kp2, _, _, _ = write_paged_layer(kp, vp, ks, vs, k_new, k_new, pages, offs)
    np.testing.assert_array_equal(np.asarray(kp2), np.asarray(kp))  # dropped


def test_paged_attention_kernel_matches_dense():
    rng = np.random.default_rng(1)
    b, nh, n_kv, hd, psize, P, mp = 2, 8, 4, 32, 16, 10, 4
    q = jnp.asarray(rng.standard_normal((b, nh, hd)), jnp.float32)
    kd = jnp.asarray(rng.standard_normal((b, n_kv, mp * psize, hd)), jnp.float32)
    vd = jnp.asarray(rng.standard_normal((b, n_kv, mp * psize, hd)), jnp.float32)
    lengths = [37, 64]

    # Scatter the dense KV into pages via disjoint per-row tables.
    tables = np.array([[0, 3, 7, 2], [1, 4, 5, 8]], np.int32)
    kp = np.zeros((n_kv, P, psize, hd), np.int8)
    vp = np.zeros_like(kp)
    ks = np.zeros((P, n_kv, psize), np.float32)
    vs = np.zeros_like(ks)
    qk, sk = quantize_kv(kd)   # sk [B, n_kv, mp*psize]
    qv, sv = quantize_kv(vd)
    for row in range(b):
        for i in range(mp):
            page = tables[row, i]
            kp[:, page] = np.asarray(qk)[row, :, i * psize:(i + 1) * psize]
            vp[:, page] = np.asarray(qv)[row, :, i * psize:(i + 1) * psize]
            ks[page] = np.asarray(sk)[row, :, i * psize:(i + 1) * psize]
            vs[page] = np.asarray(sv)[row, :, i * psize:(i + 1) * psize]

    got = np.asarray(paged_decode_attention(
        q, jnp.asarray(kp), jnp.asarray(vp), jnp.asarray(ks), jnp.asarray(vs),
        jnp.asarray(tables), jnp.asarray(lengths), scale=0.125, interpret=True,
    ))

    kdq = dequantize_kv(qk, sk, jnp.float32)
    vdq = dequantize_kv(qv, sv, jnp.float32)
    for row in range(b):
        pos = jnp.asarray([[lengths[row] - 1]], jnp.int32)
        mask = xops.causal_mask(pos, mp * psize, lengths[row])
        ref = xops.attention(q[row:row+1, None], kdq[row:row+1], vdq[row:row+1],
                             mask, scale=0.125)
        np.testing.assert_allclose(got[row], np.asarray(ref)[0, 0], rtol=2e-4, atol=2e-4)


def test_paged_forward_matches_dense_cache():
    """Full model forward on a paged cache ≈ dense cache (int8 KV in both)."""
    cfg = TINY_LLAMA
    params = init_random_params(cfg, seed=41, dtype=jnp.float32)
    prompt = jnp.asarray([[3, 1, 4, 1, 5, 9, 2, 6]], jnp.int32)

    dense_cache = KVCache.create(cfg, 1, 16, dtype=jnp.float32)
    ref_logits, _ = jax.jit(forward, static_argnames="config")(
        params, dense_cache, prompt, 0, config=cfg
    )

    paged = PagedKVCache.create(cfg, num_pages=8, page_size=4, max_slots=1,
                                max_pages_per_seq=4)
    paged = paged.replace(
        page_table=jnp.asarray([[6, 2, 5, 0]], jnp.int32),
        lengths=jnp.asarray([0], jnp.int32),
    )
    logits, new_cache = jax.jit(forward, static_argnames="config")(
        params, paged, prompt, 0, config=cfg
    )
    # int8 KV quantization noise only.
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               rtol=0.05, atol=0.05)
    np.testing.assert_array_equal(
        np.asarray(logits)[:, -1].argmax(-1), np.asarray(ref_logits)[:, -1].argmax(-1)
    )

    # Decode continues over the paged cache with per-row positions.
    tok = logits[:, -1].argmax(-1).astype(jnp.int32)[:, None]
    logits2, _ = jax.jit(forward, static_argnames="config")(
        params, new_cache, tok, jnp.asarray([8], jnp.int32), config=cfg
    )
    assert np.isfinite(np.asarray(logits2)).all()


def test_paged_attention_stacked_matches_unstacked():
    """The layer-indexed stacked variant reads layer l of the [L, ...] pool
    identically to slicing + the per-layer kernel."""
    from metalchat_tpu.ops.paged_attention_pallas import (
        paged_decode_attention_stacked,
    )

    rng = np.random.default_rng(2)
    L, b, nh, n_kv, hd, psize, P, mp = 3, 2, 8, 4, 32, 16, 10, 4
    q = jnp.asarray(rng.standard_normal((b, nh, hd)), jnp.float32)
    kp = jnp.asarray(rng.integers(-127, 127, (L, n_kv, P, psize, hd)), jnp.int8)
    vp = jnp.asarray(rng.integers(-127, 127, (L, n_kv, P, psize, hd)), jnp.int8)
    ks = jnp.asarray(rng.random((L, P, n_kv, psize)), jnp.float32) * 0.02
    vs = jnp.asarray(rng.random((L, P, n_kv, psize)), jnp.float32) * 0.02
    tables = jnp.asarray([[0, 3, 7, 2], [1, 4, 5, 8]], jnp.int32)
    lengths = jnp.asarray([37, 64], jnp.int32)
    for l in range(L):
        ref = paged_decode_attention(
            q, kp[l], vp[l], ks[l], vs[l], tables, lengths,
            scale=0.125, interpret=True)
        got = paged_decode_attention_stacked(
            q, kp, vp, ks, vs, tables, lengths, jnp.asarray(l, jnp.int32),
            scale=0.125, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)


def test_paged_fast_decode_matches_scan_path():
    """decode_step's paged fast path (stacked kernel in interpret mode +
    per-row DUS page writes) produces the same logits and cache as the
    scan path (scatter writes + per-layer kernel/gather)."""
    from metalchat_tpu.models.transformer import forward

    cfg = TINY_LLAMA.replace(max_seq_len=64)
    params = init_random_params(cfg, seed=5, dtype=jnp.float32)
    b = 2
    cache = PagedKVCache.create(cfg, num_pages=b * 16, page_size=4,
                                max_slots=b, max_pages_per_seq=16)
    # Simple identity tables: row i owns pages [i*16, ...).
    pt = jnp.asarray(np.arange(b * 16).reshape(b, 16), jnp.int32)
    cache = cache.replace(page_table=pt)

    step = jax.jit(forward, static_argnames=("config", "fast_decode"))
    tok = jnp.asarray([[3], [9]], jnp.int32)
    pos = jnp.asarray([5, 9], jnp.int32)

    # Prefill a few positions with the scan path so the caches aren't empty.
    c_fast = c_ref = cache
    lf, c_fast = step(params, c_fast, tok, pos, config=cfg, fast_decode=True)
    lr, c_ref = step(params, c_ref, tok, pos, config=cfg, fast_decode=False)
    np.testing.assert_allclose(np.asarray(lf), np.asarray(lr),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(np.asarray(c_fast.k_pages),
                                  np.asarray(c_ref.k_pages))
    np.testing.assert_allclose(np.asarray(c_fast.k_scale),
                               np.asarray(c_ref.k_scale), rtol=1e-6)


def test_paged_fused_update_kernel_matches_separate():
    """The fused quantize+page-write+attend kernel (VERDICT r4 #3) equals
    update_stacked_paged_cache + paged_decode_attention_stacked, including
    the in-place page bytes and sentinel routing to the garbage page."""
    from metalchat_tpu.cache import update_stacked_paged_cache
    from metalchat_tpu.ops.paged_attention_pallas import (
        paged_decode_attention_stacked,
        paged_decode_attention_update_stacked,
    )

    rng = np.random.default_rng(3)
    L, b, nh, n_kv, hd, psize, P, mp = 2, 3, 8, 4, 32, 16, 10, 4
    q = jnp.asarray(rng.standard_normal((b, nh, hd)), jnp.float32)
    k_new = jnp.asarray(rng.standard_normal((b, n_kv, hd)), jnp.float32)
    v_new = jnp.asarray(rng.standard_normal((b, n_kv, hd)), jnp.float32)
    # P live pages + 1 reserved garbage page (index P).
    kp = jnp.asarray(rng.integers(-127, 127, (L, n_kv, P + 1, psize, hd)), jnp.int8)
    vp = jnp.asarray(rng.integers(-127, 127, (L, n_kv, P + 1, psize, hd)), jnp.int8)
    ks = jnp.asarray(rng.random((L, P + 1, n_kv, psize)), jnp.float32) * 0.02
    vs = jnp.asarray(rng.random((L, P + 1, n_kv, psize)), jnp.float32) * 0.02
    # Row 2's pos page-table entry is the SENTINEL (P): write → garbage page.
    tables = jnp.asarray([[0, 3, 7, 2], [1, 4, 5, 8], [6, P, P, P]], jnp.int32)
    lengths = jnp.asarray([38, 64, 17], jnp.int32)  # including the new token

    for l in range(L):
        layer = jnp.asarray(l, jnp.int32)
        pos = lengths - 1
        pg, off = positions_to_pages(tables, pos[:, None], psize)
        rkp, rvp, rks, rvs = update_stacked_paged_cache(
            kp, vp, ks, vs, k_new[:, None], v_new[:, None],
            layer, pg[:, 0], off[:, 0])
        ref = paged_decode_attention_stacked(
            q, rkp, rvp, rks, rvs, tables, lengths, layer,
            scale=0.125, interpret=True)
        got, gkp, gvp, gks, gvs = paged_decode_attention_update_stacked(
            q, k_new, v_new, kp, vp, ks, vs, tables, lengths, layer,
            scale=0.125, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)
        # Live pages bit-exact (garbage page content is don't-care).
        np.testing.assert_array_equal(np.asarray(gkp)[:, :, :P],
                                      np.asarray(rkp)[:, :, :P])
        np.testing.assert_array_equal(np.asarray(gvp)[:, :, :P],
                                      np.asarray(rvp)[:, :, :P])
        np.testing.assert_allclose(np.asarray(gks)[:, :P],
                                   np.asarray(rks)[:, :P], rtol=1e-6)
        np.testing.assert_allclose(np.asarray(gvs)[:, :P],
                                   np.asarray(rvs)[:, :P], rtol=1e-6)


def test_paged_fused_update_kernel_sliding_window():
    """Fused kernel under a sliding window: pos is always inside the window;
    output matches the separate formulation."""
    from metalchat_tpu.cache import update_stacked_paged_cache
    from metalchat_tpu.ops.paged_attention_pallas import (
        paged_decode_attention_stacked,
        paged_decode_attention_update_stacked,
    )

    rng = np.random.default_rng(4)
    L, b, nh, n_kv, hd, psize, P = 1, 2, 4, 2, 16, 8, 12
    tables = jnp.asarray([[0, 3, 7, 2], [1, 4, 5, 8]], jnp.int32)
    lengths = jnp.asarray([29, 14], jnp.int32)
    q = jnp.asarray(rng.standard_normal((b, nh, hd)), jnp.float32)
    k_new = jnp.asarray(rng.standard_normal((b, n_kv, hd)), jnp.float32)
    v_new = jnp.asarray(rng.standard_normal((b, n_kv, hd)), jnp.float32)
    kp = jnp.asarray(rng.integers(-127, 127, (L, n_kv, P + 1, psize, hd)), jnp.int8)
    vp = jnp.asarray(rng.integers(-127, 127, (L, n_kv, P + 1, psize, hd)), jnp.int8)
    ks = jnp.asarray(rng.random((L, P + 1, n_kv, psize)), jnp.float32) * 0.02
    vs = jnp.asarray(rng.random((L, P + 1, n_kv, psize)), jnp.float32) * 0.02
    layer = jnp.asarray(0, jnp.int32)
    window = jnp.asarray(6, jnp.int32)

    pos = lengths - 1
    pg, off = positions_to_pages(tables, pos[:, None], psize)
    rkp, rvp, rks, rvs = update_stacked_paged_cache(
        kp, vp, ks, vs, k_new[:, None], v_new[:, None],
        layer, pg[:, 0], off[:, 0])
    ref = paged_decode_attention_stacked(
        q, rkp, rvp, rks, rvs, tables, lengths, layer,
        scale=0.25, window=window, interpret=True)
    got, gkp, gvp, gks, gvs = paged_decode_attention_update_stacked(
        q, k_new, v_new, kp, vp, ks, vs, tables, lengths, layer,
        scale=0.25, window=window, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(gkp)[:, :, :P],
                                  np.asarray(rkp)[:, :, :P])


def test_paged_fast_decode_kernel_matches_scan_path():
    """decode_step's paged fast path WITH the Pallas kernels on (interpret)
    — i.e. the fused update kernel — matches the scan path end to end."""
    from metalchat_tpu import ops as _ops
    from metalchat_tpu.models.transformer import forward as _forward

    import os
    os.environ["METALCHAT_TPU_PALLAS_INTERPRET"] = "1"
    _ops.use_pallas.cache_clear()
    try:
        cfg = TINY_LLAMA.replace(max_seq_len=64)
        params = init_random_params(cfg, seed=6, dtype=jnp.float32)
        b = 2
        cache = PagedKVCache.create(cfg, num_pages=b * 16, page_size=4,
                                    max_slots=b, max_pages_per_seq=16)
        pt = jnp.asarray(np.arange(b * 16).reshape(b, 16), jnp.int32)
        cache = cache.replace(page_table=pt)

        step = jax.jit(_forward, static_argnames=("config", "fast_decode"))
        tok = jnp.asarray([[3], [9]], jnp.int32)
        pos = jnp.asarray([5, 9], jnp.int32)
        c_fast = c_ref = cache
        lf, c_fast = step(params, c_fast, tok, pos, config=cfg, fast_decode=True)
        lr, c_ref = step(params, c_ref, tok, pos, config=cfg, fast_decode=False)
        np.testing.assert_allclose(np.asarray(lf), np.asarray(lr),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_array_equal(np.asarray(c_fast.k_pages),
                                      np.asarray(c_ref.k_pages))
        np.testing.assert_allclose(np.asarray(c_fast.k_scale),
                                   np.asarray(c_ref.k_scale), rtol=1e-6)
    finally:
        del os.environ["METALCHAT_TPU_PALLAS_INTERPRET"]
        _ops.use_pallas.cache_clear()
