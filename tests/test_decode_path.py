"""Decode fast path (models/decode.py) vs the scan reference (forward).

The fori_loop/stacked decode step must be semantically identical to the
`lax.scan` formulation at S == 1 for every model family and weight scheme.
On CPU the Pallas kernels are exercised separately in interpret mode
(test_a8_matvec.py); here the structural restructure is validated.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metalchat_tpu.cache import KVCache, QuantizedKVCache
from metalchat_tpu.config import Gemma3Config, GPT2Config, LlamaConfig
from metalchat_tpu.models.transformer import forward, init_random_params
from metalchat_tpu.quant.quantize import init_random_quantized_params, quantize_params


def llama_cfg(**kw):
    return LlamaConfig(
        vocab_size=512, hidden_size=128, intermediate_size=256,
        num_layers=3, num_heads=4, num_kv_heads=2, head_dim=32,
        max_seq_len=128, tie_word_embeddings=False, **kw)


def run_both(params, cfg, cache_cls, batch=2, steps=3, dtype=jnp.float32):
    """Prefill 4 tokens via the scan path, then decode `steps` tokens through
    both paths from identical state; compare logits at every step."""
    rng = np.random.default_rng(0)
    prompt = jnp.asarray(rng.integers(1, cfg.vocab_size, (batch, 4)), jnp.int32)
    kw = {"dtype": dtype} if cache_cls is KVCache else {}
    cache = cache_cls.create(cfg, batch, cfg.max_seq_len, **kw)
    logits, cache = forward(params, cache, prompt, 0, cfg)
    tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)[:, None]

    cache_a, cache_b = cache, cache
    pos = 4
    for i in range(steps):
        la, cache_a = forward(params, cache_a, tok, pos, cfg, fast_decode=True)
        lb, cache_b = forward(params, cache_b, tok, pos, cfg, fast_decode=False)
        np.testing.assert_allclose(
            np.asarray(la, np.float32), np.asarray(lb, np.float32),
            rtol=2e-4, atol=2e-4, err_msg=f"step {i}")
        tok = jnp.argmax(la[:, -1], -1).astype(jnp.int32)[:, None]
        pos += 1
    # Cache states must agree too (same tokens were written).
    for xa, xb in zip(jax.tree.leaves(cache_a), jax.tree.leaves(cache_b)):
        np.testing.assert_allclose(np.asarray(xa, np.float32),
                                   np.asarray(xb, np.float32),
                                   rtol=2e-4, atol=2e-4)


def test_dense_llama_matches_scan():
    cfg = llama_cfg()
    params = init_random_params(cfg, dtype=jnp.float32, max_seq_len=128)
    run_both(params, cfg, KVCache)


def test_quantized_w4a8_matches_scan():
    cfg = llama_cfg()
    params = init_random_params(cfg, dtype=jnp.float32, max_seq_len=128)
    qp = quantize_params(params, bits=4, group_size=None, act_bits=8,
                         quantize_lm_head=True)
    run_both(qp, cfg, QuantizedKVCache)


def test_quantized_w4a8_fused_matches_scan():
    from metalchat_tpu.models.fuse import fuse_projections

    cfg = llama_cfg()
    params = init_random_params(cfg, dtype=jnp.float32, max_seq_len=128)
    qp = fuse_projections(
        quantize_params(params, bits=8, group_size=None, act_bits=8), cfg)
    run_both(qp, cfg, QuantizedKVCache)


def test_groupwise_int8_matches_scan():
    cfg = llama_cfg()
    params = init_random_params(cfg, dtype=jnp.float32, max_seq_len=128)
    qp = quantize_params(params, bits=8, group_size=32)
    run_both(qp, cfg, QuantizedKVCache)


def test_gemma3_matches_scan():
    cfg = Gemma3Config(
        vocab_size=512, hidden_size=128, intermediate_size=256,
        num_layers=4, num_heads=4, num_kv_heads=2, head_dim=32,
        max_seq_len=128, sliding_window=16, sliding_window_pattern=2,
        rope_local_theta=10000.0, tie_word_embeddings=False)
    params = init_random_params(cfg, dtype=jnp.float32, max_seq_len=128)
    run_both(params, cfg, KVCache)


def test_gpt2_matches_scan():
    cfg = GPT2Config(
        vocab_size=512, hidden_size=128, intermediate_size=256,
        num_layers=2, num_heads=4, num_kv_heads=4, head_dim=32,
        max_seq_len=128)
    params = init_random_params(cfg, dtype=jnp.float32, max_seq_len=128)
    run_both(params, cfg, KVCache)


def test_per_row_start_pos():
    """Continuous-batching style decode: rows at different positions."""
    cfg = llama_cfg()
    params = init_random_params(cfg, dtype=jnp.float32, max_seq_len=128)
    rng = np.random.default_rng(1)
    tok = jnp.asarray(rng.integers(1, 512, (3, 1)), jnp.int32)
    cache = KVCache.create(cfg, 3, 128, dtype=jnp.float32)
    pos = jnp.asarray([5, 9, 2], jnp.int32)
    la, ca = forward(params, cache, tok, pos, cfg, fast_decode=True)
    lb, cb = forward(params, cache, tok, pos, cfg, fast_decode=False)
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb), rtol=2e-4, atol=2e-4)
    for xa, xb in zip(jax.tree.leaves(ca), jax.tree.leaves(cb)):
        np.testing.assert_allclose(np.asarray(xa), np.asarray(xb),
                                   rtol=2e-4, atol=2e-4)


def _window_both(params, cfg, cache_cls, s=5, batch=2, prefill=20):
    """Prefill via the scan path (> 16 tokens), then one s-token window
    through both paths — the speculative-verify shape."""
    rng = np.random.default_rng(3)
    prompt = jnp.asarray(rng.integers(1, cfg.vocab_size, (batch, prefill)),
                         jnp.int32)
    kw = {"dtype": jnp.float32} if cache_cls is KVCache else {}
    cache = cache_cls.create(cfg, batch, cfg.max_seq_len, **kw)
    _, cache = forward(params, cache, prompt, 0, cfg)
    win = jnp.asarray(rng.integers(1, cfg.vocab_size, (batch, s)), jnp.int32)
    la, ca = forward(params, cache, win, prefill, cfg, fast_decode=True)
    lb, cb = forward(params, cache, win, prefill, cfg, fast_decode=False)
    assert la.shape == (batch, s, cfg.vocab_size)
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                               rtol=3e-4, atol=3e-4)
    for xa, xb in zip(jax.tree.leaves(ca), jax.tree.leaves(cb)):
        np.testing.assert_allclose(np.asarray(xa), np.asarray(xb),
                                   rtol=3e-4, atol=3e-4)


def test_multitoken_window_w4a8_matches_scan():
    cfg = llama_cfg()
    params = init_random_params(cfg, dtype=jnp.float32, max_seq_len=128)
    qp = quantize_params(params, bits=4, group_size=None, act_bits=8,
                         quantize_lm_head=True)
    _window_both(qp, cfg, QuantizedKVCache)


def test_multitoken_window_dense_matches_scan():
    _cfg = llama_cfg()
    params = init_random_params(_cfg, dtype=jnp.float32, max_seq_len=128)
    _window_both(params, _cfg, KVCache)


def test_multitoken_window_gemma_sliding():
    cfg = Gemma3Config(
        vocab_size=512, hidden_size=128, intermediate_size=256,
        num_layers=4, num_heads=4, num_kv_heads=2, head_dim=32,
        max_seq_len=128, sliding_window=16, sliding_window_pattern=2,
        rope_local_theta=10000.0, tie_word_embeddings=False)
    params = init_random_params(cfg, dtype=jnp.float32, max_seq_len=128)
    _window_both(params, cfg, KVCache, s=7, prefill=24)


def test_multitoken_window_per_row_start_pos():
    """Per-row offsets with S > 1 are a fast-path-only feature; the
    reference is each row run separately through the scan path at its own
    scalar offset."""
    cfg = llama_cfg()
    params = init_random_params(cfg, dtype=jnp.float32, max_seq_len=128)
    rng = np.random.default_rng(4)
    tok = jnp.asarray(rng.integers(1, 512, (3, 4)), jnp.int32)
    cache = KVCache.create(cfg, 3, 128, dtype=jnp.float32)
    pos = jnp.asarray([5, 9, 2], jnp.int32)
    la, ca = forward(params, cache, tok, pos, cfg, fast_decode=True)
    for r in range(3):
        row_cache = KVCache.create(cfg, 1, 128, dtype=jnp.float32)
        lb, cb = forward(params, row_cache, tok[r : r + 1], int(pos[r]), cfg,
                         fast_decode=False)
        np.testing.assert_allclose(np.asarray(la[r]), np.asarray(lb[0]),
                                   rtol=2e-4, atol=2e-4)
        # The row's KV slice must match the solo run's (other rows differ —
        # the solo cache never saw them).
        for xa, xb in zip(jax.tree.leaves(ca), jax.tree.leaves(cb)):
            np.testing.assert_allclose(
                np.asarray(xa[:, r : r + 1]), np.asarray(xb),
                rtol=2e-4, atol=2e-4)


def _fused_quant_params(cfg, bits, seed=0):
    from metalchat_tpu.models.fuse import fuse_projections

    params = init_random_params(cfg, dtype=jnp.float32, seed=seed,
                                max_seq_len=cfg.max_seq_len)
    return fuse_projections(
        quantize_params(params, bits=bits, group_size=None, act_bits=8,
                        scales_dtype=jnp.float32), cfg)


def _run_merged_vs_unmerged(cfg, bits, s=1, monkeypatch=None):
    """The merged post-attention block kernel (ops/ffn_block_pallas.py) must
    be BIT-identical to the unmerged wo→norm→w13→act→w2 composition in
    interpret mode (same ops, same order)."""
    from metalchat_tpu import ops
    from metalchat_tpu.models import decode

    monkeypatch.setenv("METALCHAT_TPU_PALLAS_INTERPRET", "1")
    ops.use_pallas.cache_clear()
    try:
        params = _fused_quant_params(cfg, bits)
        cache = QuantizedKVCache.create(cfg, 2, cfg.max_seq_len)
        rng = np.random.default_rng(7)
        tok = jnp.asarray(rng.integers(1, cfg.vocab_size, (2, s)), jnp.int32)

        monkeypatch.setenv("METALCHAT_FFN_BLOCK", "0")
        la, ca = decode.decode_step(params, cache, tok, 4, cfg)

        calls = []
        orig = decode.ffn_block_stacked
        monkeypatch.setattr(
            decode, "ffn_block_stacked",
            lambda *a, **k: (calls.append(1), orig(*a, **k))[1])
        monkeypatch.setenv("METALCHAT_FFN_BLOCK", "1")
        lb, cb = decode.decode_step(params, cache, tok, 4, cfg)

        assert calls, "merged ffn-block kernel did not engage"
        # The kernel itself is BIT-exact vs the composed ops
        # (tests/test_ffn_block.py); at decode_step level the two traced
        # programs fuse differently in XLA, so unrelated f32 ops drift by
        # ~1 ulp — hence tight-but-not-zero tolerances here.
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=1e-5, atol=1e-5)
        for xa, xb in zip(jax.tree.leaves(ca), jax.tree.leaves(cb)):
            np.testing.assert_allclose(np.asarray(xa, np.float32),
                                       np.asarray(xb, np.float32),
                                       rtol=1e-5, atol=1e-5)
    finally:
        ops.use_pallas.cache_clear()


def test_ffn_block_merged_w8a8_exact(monkeypatch):
    _run_merged_vs_unmerged(llama_cfg(), bits=8, monkeypatch=monkeypatch)


def test_ffn_block_merged_w4a8_exact(monkeypatch):
    cfg = LlamaConfig(
        vocab_size=512, hidden_size=256, intermediate_size=512,
        num_layers=3, num_heads=4, num_kv_heads=2, head_dim=64,
        max_seq_len=128, tie_word_embeddings=False)
    _run_merged_vs_unmerged(cfg, bits=4, monkeypatch=monkeypatch)


def test_ffn_block_merged_multitoken_window(monkeypatch):
    """s > 1 windows flatten to b·s rows through the same merged kernel."""
    _run_merged_vs_unmerged(llama_cfg(), bits=8, s=4, monkeypatch=monkeypatch)


def test_ffn_block_full_decode_matches_scan(monkeypatch):
    """End-to-end: the merged-kernel fast path vs the scan reference."""
    from metalchat_tpu import ops

    monkeypatch.setenv("METALCHAT_TPU_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("METALCHAT_FFN_BLOCK", "1")
    ops.use_pallas.cache_clear()
    try:
        cfg = llama_cfg()
        params = _fused_quant_params(cfg, bits=8)
        run_both(params, cfg, QuantizedKVCache)
    finally:
        ops.use_pallas.cache_clear()


def test_plain_attn_kernel_branch_matches_scan(monkeypatch):
    """METALCHAT_ATTN_KERNEL=plain forces the separate-update + plain
    stacked attention kernel branch (the on-chip path for hd=64 models,
    e.g. llama32_1b, where the fused update kernel cannot lower) — it
    must match the scan reference like every other fast-path branch."""
    from metalchat_tpu import ops
    from metalchat_tpu.models import decode

    monkeypatch.setenv("METALCHAT_TPU_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("METALCHAT_ATTN_KERNEL", "plain")
    ops.use_pallas.cache_clear()
    try:
        calls = []
        orig = decode.decode_attention_quantized_stacked
        monkeypatch.setattr(
            decode, "decode_attention_quantized_stacked",
            lambda *a, **k: (calls.append(1), orig(*a, **k))[1])
        cfg = llama_cfg()
        params = quantize_params(
            init_random_params(cfg, dtype=jnp.float32), bits=8,
            group_size=None, act_bits=8, scales_dtype=jnp.float32)
        run_both(params, cfg, QuantizedKVCache)
        assert calls, "plain attention kernel branch did not engage"
    finally:
        ops.use_pallas.cache_clear()
