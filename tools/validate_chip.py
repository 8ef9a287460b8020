"""On-chip numeric validation of the Pallas decode path.

Two layers of evidence (run after any kernel change, before trusting bench
numbers):

  1. tools/validate_kernels.py — per-op Mosaic-vs-interpret ladder. The
     integer matvec and the fused act-quant are BIT-EXACT on chip; the
     rmsnorm prologue differs from XLA only in the f32 mean's reduction
     order (±1 ulp in var), which can flip borderline int8 activation
     rounds — one-quantum scheme noise, not a lowering bug.
  2. This script — model level. Teacher-forced decode (fixed token stream,
     so one borderline flip cannot cascade through argmax feedback) through
     three programs on the real chip:
        fast  = Pallas kernels (fast_decode=True)
        ref   = XLA scan fallback (fast_decode=False), same quantized params
        dense = dequantized bf16 weights (the quantization-free oracle)
     Accepts iff (a) fast tracks ref within int8-activation noise and
     (b) fast's error against dense does NOT exceed ref's — a Mosaic bug
     would amplify err_fast far beyond err_ref; reduction-order quantum
     flips keep them comparable.

Run: python tools/validate_chip.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _validate(cfg, bits: int) -> None:
    from metalchat_tpu.cache import KVCache, QuantizedKVCache
    from metalchat_tpu.models.transformer import forward
    from metalchat_tpu.quant.quantize import (
        QuantizedTensor,
        dequantize,
        init_random_quantized_params,
    )
    params = init_random_quantized_params(cfg, bits=bits, group_size=None,
                                          act_bits=8, max_seq_len=512)
    dense_params = jax.tree.map(
        lambda x: dequantize(x) if isinstance(x, QuantizedTensor) else x,
        params, is_leaf=lambda x: isinstance(x, QuantizedTensor),
    )

    rng = np.random.default_rng(0)
    stream = jnp.asarray(rng.integers(0, cfg.vocab_size, size=28), jnp.int32)

    def run(name: str, p, fast: bool, quantized_kv: bool):
        import time
        t0 = time.time()
        cls = QuantizedKVCache if quantized_kv else KVCache
        cache = cls.create(cfg, 1, 512)
        step = jax.jit(lambda p, c, t, s: forward(p, c, t, s, cfg,
                                                  fast_decode=fast))
        logits, cache = step(p, cache, stream[None, :16], 0)
        rows = [np.asarray(logits[0, -1], np.float32)]
        print(f"[{name}] prefill done ({time.time()-t0:.0f}s)", flush=True)
        for pos in range(16, len(stream)):        # teacher-forced
            logits, cache = step(p, cache, stream[None, pos : pos + 1], pos)
            rows.append(np.asarray(logits[0, -1], np.float32))
        print(f"[{name}] {len(rows)} steps done ({time.time()-t0:.0f}s)",
              flush=True)
        return np.stack(rows)

    fast = run("fast", params, True, True)    # Pallas kernels on chip
    ref = run("ref", params, False, True)     # XLA scan path, same params
    dense = run("dense", dense_params, False, False)

    scale = np.max(np.abs(ref)) + 1e-9
    rel_fr = np.max(np.abs(fast - ref)) / scale
    err_fast = np.max(np.abs(fast - dense))
    err_ref = np.max(np.abs(ref - dense))
    agree = float(np.mean(np.argmax(fast, -1) == np.argmax(ref, -1)))
    print(f"max|fast-ref|/scale = {rel_fr:.2e}   per-step greedy agreement "
          f"{agree:.0%}")
    print(f"err vs dense oracle: fast {err_fast:.4f}  ref {err_ref:.4f}  "
          f"(ratio {err_fast / (err_ref + 1e-9):.3f})")
    assert rel_fr < 3e-2, f"fast path beyond int8-activation noise: {rel_fr}"
    assert err_fast <= 1.3 * err_ref + 1e-3, (
        f"Pallas path amplifies quantization error: {err_fast} vs {err_ref}")
    print(f"chip validation OK (hd={cfg.head_dim}, bits={bits})")


def main() -> None:
    from metalchat_tpu.config import LlamaConfig

    # Small but kernel-eligible dims (lane/block aligned like the 8B):
    # the fused attention+update kernel path (hd=128).
    _validate(LlamaConfig(
        vocab_size=1024, hidden_size=512, intermediate_size=1024,
        num_layers=4, num_heads=8, num_kv_heads=2, head_dim=128,
        max_seq_len=512, tie_word_embeddings=False,
    ), bits=4)
    # llama32_1b-style sub-lane head dim: the PLAIN stacked attention
    # kernel + separate cache update path (late-r5 hd=64 gate split),
    # validated on the TRAINED 10M fixture rather than random weights —
    # with random params one-quantum act-quant flips amplify chaotically
    # through the layer stack (measured 0.33 rel in a SINGLE matched-state
    # step, while every kernel row is ≤1e-2 and the trained-weight quality
    # gate holds w8a8 at +0.059% ppl on chip), so random-weight logit
    # comparisons gate nothing at this scale. Trained weights are well-
    # conditioned; fast-vs-ref must stay within single-quantum noise.
    _validate_fixture_hd64()


def _validate_fixture_hd64() -> None:
    import functools

    from metalchat_tpu.cache import QuantizedKVCache
    from metalchat_tpu.config import load_config
    from metalchat_tpu.io.loaders import load_params
    from metalchat_tpu.io.safetensors import open_safetensors
    from metalchat_tpu.models import decode as _dec
    from metalchat_tpu.models.transformer import forward
    from metalchat_tpu.quant.quantize import quantize_params

    fixture = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "fixtures", "pyllama_10m")
    cfg = load_config(os.path.join(fixture, "config.json"))
    assert cfg.head_dim == 64, cfg.head_dim
    doc = open_safetensors(os.path.join(fixture, "model.safetensors"))
    params = quantize_params(
        load_params(doc, cfg, dtype=jnp.bfloat16, max_seq_len=1024),
        bits=8, group_size=None, act_bits=8)
    ev = np.load(os.path.join(fixture, "eval_tokens.npy")).astype(np.int32)
    stream = jnp.asarray(ev[:48])

    def run(fast, attn_interp=False):
        orig = _dec.decode_attention_quantized_stacked
        if attn_interp:
            _dec.decode_attention_quantized_stacked = functools.partial(
                orig, interpret=True)
        try:
            cache = QuantizedKVCache.create(cfg, 1, 1024)
            step = jax.jit(lambda p, c, t, s: forward(p, c, t, s, cfg,
                                                      fast_decode=fast))
            logits, cache = step(params, cache, stream[None, :16], 0)
            rows = [np.asarray(logits[0, -1], np.float32)]
            for pos in range(16, len(stream)):
                logits, cache = step(params, cache,
                                     stream[None, pos : pos + 1], pos)
                rows.append(np.asarray(logits[0, -1], np.float32))
            return np.stack(rows)
        finally:
            _dec.decode_attention_quantized_stacked = orig

    fast = run(True)
    ref = run(False)
    fast_ia = run(True, attn_interp=True)
    assert np.array_equal(fast, fast_ia), (
        "plain attention kernel lowering differs from its interpret "
        "reference inside the model program")
    print("plain attn kernel ≡ interpret reference (bit-exact)")
    rel = np.max(np.abs(fast - ref)) / (np.max(np.abs(ref)) + 1e-9)
    agree = float(np.mean(np.argmax(fast, -1) == np.argmax(ref, -1)))
    print(f"trained-fixture fast-vs-ref rel = {rel:.2e}, greedy agreement "
          f"{agree:.0%}")
    assert rel < 3e-2, f"trained-weight divergence beyond quantum noise: {rel}"
    print("chip validation OK (hd=64 plain-attention path, trained fixture)")


if __name__ == "__main__":
    main()
