"""On-chip numeric validation of the PAGED Pallas decode path.

Same posture as tools/validate_chip.py, but through a PagedKVCache:
teacher-forced decode through the fused paged kernel
(`paged_decode_attention_update_stacked`, fast_decode=True) vs the XLA
paged formulation (scatter writes + gather_pages_dense, fast_decode=False)
on the real chip. Prefill always runs the XLA path (both programs), so the
comparison isolates the decode kernel.

Run: python tools/validate_chip_paged.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    from metalchat_tpu.cache import PagedKVCache
    from metalchat_tpu.config import LlamaConfig
    from metalchat_tpu.models.transformer import forward
    from metalchat_tpu.quant.quantize import init_random_quantized_params

    cfg = LlamaConfig(
        vocab_size=1024, hidden_size=512, intermediate_size=1024,
        num_layers=4, num_heads=8, num_kv_heads=2, head_dim=128,
        max_seq_len=512, tie_word_embeddings=False,
    )
    params = init_random_quantized_params(cfg, bits=4, group_size=None,
                                          act_bits=8, max_seq_len=512)

    rng = np.random.default_rng(0)
    stream = jnp.asarray(rng.integers(0, cfg.vocab_size, size=28), jnp.int32)
    psize = 256

    def run(name: str, fast: bool):
        import time
        t0 = time.time()
        cache = PagedKVCache.create(cfg, num_pages=2, page_size=psize,
                                    max_slots=1, max_pages_per_seq=2)
        cache = cache.replace(page_table=jnp.asarray([[0, 1]], jnp.int32))
        step = jax.jit(lambda p, c, t, s: forward(p, c, t, s, cfg,
                                                  fast_decode=fast))
        logits, cache = step(params, cache, stream[None, :16], 0)
        rows = [np.asarray(logits[0, -1], np.float32)]
        print(f"[{name}] prefill done ({time.time()-t0:.0f}s)", flush=True)
        for pos in range(16, len(stream)):        # teacher-forced
            logits, cache = step(params, cache, stream[None, pos:pos + 1],
                                 jnp.asarray([pos], jnp.int32))
            rows.append(np.asarray(logits[0, -1], np.float32))
        print(f"[{name}] {len(rows)} steps done ({time.time()-t0:.0f}s)",
              flush=True)
        return np.stack(rows)

    fast = run("fast", True)      # fused paged kernel on chip
    ref = run("ref", False)       # XLA paged formulation, same params

    scale = np.max(np.abs(ref)) + 1e-9
    rel = np.max(np.abs(fast - ref)) / scale
    agree = float(np.mean(np.argmax(fast, -1) == np.argmax(ref, -1)))
    print(f"max|fast-ref|/scale = {rel:.2e}   per-step greedy agreement "
          f"{agree:.0%}")
    # No agreement floor (matching validate_chip.py): random-weight logits
    # are near-flat, and the XLA ref attends in bf16 while the kernel runs
    # f32 — borderline argmax flips are precision noise, not a lowering
    # bug; the scale-relative bound is the acceptance criterion.
    assert rel < 3e-2, f"paged fused kernel beyond int8 noise: {rel}"
    print("paged chip validation OK")


if __name__ == "__main__":
    main()
