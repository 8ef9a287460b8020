"""On-chip MoE decode: stacked fast path vs scan path (VERDICT r4 #5).

Small Mixtral-style config (w4a8 experts), batch 1 and 8: measures decode
tokens/s through `decode_step` (expert matvecs on the stacked Pallas
kernel via the flattened (layer, expert) index — sparse routed-expert
formulation at B=1, dense-over-experts at B=8) against the scan path
(per-expert fused-dequant XLA contractions).

Marginal method per CLAUDE.md: one compiled program with a dynamic step
count, timed at two counts so the fixed dispatch+sync latency cancels.

Run: python benchmarks/moe_bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    from metalchat_tpu.cache import QuantizedKVCache
    from metalchat_tpu.config import MixtralConfig
    from metalchat_tpu.models import init_random_params
    from metalchat_tpu.models.decode import supports_fast_decode
    from metalchat_tpu.models.transformer import forward
    from metalchat_tpu.quant.quantize import quantize_params

    cfg = MixtralConfig(
        vocab_size=32000, hidden_size=1024, intermediate_size=2048,
        num_layers=8, num_heads=16, num_kv_heads=8, head_dim=128,
        max_seq_len=1024, tie_word_embeddings=False,
        num_experts=8, num_experts_per_tok=2,
    )
    params = init_random_params(cfg, seed=0, dtype=jnp.bfloat16)
    qparams = quantize_params(params, bits=4, group_size=None, act_bits=8)

    def make_run(fast: bool, batch: int):
        @jax.jit
        def run_steps(p, steps):
            cache = QuantizedKVCache.create(cfg, batch, cfg.max_seq_len)
            token = jnp.ones((batch,), jnp.int32)
            pos = jnp.asarray(16, jnp.int32)

            def body(i, carry):
                token, pos, cache = carry
                logits, cache = forward(p, cache, token[:, None], pos, cfg,
                                        fast_decode=fast)
                return (jnp.argmax(logits[:, -1], -1).astype(jnp.int32),
                        pos + 1, cache)

            token, pos, cache = jax.lax.fori_loop(
                0, steps, body, (token, pos, cache))
            return token

        def run(steps: int) -> float:
            t0 = time.perf_counter()
            np.asarray(run_steps(qparams, steps))
            return time.perf_counter() - t0

        return run

    results = {}
    for batch in (1, 8):
        cache = QuantizedKVCache.create(cfg, batch, cfg.max_seq_len)
        assert supports_fast_decode(qparams, cache,
                                    cfg, jnp.ones((batch, 1), jnp.int32))
        for fast in (True, False):
            run = make_run(fast, batch)
            run(8)  # compile
            lo = min(run(8) for _ in range(2))
            hi = min(run(72) for _ in range(2))
            tps = batch * 64 / (hi - lo)
            key = f"b{batch}_{'fast' if fast else 'scan'}"
            results[key] = round(tps, 1)
            print(f"{key}: {tps:.1f} tok/s", flush=True)

    for batch in (1, 8):
        f, s = results[f"b{batch}_fast"], results[f"b{batch}_scan"]
        results[f"b{batch}_speedup"] = round(f / s, 2)
    print(json.dumps({"metric": "moe_w4a8_decode_fast_vs_scan",
                      "config": "8x~0.7B mixtral-style (hd128)", **results}))


if __name__ == "__main__":
    main()
