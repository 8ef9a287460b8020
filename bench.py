"""Decode-throughput benchmark (run by the driver on real TPU hardware).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Benchmark: Llama-3.2-1B bf16 closed-loop decode, batch 1 (the reference's
functional scale point — BASELINE.md: Llama-3.2-1B interactive decode on
Apple Silicon, no recorded rate). The reference publishes no numbers, so
`vs_baseline` is the fraction of the HBM roofline achieved on this chip:
decoding is bandwidth-bound, roofline tok/s = HBM_BW / bytes(weights+KV).
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp


def _roofline_tokens_per_sec(num_params: int, bytes_per_param: float, kv_bytes_per_token: float) -> float:
    # v5e ("TPU v5 lite"): ~819 GB/s HBM bandwidth.
    hbm_bw = 819e9
    return hbm_bw / (num_params * bytes_per_param + kv_bytes_per_token)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--small", action="store_true", help="tiny model (CI/CPU smoke)")
    parser.add_argument("--steps", type=int, default=128)
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("--quantized-kv", action="store_true")
    args = parser.parse_args()

    from metalchat_tpu.cache import KVCache, QuantizedKVCache
    from metalchat_tpu.config import LlamaConfig
    from metalchat_tpu.engine import generate
    from metalchat_tpu.models import init_random_params

    if args.small:
        config = LlamaConfig(
            vocab_size=512, hidden_size=128, intermediate_size=256,
            num_layers=2, num_heads=4, num_kv_heads=2, head_dim=32,
            max_seq_len=128, tie_word_embeddings=False,
        )
        max_seq = 128
    else:
        config = LlamaConfig(max_seq_len=1024)  # Llama-3.2-1B shape
        max_seq = 1024

    params = init_random_params(config, seed=0, dtype=jnp.bfloat16)
    n_params = sum(
        int(x.size) for x in jax.tree.leaves(params)
    ) - sum(int(x.size) for x in jax.tree.leaves(params["rope"]))

    cls = QuantizedKVCache if args.quantized_kv else KVCache
    prompt = jnp.ones((args.batch, 16), jnp.int32)
    steps = args.steps

    def run():
        cache = cls.create(config, args.batch, max_seq)
        out = generate(params, config, prompt, max_new_tokens=steps, cache=cache)
        jax.block_until_ready(out)
        return out

    run()  # warmup + compile
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    best = min(times)
    tokens_per_sec = args.batch * steps / best

    kv_bytes = (
        2 * config.num_layers * config.num_kv_heads * config.head_dim
        * (1 if args.quantized_kv else 2) * (max_seq / 2) * args.batch
    )
    roofline = _roofline_tokens_per_sec(n_params, 2.0, kv_bytes)
    print(
        json.dumps(
            {
                "metric": "llama1b_bf16_decode_tokens_per_sec",
                "value": round(tokens_per_sec, 2),
                "unit": "tokens/s",
                "vs_baseline": round(tokens_per_sec / roofline, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
