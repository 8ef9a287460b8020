"""Decode-throughput benchmark (run by the driver on real TPU hardware).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Headline config (BASELINE.json metric): **Llama-3.1-8B INT4 weights +
INT8 KV cache, single chip, closed-loop decode** — run in the W4A8
execution scheme (packed int4 weights, per-channel scales, dynamic per-token
int8 activations, s8×s8→s32 on the MXU), the fastest formulation measured
on v5e (benchmarks/quant_microbench.py; 2.6× the fused-dequant bf16 path).
`--config 8b-int4` selects the group-32 weight-only-exact scheme instead.
Throughput is measured as the *marginal* tokens/s between a short and a
long generation (the axon tunnel adds fixed per-invocation latency —
~28 ms warm, seconds cold — that would otherwise swamp the number; both
runs pay it, the delta cancels it).

The reference publishes no numbers (BASELINE.md), so `vs_baseline` reports
the fraction of this chip's HBM roofline achieved: decode is bandwidth-bound
and roofline tok/s = HBM_BW / bytes-read-per-token (weights + scales + KV).

Other configs: --config {8b-int4, 8b-w8a8, 1b-bf16, 1b-int8, small}.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import time

import jax
import jax.numpy as jnp

HBM_BW = 819e9  # v5e ("TPU v5 lite") HBM bandwidth, bytes/s
MXU_BF16 = 197e12  # v5e peak bf16 FLOP/s
MXU_INT8 = 394e12  # v5e peak int8 OP/s


def linear_flops_per_token(params) -> float:
    """2·(in×out) summed over every linear leaf (stacked leaves × L), the
    prefill FLOPs per token. Embedding gather / norms / rope are negligible;
    attention FLOPs are context-dependent and excluded (so the prefill
    vs_baseline denominator is an upper bound on useful throughput)."""
    from metalchat_tpu.quant.quantize import LoraLinear, QuantizedTensor

    total = 0.0

    def leaf_flops(leaf):
        if isinstance(leaf, LoraLinear):
            return leaf_flops(leaf.base)
        if isinstance(leaf, QuantizedTensor):
            stack = leaf.q.shape[0] if leaf.q.ndim == 3 else 1
            return 2.0 * leaf.in_features * leaf.out_features * stack
        if hasattr(leaf, "ndim") and leaf.ndim >= 2 and leaf.dtype != jnp.int32:
            shape = leaf.shape
            if leaf.ndim == 2:
                return 2.0 * shape[0] * shape[1]
            return 2.0 * shape[-2] * shape[-1] * shape[0]
        return 0.0

    for name in ("wq", "wk", "wv", "wo", "w1", "w2", "w3", "wqkv", "w13"):
        if name in params["layers"]:
            total += leaf_flops(params["layers"][name])
    total += leaf_flops(params["lm_head"])
    return total


def build(config_name: str):
    from metalchat_tpu.config import LlamaConfig
    from metalchat_tpu.models import init_random_params
    from metalchat_tpu.quant.quantize import init_random_quantized_params

    if config_name == "8b-int4":
        cfg = LlamaConfig.llama31_8b(max_seq_len=1024)
        params = init_random_quantized_params(cfg, bits=4, group_size=32,
                                              max_seq_len=1024)
        quantized_kv = True
    elif config_name == "8b-w4a8":
        # Per-channel int4 + dynamic int8 activations: the s8×s8 MXU path
        # (fastest wall-clock formulation measured on v5e).
        cfg = LlamaConfig.llama31_8b(max_seq_len=1024)
        params = init_random_quantized_params(cfg, bits=4, group_size=None,
                                              act_bits=8, max_seq_len=1024)
        quantized_kv = True
    elif config_name == "8b-w8a8":
        cfg = LlamaConfig.llama31_8b(max_seq_len=1024)
        params = init_random_quantized_params(cfg, bits=8, group_size=None,
                                              act_bits=8, max_seq_len=1024)
        quantized_kv = True
    elif config_name == "1b-int8":
        # Legacy group-wise int8 (exact dequant dot) — kept as the slow-
        # formulation comparison row, like 8b-int4. The fast 1B scheme is
        # 1b-w8a8 below; requantize_per_channel converts group checkpoints.
        cfg = LlamaConfig.llama32_1b(max_seq_len=1024)
        params = init_random_quantized_params(cfg, bits=8, group_size=32,
                                              max_seq_len=1024)
        quantized_kv = True
    elif config_name == "1b-w8a8":
        cfg = LlamaConfig.llama32_1b(max_seq_len=1024)
        params = init_random_quantized_params(cfg, bits=8, group_size=None,
                                              act_bits=8, max_seq_len=1024)
        quantized_kv = True
    elif config_name in ("gemma3-4b-int8", "gemma3-1b-int8"):
        from metalchat_tpu.config import Gemma3Config

        preset = (Gemma3Config.gemma3_4b if "4b" in config_name
                  else Gemma3Config.gemma3_1b)
        cfg = preset(max_seq_len=1024)
        params = init_random_quantized_params(cfg, bits=8, group_size=None,
                                              act_bits=8, max_seq_len=1024)
        quantized_kv = True
    elif config_name == "1b-bf16":
        cfg = LlamaConfig.llama32_1b(max_seq_len=1024)
        params = init_random_params(cfg, dtype=jnp.bfloat16, max_seq_len=1024)
        quantized_kv = False
    elif config_name in ("small", "small-f32"):
        # small-f32: CPU smoke testing (the CPU backend cannot execute
        # bf16×bf16 dots — CLAUDE.md).
        dtype = jnp.float32 if config_name == "small-f32" else jnp.bfloat16
        cfg = LlamaConfig(
            vocab_size=512, hidden_size=256, intermediate_size=512,
            num_layers=2, num_heads=4, num_kv_heads=2, head_dim=64,
            max_seq_len=512, tie_word_embeddings=False,
        )
        params = init_random_params(cfg, dtype=dtype, max_seq_len=512)
        quantized_kv = False
    else:
        raise SystemExit(f"unknown config {config_name}")
    return cfg, params, quantized_kv


def bytes_per_token(cfg, params, quantized_kv: bool, kv_len: int, batch: int) -> float:
    """HBM bytes read per decoded token.

    Counts: every weight leaf EXCEPT the embedding table (decode gathers ONE
    row of it, not the table — VERDICT r1 flagged the old all-params sum as
    flattering the roofline by ~1 GB/token on 8B) and the rope tables (one
    row), plus the KV payload and scales actually streamed per row at the
    average fill level kv_len/2.
    """
    def nbytes(tree) -> int:
        return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(tree))

    weight_bytes = (
        nbytes(params)
        - nbytes(params["rope"])
        - nbytes(params["embed"])
        + cfg.hidden_size * 2  # the one gathered embedding row (bf16)
    )
    kv_payload = (1 if quantized_kv else 2)
    kv_bytes_row = (
        2 * cfg.num_layers * cfg.num_kv_heads * (kv_len / 2)
        * (cfg.head_dim * kv_payload + (4 if quantized_kv else 0))
    )
    return weight_bytes + batch * kv_bytes_row


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="8b-w4a8")
    parser.add_argument("--kv", choices=["default", "bf16", "int8"], default="default",
                        help="override the KV cache dtype of the chosen config")
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("--ctx", type=int, default=None,
                        help="override max_seq_len (KV capacity)")
    parser.add_argument("--steps-lo", type=int, default=16)
    parser.add_argument("--steps-hi", type=int, default=144)
    parser.add_argument("--mode", choices=["decode", "prefill", "serve"],
                        default="decode")
    parser.add_argument("--slots", type=int, default=8)
    parser.add_argument("--burst", type=int, default=32)
    parser.add_argument("--requests", type=int, default=24)
    parser.add_argument("--max-new", type=int, default=96)
    parser.add_argument("--cache-mode", choices=["dense", "paged"],
                        default="dense")
    parser.add_argument("--prefill-chunk", type=int, default=256,
                        help="serve mode: prompt chunk size (larger = fewer "
                             "prefill dispatches, more compute per dispatch)")
    parser.add_argument("--prompt-min", type=int, default=48,
                        help="serve mode: shortest prompt length")
    parser.add_argument("--prompt-max", type=int, default=640,
                        help="serve mode: longest prompt length (clamped to "
                             "ctx - max_new - 8); raise with --ctx for the "
                             "long-context serving artifact")
    parser.add_argument("--page-size", type=int, default=256)
    parser.add_argument("--no-ttft", action="store_true",
                        help="skip the TTFT measurement in decode mode")
    parser.add_argument("--fuse", action=argparse.BooleanOptionalAction,
                        default=None,
                        help="fuse QKV/gate-up projections (default: on for "
                             "quantized configs — fewer kernel launches on "
                             "the stacked decode path, +5.4 tok/s at 8B)")
    args = parser.parse_args()

    import numpy as np

    from metalchat_tpu.cache import KVCache, QuantizedKVCache
    from metalchat_tpu.models.transformer import forward

    cfg, params, quantized_kv = build(args.config)
    if args.ctx:
        cfg = cfg.replace(max_seq_len=args.ctx)
    if args.fuse is None:
        args.fuse = quantized_kv and "bf16" not in args.config
    if args.fuse:
        from metalchat_tpu.models.fuse import fuse_projections

        params = fuse_projections(params, cfg)
    if args.kv != "default":
        quantized_kv = args.kv == "int8"
    max_seq = cfg.max_seq_len
    cls = QuantizedKVCache if quantized_kv else KVCache
    prompt = jnp.ones((args.batch, 16), jnp.int32)

    if args.mode == "serve":
        # Continuous-batching sustained throughput (BASELINE config 4):
        # mixed prompt lengths, all submitted upfront (offline saturation),
        # chunked prefill interleaved with burst decode. Reported tok/s is
        # generated-tokens / wall from first to last completion; prefill
        # work happens inside the same window (it is "mixed load", not
        # subtracted).
        import random

        from metalchat_tpu.engine.serving import ContinuousBatchingEngine, Request

        rng = random.Random(0)
        paged_kw = ({"cache_mode": "paged", "page_size": args.page_size}
                    if args.cache_mode == "paged" else
                    {"quantized_kv": quantized_kv})
        engine = ContinuousBatchingEngine(
            params, cfg, max_slots=args.slots, max_seq_len=max_seq,
            decode_burst=args.burst, prefill_chunk=args.prefill_chunk,
            **paged_kw,
        )
        hi = min(args.prompt_max, max_seq - args.max_new - 8)
        lengths = [rng.randint(min(args.prompt_min, hi), hi)
                   for _ in range(args.requests)]
        requests = [
            Request(prompt=[1 + (i % 100)] * n, max_new_tokens=args.max_new)
            for i, n in enumerate(lengths)
        ]
        # Warm the compile caches with an exact CLONE of the measured
        # workload: the engine's scheduling is deterministic, so one full
        # pre-run compiles precisely the program set the measured run will
        # hit — prefill buckets, batched multi-slot prefill (k, bucket)
        # combinations, every power-of-two burst size, and the
        # prefill-fresh first-decode shape. (The previous hand-built warm
        # waves missed the batched-prefill programs, putting ~20 s of
        # compile inside the measured window.)
        engine.run([Request(prompt=list(r.prompt),
                            max_new_tokens=r.max_new_tokens)
                    for r in requests])
        # The meter accumulated warmup TTFTs (compile-dominated) — reset so
        # the reported percentiles cover only the measured window.
        engine.meter = type(engine.meter)()
        engine.counters = {k: 0 for k in engine.counters}
        engine.meter.start()
        t0 = time.perf_counter()
        out = engine.run(requests)
        wall = time.perf_counter() - t0
        total = sum(len(c.tokens) for c in out.values())
        assert all(c.error is None for c in out.values())
        m = engine.metrics()
        # Honest denominator: decode roofline at full slots (weights read
        # once per step, amortized over `slots` rows) — the throughput an
        # ideal engine would reach if every step decoded all slots and
        # prefill were free. Mixed prefill work + partial occupancy are the
        # engine's real costs, so the fraction is conservative.
        bpt = bytes_per_token(cfg, params, quantized_kv, max_seq, args.slots)
        serve_roof = HBM_BW / bpt * args.slots
        print(json.dumps({
            "metric": (f"{args.config}_serve_{args.cache_mode}"
                       "_sustained_tokens_per_sec"),
            "value": round(total / wall, 2),
            "unit": "tokens/s",
            "vs_baseline": round(total / wall / serve_roof, 4),
            "requests": args.requests,
            "prompt_tokens": sum(lengths),
            "generated_tokens": total,
            "slots": args.slots,
            "decode_burst": args.burst,
            # ttft_* includes queue wait (all requests submitted upfront);
            # service_ttft_* is admission -> first token, the engine's own
            # latency.
            "ttft_p50_ms": round(1e3 * m.get("ttft_p50", 0.0), 1),
            "ttft_p99_ms": round(1e3 * m.get("ttft_p99", 0.0), 1),
            "service_ttft_p50_ms": round(1e3 * m.get("service_ttft_p50", 0.0), 1),
            "service_ttft_p99_ms": round(1e3 * m.get("service_ttft_p99", 0.0), 1),
            "wall_s": round(wall, 2),
            "prefill_dispatches": m.get("prefill_dispatches", 0),
            "decode_dispatches": m.get("decode_dispatches", 0),
            "combined_dispatches": m.get("combined_dispatches", 0),
        }))
        return

    if args.mode == "prefill":
        # Prefill throughput: marginal tokens/s between a short and a long
        # prompt through the same flash-attention prefill path.
        lo_len, hi_len = 128, max_seq - 128

        def run_prefill(n: int) -> float:
            cache = cls.create(cfg, args.batch, max_seq)
            toks = jnp.ones((args.batch, n), jnp.int32)
            t0 = time.perf_counter()
            logits, _ = jax.jit(forward, static_argnames="config")(
                params, cache, toks, 0, cfg
            )
            np.asarray(logits[:, -1, :8])
            return time.perf_counter() - t0

        run_prefill(lo_len)
        run_prefill(hi_len)
        lo = min(run_prefill(lo_len) for _ in range(2))
        hi = min(run_prefill(hi_len) for _ in range(2))
        tps = args.batch * (hi_len - lo_len) / (hi - lo)
        # Honest fraction of MXU peak: tok/s · (2·params) FLOPs/token over
        # the peak of the dot precision actually used (int8 for act8
        # schemes, bf16 otherwise).
        peak = MXU_INT8 if quantized_kv and "bf16" not in args.config else MXU_BF16
        mxu_roof = peak / linear_flops_per_token(params)
        print(json.dumps({
            "metric": f"llama_{args.config}_prefill_tokens_per_sec",
            "value": round(tps, 2), "unit": "tokens/s",
            "vs_baseline": round(tps / mxu_roof, 4),
        }))
        return

    # One compiled program with a *dynamic* step count (fori_loop): the
    # lo/hi runs reuse the same executable, so only the decode steps differ.
    @jax.jit
    def run_steps(params, prompt, steps):
        cache = cls.create(cfg, args.batch, max_seq)
        logits, cache = forward(params, cache, prompt, 0, cfg)
        token = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
        pos = jnp.asarray(prompt.shape[1], jnp.int32)

        def body(i, carry):
            token, pos, cache = carry
            logits, cache = forward(params, cache, token[:, None], pos, cfg)
            return jnp.argmax(logits[:, -1], -1).astype(jnp.int32), pos + 1, cache

        token, pos, cache = jax.lax.fori_loop(0, steps, body, (token, pos, cache))
        return token

    def run(steps: int) -> float:
        t0 = time.perf_counter()
        np.asarray(run_steps(params, prompt, steps))  # forces real completion
        return time.perf_counter() - t0

    run(args.steps_lo)  # compile once
    lo = min(run(args.steps_lo) for _ in range(2))
    hi = min(run(args.steps_hi) for _ in range(2))
    marginal = (hi - lo) / (args.steps_hi - args.steps_lo)
    tokens_per_sec = args.batch / marginal

    bpt = bytes_per_token(cfg, params, quantized_kv, max_seq, args.batch)
    roofline = HBM_BW / bpt * args.batch

    result = {
        "metric": f"llama_{args.config}_decode_tokens_per_sec",
        "value": round(tokens_per_sec, 2),
        "unit": "tokens/s",
        "vs_baseline": round(tokens_per_sec / roofline, 4),
    }

    if not args.no_ttft:
        # TTFT p50 = prefill(n) compute time, measured with the
        # repeats-marginal: ONE jitted program runs the prefill body R times
        # (fori_loop, iterations chained through the carry so they stay
        # sequential), timed at two repeat counts — the fixed tunnel
        # dispatch+sync latency cancels exactly between two runs of the SAME
        # executable, and unlike the old short-vs-long-prompt marginal
        # (ADVICE r2: under-reported by up to the floor run's full
        # round-trip) nothing of the prefill itself is subtracted away.
        @functools.partial(jax.jit, static_argnames=("n", "reps"))
        def prefill_reps(params, toks, n: int, reps: int):
            def body(i, carry):
                bias, acc = carry
                cache = cls.create(cfg, args.batch, max_seq)
                logits, _ = forward(params, cache, toks + bias, 0, cfg)
                s = jnp.sum(logits[:, -1])  # consume the sampled position
                # s·1e-30 floors to int 0 in practice but is data-dependent,
                # so XLA cannot fold the iterations into one.
                return jnp.asarray(s * 1e-30, jnp.int32), acc + s

            _, acc = jax.lax.fori_loop(
                0, reps, body, (jnp.zeros((), jnp.int32),
                                jnp.zeros((), jnp.float32)))
            return acc

        def ttft_ms(n: int, r_lo: int = 1, r_hi: int = 5) -> float:
            toks = jnp.ones((args.batch, n), jnp.int32)

            def run(reps: int) -> float:
                t0 = time.perf_counter()
                np.asarray(prefill_reps(params, toks, n, reps))
                return time.perf_counter() - t0

            run(r_lo), run(r_hi)  # compile both
            lo = float(np.median([run(r_lo) for _ in range(3)]))
            hi = float(np.median([run(r_hi) for _ in range(3)]))
            return max(hi - lo, 0.0) / (r_hi - r_lo) * 1e3

        curve = {}
        for n in (128, 512, 1024, 2048):
            if n <= max_seq:
                curve[n] = round(ttft_ms(n), 2)
        head = 512 if 512 in curve else max(curve)
        result["ttft_p50_ms"] = curve[head]
        result["ttft_prefill_len"] = head
        result["ttft_ms_by_prefill"] = curve

    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "QUALITY.json")) as fh:
            quality = json.load(fh)
        # Attach the quality-gate row matching THIS config's scheme
        # (QUALITY.md measures every scheme on the trained fixture); the
        # w4a8 headline configs use the full GPTQ-refit + int8-KV row.
        scheme_by_config = {
            "8b-w4a8": "headline_int8kv",   # GPTQ-refit w4a8 + int8 KV
            "8b-w8a8": "w8a8", "1b-w8a8": "w8a8",
            "gemma3-1b-int8": "w8a8", "gemma3-4b-int8": "w8a8",
            "8b-int4": "int4_g32", "1b-int8": "int8_g32",
        }
        scheme = scheme_by_config.get(args.config, "headline_int8kv")
        result["ppl_delta_pct"] = quality.get("ppl_delta_pct", {}).get(
            scheme, quality.get("headline_ppl_delta_pct"))
        result["ppl_scheme"] = scheme
    except (OSError, ValueError):
        pass

    print(json.dumps(result))


if __name__ == "__main__":
    main()
