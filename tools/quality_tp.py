"""Quality artifact for tensor-parallel numerics (VERDICT r4 #7).

parallel/tp_decode.py claims the per-SHARD activation quantization of
row-parallel matvecs under tp is "never coarser" than single-chip
per-token scaling. This measures it: teacher-forced perplexity of the 50M
fixture through the DECODE path (the path whose numerics tp changes),
once on a single device and once through the tp=2 shard_map step on the
CPU-8 mesh — same w4a8 weights, same eval tokens.

The per-shard scheme needs no Pallas: shard_map splits the activation
rows before `_matmul_a8` quantizes them, so the XLA branch exercises the
exact tp numerics (the kernels are bit-identical to that branch).

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python tools/quality_tp.py
Appends a `w4a8_tp2` block to QUALITY_50m.json and a row to QUALITY_50m.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE = "tests/fixtures/pyllama_50m"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fixture", default=FIXTURE)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--seq", type=int, default=512)
    ap.add_argument("--window", type=int, default=16,
                    help="teacher-forced tokens per decode step (<=16 rides "
                         "the decode fast path's multi-token window)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from metalchat_tpu.cache import QuantizedKVCache
    from metalchat_tpu.config import load_config
    from metalchat_tpu.io.loaders import load_params
    from metalchat_tpu.io.safetensors import open_safetensors
    from metalchat_tpu.models.decode import decode_step
    from metalchat_tpu.parallel.mesh import make_mesh, shard_cache, shard_params
    from metalchat_tpu.parallel.tp_decode import (
        make_tp_decode_step,
        supports_tp_fast_decode,
    )
    from metalchat_tpu.quant.quantize import quantize_params

    cfg = load_config(os.path.join(args.fixture, "config.json"))
    doc = open_safetensors(os.path.join(args.fixture, "model.safetensors"))
    # f32 activations: the CPU backend cannot execute bf16 dots.
    params = load_params(doc, cfg, dtype=jnp.float32, max_seq_len=args.seq)
    qparams = quantize_params(params, bits=4, group_size=None, act_bits=8,
                              scales_dtype=jnp.float32)

    ev = np.load(os.path.join(args.fixture, "eval_tokens.npy")).astype(np.int32)
    n = args.batch * args.seq
    data = jnp.asarray(ev[:n].reshape(args.batch, args.seq))

    mesh = make_mesh(tp=2, dp=1, devices=jax.devices()[:2])
    assert supports_tp_fast_decode(qparams, cfg, mesh)
    sq = shard_params(qparams, cfg, mesh)

    w = args.window
    assert args.seq % w == 0

    def decode_nll(step, p, cache):
        """Teacher-forced NLL through w-token decode windows."""
        total, count = 0.0, 0
        for t0 in range(0, args.seq - 1, w):
            toks = data[:, t0:t0 + w]
            pos = jnp.full((args.batch,), t0, jnp.int32)
            logits, cache = step(p, cache, toks, pos)
            logp = jax.nn.log_softmax(np.asarray(logits, np.float32), axis=-1)
            # Targets: the NEXT token of each window position (drop the last
            # position of the final window — no target).
            hi = min(t0 + w, args.seq - 1)
            tgt = np.asarray(data[:, t0 + 1:hi + 1])
            k = tgt.shape[1]
            rows = np.arange(args.batch)[:, None]
            cols = np.arange(k)[None, :]
            total += float(np.sum(logp[rows, cols, tgt]))
            count += args.batch * k
        return -total / count

    single = jax.jit(lambda p, c, t, s: decode_step(p, c, t, s, cfg))
    nll_1 = decode_nll(single, qparams,
                       QuantizedKVCache.create(cfg, args.batch, args.seq))
    ppl_1 = float(np.exp(nll_1))
    print(f"single-chip decode-path w4a8: ppl {ppl_1:.4f}", flush=True)

    tp_step = jax.jit(make_tp_decode_step(sq, cfg, mesh))
    cache_tp = shard_cache(QuantizedKVCache.create(cfg, args.batch, args.seq),
                           mesh)
    nll_2 = decode_nll(tp_step, sq, cache_tp)
    ppl_2 = float(np.exp(nll_2))
    print(f"tp=2 per-shard act-quant:     ppl {ppl_2:.4f}", flush=True)
    delta = 100.0 * (ppl_2 - ppl_1) / ppl_1
    print(f"tp2 vs single-chip: {delta:+.4f}%  "
          f"({'never-coarser holds' if delta <= 0.05 else 'REGRESSION'})")

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    qpath = os.path.join(root, "QUALITY_50m.json")
    if os.path.exists(qpath):
        blob = json.load(open(qpath))
        blob["w4a8_tp2"] = {
            "decode_path_ppl_single": round(ppl_1, 5),
            "decode_path_ppl_tp2": round(ppl_2, 5),
            "tp2_vs_single_pct": round(delta, 4),
            "tokens_scored": args.batch * (args.seq - 1),
            "note": "teacher-forced decode-path ppl; tp2 = per-shard "
                    "activation quantization on row-parallel matvecs "
                    "(CPU-8 mesh, XLA branch — bit-identical to kernels)",
        }
        json.dump(blob, open(qpath, "w"), indent=1)
        print(f"recorded w4a8_tp2 in {qpath}")


if __name__ == "__main__":
    main()
