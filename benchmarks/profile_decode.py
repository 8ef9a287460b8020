"""Capture a device trace of one 8B W4A8 decode step and dump per-op times.

Usage:  python benchmarks/profile_decode.py [--config 8b-w4a8] [--fuse]

Writes the trace under /tmp/metalchat_trace and, if the tensorboard profile
plugin can parse it, prints a sorted table of XLA op durations — the ground
truth for where the per-token milliseconds go (VERDICT.md Weak #1: 102 tok/s
vs a ~216 tok/s HBM roofline).
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="8b-w4a8")
    parser.add_argument("--fuse", action="store_true")
    parser.add_argument("--steps", type=int, default=8,
                        help="decode steps inside the trace window")
    parser.add_argument("--logdir", default="/tmp/metalchat_trace")
    args = parser.parse_args()

    from bench import build
    from metalchat_tpu.cache import KVCache, QuantizedKVCache
    from metalchat_tpu.models.transformer import forward

    cfg, params, quantized_kv = build(args.config)
    if args.fuse:
        from metalchat_tpu.models.fuse import fuse_projections

        params = fuse_projections(params, cfg)
    cls = QuantizedKVCache if quantized_kv else KVCache
    max_seq = cfg.max_seq_len
    batch = 1

    step = jax.jit(forward, static_argnames="config", donate_argnums=(1,))

    cache = cls.create(cfg, batch, max_seq)
    # Prefill 16 tokens, then warm the decode step.
    prompt = jnp.ones((batch, 16), jnp.int32)
    logits, cache = jax.jit(forward, static_argnames="config")(
        params, cache, prompt, 0, cfg)
    token = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)[:, None]
    pos = 16
    for _ in range(3):  # compile + warm
        logits, cache = step(params, cache, token, pos, cfg)
        pos += 1
    np.asarray(logits[:, -1, :8])

    os.makedirs(args.logdir, exist_ok=True)
    t0 = time.perf_counter()
    with jax.profiler.trace(args.logdir):
        for _ in range(args.steps):
            logits, cache = step(params, cache, token, pos, cfg)
            pos += 1
        np.asarray(logits[:, -1, :8])
    wall = time.perf_counter() - t0
    print(f"trace window: {wall*1e3:.1f} ms for {args.steps} steps "
          f"({wall/args.steps*1e3:.2f} ms/step incl. tunnel latency)")

    dump_trace(args.logdir, args.steps)


def dump_trace(logdir: str, steps: int) -> None:
    paths = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        print("no xplane.pb produced — device tracing unavailable through the "
              "tunnel; fall back to differential microbenchmarks")
        return
    path = paths[-1]
    print(f"parsing {path}")
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore
    except ImportError:
        from tsl.profiler.protobuf import xplane_pb2  # type: ignore

    space = xplane_pb2.XSpace()
    with open(path, "rb") as fh:
        space.ParseFromString(fh.read())
    for plane in space.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        print(f"== plane: {plane.name}")
        ev_meta = plane.event_metadata
        totals: dict[str, float] = {}
        counts: dict[str, int] = {}
        for line in plane.lines:
            for ev in line.events:
                name = ev_meta[ev.metadata_id].name
                dur_us = ev.duration_ps / 1e6
                totals[name] = totals.get(name, 0.0) + dur_us
                counts[name] = counts.get(name, 0) + 1
        rows = sorted(totals.items(), key=lambda kv: -kv[1])
        print(f"{'op':<72} {'total_us':>10} {'n':>6} {'us/step':>9}")
        shown = 0.0
        for name, us in rows[:48]:
            print(f"{name[:72]:<72} {us:>10.1f} {counts[name]:>6} {us/steps:>9.2f}")
            shown += us
        rest = sum(totals.values()) - shown
        print(f"{'(rest)':<72} {rest:>10.1f}")


if __name__ == "__main__":
    main()
