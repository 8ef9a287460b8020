"""Training-step tests: loss descent, LoRA partitioning, remat equivalence,
and sharded training on the 8-device CPU mesh.

The reference ships no training at all; the coverage model here mirrors its
test tiers (SURVEY.md §4) — numerics against the plain forward, then the
parallel path validated bit-for-bit against single-device."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from metalchat_tpu.config import LlamaConfig
from metalchat_tpu.models import init_random_params
from metalchat_tpu.quant.quantize import LoraLinear, quantize_params
from metalchat_tpu.train import (
    TrainState,
    attach_lora,
    causal_lm_loss,
    combine,
    lora_param_count,
    make_train_step,
    merge_lora,
    partition,
    trainable_full,
    trainable_lora,
)

CFG = LlamaConfig(
    vocab_size=128,
    hidden_size=64,
    intermediate_size=128,
    num_layers=2,
    num_heads=4,
    num_kv_heads=2,
    head_dim=16,
    rope_theta=10000.0,
    max_seq_len=32,
    tie_word_embeddings=False,
)


def make_batch(seed=0, b=4, s=16):
    rng = np.random.default_rng(seed)
    tokens = jnp.asarray(rng.integers(0, CFG.vocab_size, (b, s)), jnp.int32)
    return {"tokens": tokens, "loss_mask": jnp.ones((b, s - 1), jnp.float32)}


def test_loss_finite_and_matches_manual():
    params = init_random_params(CFG, seed=0, dtype=jnp.float32)
    batch = make_batch()
    loss = causal_lm_loss(params, batch["tokens"], batch["loss_mask"], CFG)
    assert np.isfinite(float(loss))
    # Uniform-ish logits at random init → loss near log(V).
    assert abs(float(loss) - np.log(CFG.vocab_size)) < 1.0


def test_remat_matches_no_remat():
    params = init_random_params(CFG, seed=1, dtype=jnp.float32)
    batch = make_batch(1)
    l0 = causal_lm_loss(params, batch["tokens"], batch["loss_mask"], CFG, remat=False)
    l1 = causal_lm_loss(params, batch["tokens"], batch["loss_mask"], CFG, remat=True)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)

    def grads(remat):
        t, f, spec = partition(params, trainable_full)
        g = jax.grad(
            lambda tr: causal_lm_loss(
                combine(tr, f, spec), batch["tokens"], batch["loss_mask"],
                CFG, remat=remat,
            )
        )(t)
        return g

    for a, b in zip(grads(False), grads(True)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_full_finetune_loss_descends():
    params = init_random_params(CFG, seed=2, dtype=jnp.float32)
    trainable, frozen, spec = partition(params, trainable_full)
    opt = optax.adamw(1e-3)
    init_state, step_fn = make_train_step(CFG, opt, spec)
    state = init_state(trainable)
    batch = make_batch(2)
    losses = []
    for _ in range(8):
        state, metrics = step_fn(state, frozen, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] - 0.1, losses
    assert int(state.step) == 8


def test_lora_partition_only_adaptors_trainable():
    params = attach_lora(init_random_params(CFG, seed=3, dtype=jnp.float32), rank=4)
    trainable, frozen, spec = partition(params, trainable_lora)
    # 7 targets × 2 adaptors per layer-stacked leaf
    assert len(trainable) == 14
    assert lora_param_count(params) == sum(x.size for x in trainable)
    rebuilt = combine(trainable, frozen, spec)
    for name in ("wq", "w1"):
        assert isinstance(rebuilt["layers"][name], LoraLinear)


def test_qlora_training_descends_and_base_frozen():
    """LoRA over an int8-quantized base: loss descends, base bytes untouched."""
    params = quantize_params(
        init_random_params(CFG, seed=4, dtype=jnp.float32), bits=8
    )
    params = attach_lora(params, rank=4, targets=("wq", "wv", "w1", "w2"))
    trainable, frozen, spec = partition(params, trainable_lora)
    frozen_before = [np.asarray(x) for x in frozen]

    opt = optax.adam(5e-3)
    init_state, step_fn = make_train_step(CFG, opt, spec)
    state = init_state(trainable)
    batch = make_batch(4)
    losses = []
    for _ in range(10):
        state, metrics = step_fn(state, frozen, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] - 0.05, losses
    for before, after in zip(frozen_before, frozen):
        np.testing.assert_array_equal(before, np.asarray(after))


def test_lora_zero_init_is_identity_and_merge_matches():
    """B=0 ⇒ adapted forward == base forward; after training, merged dense
    weights reproduce the adapted model."""
    base = init_random_params(CFG, seed=5, dtype=jnp.float32)
    batch = make_batch(5)
    adapted = attach_lora(base, rank=4)
    l_base = causal_lm_loss(base, batch["tokens"], batch["loss_mask"], CFG)
    l_adapted = causal_lm_loss(adapted, batch["tokens"], batch["loss_mask"], CFG)
    np.testing.assert_allclose(float(l_base), float(l_adapted), rtol=1e-6)

    # Train a few steps, then merge and compare losses.
    trainable, frozen, spec = partition(adapted, trainable_lora)
    init_state, step_fn = make_train_step(CFG, optax.adam(5e-3), spec)
    state = init_state(trainable)
    for _ in range(5):
        state, _ = step_fn(state, frozen, batch)
    tuned = combine(state.trainable, frozen, spec)
    merged = merge_lora(tuned, dtype=jnp.float32)
    assert not any(
        isinstance(leaf, LoraLinear)
        for leaf in jax.tree.leaves(
            merged, is_leaf=lambda x: isinstance(x, LoraLinear))
    )
    l_tuned = causal_lm_loss(tuned, batch["tokens"], batch["loss_mask"], CFG)
    l_merged = causal_lm_loss(merged, batch["tokens"], batch["loss_mask"], CFG)
    np.testing.assert_allclose(float(l_tuned), float(l_merged), rtol=1e-4)


def test_sharded_train_step_matches_single_device(cpu_devices):
    """dp×tp-sharded train step computes the same loss/updates as unsharded."""
    from metalchat_tpu.parallel import make_mesh, shard_params

    params = init_random_params(CFG, seed=6, dtype=jnp.float32)
    batch = make_batch(6, b=4)
    opt = optax.sgd(1e-2)

    def run(params):
        trainable, frozen, spec = partition(params, trainable_full)
        init_state, step_fn = make_train_step(CFG, opt, spec)
        state = init_state(trainable)
        for _ in range(3):
            state, metrics = step_fn(state, frozen, batch)
        return float(metrics["loss"]), state.trainable

    ref_loss, ref_weights = run(params)

    mesh = make_mesh(tp=4, dp=2, devices=cpu_devices)
    sharded = shard_params(params, CFG, mesh)
    dp_batch = jax.device_put(
        batch,
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("dp")),
    )
    got_loss, got_weights = run(sharded)
    # CPU f32 collectives are deterministic → near-bit-exact.
    np.testing.assert_allclose(got_loss, ref_loss, rtol=1e-6)
    for a, b in zip(ref_weights, got_weights):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_packed_dataset_shapes_and_masks():
    from metalchat_tpu.train import PackedDataset

    docs = [[1, 2, 3], [4, 5, 6, 7, 8], [9]]
    ds = PackedDataset(docs, seq_len=4, eos_id=0)
    # stream = 1 2 3 0 4 5 6 7 8 0 9 0 → windows of 5: 2 full + tail of 2
    assert ds.tokens.shape == (3, 5)
    assert ds.loss_mask.shape == (3, 4)
    np.testing.assert_array_equal(ds.tokens[0], [1, 2, 3, 0, 4])
    assert ds.loss_mask[-1].sum() == 1.0  # tail: one real (input,label) pair

    batches = list(ds.batches(2, seed=0, drop_last=False))
    assert len(batches) == 2
    assert batches[0]["tokens"].shape == (2, 5)
    # padded final batch rows are fully masked
    assert batches[1]["loss_mask"][1].sum() == 0.0


def test_packed_dataset_feeds_train_step():
    from metalchat_tpu.train import PackedDataset

    rng = np.random.default_rng(0)
    docs = [rng.integers(1, CFG.vocab_size, rng.integers(5, 40)).tolist()
            for _ in range(8)]
    ds = PackedDataset(docs, seq_len=16, eos_id=0)
    params = init_random_params(CFG, seed=7, dtype=jnp.float32)
    trainable, frozen, spec = partition(params, trainable_full)
    init_state, step_fn = make_train_step(CFG, optax.adam(1e-3), spec)
    state = init_state(trainable)
    losses = []
    for batch in ds.batches(4, seed=1, epochs=3):
        state, m = step_fn(state, frozen,
                           {k: jnp.asarray(v) for k, v in batch.items()})
        losses.append(float(m["loss"]))
    assert len(losses) >= 3 and np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_train_state_save_load_resume(tmp_path):
    from metalchat_tpu.train import load_train_state, save_train_state

    params = init_random_params(CFG, seed=8, dtype=jnp.float32)
    trainable, frozen, spec = partition(params, trainable_full)
    opt = optax.adamw(1e-3)
    init_state, step_fn = make_train_step(CFG, opt, spec)
    state = init_state(trainable)
    batch = make_batch(8)
    for _ in range(3):
        state, _ = step_fn(state, frozen, batch)

    path = str(tmp_path / "train_state.safetensors")
    save_train_state(path, state)
    restored = load_train_state(path, init_state(trainable))
    assert int(restored.step) == 3
    # Resuming from the restored state reproduces the original trajectory.
    s1, m1 = step_fn(state, frozen, batch)
    s2, m2 = step_fn(restored, frozen, batch)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)
    for a, b in zip(s1.trainable, s2.trainable):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
