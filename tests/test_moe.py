"""Mixture-of-experts tests: routing numerics vs a per-token numpy oracle,
dense/dispatch scheme agreement, capacity drops, EP sharding, end-to-end
generate, checkpoint round-trip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from metalchat_tpu.cache import KVCache
from metalchat_tpu.config import MixtralConfig, config_from_dict
from metalchat_tpu.models import forward, init_random_params
from metalchat_tpu.models.moe import (
    _moe_dense,
    _moe_dispatch,
    load_balancing_loss,
    moe_ffn,
)

CFG = MixtralConfig(
    vocab_size=128,
    hidden_size=32,
    intermediate_size=64,
    num_layers=2,
    num_heads=4,
    num_kv_heads=2,
    head_dim=8,
    rope_theta=10000.0,
    max_seq_len=64,
    tie_word_embeddings=False,
    num_experts=4,
    num_experts_per_tok=2,
)


def make_layer(seed=0, e=4, h=32, f=64):
    ks = iter(jax.random.split(jax.random.PRNGKey(seed), 4))
    scale = lambda k, *s: (jax.random.normal(k, s) * 0.1).astype(jnp.float32)  # noqa: E731
    return {
        "router": scale(next(ks), h, e),
        "w1": scale(next(ks), e, h, f),
        "w3": scale(next(ks), e, h, f),
        "w2": scale(next(ks), e, f, h),
    }


def oracle(xt, layer, k=2):
    """Per-token numpy reference: route, renormalized top-k, SwiGLU experts."""
    xt = np.asarray(xt, np.float64)
    r = np.asarray(layer["router"], np.float64)
    w1 = np.asarray(layer["w1"], np.float64)
    w3 = np.asarray(layer["w3"], np.float64)
    w2 = np.asarray(layer["w2"], np.float64)
    logits = xt @ r
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    out = np.zeros_like(xt)
    for t in range(xt.shape[0]):
        top = np.argsort(-probs[t])[:k]
        gates = probs[t][top] / probs[t][top].sum()
        for g, e_idx in zip(gates, top):
            hdn = xt[t] @ w1[e_idx]
            act = hdn / (1 + np.exp(-hdn)) * (xt[t] @ w3[e_idx])
            out[t] += g * (act @ w2[e_idx])
    return out


def test_dense_scheme_matches_oracle():
    layer = make_layer()
    xt = jax.random.normal(jax.random.PRNGKey(1), (8, 32), jnp.float32)
    got = np.asarray(_moe_dense(xt, layer, CFG)[0])
    want = oracle(xt, layer)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_dispatch_matches_dense_with_headroom():
    """With capacity ≥ tokens, the dispatch scheme is exact too."""
    cfg = CFG.replace(expert_capacity_factor=4.0)
    layer = make_layer(2)
    xt = jax.random.normal(jax.random.PRNGKey(3), (64, 32), jnp.float32)
    dense = np.asarray(_moe_dense(xt, layer, cfg)[0])
    disp = np.asarray(_moe_dispatch(xt, layer, cfg)[0])
    np.testing.assert_allclose(disp, dense, atol=2e-5)


def test_dispatch_capacity_drops_are_bounded():
    """With tight capacity some tokens lose an expert — outputs differ but
    remain finite and mostly intact."""
    layer = make_layer(4)
    xt = jax.random.normal(jax.random.PRNGKey(5), (64, 32), jnp.float32)
    dense = np.asarray(_moe_dense(xt, layer, CFG.replace())[0])

    disp_tight = np.asarray(
        _moe_dispatch(xt, layer, CFG.replace(expert_capacity_factor=0.5))[0])
    assert np.all(np.isfinite(disp_tight))
    # Tight capacity must actually drop something (differs from dense)...
    assert not np.allclose(disp_tight, dense, atol=2e-5)

    # ...and capacity=1.0 keeps a majority of tokens fully intact.
    disp_1 = np.asarray(
        _moe_dispatch(xt, layer, CFG.replace(expert_capacity_factor=1.0))[0])
    same = np.isclose(disp_1, dense, atol=2e-5).all(axis=-1).mean()
    assert same > 0.25, same


def test_moe_forward_and_generate():
    from metalchat_tpu.engine import generate

    params = init_random_params(CFG, seed=0, dtype=jnp.float32)
    assert params["layers"]["w1"].shape == (2, 4, 32, 64)
    tokens = jnp.asarray(
        np.random.default_rng(0).integers(0, 128, (2, 8)), jnp.int32)
    cache = KVCache.create(CFG, 2, 32, dtype=jnp.float32)
    logits, cache = jax.jit(forward, static_argnames="config")(
        params, cache, tokens, 0, config=CFG)
    assert logits.shape == (2, 8, 128)
    assert np.all(np.isfinite(np.asarray(logits)))

    out = generate(params, CFG, tokens, max_new_tokens=4,
                   cache=KVCache.create(CFG, 2, 32, dtype=jnp.float32))
    assert np.asarray(out).shape == (2, 4)


def test_ep_sharded_forward_matches(cpu_devices):
    from metalchat_tpu.parallel import make_mesh, shard_cache, shard_params

    params = init_random_params(CFG, seed=1, dtype=jnp.float32)
    tokens = jnp.asarray(
        np.random.default_rng(1).integers(0, 128, (2, 6)), jnp.int32)

    def run(p, cache):
        logits, _ = jax.jit(forward, static_argnames="config")(
            p, cache, tokens, 0, config=CFG)
        return np.asarray(logits)

    ref = run(params, KVCache.create(CFG, 2, 16, dtype=jnp.float32))

    mesh = make_mesh(tp=2, dp=1, ep=4, devices=cpu_devices)
    assert dict(mesh.shape) == {"dp": 1, "ep": 4, "tp": 2}
    sp = shard_params(params, CFG, mesh)
    sc = jax.device_put(
        KVCache.create(CFG, 2, 16, dtype=jnp.float32),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()),
    )
    got = run(sp, sc)
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_mixtral_config_mapping():
    cfg = config_from_dict({
        "model_type": "mixtral", "architectures": ["MixtralForCausalLM"],
        "hidden_size": 64, "intermediate_size": 128, "num_hidden_layers": 2,
        "num_attention_heads": 8, "num_key_value_heads": 4,
        "num_local_experts": 8, "num_experts_per_tok": 2,
        "vocab_size": 1024, "rope_theta": 1e6,
    })
    assert isinstance(cfg, MixtralConfig)
    assert cfg.num_experts == 8 and cfg.num_experts_per_tok == 2
    assert cfg.head_dim == 8


def test_moe_checkpoint_roundtrip(tmp_path):
    from metalchat_tpu.io.loaders import load_params, save_params
    from metalchat_tpu.io.safetensors import open_safetensors, save_safetensors

    params = init_random_params(CFG, seed=2, dtype=jnp.float32)
    tensors = save_params(params, CFG)
    assert "model.layers.0.block_sparse_moe.gate.weight" in tensors
    assert "model.layers.1.block_sparse_moe.experts.3.w2.weight" in tensors
    path = tmp_path / "model.safetensors"
    save_safetensors(str(path), tensors)
    loaded = load_params(open_safetensors(str(path)), CFG, dtype=jnp.float32)
    for key in ("router", "w1", "w2", "w3"):
        np.testing.assert_allclose(
            np.asarray(loaded["layers"][key]),
            np.asarray(params["layers"][key]), atol=1e-6)


def test_load_balancing_loss_range():
    layer = make_layer(6)
    xt = jax.random.normal(jax.random.PRNGKey(7), (128, 32), jnp.float32)
    loss = float(load_balancing_loss(xt, layer["router"], CFG))
    # Perfectly balanced → 1.0; collapsed → ≈ num_experts.
    assert 0.9 < loss < CFG.num_experts + 0.1


def test_moe_training_with_aux_loss():
    """MoE fine-tuning: loss descends and the aux weight is differentiable."""
    import functools
    import optax
    from metalchat_tpu.train import (causal_lm_loss, make_train_step,
                                     partition, trainable_full)

    params = init_random_params(CFG, seed=3, dtype=jnp.float32)
    trainable, frozen, spec = partition(params, trainable_full)
    loss_fn = functools.partial(causal_lm_loss, moe_aux_weight=0.01)
    init_state, step = make_train_step(CFG, optax.adam(3e-3), spec,
                                       loss_fn=loss_fn)
    state = init_state(trainable)
    batch = {
        "tokens": jnp.asarray(
            np.random.default_rng(3).integers(0, 128, (4, 40)), jnp.int32),
        "loss_mask": jnp.ones((4, 39), jnp.float32),
    }
    losses = []
    for _ in range(8):
        state, m = step(state, frozen, batch)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] - 0.05, losses


def test_forward_with_aux_returns_scalar():
    from metalchat_tpu.models import forward

    params = init_random_params(CFG, seed=4, dtype=jnp.float32)
    tokens = jnp.asarray(
        np.random.default_rng(4).integers(0, 128, (2, 40)), jnp.int32)
    cache = KVCache.create(CFG, 2, 64, dtype=jnp.float32)
    logits, _, aux = forward(params, cache, tokens, 0, CFG, with_aux=True)
    # balanced-ish routing at random init → aux near 1.0
    assert 0.8 < float(aux) < CFG.num_experts + 0.1

    # dense model → aux exactly 0
    from metalchat_tpu.config import LlamaConfig
    dense_cfg = LlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=8, max_seq_len=64,
        tie_word_embeddings=False)
    dp = init_random_params(dense_cfg, seed=5, dtype=jnp.float32)
    dc = KVCache.create(dense_cfg, 2, 64, dtype=jnp.float32)
    _, _, aux0 = forward(dp, dc, tokens, 0, dense_cfg, with_aux=True)
    assert float(aux0) == 0.0


# -- MoE fast decode (VERDICT r4 #5) ----------------------------------------


@pytest.fixture
def pallas_interpret(monkeypatch):
    from metalchat_tpu import ops

    monkeypatch.setenv("METALCHAT_TPU_PALLAS_INTERPRET", "1")
    ops.use_pallas.cache_clear()
    yield
    ops.use_pallas.cache_clear()


def _rollout(params, cfg, step_fn, b, steps=6):
    cache = KVCache.create(cfg, b, cfg.max_seq_len, dtype=jnp.float32)
    tok = jnp.arange(1, b + 1, dtype=jnp.int32)[:, None]
    pos = jnp.zeros((b,), jnp.int32)
    toks, first_logits = [], None
    for i in range(steps):
        logits, cache = step_fn(params, cache, tok, pos)
        if i == 0:
            first_logits = np.asarray(logits)
        tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)[:, None]
        toks.append(np.asarray(tok)[:, 0])
        pos = pos + 1
    return np.asarray(toks), first_logits


@pytest.mark.parametrize("b", [1, 2])
def test_moe_fast_decode_matches_scan(pallas_interpret, b):
    """MoE decode through the stacked fast path (supports_fast_decode no
    longer excludes experts) is token-exact vs the scan path; b=1 exercises
    the sparse routed-experts formulation, b=2 the dense-over-experts one."""
    from metalchat_tpu.models.decode import decode_step, supports_fast_decode

    params = init_random_params(CFG, seed=0, dtype=jnp.float32)
    cache = KVCache.create(CFG, b, CFG.max_seq_len, dtype=jnp.float32)
    tokens = jnp.zeros((b, 1), jnp.int32)
    assert supports_fast_decode(params, cache, CFG, tokens)

    fast = jax.jit(lambda p, c, t, s: decode_step(p, c, t, s, CFG))
    scan = jax.jit(lambda p, c, t, s: forward(p, c, t, s, CFG,
                                              fast_decode=False))
    toks_fast, logits_fast = _rollout(params, CFG, fast, b)
    toks_scan, logits_scan = _rollout(params, CFG, scan, b)
    np.testing.assert_allclose(logits_fast, logits_scan, rtol=2e-4, atol=2e-4)
    assert np.array_equal(toks_fast, toks_scan)


def test_moe_quantized_fast_decode(pallas_interpret):
    """Quantized (w4a8) expert leaves route through the stacked Pallas
    matvec with the flattened (layer, expert) index; matches the scan
    path's per-expert quant_matmul contraction."""
    from metalchat_tpu.models.decode import decode_step, supports_fast_decode
    from metalchat_tpu.quant.quantize import QuantizedTensor, quantize_params

    # Kernel-legal expert shapes: in/out multiples of 128/256.
    cfg = CFG.replace(hidden_size=256, intermediate_size=512, num_heads=4,
                      num_kv_heads=2, head_dim=64, max_seq_len=64)
    params = init_random_params(cfg, seed=1, dtype=jnp.float32)
    qparams = quantize_params(params, bits=4, group_size=None, act_bits=8,
                              scales_dtype=jnp.float32)
    assert isinstance(qparams["layers"]["w1"], QuantizedTensor)
    assert qparams["layers"]["w1"].q.ndim == 4

    b = 2
    cache = KVCache.create(cfg, b, cfg.max_seq_len, dtype=jnp.float32)
    tokens = jnp.zeros((b, 1), jnp.int32)
    assert supports_fast_decode(qparams, cache, cfg, tokens)

    fast = jax.jit(lambda p, c, t, s: decode_step(p, c, t, s, cfg))
    scan = jax.jit(lambda p, c, t, s: forward(p, c, t, s, cfg,
                                              fast_decode=False))
    toks_fast, logits_fast = _rollout(qparams, cfg, fast, b, steps=4)
    toks_scan, logits_scan = _rollout(qparams, cfg, scan, b, steps=4)
    rel = (np.linalg.norm(logits_fast - logits_scan)
           / np.linalg.norm(logits_scan))
    assert rel < 1e-3, rel
    assert np.array_equal(toks_fast, toks_scan)
