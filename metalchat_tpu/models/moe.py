"""Mixture-of-experts FFN (Mixtral-style top-k routing), TPU-first.

Two execution schemes, selected by the static token count:

  * **decode / small batches** (`_moe_dense`): every expert computes every
    token and the router gates select — at matvec sizes the cost is HBM
    reads of the expert weights, which the dispatch scheme pays anyway, so
    this path is *exact* (no capacity drops) at identical bandwidth.
  * **prefill / training** (`_moe_dispatch`): GShard/Switch-style
    dispatch-combine einsums with a static expert capacity — tokens beyond
    capacity are dropped (standard TPU MoE posture; `expert_capacity_factor`
    controls headroom). All contractions are MXU-shaped; the expert axis of
    w1/w3/w2 shards over the "ep" mesh axis (parallel/mesh.py) and XLA
    inserts the all-to-all-equivalent collectives from the shardings.

The reference framework has no MoE models; this is a beyond-reference
capability of the TPU build (SURVEY.md §2.9 expert parallelism).

Param layout per layer (stacked leaves, models/transformer.py docstring):
  router [L, H, E]; w1/w3 [L, E, H, F]; w2 [L, E, F, H].
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from metalchat_tpu.config import ModelConfig

# Below this many tokens the dense (exact) scheme is used: the expert
# weights dominate HBM traffic either way, so dropping tokens buys nothing.
DENSE_TOKEN_CUTOFF = 32


def _expert_linear(xin: jax.Array, leaf) -> jax.Array:
    """xin [E, C, in] through a per-layer expert weight stack [E, in, out]
    (dense) or an expert-stacked QuantizedTensor (per-expert fused-dequant
    contraction — quantized MoE, beyond the reference)."""
    from metalchat_tpu.quant.quantize import QuantizedTensor, quant_matmul

    if isinstance(leaf, QuantizedTensor):
        import dataclasses

        outs = [
            quant_matmul(xin[e], dataclasses.replace(
                leaf, q=leaf.q[e], scales=leaf.scales[e]))
            for e in range(xin.shape[0])
        ]
        return jnp.stack(outs)
    return jnp.einsum("ech,ehf->ecf", xin, leaf.astype(xin.dtype))


def _expert_mlp(xin: jax.Array, layer, config: ModelConfig) -> jax.Array:
    """Batched-over-experts SwiGLU: xin [E, C, H] → [E, C, H]."""
    gate = _expert_linear(xin, layer["w1"])
    act = (jax.nn.gelu(gate, approximate=True)
           if config.hidden_act == "gelu_tanh" else jax.nn.silu(gate))
    if "w3" in layer:
        act = act * _expert_linear(xin, layer["w3"])
    return _expert_linear(act, layer["w2"])


def _route(xt: jax.Array, router: jax.Array, config: ModelConfig):
    """Router: f32 softmax over experts, renormalized top-k gates."""
    logits = jnp.einsum("th,he->te", xt.astype(jnp.float32),
                        router.astype(jnp.float32))
    probs = jax.nn.softmax(logits, axis=-1)
    gate_vals, idx = jax.lax.top_k(probs, config.num_experts_per_tok)
    gate_vals = gate_vals / jnp.sum(gate_vals, axis=-1, keepdims=True)
    return probs, gate_vals, idx


def _aux_loss(probs: jax.Array, idx: jax.Array, e: int) -> jax.Array:
    """Switch-transformer load-balancing loss: E · Σ_e fraction_e · prob_e
    (1.0 when perfectly balanced, → E when collapsed)."""
    counts = jnp.sum(jax.nn.one_hot(idx, e, dtype=jnp.float32), axis=(0, 1))
    fraction = counts / jnp.maximum(jnp.sum(counts), 1.0)
    mean_prob = jnp.mean(probs, axis=0)
    return e * jnp.sum(fraction * mean_prob)


def _moe_dense(xt: jax.Array, layer, config: ModelConfig):
    e = config.num_experts
    probs, gate_vals, idx = _route(xt, layer["router"], config)
    # Full gate matrix [T, E]: zero except the renormalized top-k entries.
    gates = jnp.zeros(probs.shape, probs.dtype).at[
        jnp.arange(xt.shape[0])[:, None], idx].set(gate_vals)
    outs = _expert_mlp(
        jnp.broadcast_to(xt[None], (e, *xt.shape)), layer, config
    )  # [E, T, H]
    y = jnp.einsum("te,eth->th", gates.astype(xt.dtype), outs)
    return y, _aux_loss(probs, idx, e)


def _moe_dispatch(xt: jax.Array, layer, config: ModelConfig):
    t, h = xt.shape
    e, k = config.num_experts, config.num_experts_per_tok
    capacity = min(t, max(1, int(-(-t * k * config.expert_capacity_factor // e))))

    probs, gate_vals, idx = _route(xt, layer["router"], config)

    # Position of each (token, choice) within its expert's capacity buffer.
    # Priority: all 1st choices before any 2nd choices (k-major cumsum).
    mask = jax.nn.one_hot(idx, e, dtype=jnp.int32)          # [T, K, E]
    mask_flat = mask.transpose(1, 0, 2).reshape(k * t, e)
    pos_flat = jnp.cumsum(mask_flat, axis=0) - mask_flat
    pos = pos_flat.reshape(k, t, e).transpose(1, 0, 2)       # [T, K, E]
    slot = jnp.sum(pos * mask, axis=-1)                      # [T, K]
    kept = slot < capacity                                   # [T, K]
    slot = jnp.where(kept, slot, capacity)                   # OOB → zero row

    sel = jax.nn.one_hot(idx, e, dtype=xt.dtype) * kept[..., None].astype(xt.dtype)
    slot_oh = jax.nn.one_hot(slot, capacity, dtype=xt.dtype)  # [T, K, C]

    dispatch = jnp.einsum("tke,tkc->tec", sel, slot_oh)       # 0/1 [T, E, C]
    xin = jnp.einsum("tec,th->ech", dispatch, xt)
    out = _expert_mlp(xin, layer, config)                     # [E, C, H]
    combine = jnp.einsum("tke,tkc,tk->tec", sel, slot_oh,
                         gate_vals.astype(xt.dtype))
    y = jnp.einsum("tec,ech->th", combine, out)
    return y, _aux_loss(probs, idx, e)


def moe_ffn(x: jax.Array, layer: Dict[str, jax.Array], config: ModelConfig):
    """Sparse-MoE FFN for x [B, S, H] → (y, aux_load_balancing_loss)."""
    b, s, h = x.shape
    xt = x.reshape(b * s, h)
    if b * s <= DENSE_TOKEN_CUTOFF:
        yt, aux = _moe_dense(xt, layer, config)
    else:
        yt, aux = _moe_dispatch(xt, layer, config)
    return yt.reshape(b, s, h).astype(x.dtype), aux


def load_balancing_loss(xt: jax.Array, router: jax.Array, config: ModelConfig) -> jax.Array:
    """Switch-transformer auxiliary loss: E · Σ_e fraction_e · prob_e.

    Recompute from activations in the training loss (router matmuls are
    negligible next to the model forward)."""
    probs, _, idx = _route(xt.reshape(-1, xt.shape[-1]), router, config)
    return _aux_loss(probs, idx, config.num_experts)
