"""Jitted training step: loss, partitioned gradients, optax update.

TPU-first design: the whole step (forward with per-layer remat, backward,
optimizer) is ONE compiled program over the same ("dp", "tp") mesh as
serving — batch sharded on dp, weights on tp, gradient reductions emitted by
XLA's SPMD partitioner. Frozen leaves (quantized bases, rope tables, …)
never receive gradients: the parameter tree is *partitioned* into a flat
trainable list + frozen list rather than masked, so no int8 cotangents are
ever formed (QLoRA trains adaptors over frozen int4/int8 bases).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from metalchat_tpu.cache import KVCache
from metalchat_tpu.config import ModelConfig
from metalchat_tpu.models.transformer import forward
from metalchat_tpu.quant.quantize import QuantizedTensor

PartitionSpec = Tuple[Any, Tuple[bool, ...]]  # (treedef, per-leaf trainable flag)


def trainable_lora(path, leaf) -> bool:
    """Trainable = LoRA adaptor leaves (fields .a / .b of LoraLinear)."""
    return any(
        isinstance(k, jax.tree_util.GetAttrKey) and k.name in ("a", "b")
        for k in path
    )


def trainable_full(path, leaf) -> bool:
    """Trainable = every floating-point weight except rope tables and
    quantized payloads (q/scales stay frozen; scales are not weights)."""
    if not jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.floating):
        return False
    keys = [getattr(k, "key", getattr(k, "name", None)) for k in path]
    return "rope" not in keys and "scales" not in keys


def partition(params: Dict[str, Any], pred: Callable) -> Tuple[List, List, PartitionSpec]:
    """Split a parameter tree into (trainable_leaves, frozen_leaves, spec).

    Flat leaf lists are themselves pytrees — `jax.grad`/optax work on the
    trainable list directly, and no gradient is ever computed for frozen
    leaves (unlike optax.masked, which still differentiates everything).
    """
    with_path, treedef = jax.tree_util.tree_flatten_with_path(params)
    flags = tuple(bool(pred(path, leaf)) for path, leaf in with_path)
    trainable = [leaf for (_, leaf), f in zip(with_path, flags) if f]
    frozen = [leaf for (_, leaf), f in zip(with_path, flags) if not f]
    return trainable, frozen, (treedef, flags)


def combine(trainable: List, frozen: List, spec: PartitionSpec) -> Dict[str, Any]:
    """Rebuild the full parameter tree from the two partitions."""
    treedef, flags = spec
    it_t, it_f = iter(trainable), iter(frozen)
    leaves = [next(it_t) if f else next(it_f) for f in flags]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def causal_lm_loss(
    params: Dict[str, Any],
    tokens: jax.Array,       # int32 [B, S] — inputs; labels are tokens shifted
    loss_mask: jax.Array,    # [B, S-1] float/bool — which label positions count
    config: ModelConfig,
    *,
    remat: bool = True,
    moe_aux_weight: float = 0.0,
) -> jax.Array:
    """Mean next-token cross-entropy (f32) over masked positions.

    moe_aux_weight > 0 adds the router load-balancing loss (MoE models;
    Switch-transformer default is ~0.01)."""
    b, s = tokens.shape
    inputs, labels = tokens[:, :-1], tokens[:, 1:]
    cache = KVCache.create(config, batch_size=b, max_seq_len=s - 1)
    logits, _, aux = forward(params, cache, inputs, 0, config, remat=remat,
                             with_aux=True, differentiable=True)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    mask = loss_mask.astype(jnp.float32)
    loss = jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    if moe_aux_weight:
        loss = loss + moe_aux_weight * aux
    return loss


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["trainable", "opt_state", "step"],
    meta_fields=[],
)
@dataclass
class TrainState:
    trainable: List           # flat list of trainable leaves
    opt_state: Any
    step: jax.Array


def make_train_step(
    config: ModelConfig,
    optimizer,                        # optax.GradientTransformation
    spec: PartitionSpec,
    *,
    remat: bool = True,
    loss_fn: Optional[Callable] = None,
):
    """Build (init_state, step_fn).

    step_fn(state, frozen, batch) -> (state, metrics); batch is a dict with
    "tokens" int32 [B, S] and "loss_mask" [B, S-1]. Jit once per shape; shard
    batch on dp / params on tp before calling and XLA partitions the step.
    """
    loss_of_params = loss_fn or causal_lm_loss

    def init_state(trainable: List) -> TrainState:
        return TrainState(
            trainable=trainable,
            opt_state=optimizer.init(trainable),
            step=jnp.zeros((), jnp.int32),
        )

    @jax.jit
    def step_fn(state: TrainState, frozen: List, batch: Dict[str, jax.Array]):
        def loss(trainable):
            params = combine(trainable, frozen, spec)
            return loss_of_params(
                params, batch["tokens"], batch["loss_mask"], config, remat=remat
            )

        loss_value, grads = jax.value_and_grad(loss)(state.trainable)
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.trainable
        )
        import optax

        trainable = optax.apply_updates(state.trainable, updates)
        metrics = {
            "loss": loss_value,
            "grad_norm": optax.global_norm(grads),
            "step": state.step + 1,
        }
        return TrainState(trainable, opt_state, state.step + 1), metrics

    return init_state, step_fn
