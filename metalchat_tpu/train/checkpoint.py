"""Train-state checkpointing (resume): trainable leaves + optimizer state.

Weights-only checkpointing lives in io/ (safetensors, like the reference's
save path, src/safetensor.cc:287-319); this adds what the reference never
had — optimizer-state persistence for resuming a fine-tune. The pytree
STRUCTURE is not serialized: restoring goes through a template state built
by `make_train_step(...)[0]` on the same model/optimizer, so only leaf
arrays hit disk (safetensors, numbered leaf names).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from metalchat_tpu.io.safetensors import open_safetensors, save_safetensors
from metalchat_tpu.train.step import TrainState


def save_train_state(path: str, state: TrainState) -> None:
    leaves, _ = jax.tree_util.tree_flatten(
        (state.trainable, state.opt_state, state.step))
    tensors = {f"leaf.{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    save_safetensors(path, tensors, metadata={"n_leaves": str(len(leaves))})


def load_train_state(path: str, template: TrainState) -> TrainState:
    """Restore into the structure of `template` (same model + optimizer)."""
    doc = open_safetensors(path)
    n = int(doc.metadata["n_leaves"])
    t_leaves, treedef = jax.tree_util.tree_flatten(
        (template.trainable, template.opt_state, template.step))
    if len(t_leaves) != n:
        raise ValueError(
            f"checkpoint has {n} leaves, template has {len(t_leaves)} "
            "(different model or optimizer)")
    leaves = [
        jnp.asarray(np.asarray(doc[f"leaf.{i}"]))
        .reshape(jnp.shape(t_leaves[i]))  # 0-d leaves round-trip as [1]
        .astype(t_leaves[i].dtype)
        for i in range(n)
    ]
    trainable, opt_state, step = jax.tree_util.tree_unflatten(treedef, leaves)
    return TrainState(trainable=trainable, opt_state=opt_state, step=step)
