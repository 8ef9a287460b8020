"""Fine-tuning: full-parameter and (Q)LoRA training on the same model core.

The reference ships LoRA *inference* (quantization/lora.h) but no training
of any kind; this package closes the loop TPU-natively: the jitted train
step differentiates the same `models.transformer.forward` used for serving
(per-layer rematerialization via `jax.checkpoint`), shards over the same
("dp", "tp") mesh, and exports adaptors that `quant/checkpoint.py` and the
serving engine already consume.
"""

from metalchat_tpu.train.lora import (
    attach_lora,
    lora_param_count,
    merge_lora,
)
from metalchat_tpu.train.checkpoint import (
    load_train_state,
    save_train_state,
)
from metalchat_tpu.train.data import PackedDataset, from_texts
from metalchat_tpu.train.step import (
    TrainState,
    causal_lm_loss,
    combine,
    make_train_step,
    partition,
    trainable_full,
    trainable_lora,
)

__all__ = [
    "attach_lora",
    "merge_lora",
    "lora_param_count",
    "TrainState",
    "causal_lm_loss",
    "make_train_step",
    "partition",
    "combine",
    "trainable_lora",
    "trainable_full",
    "PackedDataset",
    "from_texts",
    "save_train_state",
    "load_train_state",
]
