"""LoRA adaptor attachment / merging on parameter trees.

The reference attaches LoRA by layer surgery (`replace_layer` +
`quantization::lora_linear`, include/metalchat/quantization/lora.h:56-130);
here it is a pytree transform: target leaves (dense [L, in, out] arrays or
`QuantizedTensor`s) are wrapped in `LoraLinear`, whose forward the model
core already dispatches on (quant/quantize.py::linear). B is zero-init so
the adapted model is exactly the base model at step 0.
"""

from __future__ import annotations

from typing import Any, Dict, Iterable, Tuple

import jax
import jax.numpy as jnp

from metalchat_tpu.quant.quantize import LoraLinear, QuantizedTensor, dequantize

DEFAULT_TARGETS = ("wq", "wk", "wv", "wo", "w1", "w2", "w3")


def _leaf_dims(leaf) -> Tuple[int, int, Tuple[int, ...]]:
    """(in_features, out_features, stack_dims) of a linear leaf."""
    if isinstance(leaf, QuantizedTensor):
        return leaf.in_features, leaf.out_features, leaf.q.shape[:-2]
    return leaf.shape[-2], leaf.shape[-1], leaf.shape[:-2]


def attach_lora(
    params: Dict[str, Any],
    *,
    rank: int = 8,
    scale: float = 2.0,
    targets: Iterable[str] = DEFAULT_TARGETS,
    seed: int = 0,
    dtype=jnp.float32,
) -> Dict[str, Any]:
    """Wrap target linear leaves in LoraLinear(base, A, B).

    A ~ N(0, 1/rank) (Kaiming-style over the rank), B = 0 — the reference's
    adaptor shapes (lora.h:17-53: A [in, r], B [r, out]) with the stacked
    layer axis this framework uses; `scale` defaults to the reference's 2.0
    (huggingface/llama.h:166-168).
    """
    key = jax.random.PRNGKey(seed)
    out = dict(params)
    out["layers"] = dict(params["layers"])
    for name in targets:
        leaf = out["layers"].get(name)
        if leaf is None or isinstance(leaf, LoraLinear):
            continue
        key, ka = jax.random.split(key)
        in_f, out_f, stack = _leaf_dims(leaf)
        a = (jax.random.normal(ka, (*stack, in_f, rank), jnp.float32)
             * (rank ** -0.5)).astype(dtype)
        b = jnp.zeros((*stack, rank, out_f), dtype)
        out["layers"][name] = LoraLinear(base=leaf, a=a, b=b, scale=scale)
    return out


def merge_lora(params: Dict[str, Any], dtype=jnp.bfloat16) -> Dict[str, Any]:
    """Fold adaptors into dense weights: W' = dequant(base) + scale * A @ B.

    Produces a plain dense tree (exportable with io.loaders.save_params /
    servable without the adaptor matmuls)."""

    def fold(leaf):
        if not isinstance(leaf, LoraLinear):
            return leaf
        base = leaf.base
        if isinstance(base, QuantizedTensor):
            base = dequantize(base, jnp.float32)
        delta = jnp.einsum(
            "...ir,...ro->...io", leaf.a.astype(jnp.float32),
            leaf.b.astype(jnp.float32),
        ) * leaf.scale
        return (base.astype(jnp.float32) + delta).astype(dtype)

    return jax.tree.map(
        fold, params, is_leaf=lambda x: isinstance(x, LoraLinear)
    )


def lora_param_count(params: Dict[str, Any]) -> int:
    """Number of trainable adaptor parameters."""
    n = 0
    for leaf in jax.tree.leaves(
        params, is_leaf=lambda x: isinstance(x, LoraLinear)
    ):
        if isinstance(leaf, LoraLinear):
            n += leaf.a.size + leaf.b.size
    return n
