"""Projection fusion: QKV → one matmul, FFN gate/up → one matmul.

At decode (batch-1 matvec) sizes each dot pays a fixed dispatch/pipeline
cost comparable to its HBM read (measured on v5e: a 29 MB W4A8 matvec takes
~78 µs while the pure-read floor is ~38 µs) — fusing wq/wk/wv and w1/w3
into single wider matmuls removes 3 of the 7 per-layer dots at identical
bandwidth. Pure parameter-tree transform applied after load; `_layer_step`
dispatches on the presence of the fused leaves. Exact: concatenating weights
along out-features is algebraically the concat of the individual products
(and for QuantizedTensor the packed values/scales concat losslessly —
groups run along in-features).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from metalchat_tpu.config import ModelConfig
from metalchat_tpu.quant.quantize import (
    LoraLinear,
    QuantizedTensor,
    auto_orient,
    with_orientation,
)


def _concat_linears(leaves) -> Any:
    """Concat linear leaves along out-features (dense or quantized)."""
    if any(isinstance(w, LoraLinear) for w in leaves):
        raise ValueError("cannot fuse LoRA-adapted projections")
    if all(isinstance(w, QuantizedTensor) for w in leaves):
        qs = [with_orientation(w, False) for w in leaves]
        bits = {w.bits for w in qs}
        groups = {w.group_size for w in qs}
        acts = {w.act_bits for w in qs}
        ins = {w.in_features for w in qs}
        if len(bits) != 1 or len(acts) != 1 or len(ins) != 1 or len(groups) != 1:
            raise ValueError("quantized projections disagree on layout")
        return auto_orient(QuantizedTensor(
            q=jnp.concatenate([w.q for w in qs], axis=-1),
            scales=jnp.concatenate([w.scales for w in qs], axis=-1),
            bits=qs[0].bits,
            group_size=qs[0].group_size,
            act_bits=qs[0].act_bits,
        ))
    if any(isinstance(w, QuantizedTensor) for w in leaves):
        raise ValueError("cannot fuse mixed dense/quantized projections")
    return jnp.concatenate(leaves, axis=-1)


def fuse_projections(params: Dict[str, Any], config: ModelConfig) -> Dict[str, Any]:
    """Return a tree with wq/wk/wv fused to `wqkv` and w1/w3 to `w13`.

    Skips fusion groups that contain LoRA adaptors or are absent (MoE expert
    FFNs, MLP-only models keep their layout)."""
    out = dict(params)
    layers = dict(params["layers"])

    def try_fuse(names, fused_name, bias_name):
        if not all(n in layers for n in names):
            return
        try:
            layers[fused_name] = _concat_linears([layers[n] for n in names])
        except ValueError:
            return
        for n in names:
            del layers[n]
        bias_keys = [n + "_b" for n in names]
        if config.use_bias and all(k in layers for k in bias_keys):
            layers[bias_name] = jnp.concatenate(
                [layers[k] for k in bias_keys], axis=-1)
            for k in bias_keys:
                del layers[k]

    try_fuse(("wq", "wk", "wv"), "wqkv", "wqkv_b")
    if not config.num_experts and config.ffn_type != "mlp":
        try_fuse(("w1", "w3"), "w13", "w13_b")
    out["layers"] = layers
    return out
