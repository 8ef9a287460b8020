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

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from metalchat_tpu.config import ModelConfig
from metalchat_tpu.quant.quantize import (
    LoraLinear,
    QuantizedTensor,
    auto_orient,
    with_orientation,
)


def fused_segments(name: str, config: ModelConfig) -> tuple:
    """Logical out-axis segment widths of a fused projection leaf."""
    if name == "wqkv":
        hd = config.head_dim
        return (config.num_heads * hd, config.num_kv_heads * hd,
                config.num_kv_heads * hd)
    if name == "w13":
        return (config.intermediate_size, config.intermediate_size)
    raise ValueError(f"not a fused leaf: {name}")


def split_fused(y: jax.Array, segments: Sequence[int], blocks: int = 1):
    """Split a fused projection output back into its logical segments.

    blocks=1 is the plain concat layout ([q|k|v]); blocks>1 is the
    tp-blocked layout (QuantizedTensor.fuse_tp): y's last axis is `blocks`
    contiguous chunks of [seg0/b | seg1/b | ...], so the split reshapes to
    expose the block axis, slices each segment's per-block strip, and
    re-merges — all local ops under GSPMD when the axis is tp-sharded
    (the reshape splits the sharded axis by exactly the mesh factor)."""
    bounds = np.cumsum(segments)[:-1]
    if blocks == 1:
        return jnp.split(y, bounds, axis=-1)
    total = y.shape[-1]
    assert total == int(np.sum(segments)), (y.shape, segments)
    yr = y.reshape(*y.shape[:-1], blocks, total // blocks)
    parts = jnp.split(yr, [s // blocks for s in np.cumsum(segments)[:-1]],
                      axis=-1)
    return [p.reshape(*y.shape[:-1], s) for p, s in zip(parts, segments)]


def _blocked_order(segments: Sequence[int], blocks: int) -> np.ndarray:
    """Index order turning [seg0|seg1|...] into `blocks` chunks of
    [seg0_i|seg1_i|...] (the fuse_tp layout)."""
    starts = np.concatenate([[0], np.cumsum(segments)[:-1]])
    order = []
    for i in range(blocks):
        for seg, start in zip(segments, starts):
            w = seg // blocks
            order.append(np.arange(start + i * w, start + (i + 1) * w))
    return np.concatenate(order)


def permute_fused_tp(leaf: QuantizedTensor, segments: Sequence[int],
                     tp: int) -> QuantizedTensor:
    """Block-permute a fused QuantizedTensor's out axis for tp sharding
    (see QuantizedTensor.fuse_tp). Pure layout move — no numeric change;
    requires every segment divisible by tp."""
    import dataclasses

    if leaf.fuse_tp == tp:
        return leaf
    assert leaf.fuse_tp == 1, "re-blocking a blocked leaf is unsupported"
    if any(s % tp for s in segments):
        raise ValueError(f"segments {segments} not divisible by tp={tp}")
    order = _blocked_order(segments, tp)
    out_axis = -2 if leaf.transposed else -1
    q = jnp.take(leaf.q, order, axis=out_axis)
    if leaf.group_size == leaf.in_features:   # per-channel scales [.., 1, out]
        scales = jnp.take(leaf.scales, order, axis=-1)
    elif leaf.transposed:                     # [.., out, in/g]
        scales = jnp.take(leaf.scales, order, axis=-2)
    else:                                     # [.., in/g, out]
        scales = jnp.take(leaf.scales, order, axis=-1)
    return dataclasses.replace(leaf, q=q, scales=scales, fuse_tp=tp)


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
