"""Quantized-checkpoint serialization.

Two on-disk dialects:

  * **native** — this framework's format: HF-style tensor names with
    ``.qweight`` / ``.scales`` / ``.lora_a`` / ``.lora_b`` leaves and
    ``__metadata__`` carrying bits/group_size. Round-trips `quantize_params`
    output exactly (packed int4 stays packed on disk).
  * **reference QLoRA** — the layout the reference's
    `llama3_qlora_safetensor_serializer` consumes (huggingface/llama.h:124-176,
    quantization/lora.h): internal names (`layers.N.attention.wq.weight` int8
    [out, in], `.scales` f32 [out, in/group], `.adaptor.A.weight` [rank, in],
    `.adaptor.B.weight` [out, rank]; `tok_embeddings` int8 + scales;
    `output` int8 + scales; bf16 norms), LoRA scale 2.0, group 32.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np
import jax.numpy as jnp

from metalchat_tpu.config import ModelConfig
from metalchat_tpu.io.safetensors import SafetensorsDocument
from metalchat_tpu.models.transformer import Params, make_rope_tables
from metalchat_tpu.quant.quantize import (
    LoraLinear,
    QuantizedTensor,
    auto_orient,
    with_orientation,
)

_HF_NAMES = {
    "wq": "self_attn.q_proj",
    "wk": "self_attn.k_proj",
    "wv": "self_attn.v_proj",
    "wo": "self_attn.o_proj",
    "w1": "mlp.gate_proj",
    "w3": "mlp.up_proj",
    "w2": "mlp.down_proj",
}
_NORM_NAMES = {
    "attn_norm": "input_layernorm.weight",
    "ffn_norm": "post_attention_layernorm.weight",
    "q_norm": "self_attn.q_norm.weight",
    "k_norm": "self_attn.k_norm.weight",
    "post_attn_norm": "post_attention_layernorm.weight",
    "post_ffn_norm": "post_feedforward_layernorm.weight",
}


def export_quantized(params: Params, config: ModelConfig) -> tuple[Dict[str, np.ndarray], Dict[str, str]]:
    """Flatten a (possibly quantized/LoRA) param tree to native-format tensors
    + metadata. Use with `io.save_safetensors`."""
    tensors: Dict[str, np.ndarray] = {}
    meta: Dict[str, str] = {}

    def put_leaf(prefix: str, leaf, layer_idx: Optional[int] = None):
        def sel(x):
            return np.asarray(x if layer_idx is None else x[layer_idx])

        if isinstance(leaf, LoraLinear):
            put_leaf(prefix, leaf.base, layer_idx)
            tensors[prefix + ".lora_a"] = sel(leaf.a)
            tensors[prefix + ".lora_b"] = sel(leaf.b)
            meta.setdefault("lora_scale", str(leaf.scale))
        elif isinstance(leaf, QuantizedTensor):
            pc = leaf.group_size == leaf.in_features
            leaf = with_orientation(leaf, False)  # canonical on-disk layout
            tensors[prefix + ".qweight"] = sel(leaf.q)
            tensors[prefix + ".scales"] = sel(leaf.scales)
            meta.setdefault("bits", str(leaf.bits))
            meta.setdefault("group_size", "channel" if pc else str(leaf.group_size))
            if leaf.bits == 4:
                meta.setdefault("int4_packing", "halfsplit-offsetlo")
            if leaf.act_bits:
                meta.setdefault("act_bits", str(leaf.act_bits))
        else:
            tensors[prefix + ".weight"] = np.ascontiguousarray(sel(leaf).T)

    e = params["embed"]
    if isinstance(e, QuantizedTensor):
        tensors["model.embed_tokens.qweight"] = np.asarray(e.q)
        tensors["model.embed_tokens.scales"] = np.asarray(e.scales)
        meta.setdefault("bits", str(e.bits))
        meta.setdefault("group_size", str(e.group_size))
    else:
        tensors["model.embed_tokens.weight"] = np.asarray(e)
    tensors["model.norm.weight"] = np.asarray(params["final_norm"])
    put_leaf("lm_head", params["lm_head"])

    for key, stacked in params["layers"].items():
        for i in range(config.num_layers):
            base = f"model.layers.{i}."
            if key in _HF_NAMES:
                put_leaf(base + _HF_NAMES[key], stacked, i)
            else:
                name = _NORM_NAMES[key]
                if key == "ffn_norm" and config.use_post_norms:
                    name = "pre_feedforward_layernorm.weight"
                tensors[base + name] = np.asarray(stacked[i])
    return tensors, meta


def load_quantized(
    doc: SafetensorsDocument,
    config: ModelConfig,
    *,
    dtype=jnp.bfloat16,
    max_seq_len: Optional[int] = None,
) -> Params:
    """Load a native-format quantized checkpoint back into a param tree."""
    bits = int(doc.metadata.get("bits", 8))
    if bits == 4:
        packing = doc.metadata.get("int4_packing", "halfsplit-offsetlo")
        if packing != "halfsplit-offsetlo":
            raise ValueError(
                f"unsupported int4 packing {packing!r}: this build stores the "
                "low nibble offset-binary (lo+8); re-export the checkpoint")
    act_bits_meta = doc.metadata.get("act_bits")
    act_bits = int(act_bits_meta) if act_bits_meta else None
    lora_scale = float(doc.metadata.get("lora_scale", 2.0))
    L = config.num_layers

    def derive_group(q, scales):
        # Canonical on-disk orientation: q [in(/2), out], scales [in/g, out];
        # group size follows from the shapes (handles per-channel "channel").
        in_features = q.shape[-2] * (2 if bits == 4 else 1)
        return in_features // scales.shape[-2]

    def leaf(prefix: str, stack: bool):
        def get(suffix, transform=lambda a: a):
            if stack:
                return jnp.asarray(
                    np.stack([transform(np.asarray(doc[f"model.layers.{i}.{prefix}{suffix}"]))
                              for i in range(L)])
                )
            return jnp.asarray(transform(np.asarray(doc[prefix + suffix])))

        probe = (f"model.layers.0.{prefix}" if stack else prefix)
        if probe + ".qweight" in doc:
            q, scales = get(".qweight"), get(".scales")
            qt = auto_orient(QuantizedTensor(
                q=q, scales=scales, bits=bits,
                group_size=derive_group(q, scales), act_bits=act_bits))
            if probe + ".lora_a" in doc:
                return LoraLinear(base=qt, a=get(".lora_a"), b=get(".lora_b"),
                                  scale=lora_scale)
            return qt
        return get(".weight", lambda a: np.ascontiguousarray(a.T)).astype(dtype)

    def norm(prefix: str, stack: bool):
        if stack:
            return jnp.asarray(
                np.stack([np.asarray(doc[f"model.layers.{i}.{prefix}"]) for i in range(L)])
            ).astype(dtype)
        return jnp.asarray(np.asarray(doc[prefix])).astype(dtype)

    layers: Dict[str, Any] = {}
    for key, hf in _HF_NAMES.items():
        layers[key] = leaf(hf, stack=True)
    layers["attn_norm"] = norm("input_layernorm.weight", True)
    if config.use_post_norms:
        layers["ffn_norm"] = norm("pre_feedforward_layernorm.weight", True)
        layers["post_attn_norm"] = norm("post_attention_layernorm.weight", True)
        layers["post_ffn_norm"] = norm("post_feedforward_layernorm.weight", True)
    else:
        layers["ffn_norm"] = norm("post_attention_layernorm.weight", True)
    if config.use_qk_norm:
        layers["q_norm"] = norm("self_attn.q_norm.weight", True)
        layers["k_norm"] = norm("self_attn.k_norm.weight", True)

    if "model.embed_tokens.qweight" in doc:
        eq = jnp.asarray(doc["model.embed_tokens.qweight"])
        es = jnp.asarray(doc["model.embed_tokens.scales"])
        # Row-quantized table: groups run along H (axis -1 of each row).
        eg = eq.shape[-1] * (2 if bits == 4 else 1) // es.shape[-1]
        embed: Any = QuantizedTensor(q=eq, scales=es, bits=bits, group_size=eg)
    else:
        embed = jnp.asarray(np.asarray(doc["model.embed_tokens.weight"])).astype(dtype)

    return {
        "embed": embed,
        "layers": layers,
        "final_norm": norm("model.norm.weight", False),
        "lm_head": leaf("lm_head", stack=False),
        "rope": make_rope_tables(config, max_seq_len),
    }


# -- reference QLoRA dialect ------------------------------------------------

_REF_LINEARS = {
    "wq": "attention.wq",
    "wk": "attention.wk",
    "wv": "attention.wv",
    "wo": "attention.wo",
    "w1": "feed_forward.w1",
    "w2": "feed_forward.w2",
    "w3": "feed_forward.w3",
}


def load_reference_qlora(
    doc: SafetensorsDocument,
    config: ModelConfig,
    *,
    bits: int = 8,
    group_size: int = 32,
    lora_scale: float = 2.0,
    dtype=jnp.bfloat16,
    max_seq_len: Optional[int] = None,
) -> Params:
    """Load a QLoRA checkpoint in the reference's internal naming
    (quantization/lora.h parameter registry; defaults from
    huggingface/llama.h:166-168: scale=2.0, group=32).

    Reference orientation: weight int8 [out, in], scales [out, in/group],
    adaptor.A.weight [rank, in], adaptor.B.weight [out, rank] — all
    transposed into this framework's [in, out] convention.
    """
    L = config.num_layers

    def t(a):  # [out, in] → [in, out]
        return np.ascontiguousarray(np.asarray(a).T)

    def lora_stack(ref_name: str) -> LoraLinear:
        qs, ss, As, Bs = [], [], [], []
        for i in range(L):
            p = f"layers.{i}.{ref_name}"
            qs.append(t(doc[p + ".weight"]))
            ss.append(t(doc[p + ".scales"]))
            As.append(t(doc[p + ".adaptor.A.weight"]))
            Bs.append(t(doc[p + ".adaptor.B.weight"]))
        qt = auto_orient(QuantizedTensor(
            q=jnp.asarray(np.stack(qs)),
            scales=jnp.asarray(np.stack(ss), jnp.float32),
            bits=bits, group_size=group_size,
        ))
        return LoraLinear(base=qt, a=jnp.asarray(np.stack(As)).astype(dtype),
                          b=jnp.asarray(np.stack(Bs)).astype(dtype), scale=lora_scale)

    layers: Dict[str, Any] = {k: lora_stack(v) for k, v in _REF_LINEARS.items()}
    layers["attn_norm"] = jnp.asarray(
        np.stack([np.asarray(doc[f"layers.{i}.attention_norm.weight"]) for i in range(L)])
    ).astype(dtype)
    layers["ffn_norm"] = jnp.asarray(
        np.stack([np.asarray(doc[f"layers.{i}.ffn_norm.weight"]) for i in range(L)])
    ).astype(dtype)

    embed = QuantizedTensor(
        q=jnp.asarray(doc["tok_embeddings.weight"]),
        scales=jnp.asarray(doc["tok_embeddings.scales"], jnp.float32),
        bits=bits, group_size=group_size,
    )
    lm_head: Any
    if "output.weight" in doc:
        lm_head = QuantizedTensor(
            q=jnp.asarray(t(doc["output.weight"])),
            scales=jnp.asarray(t(doc["output.scales"]), jnp.float32),
            bits=bits, group_size=group_size,
        ) if "output.scales" in doc else jnp.asarray(t(doc["output.weight"])).astype(dtype)
    else:
        # Tied output: dequantized embedding transpose at trace time is too
        # costly; reuse the quantized embedding as a vocab-major matmul.
        lm_head = QuantizedTensor(
            q=jnp.swapaxes(embed.q, -1, -2),
            scales=jnp.swapaxes(embed.scales, -1, -2),
            bits=bits, group_size=group_size,
        )
    return {
        "embed": embed,
        "layers": layers,
        "final_norm": jnp.asarray(np.asarray(doc["norm.weight"])).astype(dtype),
        "lm_head": lm_head,
        "rope": make_rope_tables(config, max_seq_len),
    }
