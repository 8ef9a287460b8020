"""Checkpoint → parameter-tree loaders.

Analog of the reference's per-model serializer traits: HF Llama regex remap
(huggingface/llama.h:86-106), Meta-format tied-output alias + head
permutation (reference.h:22-99, attention.h:225-280 `permute_attention_heads`),
and the Gemma serializer (huggingface/gemma.h). The reference swaps container
pointers under a live layer tree; here loading *builds* the pytree: numpy
views from the mmap are stacked per-layer and materialized on device (via
`jax.device_put`, optionally pre-sharded by the parallel layer).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from metalchat_tpu.config import Gemma3Config, ModelConfig
from metalchat_tpu.io.safetensors import SafetensorsDocument
from metalchat_tpu.models.transformer import Params, make_rope_tables

# Meta checkpoint names → HF names (reference: huggingface/llama.h:86-106 is
# the inverse direction; we normalize everything to HF naming).
_META_RENAMES = [
    (r"^tok_embeddings\.weight$", "model.embed_tokens.weight"),
    (r"^norm\.weight$", "model.norm.weight"),
    (r"^output\.weight$", "lm_head.weight"),
    (r"^layers\.(\d+)\.attention\.wq\.weight$", r"model.layers.\1.self_attn.q_proj.weight"),
    (r"^layers\.(\d+)\.attention\.wk\.weight$", r"model.layers.\1.self_attn.k_proj.weight"),
    (r"^layers\.(\d+)\.attention\.wv\.weight$", r"model.layers.\1.self_attn.v_proj.weight"),
    (r"^layers\.(\d+)\.attention\.wo\.weight$", r"model.layers.\1.self_attn.o_proj.weight"),
    (r"^layers\.(\d+)\.feed_forward\.w1\.weight$", r"model.layers.\1.mlp.gate_proj.weight"),
    (r"^layers\.(\d+)\.feed_forward\.w2\.weight$", r"model.layers.\1.mlp.down_proj.weight"),
    (r"^layers\.(\d+)\.feed_forward\.w3\.weight$", r"model.layers.\1.mlp.up_proj.weight"),
    (r"^layers\.(\d+)\.attention_norm\.weight$", r"model.layers.\1.input_layernorm.weight"),
    (r"^layers\.(\d+)\.ffn_norm\.weight$", r"model.layers.\1.post_attention_layernorm.weight"),
]


def permute_qk_meta_to_hf(w: np.ndarray, num_heads: int) -> np.ndarray:
    """Meta interleaved rope layout → HF half-split layout
    (reference: attention.h:225-280 `permute_attention_heads`).

    w: [num_heads*head_dim, hidden] (out-major, as stored).
    """
    out_dim, in_dim = w.shape
    head_dim = out_dim // num_heads
    return (
        w.reshape(num_heads, head_dim // 2, 2, in_dim)
        .transpose(0, 2, 1, 3)
        .reshape(out_dim, in_dim)
    )


def normalize_meta_document(doc: SafetensorsDocument) -> SafetensorsDocument:
    """Rename a Meta-format checkpoint to HF names in place."""
    for pattern, repl in _META_RENAMES:
        doc.rename(pattern, repl)
    return doc


def _stack(
    doc: SafetensorsDocument,
    template: str,
    num_layers: int,
    transform,
) -> np.ndarray:
    return np.stack(
        [transform(doc[template.format(i=i)]) for i in range(num_layers)], axis=0
    )


def load_params(
    doc: SafetensorsDocument,
    config: ModelConfig,
    *,
    dtype: jnp.dtype = jnp.bfloat16,
    source: str = "hf",
    max_seq_len: Optional[int] = None,
    device_put=None,
) -> Params:
    """Build the model parameter tree from an (HF-named) safetensors document.

    source="meta" additionally applies the Meta→HF rename and the q/k head
    permutation. `device_put(path, np_array) -> jax.Array` lets the parallel
    layer intercept placement (sharded device_put); default is plain jnp.
    """
    if source == "meta":
        normalize_meta_document(doc)
        doc.alias_if_missing("lm_head.weight", "model.embed_tokens.weight")

    if device_put is None:
        def device_put(path: str, arr: np.ndarray) -> jax.Array:  # noqa: ANN001
            return jnp.asarray(arr, dtype)

    is_gemma = isinstance(config, Gemma3Config) or config.norm_weight_offset != 0.0

    def linear(arr: np.ndarray) -> np.ndarray:
        return np.ascontiguousarray(arr.transpose())  # [out,in] → [in,out]

    def qk_permuted(arr: np.ndarray, heads: int) -> np.ndarray:
        if source == "meta":
            arr = permute_qk_meta_to_hf(np.asarray(arr), heads)
        return linear(arr)

    L = config.num_layers
    pre = "model.layers.{i}."
    layers: Dict[str, np.ndarray] = {
        "attn_norm": _stack(doc, pre + "input_layernorm.weight", L, np.asarray),
        "wq": _stack(doc, pre + "self_attn.q_proj.weight", L,
                     lambda a: qk_permuted(a, config.num_heads)),
        "wk": _stack(doc, pre + "self_attn.k_proj.weight", L,
                     lambda a: qk_permuted(a, config.num_kv_heads)),
        "wv": _stack(doc, pre + "self_attn.v_proj.weight", L, linear),
        "wo": _stack(doc, pre + "self_attn.o_proj.weight", L, linear),
    }
    if config.num_experts:
        # Mixtral sparse-MoE names: block_sparse_moe.gate + experts.N.w{1,2,3}
        # (w1=gate, w3=up, w2=down in Mixtral's own convention). Stacked to
        # router [L, H, E] and expert weights [L, E, in, out].
        e = config.num_experts

        def experts(which: str) -> np.ndarray:
            return np.stack([
                np.stack([
                    linear(np.asarray(
                        doc[f"model.layers.{i}.block_sparse_moe.experts.{j}.{which}.weight"]))
                    for j in range(e)
                ])
                for i in range(L)
            ])

        layers["router"] = _stack(
            doc, pre + "block_sparse_moe.gate.weight", L, linear)
        layers["w1"] = experts("w1")
        layers["w3"] = experts("w3")
        layers["w2"] = experts("w2")
    else:
        layers["w1"] = _stack(doc, pre + "mlp.gate_proj.weight", L, linear)
        layers["w3"] = _stack(doc, pre + "mlp.up_proj.weight", L, linear)
        layers["w2"] = _stack(doc, pre + "mlp.down_proj.weight", L, linear)
    if is_gemma:
        layers["ffn_norm"] = _stack(doc, pre + "pre_feedforward_layernorm.weight", L, np.asarray)
        layers["post_attn_norm"] = _stack(doc, pre + "post_attention_layernorm.weight", L, np.asarray)
        layers["post_ffn_norm"] = _stack(doc, pre + "post_feedforward_layernorm.weight", L, np.asarray)
        layers["q_norm"] = _stack(doc, pre + "self_attn.q_norm.weight", L, np.asarray)
        layers["k_norm"] = _stack(doc, pre + "self_attn.k_norm.weight", L, np.asarray)
    else:
        layers["ffn_norm"] = _stack(doc, pre + "post_attention_layernorm.weight", L, np.asarray)

    embed = np.asarray(doc["model.embed_tokens.weight"])
    if "lm_head.weight" in doc:
        lm_head = linear(np.asarray(doc["lm_head.weight"]))
    elif config.tie_word_embeddings:
        lm_head = linear(embed)
    else:
        raise KeyError("checkpoint has no lm_head.weight and embeddings are not tied")

    params: Params = {
        "embed": device_put("embed", embed),
        "layers": {k: device_put(f"layers.{k}", v) for k, v in layers.items()},
        "final_norm": device_put("final_norm", np.asarray(doc["model.norm.weight"])),
        "lm_head": device_put("lm_head", lm_head),
        "rope": make_rope_tables(config, max_seq_len),
    }
    return params


def load_gpt2_params(
    doc: SafetensorsDocument,
    config: ModelConfig,
    *,
    dtype: jnp.dtype = jnp.bfloat16,
    max_seq_len: Optional[int] = None,
) -> Params:
    """Load an HF GPT-2 checkpoint (wte/wpe/h.N.* naming; Conv1D weights are
    already [in, out]-major so no transposes). The fused c_attn [H, 3H] is
    split into wq/wk/wv."""
    L, h = config.num_layers, config.hidden_size

    def a(name):
        return np.asarray(doc[name], np.float32)

    def stack(fmt, transform=lambda x: x):
        return jnp.asarray(
            np.stack([transform(a(fmt.format(i=i))) for i in range(L)]), dtype
        )

    layers: Dict[str, Any] = {
        "attn_norm": stack("h.{i}.ln_1.weight"),
        "attn_norm_b": stack("h.{i}.ln_1.bias"),
        "ffn_norm": stack("h.{i}.ln_2.weight"),
        "ffn_norm_b": stack("h.{i}.ln_2.bias"),
        "wq": stack("h.{i}.attn.c_attn.weight", lambda w: w[:, :h]),
        "wk": stack("h.{i}.attn.c_attn.weight", lambda w: w[:, h : 2 * h]),
        "wv": stack("h.{i}.attn.c_attn.weight", lambda w: w[:, 2 * h :]),
        "wq_b": stack("h.{i}.attn.c_attn.bias", lambda b: b[:h]),
        "wk_b": stack("h.{i}.attn.c_attn.bias", lambda b: b[h : 2 * h]),
        "wv_b": stack("h.{i}.attn.c_attn.bias", lambda b: b[2 * h :]),
        "wo": stack("h.{i}.attn.c_proj.weight"),
        "wo_b": stack("h.{i}.attn.c_proj.bias"),
        "w1": stack("h.{i}.mlp.c_fc.weight"),
        "w1_b": stack("h.{i}.mlp.c_fc.bias"),
        "w2": stack("h.{i}.mlp.c_proj.weight"),
        "w2_b": stack("h.{i}.mlp.c_proj.bias"),
    }
    embed = a("wte.weight")
    return {
        "embed": jnp.asarray(embed, dtype),
        "pos_emb": jnp.asarray(a("wpe.weight"), dtype),
        "layers": layers,
        "final_norm": jnp.asarray(a("ln_f.weight"), dtype),
        "final_norm_b": jnp.asarray(a("ln_f.bias"), dtype),
        "lm_head": jnp.asarray(np.ascontiguousarray(embed.T), dtype),
        "rope": make_rope_tables(config, max_seq_len),
    }


def save_params(params: Params, config: ModelConfig) -> Dict[str, np.ndarray]:
    """Flatten a parameter tree back to HF-named tensors (for
    `save_safetensors`; reference: src/safetensor.cc:287-319 save path)."""
    out: Dict[str, np.ndarray] = {}
    out["model.embed_tokens.weight"] = np.asarray(params["embed"])
    out["model.norm.weight"] = np.asarray(params["final_norm"])
    if not config.tie_word_embeddings:
        out["lm_head.weight"] = np.ascontiguousarray(np.asarray(params["lm_head"]).T)
    name_map = {
        "attn_norm": "input_layernorm.weight",
        "wq": "self_attn.q_proj.weight",
        "wk": "self_attn.k_proj.weight",
        "wv": "self_attn.v_proj.weight",
        "wo": "self_attn.o_proj.weight",
        "w1": "mlp.gate_proj.weight",
        "w3": "mlp.up_proj.weight",
        "w2": "mlp.down_proj.weight",
        "q_norm": "self_attn.q_norm.weight",
        "k_norm": "self_attn.k_norm.weight",
        "post_attn_norm": "post_attention_layernorm.weight",
        "post_ffn_norm": "post_feedforward_layernorm.weight",
    }
    is_gemma = config.norm_weight_offset != 0.0
    name_map["ffn_norm"] = (
        "pre_feedforward_layernorm.weight" if is_gemma else "post_attention_layernorm.weight"
    )
    moe = bool(config.num_experts)
    for key, stacked in params["layers"].items():
        arr = np.asarray(stacked)
        for i in range(config.num_layers):
            w = arr[i]
            if moe and key == "router":
                out[f"model.layers.{i}.block_sparse_moe.gate.weight"] = (
                    np.ascontiguousarray(w.T))
            elif moe and key in ("w1", "w2", "w3"):
                for j in range(config.num_experts):
                    out[
                        f"model.layers.{i}.block_sparse_moe.experts.{j}.{key}.weight"
                    ] = np.ascontiguousarray(w[j].T)
            elif key in ("wq", "wk", "wv", "wo", "w1", "w2", "w3"):
                w = np.ascontiguousarray(w.T)
                out[f"model.layers.{i}.{name_map[key]}"] = w
            else:
                out[f"model.layers.{i}.{name_map[key]}"] = w
    return out
