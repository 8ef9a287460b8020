"""Config loading / option-merge tests (mirrors reference test_huggingface.cc:40-111
and test_reference.cc options-serializer coverage)."""

import json

import pytest

from metalchat_tpu.config import (
    Gemma3Config,
    LlamaConfig,
    config_from_dict,
    load_config,
    merge_options,
)

LLAMA32_1B_HF = {
    "architectures": ["LlamaForCausalLM"],
    "model_type": "llama",
    "hidden_size": 2048,
    "intermediate_size": 8192,
    "num_attention_heads": 32,
    "num_key_value_heads": 8,
    "num_hidden_layers": 16,
    "head_dim": 64,
    "rms_norm_eps": 1e-5,
    "rope_theta": 500000.0,
    "rope_scaling": {
        "factor": 32.0,
        "low_freq_factor": 1.0,
        "high_freq_factor": 4.0,
        "original_max_position_embeddings": 8192,
        "rope_type": "llama3",
    },
    "vocab_size": 128256,
    "max_position_embeddings": 131072,
    "tie_word_embeddings": True,
    "bos_token_id": 128000,
    "eos_token_id": [128001, 128008, 128009],
}

META_1B_PARAMS = {
    "dim": 2048,
    "n_layers": 16,
    "n_heads": 32,
    "n_kv_heads": 8,
    "vocab_size": 128256,
    "ffn_dim_multiplier": 1.5,
    "multiple_of": 256,
    "norm_eps": 1e-5,
    "rope_theta": 500000.0,
    "use_scaled_rope": True,
}

GEMMA3_270M_HF = {
    "architectures": ["Gemma3ForCausalLM"],
    "model_type": "gemma3_text",
    "hidden_size": 640,
    "intermediate_size": 2048,
    "num_attention_heads": 4,
    "num_key_value_heads": 1,
    "num_hidden_layers": 18,
    "head_dim": 256,
    "rms_norm_eps": 1e-6,
    "rope_theta": 1000000.0,
    "rope_local_base_freq": 10000.0,
    "sliding_window": 512,
    "sliding_window_pattern": 6,
    "query_pre_attn_scalar": 256,
    "vocab_size": 262144,
    "max_position_embeddings": 32768,
}


def test_llama_hf_config():
    cfg = config_from_dict(LLAMA32_1B_HF)
    assert isinstance(cfg, LlamaConfig)
    assert cfg.hidden_size == 2048
    assert cfg.num_kv_heads == 8
    assert cfg.num_kv_groups == 4
    assert cfg.head_dim == 64
    assert cfg.rope_scaling is not None and cfg.rope_scaling.factor == 32.0
    assert cfg.tie_word_embeddings
    assert cfg.eos_token_ids == (128001, 128008, 128009)


def test_meta_params_json():
    cfg = LlamaConfig.from_meta_params(META_1B_PARAMS)
    assert cfg.hidden_size == 2048
    # 2*(4*2048)/3 * 1.5 = 8192 → already a multiple of 256
    assert cfg.intermediate_size == 8192
    assert cfg.head_dim == 64
    assert cfg.rope_scaling is not None


def test_gemma3_config():
    cfg = config_from_dict(GEMMA3_270M_HF)
    assert isinstance(cfg, Gemma3Config)
    assert cfg.use_qk_norm and cfg.use_post_norms
    assert cfg.norm_weight_offset == 1.0
    assert cfg.embedding_scale == pytest.approx(640**0.5)
    assert cfg.rope_local_theta == 10000.0
    assert cfg.query_scale == pytest.approx(256**-0.5)
    # Alternation: layers 5, 11, 17 are global (1-indexed multiples of 6).
    globals_ = [i for i in range(18) if cfg.layer_is_global(i)]
    assert globals_ == [5, 11, 17]


def test_gemma3_nested_text_config():
    nested = {"architectures": ["Gemma3ForConditionalGeneration"],
              "model_type": "gemma3",
              "text_config": GEMMA3_270M_HF}
    cfg = config_from_dict(nested)
    assert cfg.hidden_size == 640


def test_load_config_file(tmp_path):
    p = tmp_path / "config.json"
    p.write_text(json.dumps(LLAMA32_1B_HF))
    cfg = load_config(p)
    assert cfg.num_layers == 16


def test_merge_options():
    cfg = config_from_dict(LLAMA32_1B_HF)
    merged = merge_options(cfg, {"inference.max_seq_len": 1024, "rope_theta": 1e6})
    assert merged.max_seq_len == 1024
    assert merged.rope_theta == 1e6
    with pytest.raises(KeyError):
        merge_options(cfg, {"no.such.option": 1})


def test_unknown_config_rejected():
    with pytest.raises(ValueError):
        config_from_dict({"model_type": "mamba"})
