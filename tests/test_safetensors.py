"""Safetensors round-trip / rename / alias / sharding tests.

Mirrors the reference's test_safetensor.cc:94-167 coverage (round-trip with
in-memory allocators, aliasing, sharded index read).
"""

import json

import numpy as np
import pytest

import ml_dtypes

from metalchat_tpu.io.safetensors import (
    SafetensorsDocument,
    ShardedSafetensorsDocument,
    open_safetensors,
    parse_header,
    save_safetensors,
)


def _rand(shape, dtype=np.float32, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal(shape).astype(dtype)


def test_roundtrip_mmap(tmp_path):
    tensors = {
        "model.embed_tokens.weight": _rand((16, 8), np.float32, 1),
        "model.layers.0.self_attn.q_proj.weight": _rand((8, 8), np.float32, 2),
        "scales": _rand((4,), np.float16, 3),
        "codes": np.arange(12, dtype=np.int8).reshape(3, 4),
        "flags": np.array([True, False, True]),
    }
    path = tmp_path / "model.safetensors"
    save_safetensors(path, tensors, metadata={"format": "pt"})

    doc = SafetensorsDocument.open(path)
    assert doc.metadata == {"format": "pt"}
    assert set(doc.keys()) == set(tensors)
    for name, ref in tensors.items():
        got = doc[name]
        assert got.dtype == ref.dtype
        assert got.shape == ref.shape
        np.testing.assert_array_equal(got, ref)
    doc.close()


def test_bfloat16_roundtrip(tmp_path):
    x = _rand((4, 4)).astype(ml_dtypes.bfloat16)
    path = tmp_path / "bf16.safetensors"
    save_safetensors(path, {"w": x})
    doc = SafetensorsDocument.open(path)
    assert doc.entry("w").dtype == "BF16"
    np.testing.assert_array_equal(doc["w"], x)


def test_zero_copy_view(tmp_path):
    """Tensor views must alias the mmap, not copy (reference zero-copy posture)."""
    x = _rand((128, 64))
    path = tmp_path / "z.safetensors"
    save_safetensors(path, {"w": x})
    doc = SafetensorsDocument.open(path)
    arr = doc["w"]
    assert not arr.flags.owndata  # aliases the mapping


def test_rename_and_alias(tmp_path):
    path = tmp_path / "m.safetensors"
    save_safetensors(path, {"model.layers.3.mlp.up_proj.weight": _rand((4, 4))})
    doc = SafetensorsDocument.open(path)
    doc.rename(r"^model\.layers\.(\d+)\.mlp\.up_proj", r"layers.\1.feed_forward.w3")
    assert "layers.3.feed_forward.w3.weight" in doc
    # Tied-weight aliasing (reference: reference.h:53-59 output.weight alias).
    doc.alias("output.weight", "layers.3.feed_forward.w3.weight")
    np.testing.assert_array_equal(
        doc["output.weight"], doc["layers.3.feed_forward.w3.weight"]
    )
    doc.alias_if_missing("output.weight", "layers.3.feed_forward.w3.weight")


def test_sharded_index(tmp_path):
    a = _rand((4, 4), seed=10)
    b = _rand((2, 6), seed=11)
    save_safetensors(tmp_path / "model-00001-of-00002.safetensors", {"wa": a})
    save_safetensors(tmp_path / "model-00002-of-00002.safetensors", {"wb": b})
    index = {
        "metadata": {"total_size": int(a.nbytes + b.nbytes)},
        "weight_map": {
            "wa": "model-00001-of-00002.safetensors",
            "wb": "model-00002-of-00002.safetensors",
        },
    }
    (tmp_path / "model.safetensors.index.json").write_text(json.dumps(index))

    doc = open_safetensors(tmp_path)
    assert isinstance(doc, ShardedSafetensorsDocument)
    np.testing.assert_array_equal(doc["wa"], a)
    np.testing.assert_array_equal(doc["wb"], b)
    doc.rename(r"^w", "weight_")
    np.testing.assert_array_equal(doc["weight_a"], a)
    doc.close()


def test_open_auto_detect_single(tmp_path):
    save_safetensors(tmp_path / "model.safetensors", {"w": _rand((2, 2))})
    doc = open_safetensors(tmp_path)
    assert "w" in doc


def test_corrupt_header_rejected():
    with pytest.raises(ValueError):
        parse_header(b"\xff" * 32)
    blob = (2**40).to_bytes(8, "little") + b"{}"
    with pytest.raises(ValueError):
        parse_header(blob)


def test_byte_span_validation():
    header = json.dumps(
        {"w": {"dtype": "F32", "shape": [2, 2], "data_offsets": [0, 8]}}
    ).encode()
    blob = len(header).to_bytes(8, "little") + header + b"\x00" * 8
    with pytest.raises(ValueError, match="byte span"):
        parse_header(blob)


def test_sharded_write_roundtrip(tmp_path):
    """save_sharded_safetensors → open_safetensors consolidates back."""
    from metalchat_tpu.io.safetensors import save_sharded_safetensors

    tensors = {f"w{i}": _rand((64, 64), seed=i) for i in range(6)}  # 16KB each
    index = save_sharded_safetensors(tmp_path, tensors, max_shard_bytes=40_000)
    assert index.name == "model.safetensors.index.json"
    shards = list(tmp_path.glob("model-*.safetensors"))
    assert len(shards) >= 3  # forced sharding
    doc = open_safetensors(tmp_path)
    for name, ref in tensors.items():
        np.testing.assert_array_equal(doc[name], ref)
