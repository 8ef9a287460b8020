"""Zero-copy safetensors documents.

TPU-native analog of the reference's `safetensor_document`
(include/metalchat/safetensor.h:534-972, src/safetensor.cc). Where the
reference mmaps the file and wraps the pages in MTLBuffers (unified memory,
zero copies all the way to the GPU), the TPU path mmaps the file into numpy
views (zero host copies) and lets `jax.device_put` stream each tensor —
optionally already sharded via NamedSharding so each chip only receives its
slice. Capabilities mirrored from the reference:

  * 8-byte LE header length + JSON header parse, `__metadata__` split out,
    tensors iterated in file-offset order         (src/safetensor.cc:83-133)
  * mmap zero-copy open / stream open / save       (safetensor.h:652-747)
  * regex `rename` for ecosystem name mapping      (safetensor.h:835-853)
  * `alias` for tied weights (output ↔ embedding)  (src/safetensor.cc:217-226)
  * sharded `model.safetensors.index.json` read    (safetensor.h:980-1033)
  * dynamic dtype registry incl. bf16/f8/int4      (safetensor.h:242-327)

If the optional C++ fast path (`metalchat_tpu.native`) is built, header
parsing and mmap management are delegated to it.
"""

from __future__ import annotations

import json
import mmap
import re
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, Iterator, Mapping, Optional, Sequence, Tuple

import numpy as np

try:  # ml_dtypes ships with jax; gives numpy bfloat16/fp8 views.
    import ml_dtypes

    _BFLOAT16 = np.dtype(ml_dtypes.bfloat16)
    _FP8_E4M3 = np.dtype(ml_dtypes.float8_e4m3fn)
    _FP8_E5M2 = np.dtype(ml_dtypes.float8_e5m2)
except ImportError:  # pragma: no cover
    _BFLOAT16 = _FP8_E4M3 = _FP8_E5M2 = None

# safetensors dtype tag → numpy dtype (reference: safetensor.h:242-327).
_DTYPES: Dict[str, np.dtype] = {
    "BOOL": np.dtype(np.bool_),
    "I8": np.dtype(np.int8),
    "U8": np.dtype(np.uint8),
    "I16": np.dtype(np.int16),
    "U16": np.dtype(np.uint16),
    "F16": np.dtype(np.float16),
    "I32": np.dtype(np.int32),
    "U32": np.dtype(np.uint32),
    "F32": np.dtype(np.float32),
    "F64": np.dtype(np.float64),
    "I64": np.dtype(np.int64),
    "U64": np.dtype(np.uint64),
}
if _BFLOAT16 is not None:
    _DTYPES["BF16"] = _BFLOAT16
    _DTYPES["F8_E4M3"] = _FP8_E4M3
    _DTYPES["F8_E5M2"] = _FP8_E5M2

_TAGS: Dict[np.dtype, str] = {v: k for k, v in _DTYPES.items()}

_MAX_HEADER_BYTES = 100 * 1024 * 1024


@dataclass(frozen=True)
class TensorEntry:
    name: str
    dtype: str            # safetensors tag, e.g. "BF16"
    shape: Tuple[int, ...]
    data_offsets: Tuple[int, int]  # [begin, end) into the data section

    @property
    def nbytes(self) -> int:
        return self.data_offsets[1] - self.data_offsets[0]

    @property
    def np_dtype(self) -> np.dtype:
        try:
            return _DTYPES[self.dtype]
        except KeyError:
            raise ValueError(f"unsupported safetensors dtype {self.dtype!r}") from None


def parse_header(blob: bytes | memoryview) -> Tuple[Dict[str, Any], list[TensorEntry]]:
    """Parse the safetensors preamble: 8-byte LE length + JSON header.

    Returns (metadata, entries sorted by file offset) — the same shape as the
    reference parser (src/safetensor.cc:83-133).
    """
    if len(blob) < 8:
        raise ValueError("safetensors: file shorter than header length field")
    header_len = int.from_bytes(bytes(blob[:8]), "little")
    if header_len > _MAX_HEADER_BYTES or 8 + header_len > len(blob):
        raise ValueError(f"safetensors: implausible header length {header_len}")
    header = json.loads(bytes(blob[8 : 8 + header_len]).decode("utf-8"))
    metadata = header.pop("__metadata__", {})
    entries = [
        TensorEntry(
            name=name,
            dtype=info["dtype"],
            shape=tuple(int(s) for s in info["shape"]),
            data_offsets=(int(info["data_offsets"][0]), int(info["data_offsets"][1])),
        )
        for name, info in header.items()
    ]
    entries.sort(key=lambda e: e.data_offsets[0])
    for e in entries:
        expect = int(np.prod(e.shape, dtype=np.int64)) * e.np_dtype.itemsize
        if expect != e.nbytes:
            raise ValueError(
                f"safetensors: tensor {e.name!r} byte span {e.nbytes} != "
                f"shape/dtype implies {expect}"
            )
    return metadata, entries


class SafetensorsDocument:
    """A read-only view over one safetensors file.

    Tensors are exposed as numpy arrays aliasing the mmap — no copy is made
    until the consumer materializes them (e.g. `jax.device_put`). Mirrors the
    reference's mmap→nocopy-buffer open path (safetensor.h:689-747), including
    `rename` and `alias` capabilities.
    """

    def __init__(
        self,
        entries: Sequence[TensorEntry],
        data: memoryview,
        metadata: Optional[Mapping[str, Any]] = None,
        *,
        _owner: Any = None,
    ):
        self._entries: Dict[str, TensorEntry] = {e.name: e for e in entries}
        self._data = data
        self.metadata: Dict[str, Any] = dict(metadata or {})
        self._aliases: Dict[str, str] = {}
        self._owner = _owner  # keeps the mmap/file alive

    # -- opening ----------------------------------------------------------

    @classmethod
    def open(cls, path: str | Path) -> "SafetensorsDocument":
        """mmap the file; tensor views are zero-copy aliases of the mapping.

        Uses the native C++ data plane (metalchat_tpu.native) when built —
        mmap + WILLNEED prefetch for bulk device uploads — falling back to
        Python mmap otherwise."""
        path = Path(path)
        try:
            from metalchat_tpu import native

            if native.available():
                nm = native.NativeMmap(str(path))
                view = nm.view()
                metadata, entries = parse_header(view)
                header_len = int.from_bytes(bytes(view[:8]), "little")
                nm.advise("willneed")
                return cls(entries, view[8 + header_len :], metadata,
                           _owner=("native", nm, view))
        except Exception:
            pass  # any native failure → portable path
        f = path.open("rb")
        mapped = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
        if hasattr(mmap, "MADV_WILLNEED"):
            try:
                mapped.madvise(mmap.MADV_WILLNEED)
            except OSError:
                pass
        view = memoryview(mapped)
        metadata, entries = parse_header(view)
        header_len = int.from_bytes(bytes(view[:8]), "little")
        data = view[8 + header_len :]
        return cls(entries, data, metadata, _owner=(f, mapped, view))

    @classmethod
    def from_bytes(cls, blob: bytes) -> "SafetensorsDocument":
        """Stream-open from an in-memory buffer (reference: safetensor.h:652-677)."""
        metadata, entries = parse_header(blob)
        header_len = int.from_bytes(blob[:8], "little")
        return cls(entries, memoryview(blob)[8 + header_len :], metadata)

    # -- iteration / lookup ------------------------------------------------

    def keys(self) -> Iterator[str]:
        yield from self._entries
        yield from self._aliases

    def __contains__(self, name: str) -> bool:
        return name in self._entries or name in self._aliases

    def __len__(self) -> int:
        return len(self._entries) + len(self._aliases)

    def entry(self, name: str) -> TensorEntry:
        name = self._aliases.get(name, name)
        return self._entries[name]

    def tensor(self, name: str) -> np.ndarray:
        """Zero-copy numpy view of one tensor."""
        e = self.entry(name)
        begin, end = e.data_offsets
        arr = np.frombuffer(self._data[begin:end], dtype=e.np_dtype)
        return arr.reshape(e.shape)

    def __getitem__(self, name: str) -> np.ndarray:
        return self.tensor(name)

    def items(self) -> Iterator[Tuple[str, np.ndarray]]:
        for name in self._entries:
            yield name, self.tensor(name)

    # -- surgery -----------------------------------------------------------

    def rename(self, pattern: str, replacement: str) -> "SafetensorsDocument":
        """Regex-rename every tensor (reference: safetensor.h:835-853).

        Python backreference syntax (``\\1``) is used in ``replacement``.
        """
        rx = re.compile(pattern)
        renamed = {}
        for name, e in self._entries.items():
            new = rx.sub(replacement, name)
            if new in renamed:
                raise ValueError(f"rename collision: {new!r}")
            renamed[new] = TensorEntry(new, e.dtype, e.shape, e.data_offsets)
        self._entries = renamed
        return self

    def alias(self, name: str, source: str) -> "SafetensorsDocument":
        """Expose `source` under a second name — tied weights
        (reference: src/safetensor.cc:217-226 `insert`)."""
        if source not in self._entries:
            raise KeyError(source)
        self._aliases[name] = source
        return self

    def alias_if_missing(self, name: str, source: str) -> "SafetensorsDocument":
        if name not in self:
            self.alias(name, source)
        return self

    def close(self) -> None:
        self._data = memoryview(b"")
        if self._owner is not None:
            tag, mapped, view = self._owner
            if tag == "native":
                mapped.close()  # NativeMmap (views become invalid)
                self._owner = None
                return
            view.release()
            try:
                mapped.close()
            except BufferError:
                # Outstanding numpy views still alias the mapping; the mmap is
                # released when they are garbage-collected.
                pass
            tag.close()  # the file object
            self._owner = None


class ShardedSafetensorsDocument(SafetensorsDocument):
    """Consolidated view over a sharded checkpoint via
    ``model.safetensors.index.json`` (reference: safetensor.h:980-1033)."""

    def __init__(self, index_path: str | Path):
        index_path = Path(index_path)
        index = json.loads(index_path.read_text())
        weight_map: Mapping[str, str] = index["weight_map"]
        self._shards: Dict[str, SafetensorsDocument] = {}
        self._where: Dict[str, str] = {}
        for name, shard in weight_map.items():
            if shard not in self._shards:
                self._shards[shard] = SafetensorsDocument.open(index_path.parent / shard)
            self._where[name] = shard
        entries = [self._shards[s].entry(n) for n, s in self._where.items()]
        super().__init__(entries, memoryview(b""), index.get("metadata", {}))

    def tensor(self, name: str) -> np.ndarray:
        name = self._aliases.get(name, name)
        return self._shards[self._where[name]].tensor(name)

    def rename(self, pattern: str, replacement: str) -> "ShardedSafetensorsDocument":
        rx = re.compile(pattern)
        self._where = {rx.sub(replacement, n): s for n, s in self._where.items()}
        for shard in self._shards.values():
            shard.rename(pattern, replacement)
        return super().rename(pattern, replacement)  # type: ignore[return-value]

    def close(self) -> None:
        for shard in self._shards.values():
            shard.close()
        super().close()


def open_safetensors(path: str | Path) -> SafetensorsDocument:
    """Open either a single file or a sharded index, auto-detecting
    (reference: program/model.h:171-283 partitioning dispatch)."""
    path = Path(path)
    if path.is_dir():
        index = path / "model.safetensors.index.json"
        if index.exists():
            return ShardedSafetensorsDocument(index)
        single = path / "model.safetensors"
        if single.exists():
            return SafetensorsDocument.open(single)
        raise FileNotFoundError(f"no safetensors checkpoint under {path}")
    if path.name.endswith(".index.json"):
        return ShardedSafetensorsDocument(path)
    return SafetensorsDocument.open(path)


def save_sharded_safetensors(
    directory: str | Path,
    tensors: Mapping[str, np.ndarray],
    *,
    max_shard_bytes: int = 5 * 1024**3,
    metadata: Optional[Mapping[str, str]] = None,
) -> Path:
    """Write a sharded checkpoint + ``model.safetensors.index.json``.

    The reference reads sharded indexes but only writes consolidated files
    (SURVEY.md §5 checkpoint: "sharded-index read (but consolidated-only
    write)"); large TPU checkpoints want bounded shard sizes for parallel
    upload, so the writer is symmetric here. Returns the index path.
    """
    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    shards: list[Dict[str, np.ndarray]] = [{}]
    sizes = [0]
    for name, arr in tensors.items():
        arr = np.ascontiguousarray(arr)
        if sizes[-1] and sizes[-1] + arr.nbytes > max_shard_bytes:
            shards.append({})
            sizes.append(0)
        shards[-1][name] = arr
        sizes[-1] += arr.nbytes
    n = len(shards)
    weight_map: Dict[str, str] = {}
    for i, shard in enumerate(shards):
        fname = f"model-{i + 1:05d}-of-{n:05d}.safetensors"
        save_safetensors(directory / fname, shard, metadata)
        for name in shard:
            weight_map[name] = fname
    index = {
        "metadata": {"total_size": int(sum(sizes))},
        "weight_map": weight_map,
    }
    index_path = directory / "model.safetensors.index.json"
    index_path.write_text(json.dumps(index, indent=2))
    return index_path


def save_safetensors(
    path: str | Path,
    tensors: Mapping[str, np.ndarray],
    metadata: Optional[Mapping[str, str]] = None,
) -> None:
    """Serialize tensors to a safetensors file (reference: src/safetensor.cc:296-319)."""
    header: Dict[str, Any] = {}
    if metadata:
        header["__metadata__"] = dict(metadata)
    offset = 0
    arrays = []
    for name, arr in tensors.items():
        arr = np.ascontiguousarray(arr)
        if arr.dtype not in _TAGS:
            raise ValueError(f"cannot serialize dtype {arr.dtype} for {name!r}")
        header[name] = {
            "dtype": _TAGS[arr.dtype],
            "shape": list(arr.shape),
            "data_offsets": [offset, offset + arr.nbytes],
        }
        offset += arr.nbytes
        arrays.append(arr)
    blob = json.dumps(header, separators=(",", ":")).encode("utf-8")
    # Pad the header to 8 bytes so the data section is aligned.
    blob += b" " * (-len(blob) % 8)
    with Path(path).open("wb") as f:
        f.write(len(blob).to_bytes(8, "little"))
        f.write(blob)
        for arr in arrays:
            f.write(arr.tobytes())
