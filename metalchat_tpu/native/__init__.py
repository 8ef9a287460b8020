"""Native (C++) runtime components, loaded via ctypes.

The reference's host runtime is C++ throughout (SURVEY.md §2: memfile/mmap
containers, the BPE merge loop). The TPU build keeps the compute path in
JAX/XLA/Pallas but implements the same host-side hot paths natively:

  * ``safetensors.cc`` — mmap open/advise/close + header scan (the data
    plane under io.safetensors; WILLNEED prefetch before bulk device upload)
  * ``bpe.cc`` — the greedy lowest-rank merge loop (under text.bpe)

Build with ``python -m metalchat_tpu.native.build`` (or make -C native).
Everything degrades gracefully to the pure-Python implementations when the
shared library is absent: `available()` gates each fast path.
"""

from __future__ import annotations

import ctypes
import functools
from pathlib import Path
from typing import Optional

_LIB_NAME = "libmetalchat_native.so"


def _stale(so_path: Path) -> bool:
    """True when any .cc source is newer than the built library."""
    try:
        built = so_path.stat().st_mtime
        return any(src.stat().st_mtime > built
                   for src in so_path.parent.glob("*.cc"))
    except OSError:
        return True


@functools.lru_cache(maxsize=1)
def _load() -> Optional[ctypes.CDLL]:
    path = Path(__file__).parent / _LIB_NAME
    if not path.exists() or _stale(path):
        # Build lazily from the checked-in sources (the .so itself is NOT
        # committed — a committed binary can silently shadow newer sources;
        # the reference rebuilds its metallib from source every build,
        # kernel/CMakeLists.txt:18-55). Failure → pure-Python fallbacks.
        try:
            from metalchat_tpu.native.build import build

            build(verbose=False)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(path))
    except OSError:
        return None
    # mmap API
    lib.mc_mmap_open.restype = ctypes.c_void_p
    lib.mc_mmap_open.argtypes = [ctypes.c_char_p]
    lib.mc_mmap_data.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.mc_mmap_data.argtypes = [ctypes.c_void_p]
    lib.mc_mmap_size.restype = ctypes.c_uint64
    lib.mc_mmap_size.argtypes = [ctypes.c_void_p]
    lib.mc_header_len.restype = ctypes.c_uint64
    lib.mc_header_len.argtypes = [ctypes.c_void_p]
    lib.mc_mmap_advise.restype = ctypes.c_int
    lib.mc_mmap_advise.argtypes = [ctypes.c_void_p, ctypes.c_uint64,
                                   ctypes.c_uint64, ctypes.c_int]
    lib.mc_mmap_close.restype = None
    lib.mc_mmap_close.argtypes = [ctypes.c_void_p]
    # bpe API
    lib.mc_bpe_create.restype = ctypes.c_void_p
    lib.mc_bpe_create.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.c_int64), ctypes.c_uint64,
    ]
    lib.mc_bpe_destroy.restype = None
    lib.mc_bpe_destroy.argtypes = [ctypes.c_void_p]
    lib.mc_bpe_encode.restype = ctypes.c_int64
    lib.mc_bpe_encode.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_int64),
    ]
    return lib


def available() -> bool:
    return _load() is not None


class NativeMmap:
    """Zero-copy mmap handle (analog of reference basic_memfile)."""

    def __init__(self, path: str):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library not built")
        self._lib = lib
        self._handle = lib.mc_mmap_open(str(path).encode())
        if not self._handle:
            raise OSError(f"mc_mmap_open failed for {path}")

    @property
    def size(self) -> int:
        return self._lib.mc_mmap_size(self._handle)

    @property
    def header_len(self) -> int:
        return self._lib.mc_header_len(self._handle)

    def view(self) -> memoryview:
        """Zero-copy memoryview over the whole mapping."""
        data = self._lib.mc_mmap_data(self._handle)
        return memoryview(
            (ctypes.c_uint8 * self.size).from_address(
                ctypes.addressof(data.contents)
            )
        ).cast("B")

    def advise(self, advice: str, offset: int = 0, length: Optional[int] = None) -> None:
        codes = {"normal": 0, "willneed": 1, "sequential": 2, "dontneed": 3}
        self._lib.mc_mmap_advise(
            self._handle, offset, length if length is not None else self.size - offset,
            codes[advice],
        )

    def close(self) -> None:
        """Unmap explicitly. NOTE: invalidates every outstanding view.

        There is deliberately NO automatic close on GC: numpy views and jax's
        *asynchronous* host reads (device_put) may outlive this handle, and
        munmapping under them corrupts loads / segfaults (observed: garbage
        logits when the document was a temporary). Weight mappings otherwise
        live until process exit — the same posture as the reference's
        process-lifetime resident buffers.
        """
        if self._handle:
            self._lib.mc_mmap_close(self._handle)
            self._handle = None


class NativeBPE:
    """Native merge loop over a tiktoken-style rank table."""

    def __init__(self, vocab: dict[bytes, int]):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library not built")
        self._lib = lib
        blob = b"".join(vocab.keys())
        offsets = [0]
        for tok in vocab:
            offsets.append(offsets[-1] + len(tok))
        ids = list(vocab.values())
        n = len(vocab)
        blob_arr = (ctypes.c_uint8 * len(blob)).from_buffer_copy(blob)
        off_arr = (ctypes.c_uint64 * (n + 1))(*offsets)
        id_arr = (ctypes.c_int64 * n)(*ids)
        self._handle = lib.mc_bpe_create(blob_arr, off_arr, id_arr, n)

    def encode_piece(self, piece: bytes) -> Optional[list[int]]:
        """Token ids for one pre-split piece; None → caller's fallback."""
        n = len(piece)
        if n == 0:
            return []
        buf = (ctypes.c_uint8 * n).from_buffer_copy(piece)
        out = (ctypes.c_int64 * n)()
        written = self._lib.mc_bpe_encode(self._handle, buf, n, out)
        if written < 0:
            return None
        return list(out[:written])

    def __del__(self):  # pragma: no cover
        try:
            if self._handle:
                self._lib.mc_bpe_destroy(self._handle)
                self._handle = None
        except Exception:
            pass
