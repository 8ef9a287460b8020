"""Build the native shared library: python -m metalchat_tpu.native.build"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path


def build(verbose: bool = True) -> Path:
    src_dir = Path(__file__).parent
    out = src_dir / "libmetalchat_native.so"
    cmd = [
        "g++", "-O2", "-std=c++20", "-shared", "-fPIC",
        str(src_dir / "safetensors.cc"),
        str(src_dir / "bpe.cc"),
        "-o", str(out),
    ]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return out


if __name__ == "__main__":
    path = build()
    print(f"built {path}")
    sys.exit(0)
