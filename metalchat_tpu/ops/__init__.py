"""Op layer: XLA reference implementations + Pallas TPU kernels.

The reference implements every op as a Metal shader + host wrapper
(SURVEY.md §2.3). On TPU, XLA fusion already covers most tiny elementwise
shaders; custom Pallas kernels are reserved for the memory-bandwidth-bound
fusions (quantized matmul, attention, rmsnorm) where they buy real wins.

Every op has a pure-XLA implementation (`ops.xla`) that serves as the
numerics oracle and the CPU/test path; Pallas implementations register
themselves as the TPU fast path. `use_pallas()` reports whether the current
default backend supports the Mosaic TPU compiler.
"""

from __future__ import annotations

import functools

import jax

from metalchat_tpu.ops.xla import (  # noqa: F401
    apply_rope,
    attention,
    precompute_rope,
    rms_norm,
    scale_rope_freqs,
    swiglu,
)


@functools.lru_cache(maxsize=1)
def use_pallas() -> bool:
    """True when running on real TPU hardware (Mosaic available).

    Kill-switch: METALCHAT_TPU_NO_PALLAS=1 forces the XLA reference path
    (debugging / numerics bisection)."""
    import os

    if os.environ.get("METALCHAT_TPU_NO_PALLAS"):
        return False
    return jax.default_backend() not in ("cpu",)
