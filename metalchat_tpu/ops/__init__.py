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
    (debugging / numerics bisection). METALCHAT_TPU_PALLAS_INTERPRET=1
    forces the Pallas code paths ON when the backend is CPU — the kernels
    then run in Pallas interpret mode (resolve_interpret), which is how
    the tp-sharded fast-decode path is exercised on the CPU test mesh
    with the SAME kernel code that runs on chip."""
    import os

    if os.environ.get("METALCHAT_TPU_NO_PALLAS"):
        return False
    if os.environ.get("METALCHAT_TPU_PALLAS_INTERPRET"):
        return True
    return jax.default_backend() not in ("cpu",)


def resolve_interpret(interpret) -> bool:
    """Kernel `interpret=None` default: interpret off on real TPU, on for
    the CPU backend (used by tests/dryrun to execute kernel code without
    Mosaic)."""
    if interpret is None:
        return jax.default_backend() == "cpu"
    return bool(interpret)
