"""Per-op Mosaic-vs-interpret validation ladder on the real chip.

Interpret mode (pl.pallas_call(interpret=True)) lowers the kernel body to
plain XLA ops on the SAME device, so it is the semantic reference for the
kernel: any chip difference is the Mosaic lowering itself. The ladder
isolates where a model-level divergence enters:

  a. integer-only matvec (precomputed int8 activations): the s8xs8 MXU dot
     + int4 nibble masks are integer math -> must be BIT-EXACT.
  b. fused act-quant (bf16 in): adds VPU round/clip/divide in f32.
  c. fused rmsnorm prologue: adds mean/rsqrt.

A ±1 int8 flip on a borderline round() in (b)/(c) is a one-quantum output
difference — scheme-level noise, not a lowering bug; anything in (a) or
large in (b)/(c) is a real bug.

Run: python tools/validate_kernels.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _report(name: str, y_chip, y_int, exact: bool) -> bool:
    a = np.asarray(y_chip, np.float32)
    b = np.asarray(y_int, np.float32)
    n_diff = int(np.sum(a != b))
    max_abs = float(np.max(np.abs(a - b))) if n_diff else 0.0
    denom = float(np.max(np.abs(b))) or 1.0
    ok = n_diff == 0 if exact else (max_abs / denom) < 2e-2
    print(f"{name:32s} diffs={n_diff:6d}/{a.size}  max|d|={max_abs:.3e} "
          f"(rel {max_abs/denom:.1e})  {'OK' if ok else 'FAIL'}", flush=True)
    return ok


def main() -> None:
    from metalchat_tpu.ops.a8_matvec_pallas import (
        quant_matvec_stacked,
        quant_matvec_stacked_fused,
    )
    from metalchat_tpu.quant.quantize import _pack_int4

    L, out, in_f, b = 4, 512, 512, 1
    rng = np.random.default_rng(0)
    w4 = rng.integers(-7, 8, size=(L, out, in_f), dtype=np.int8)
    # half-split offset-binary packing per layer: [L, out, in] -> [L, out, in/2]
    p4 = np.stack([_pack_int4(w4[l].T).T for l in range(L)])
    w8 = rng.integers(-127, 128, size=(L, out, in_f), dtype=np.int8)
    scales = (rng.random((L, 1, out), np.float32) * 1e-2 + 1e-3)
    nw = (rng.random((L, in_f), np.float32) * 0.5 + 0.75).astype(jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((b, in_f)), jnp.bfloat16)
    xq = jnp.asarray(rng.integers(-127, 128, size=(b, in_f), dtype=np.int8))
    p4j, w8j = jnp.asarray(p4), jnp.asarray(w8)
    sj, nwj = jnp.asarray(scales), jnp.asarray(nw)

    from metalchat_tpu.ops.ffn_block_pallas import ffn_block_stacked

    F = 1024
    w13_8 = jnp.asarray(
        rng.integers(-127, 128, size=(L, 2 * F, in_f), dtype=np.int8))
    w13_s = jnp.asarray(rng.random((L, 1, 2 * F), np.float32) * 1e-2 + 1e-3)
    w2_8 = jnp.asarray(rng.integers(-127, 128, size=(L, out, F), dtype=np.int8))
    w2_s = jnp.asarray(rng.random((L, 1, out), np.float32) * 1e-2 + 1e-3)
    attn = jnp.asarray(rng.standard_normal((b, in_f)), jnp.bfloat16)

    def _ffn_block(l, interp):
        return ffn_block_stacked(
            attn, x, w8j, sj, nwj[:, None, :], w13_8, w13_s, w2_8, w2_s,
            jnp.asarray(l, jnp.int32), bits=8, act="silu", eps=1e-5,
            interpret=interp)

    failures = []
    for l in (0, L - 1):
        li = jnp.asarray(l, jnp.int32)
        pairs = [
            ("int4 integer matvec", True,
             lambda interp: quant_matvec_stacked(
                 xq, p4j, li, bits=4, interpret=interp)),
            ("int8 integer matvec", True,
             lambda interp: quant_matvec_stacked(
                 xq, w8j, li, bits=8, interpret=interp)),
            ("int4 fused act-quant", False,
             lambda interp: quant_matvec_stacked_fused(
                 x, p4j, sj, li, bits=4, interpret=interp)),
            ("int4 fused norm+act-quant", False,
             lambda interp: quant_matvec_stacked_fused(
                 x, p4j, sj, li, bits=4, norm_stack=nwj[:, None, :], norm_eps=1e-5,
                 interpret=interp)),
            ("int8 fused act-quant", False,
             lambda interp: quant_matvec_stacked_fused(
                 x, w8j, sj, li, bits=8, interpret=interp)),
            ("int8 fused norm+act-quant", False,
             lambda interp: quant_matvec_stacked_fused(
                 x, w8j, sj, li, bits=8, norm_stack=nwj[:, None, :], norm_eps=1e-5,
                 interpret=interp)),
        ]
        for name, exact, fn in pairs:
            if not _report(f"{name} (l={l})", fn(False), fn(True), exact):
                failures.append(name)

        # Merged ffn-block kernel: interpret-vs-chip is NOT the right gate
        # here — three CASCADED act-quant stages amplify single one-quantum
        # round flips (measured rel ~2e-2 at these toy shapes, vs 5e-3 for
        # one stage above). The apples-to-apples reference is the SAME
        # cascade composed from the already-validated separate kernels ON
        # CHIP; the only intended difference is the merged kernel's f32
        # gate activation (vs a bf16 mid-round), sub-ulp at bf16.
        def _composed_chip():
            wo_out = quant_matvec_stacked_fused(attn, w8j, sj, li, bits=8)
            x2 = x + wo_out
            fused = quant_matvec_stacked_fused(
                x2, w13_8, w13_s, li, bits=8,
                norm_stack=nwj[:, None, :], norm_eps=1e-5)
            gate, up = fused[:, :F], fused[:, F:]
            h = (jax.nn.silu(gate.astype(jnp.float32))
                 * up.astype(jnp.float32)).astype(x.dtype)
            return x2 + quant_matvec_stacked_fused(h, w2_8, w2_s, li, bits=8)

        if not _report(f"merged ffn block vs composed-on-chip (l={l})",
                       _ffn_block(l, False), _composed_chip(), False):
            failures.append("merged ffn block")

    if failures:
        raise SystemExit(f"FAIL: {failures}")
    print("kernel ladder: all OK")


if __name__ == "__main__":
    main()
