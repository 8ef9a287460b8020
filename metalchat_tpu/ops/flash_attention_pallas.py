"""Pallas flash attention for prefill (block-tiled online softmax).

Replaces the reference's prefill attention chain (bmm QKᵀ → scale → mask
add → softmax → bmm ·V, nn/attention.h:161-206) — and fixes its numerics:
the reference softmax skips max-subtraction (kernel/softmax.metal:24-88);
here statistics are the standard stabilized online form in f32.

Operates directly on the cache-resident head-major KV layout
[B, nkv, T, hd]; queries are a chunk of `S` new positions starting at a dynamic
`start_pos` (chunked prefill over an existing cache). Causal tiles above the
diagonal are skipped before their DMA; sliding-window tiles below the band
are skipped too (Gemma local layers, reference make_sliding_causal_mask
attention.h:302-325).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
LANES = 128


def _flash_kernel(
    start_ref,     # SMEM [B] — per-row dynamic start position of the q chunk
    window_ref,    # SMEM [1] — sliding window, -1 = global
    q_ref,         # [1, 1, block_q, hd]
    k_ref,         # [1, 1, block_k, hd]
    v_ref,
    o_ref,         # [1, 1, block_q, hd]
    m_ref,         # VMEM [block_q, LANES]
    l_ref,
    acc_ref,       # VMEM [block_q, hd]
    *,
    block_q: int,
    block_k: int,
    scale: float,
):
    qi = pl.program_id(2)
    ki = pl.program_id(3)
    start = start_ref[pl.program_id(0)]
    window = window_ref[0]
    is_global = window < 0

    @pl.when(ki == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q_first = start + qi * block_q          # global position of first q row
    q_last = q_first + block_q - 1
    k_first = ki * block_k
    run = k_first <= q_last                  # any kv at/below the diagonal
    run &= is_global | (k_first + block_k > q_first - window)

    @pl.when(run)
    def _run():
        q = q_ref[0, 0].astype(jnp.float32)
        k = k_ref[0, 0].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale                            # [block_q, block_k]

        q_pos = q_first + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        kv_pos = k_first + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        ok = kv_pos <= q_pos
        ok &= is_global | (kv_pos > q_pos - window)
        s = jnp.where(ok, s, MASK_VALUE)

        m_prev = m_ref[:, :1]
        l_prev = l_ref[:, :1]
        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next)
        l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_ref[...] = jnp.broadcast_to(m_next, m_ref.shape)
        l_ref[...] = jnp.broadcast_to(l_next, l_ref.shape)

        v = v_ref[0, 0].astype(jnp.float32)
        acc_ref[...] = acc_ref[...] * alpha + jnp.dot(
            p, v, preferred_element_type=jnp.float32
        )

    @pl.when(ki == pl.num_programs(3) - 1)
    def _finish():
        l = l_ref[:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, 0] = (acc_ref[...] * l_inv).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "block_q", "block_k", "kv_len", "interpret"),
)
def flash_attention(
    q: jax.Array,          # [B, S, nh, hd] — S new positions
    k: jax.Array,          # [B, nkv, T, hd] — cache (valid through start+S)
    v: jax.Array,
    start_pos: jax.Array,  # scalar int32, or [B] per-row starts (batched
                           # multi-slot prefill: each row is its own chunk)
    *,
    scale: float,
    window=None,  # sliding window (dynamic scalar ok); None = global
    block_q: int = 256,
    block_k: int = 256,
    kv_len: Optional[int] = None,  # restrict scanned cache length (static)
    interpret: Optional[bool] = None,
) -> jax.Array:
    from metalchat_tpu.ops import resolve_interpret

    interpret = resolve_interpret(interpret)
    b, s, nh, hd = q.shape
    nkv, t_max = k.shape[1], (kv_len if kv_len is not None else k.shape[2])
    groups = nh // nkv
    q = jnp.swapaxes(q, 1, 2)  # [B, nh, S, hd]
    block_q = min(block_q, s)
    block_k = min(block_k, t_max)
    assert s % block_q == 0 and t_max % block_k == 0

    grid = (b, nh, s // block_q, t_max // block_k)
    kernel = functools.partial(
        _flash_kernel, block_q=block_q, block_k=block_k, scale=scale
    )
    if window is None:
        window_arr = jnp.full((1,), -1, jnp.int32)
    else:  # python int or traced scalar (per-layer value inside a scan)
        window_arr = jnp.asarray(window, jnp.int32).reshape(1)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, block_q, hd), lambda bb, h, qi, ki, *_: (bb, h, qi, 0)),
                pl.BlockSpec(
                    (1, 1, block_k, hd),
                    lambda bb, h, qi, ki, *_: (bb, h // groups, ki, 0),
                ),
                pl.BlockSpec(
                    (1, 1, block_k, hd),
                    lambda bb, h, qi, ki, *_: (bb, h // groups, ki, 0),
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, block_q, hd), lambda bb, h, qi, ki, *_: (bb, h, qi, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((block_q, LANES), jnp.float32),
                pltpu.VMEM((block_q, LANES), jnp.float32),
                pltpu.VMEM((block_q, hd), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(jnp.broadcast_to(jnp.asarray(start_pos, jnp.int32).reshape(-1), (b,)),
      window_arr, q, k, v)
    return jnp.swapaxes(out, 1, 2)  # back to [B, S, nh, hd]
