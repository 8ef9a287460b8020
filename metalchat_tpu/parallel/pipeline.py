"""Pipeline parallelism: layer stages sharded over a "pp" mesh axis.

The transformer's stacked-layer axis is sharded over ``pp``: each chip holds
L/pp contiguous layers (and their slice of the KV cache) and the GPipe
schedule streams microbatches through the stages, handing activations to the
next stage with `jax.lax.ppermute` each tick. Stage execution is guarded by
`lax.cond` so inactive ticks touch neither compute nor cache — the pipeline
is *exact*: logits and cache match the single-device forward bit-for-bit
(tests/test_pipeline.py).

This is one of the parallelism axes the reference lacks entirely
(SURVEY.md §2.9); it composes with ``dp`` (batch) on the same mesh. Use TP
for intra-layer sharding when the model fits; PP when even a stage's weights
need more chips (70B+ on small-HBM parts), paying one ICI hop per stage
boundary per microbatch.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from metalchat_tpu.cache import KVCache, QuantizedKVCache
from metalchat_tpu.config import ModelConfig


def make_pp_mesh(pp: int, dp: int = 1, devices=None) -> Mesh:
    """Build a ("dp", "pp") mesh."""
    import numpy as np

    if devices is None:
        devices = jax.devices()
    if dp * pp != len(devices):
        raise ValueError(f"dp*pp = {dp}*{pp} != {len(devices)} devices")
    return Mesh(np.asarray(devices).reshape(dp, pp), axis_names=("dp", "pp"))


def pipeline_param_shardings(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Layers sharded on the stacked-layer axis over pp; the rest replicated."""
    out = {}
    for key, value in params.items():
        if key == "layers":
            out[key] = jax.tree.map(lambda _: NamedSharding(mesh, P("pp")), value)
        else:
            out[key] = jax.tree.map(lambda _: NamedSharding(mesh, P()), value)
    return out


def shard_params_pp(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    return jax.device_put(params, pipeline_param_shardings(params, mesh))


def shard_cache_pp(cache, mesh: Mesh):
    """KV cache [L, B, ...]: layer axis on pp, batch on dp."""
    spec = NamedSharding(mesh, P("pp", "dp"))
    return jax.device_put(cache, jax.tree.map(lambda _: spec, cache))


def _slice_batch(tree, start, size, axis=1):
    return jax.tree.map(
        lambda a: jax.lax.dynamic_slice_in_dim(a, start, size, axis=axis), tree
    )


def _update_batch(tree, update, start, axis=1):
    return jax.tree.map(
        lambda a, u: jax.lax.dynamic_update_slice_in_dim(a, u, start, axis=axis),
        tree, update,
    )


def make_pipeline_forward(
    config: ModelConfig,
    mesh: Mesh,
    *,
    n_microbatches: int = 1,
    remat: bool = False,
):
    """Build fn(params, cache, tokens, start_pos) -> (logits, cache) running
    the layer stack as a pp-stage pipeline (embedding/lm_head replicated).

    Requirements: num_layers % pp == 0, batch % (dp * n_microbatches) == 0.
    Dense and int8-quantized KV caches are supported (paged KV pairs with
    continuous batching on a tp×dp mesh instead — page tables are per-host).
    """
    from metalchat_tpu.models.transformer import (
        embed_tokens,
        final_logits,
        run_layers,
    )

    n_stages = mesh.shape["pp"]
    has_dp = "dp" in mesh.shape and mesh.shape["dp"] > 1
    if config.num_layers % n_stages:
        raise ValueError(
            f"num_layers={config.num_layers} not divisible by pp={n_stages}")

    dp_axis: Optional[str] = "dp" if has_dp else None

    def fn(params, cache, tokens, start_pos):
        b, s = tokens.shape
        quantized = isinstance(cache, QuantizedKVCache)
        cache_leaves = (
            (cache.k, cache.v, cache.k_scale, cache.v_scale)
            if quantized else (cache.k, cache.v)
        )
        start_pos_arr = jnp.asarray(start_pos, jnp.int32)
        offsets = (start_pos_arr if start_pos_arr.ndim == 1
                   else jnp.broadcast_to(start_pos_arr, (b,)))
        positions = offsets[:, None] + jnp.arange(s, dtype=jnp.int32)[None, :]

        x = embed_tokens(params, tokens, positions, config)
        is_global = jnp.asarray(
            [config.layer_is_global(i) for i in range(config.num_layers)])

        n_mb = n_microbatches
        if (b // dict(mesh.shape).get("dp", 1)) % n_mb:
            raise ValueError(f"per-dp batch not divisible by {n_mb} microbatches")

        def stage_prog(layers_loc, leaves_loc, is_global_loc, rope, x_all, offs, pos):
            # x_all [B_loc, S, H]; leaves_loc: cache slices [L_loc, B_loc, ...]
            idx = jax.lax.axis_index("pp")
            b_loc = x_all.shape[0]
            mb_size = b_loc // n_mb
            x_mb = x_all.reshape(n_mb, mb_size, *x_all.shape[1:])
            outs = jnp.zeros_like(x_mb)
            acts = jnp.zeros_like(x_mb[0])
            leaves = leaves_loc

            for t in range(n_mb + n_stages - 1):
                mb = t - idx                       # this stage's microbatch id
                mb_c = jnp.clip(mb, 0, n_mb - 1)
                active = jnp.logical_and(mb >= 0, mb < n_mb)
                inject = x_mb[min(t, n_mb - 1)]
                x_in = jnp.where(idx == 0, inject, acts)

                mb_start = mb_c * mb_size
                mb_leaves = _slice_batch(leaves, mb_start, mb_size)
                mb_offs = jax.lax.dynamic_slice_in_dim(offs, mb_start, mb_size, 0)
                mb_pos = jax.lax.dynamic_slice_in_dim(pos, mb_start, mb_size, 0)
                mb_start_pos = (
                    mb_offs if start_pos_arr.ndim == 1 else start_pos_arr)
                del mb

                def run(ops):
                    x_in, mb_leaves = ops
                    y, new_leaves, _aux = run_layers(
                        x_in, layers_loc, mb_leaves, is_global_loc,
                        config=config, rope=rope, positions=mb_pos,
                        offsets=mb_offs, start_pos=mb_start_pos,
                        quantized_cache=quantized, remat=remat,
                    )
                    return y, new_leaves

                y, new_mb_leaves = jax.lax.cond(
                    active, run, lambda ops: ops, (x_in, mb_leaves))
                leaves = _update_batch(leaves, new_mb_leaves, mb_start)

                # Last stage banks its finished microbatch into outs.
                is_last = idx == n_stages - 1
                take = jnp.logical_and(is_last, active)
                current = jax.lax.dynamic_index_in_dim(outs, mb_c, 0,
                                                       keepdims=False)
                outs = jax.lax.dynamic_update_index_in_dim(
                    outs, jnp.where(take, y, current), mb_c, 0)

                # Hand activations to the next stage (no wraparound).
                acts = jax.lax.ppermute(
                    y, "pp", [(i, i + 1) for i in range(n_stages - 1)])

            # Only the last stage holds real outputs; replicate via psum.
            outs = jax.lax.psum(
                jnp.where(idx == n_stages - 1, outs, jnp.zeros_like(outs)),
                "pp",
            )
            return outs.reshape(x_all.shape), leaves

        out_x, new_leaves = shard_map(
            stage_prog,
            mesh=mesh,
            in_specs=(
                P("pp"),                       # layers: stacked axis
                P("pp", dp_axis),              # cache leaves [L, B, ...]
                P("pp"),                       # is_global [L]
                P(),                           # rope tables (replicated)
                P(dp_axis),                    # x [B, S, H]
                P(dp_axis),                    # offsets [B]
                P(dp_axis),                    # positions [B, S]
            ),
            out_specs=(P(dp_axis), P("pp", dp_axis)),
            check_rep=False,
        )(params["layers"], cache_leaves, is_global, params["rope"], x,
          offsets, positions)

        logits = final_logits(params, out_x, config)
        new_cache = (QuantizedKVCache(*new_leaves) if quantized
                     else KVCache(*new_leaves))
        return logits, new_cache

    return fn
