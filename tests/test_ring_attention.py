"""Ring attention (context parallelism) vs dense reference on the CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from metalchat_tpu.ops import xla as xops
from metalchat_tpu.parallel.ring_attention import context_parallel_attention


def _mk(b, s, nh, nkv, hd, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, s, nh, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, nkv, s, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, nkv, s, hd)), jnp.float32)
    return q, k, v


def _dense_ref(q, k, v, scale, causal=True):
    b, s = q.shape[:2]
    positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None], (b, s))
    if causal:
        mask = xops.causal_mask(positions, s, s)
    else:
        mask = jnp.ones((b, s, s), bool)
    return np.asarray(xops.attention(q, k, v, mask, scale=scale))


@pytest.mark.parametrize("shards", [2, 4, 8])
@pytest.mark.parametrize("causal", [True, False])
def test_ring_matches_dense(cpu_devices, shards, causal):
    mesh = Mesh(np.asarray(cpu_devices[:shards]), axis_names=("sp",))
    q, k, v = _mk(2, 32, 8, 4, 16)
    got = np.asarray(
        context_parallel_attention(q, k, v, mesh, "sp", scale=0.25, causal=causal)
    )
    expect = _dense_ref(q, k, v, 0.25, causal)
    np.testing.assert_allclose(got, expect, rtol=2e-5, atol=2e-5)


def test_ring_under_jit(cpu_devices):
    """shard_map ring attention composes with jit."""
    mesh = Mesh(np.asarray(cpu_devices[:4]), axis_names=("sp",))
    q, k, v = _mk(1, 64, 4, 2, 8, seed=3)

    @jax.jit
    def f(q, k, v):
        return context_parallel_attention(q, k, v, mesh, "sp", scale=0.125)

    got = np.asarray(f(q, k, v))
    np.testing.assert_allclose(got, _dense_ref(q, k, v, 0.125), rtol=2e-5, atol=2e-5)
