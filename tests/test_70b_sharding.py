"""70B-shape sharding dryrun (BASELINE config 5 memory math).

Real Llama-3.1-70B dims (h=8192, f=28672, 64 q-heads / 8 kv-heads) truncated
to 2 layers, int4 weights + int8 KV, sharded over a 16-device hybrid mesh
(dcn_dp=2 hosts x tp=8 chips). Asserts the per-device memory arithmetic that
makes 70B fit a v5e-8 host, and runs one sharded decode step end-to-end.

Runs in a subprocess: the device count (16) must be set before jax
initializes, and the suite's conftest pins 8.
"""

import subprocess
import sys
import textwrap
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

SCRIPT = textwrap.dedent(
    """
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=16"
    sys.path.insert(0, {repo!r})
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from metalchat_tpu.cache import QuantizedKVCache
    from metalchat_tpu.config import LlamaConfig
    from metalchat_tpu.models import forward
    from metalchat_tpu.parallel.mesh import (
        cache_shardings, make_mesh, shard_cache, shard_params,
    )
    from metalchat_tpu.quant.quantize import QuantizedTensor, init_random_quantized_params

    L = 2  # layer-truncated: per-layer sharding math is what matters
    cfg = LlamaConfig.llama31_70b(max_seq_len=512).replace(num_layers=L)
    mesh = make_mesh(dp=2, tp=8)  # dp = DCN axis across hosts, tp = ICI
    params = init_random_quantized_params(
        cfg, bits=4, group_size=None, act_bits=8, max_seq_len=512,
        dtype=jnp.float32)
    params = shard_params(params, cfg, mesh)

    # --- per-device memory math --------------------------------------------
    h, f, hd, nkv, V = 8192, 28672, 128, 8, 128256
    def shard_bytes(leaf):
        sh = leaf.addressable_shards[0]
        return sh.data.size * sh.data.dtype.itemsize

    layers = params["layers"]
    # w13-equivalents: w1 int4 packed [L, f, h/2] sharded tp on out(f) axis.
    w1 = layers["w1"]
    assert isinstance(w1, QuantizedTensor)
    assert shard_bytes(w1.q) == L * (f // 8) * (h // 2), (
        w1.q.shape, shard_bytes(w1.q))
    # wq [L, h, 64*hd] int4 packed, tp on heads: per device 8 q-heads.
    wq = layers["wq"]
    expect_wq = L * (64 // 8) * hd * (h // 2)
    assert shard_bytes(wq.q) == expect_wq, (wq.q.shape, shard_bytes(wq.q))
    # Full-model per-device weight budget at 80 layers (the real fit test):
    per_layer_packed = (
        (h * 64 * hd + h * nkv * hd * 2 + 64 * hd * h) // 2 +  # attn int4
        (h * f * 3) // 2                                        # ffn int4
    ) / 8  # tp=8
    embed_bytes = V * h * 4  # f32 here; bf16 in production (x0.5)
    total_80 = 80 * per_layer_packed + embed_bytes / 8
    # ~6.6 GB packed weights per device at bf16-embed production settings —
    # fits v5e's 16 GB HBM with room for KV; assert the arithmetic.
    assert 80 * per_layer_packed < 7.0e9, total_80

    # --- sharded decode step ------------------------------------------------
    cache = shard_cache(QuantizedKVCache.create(cfg, 2, 512), mesh)
    step = jax.jit(forward, static_argnames="config", donate_argnums=(1,),
                   out_shardings=(
                       jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()),
                       jax.tree.map(lambda x: x.sharding, cache),
                   ))
    tokens = jnp.ones((2, 1), jnp.int32)
    logits, cache = step(params, cache, tokens, 3, cfg)
    assert logits.shape == (2, 1, V)
    assert np.isfinite(np.asarray(logits[:, :, :64])).all()
    print("70B dryrun OK")
    """
)


@pytest.mark.timeout(420)
def test_70b_sharding_dryrun(tmp_path):
    script = tmp_path / "dryrun70b.py"
    script.write_text(SCRIPT.format(repo=str(REPO)))
    env = {k: v for k, v in __import__("os").environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    proc = subprocess.run([sys.executable, str(script)], capture_output=True,
                          text=True, timeout=400, env=env)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "70B dryrun OK" in proc.stdout
