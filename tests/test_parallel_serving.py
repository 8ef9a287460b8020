"""sp/pp as *serving* features (VERDICT r1 weak #5): context-parallel
prefill and pipeline-parallel decoding reachable from generate(), the
continuous-batching engine, and the serve CLI — each exact vs the
single-device path on the CPU-8 mesh."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from metalchat_tpu.cache import KVCache
from metalchat_tpu.engine import generate
from metalchat_tpu.engine.serving import ContinuousBatchingEngine, Request
from metalchat_tpu.models import init_random_params
from metalchat_tpu.parallel import (
    context_parallel_prefill,
    make_pipeline_forward,
    make_pp_mesh,
    shard_cache_pp,
    shard_params_pp,
)

from test_model import TINY_LLAMA


@pytest.fixture(scope="module")
def model():
    cfg = TINY_LLAMA.replace(max_seq_len=96)
    params = init_random_params(cfg, seed=11, dtype=jnp.float32)
    return cfg, params


@pytest.fixture(scope="module")
def sp_mesh():
    return Mesh(np.asarray(jax.devices()[:4]), ("sp",))


def _plain(cfg, params, prompt, n, batch=1):
    cache = KVCache.create(cfg, batch, 96, dtype=jnp.float32)
    toks = jnp.asarray(prompt, jnp.int32)
    if toks.ndim == 1:
        toks = toks[None, :]
    return np.asarray(generate(params, cfg, toks, max_new_tokens=n, cache=cache))


def test_cp_prefill_matches_forward(model, sp_mesh):
    from metalchat_tpu.models import forward

    cfg, params = model
    toks = jax.random.randint(jax.random.PRNGKey(2), (2, 40), 0, 97)
    ref_cache = KVCache.create(cfg, 2, 96, dtype=jnp.float32)
    ref_logits, ref_cache = jax.jit(forward, static_argnames="config")(
        params, ref_cache, toks, 0, cfg)

    cache = KVCache.create(cfg, 2, 96, dtype=jnp.float32)
    logits, cache = jax.jit(
        lambda p, c, t: context_parallel_prefill(p, c, t, cfg, sp_mesh, "sp")
    )(params, cache, toks)

    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(ref_logits[:, -1]), rtol=2e-4, atol=2e-4)
    # The written KV region must match the ordinary prefill's exactly.
    np.testing.assert_allclose(
        np.asarray(cache.k[:, :, :, :40]), np.asarray(ref_cache.k[:, :, :, :40]),
        rtol=2e-4, atol=2e-4)


def test_generate_with_cp_prefill_matches(model, sp_mesh):
    cfg, params = model
    prompt = list(range(1, 41))  # 40 tokens, padded to 4 shards internally
    expect = _plain(cfg, params, prompt, 8)
    got = generate(
        params, cfg, jnp.asarray([prompt], jnp.int32), max_new_tokens=8,
        cache=KVCache.create(cfg, 1, 96, dtype=jnp.float32),
        context_parallel_mesh=sp_mesh,
    )
    assert np.asarray(got).tolist() == expect.tolist()


def test_engine_cp_prefill_matches(model, sp_mesh):
    cfg, params = model
    prompts = [list(range(1, 38)), [5, 9, 23]]  # one above, one below threshold
    plain = ContinuousBatchingEngine(params, cfg, max_slots=2, max_seq_len=96)
    reqs_a = [Request(prompt=p, max_new_tokens=6) for p in prompts]
    out_a = plain.run(reqs_a)
    cp = ContinuousBatchingEngine(
        params, cfg, max_slots=2, max_seq_len=96,
        context_parallel_mesh=sp_mesh, context_parallel_threshold=16)
    reqs_b = [Request(prompt=p, max_new_tokens=6) for p in prompts]
    out_b = cp.run(reqs_b)
    for ra, rb in zip(reqs_a, reqs_b):
        assert out_a[ra.request_id].tokens == out_b[rb.request_id].tokens


def test_generate_with_pipeline_forward(model):
    cfg, params = model
    pmesh = make_pp_mesh(pp=3, devices=jax.devices()[:3])
    pparams = shard_params_pp(params, pmesh)
    pcache = shard_cache_pp(
        KVCache.create(cfg, 1, 96, dtype=jnp.float32), pmesh)
    pf = make_pipeline_forward(cfg, pmesh, n_microbatches=1)
    prompt = [5, 9, 23, 42]
    expect = _plain(cfg, params, prompt, 7)
    got = generate(
        pparams, cfg, jnp.asarray([prompt], jnp.int32), max_new_tokens=7,
        cache=pcache, forward_fn=pf,
    )
    assert np.asarray(got).tolist() == expect.tolist()


def test_engine_pipeline_serving(model):
    """The continuous-batching engine as a pipeline-parallel server."""
    cfg, params = model
    prompts = [[1, 2, 3], [9, 8, 7, 6]]
    plain = ContinuousBatchingEngine(params, cfg, max_slots=2, max_seq_len=96)
    reqs_a = [Request(prompt=p, max_new_tokens=5) for p in prompts]
    out_a = plain.run(reqs_a)

    pmesh = make_pp_mesh(pp=3, devices=jax.devices()[:3])
    pengine = ContinuousBatchingEngine(
        shard_params_pp(params, pmesh), cfg, max_slots=2, max_seq_len=96,
        forward_fn=make_pipeline_forward(cfg, pmesh, n_microbatches=1),
        cache=shard_cache_pp(
            KVCache.create(cfg, 2, 96, dtype=jnp.float32), pmesh),
    )
    reqs_b = [Request(prompt=p, max_new_tokens=5) for p in prompts]
    out_b = pengine.run(reqs_b)
    for ra, rb in zip(reqs_a, reqs_b):
        assert out_a[ra.request_id].tokens == out_b[rb.request_id].tokens


def test_cli_serve_pp_and_cp(tmp_path, monkeypatch, capsys):
    """serve --pp/--cp: the user-visible flags run on the CPU mesh."""
    from pathlib import Path

    from metalchat_tpu.cli.main import main

    fixture = Path(__file__).parent / "fixtures" / "pyllama_10m"
    monkeypatch.setenv("METALCHAT_TPU_HOME", str(tmp_path / "home"))
    monkeypatch.chdir(tmp_path)
    assert main(["model", "pull", str(fixture), "--name", "pyllama"]) == 0
    capsys.readouterr()
    from test_fixture_e2e import GOLDEN, PROMPT

    reqs = tmp_path / "reqs.jsonl"
    reqs.write_text(json.dumps({
        "prompt": PROMPT.decode(), "max_tokens": 20, "temperature": 0.0,
    }) + "\n")
    rc = main(["serve", "pyllama", "--input", str(reqs), "--slots", "2",
               "--max-seq-len", "256", "--pp", "2"])
    assert rc == 0
    pp_out = json.loads(
        [l for l in capsys.readouterr().out.splitlines() if l.strip()][0])
    rc = main(["serve", "pyllama", "--input", str(reqs), "--slots", "2",
               "--max-seq-len", "256", "--cp", "4"])
    assert rc == 0
    cp_out = json.loads(
        [l for l in capsys.readouterr().out.splitlines() if l.strip()][0])
    assert pp_out["text"] == cp_out["text"]
    assert pp_out["text"] == bytes(GOLDEN[:20]).decode()


def test_engine_spmd_paged(model):
    """SPMD engine mode + paged cache (VERDICT r3 next #7): pages shard over
    tp (kv-heads) with page tables on dp; tokens match the single-device
    paged engine exactly."""
    from metalchat_tpu.parallel import make_mesh

    cfg, params = model
    mesh = make_mesh(tp=2, dp=2, devices=jax.devices()[:4])
    from metalchat_tpu.parallel.mesh import shard_params

    def run(p, spmd):
        engine = ContinuousBatchingEngine(
            p, cfg, max_slots=4, max_seq_len=32, prefill_chunk=16,
            cache_mode="paged", page_size=8, decode_burst=2, spmd_mesh=spmd,
        )
        out = engine.run([
            Request(prompt=[1, 2, 3, 4, 5], max_new_tokens=5),
            Request(prompt=[6, 7, 8], max_new_tokens=4),
        ])
        assert all(c.finished and c.error is None for c in out.values())
        return [c.tokens for c in out.values()]

    ref = run(params, None)
    got = run(shard_params(params, cfg, mesh), mesh)
    assert ref == got, (ref, got)
