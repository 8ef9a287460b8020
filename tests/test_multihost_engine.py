"""SPMD continuous batching (BASELINE config 5): two real processes run the
SAME ContinuousBatchingEngine loop in lockstep over a hybrid mesh (tp inside
each "host", dp across them) with mixed prefill+decode scheduling, and the
token streams must match a single-process engine exactly.

This is the piece VERDICT r2 flagged as the remaining config-5 gap: the
batch-synchronous MultiHostServer proved rank-0 routing; this proves the
real engine — chunked prefill, decode bursts, per-request samplers —
executing SPMD."""

import json
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

SETUP = textwrap.dedent(
    """
    from metalchat_tpu.config import LlamaConfig
    from metalchat_tpu.models import init_random_params
    from metalchat_tpu.engine.serving import Request
    from metalchat_tpu.sampling import SamplerConfig
    import jax.numpy as jnp
    cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
        max_seq_len=128, tie_word_embeddings=False,
    )
    params = init_random_params(cfg, dtype=jnp.float32, max_seq_len=128)
    def make_requests():
        # Mixed lengths (different prefill buckets), one sampled request
        # (exercises the batched sampler path), one longer than a chunk.
        return [
            Request(prompt=[3, 1, 4, 1, 5] * 8, max_new_tokens=10),
            Request(prompt=[2, 7, 1], max_new_tokens=6),
            Request(prompt=[9] * 17, max_new_tokens=8,
                    sampler=SamplerConfig(temperature=0.8, top_k=12, top_p=0.9)),
            Request(prompt=[5, 5], max_new_tokens=5),
        ]
    ENGINE_KW = dict(max_slots=2, quantized_kv=True, decode_burst=4,
                     prefill_chunk=16, seed=3)
    """
)

WORKER = textwrap.dedent(
    """
    import sys, os, json
    proc_id = int(sys.argv[1]); port = sys.argv[2]; out_path = sys.argv[3]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    sys.path.insert(0, {repo!r})
    import jax
    jax.config.update("jax_platforms", "cpu")
    from metalchat_tpu.parallel.distributed import initialize, make_hybrid_mesh
    initialize(coordinator_address=f"127.0.0.1:{{port}}", num_processes=2,
               process_id=proc_id)
    assert jax.device_count() == 4
    {setup}
    from metalchat_tpu.parallel.multihost import MultiHostEngine
    mesh = make_hybrid_mesh(dcn_dp=2, tp=2)
    server = MultiHostEngine(params, cfg, mesh, **ENGINE_KW)
    out = server.run(make_requests() if proc_id == 0 else None)
    tokens = {{str(rid): c.tokens for rid, c in out.items()}}
    assert all(c.error is None for c in out.values()), tokens
    with open(out_path + f".{{proc_id}}", "w") as f:
        json.dump(tokens, f)
    print(f"OK {{proc_id}}")
    """
)

REFERENCE = textwrap.dedent(
    """
    import sys, os, json
    out_path = sys.argv[1]
    sys.path.insert(0, {repo!r})
    import jax
    jax.config.update("jax_platforms", "cpu")
    {setup}
    from metalchat_tpu.engine.serving import ContinuousBatchingEngine
    eng = ContinuousBatchingEngine(params, cfg, **ENGINE_KW)
    out = eng.run(make_requests())
    with open(out_path, "w") as f:
        json.dump({{str(rid): c.tokens for rid, c in out.items()}}, f)
    """
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.timeout(420)
def test_spmd_engine_token_exact(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER.format(repo=str(REPO), setup=SETUP))
    ref = tmp_path / "reference.py"
    ref.write_text(REFERENCE.format(repo=str(REPO), setup=SETUP))
    served = tmp_path / "served.json"
    ref_path = tmp_path / "reference.json"

    env = {k: v for k, v in __import__("os").environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    proc = subprocess.run([sys.executable, str(ref), str(ref_path)],
                          capture_output=True, text=True, timeout=200, env=env)
    assert proc.returncode == 0, proc.stdout + proc.stderr

    port = str(_free_port())
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), port, str(served)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=360)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"OK {i}" in out, out

    expected = json.loads(ref_path.read_text())
    got0 = json.loads((tmp_path / "served.json.0").read_text())
    got1 = json.loads((tmp_path / "served.json.1").read_text())
    assert got0 == expected  # SPMD == single-process, token-exact
    assert got1 == expected  # and identical on every rank
