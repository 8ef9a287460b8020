"""Multi-host *serving* test: two real processes generate tokens together.

VERDICT r1 (#7): `tests/test_distributed.py` proved init + a collective;
this proves the serving path — `MultiHostServer` runs rank-0-routed
generation over a 2-process hybrid mesh (dp across "hosts", tp inside each)
and rank 0's tokens must match the plain single-process `generate` output
exactly (greedy, identical seeded params). BASELINE config 5's skeleton.
"""

import json
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

# Tiny f32 llama (CPU cannot run bf16 dots). Mixed prompt lengths exercise
# the length-grouped rounds and the short-round padding/discard path.
SETUP = textwrap.dedent(
    """
    from metalchat_tpu.config import LlamaConfig
    from metalchat_tpu.models import init_random_params
    import jax.numpy as jnp
    cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
        max_seq_len=64, tie_word_embeddings=False,
    )
    params = init_random_params(cfg, dtype=jnp.float32, max_seq_len=64)
    PROMPTS = [[3, 1, 4, 1, 5, 9, 2], [2, 7, 1, 8, 2, 8, 1], [1, 2, 3]]
    MAX_NEW = 8
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
    from metalchat_tpu.parallel.multihost import MultiHostServer
    mesh = make_hybrid_mesh(dcn_dp=2, tp=2)
    server = MultiHostServer(params=params, config=cfg, mesh=mesh,
                             batch_size=2, max_new_tokens=MAX_NEW)
    results = server.serve(PROMPTS if proc_id == 0 else None)
    if proc_id == 0:
        with open(out_path, "w") as f:
            json.dump(results, f)
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
    from metalchat_tpu.engine import generate
    import jax.numpy as jnp, numpy as np
    out = []
    for p in PROMPTS:
        toks = jnp.asarray([p], jnp.int32)
        out.append(np.asarray(
            generate(params, cfg, toks, max_new_tokens=MAX_NEW)
        )[0].tolist())
    with open(out_path, "w") as f:
        json.dump(out, f)
    """
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.timeout(300)
def test_multihost_serving_exact(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER.format(repo=str(REPO), setup=SETUP))
    ref = tmp_path / "reference.py"
    ref.write_text(REFERENCE.format(repo=str(REPO), setup=SETUP))
    served_path = tmp_path / "served.json"
    ref_path = tmp_path / "reference.json"

    env = {k: v for k, v in __import__("os").environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    proc = subprocess.run([sys.executable, str(ref), str(ref_path)],
                          capture_output=True, text=True, timeout=150, env=env)
    assert proc.returncode == 0, proc.stdout + proc.stderr

    port = str(_free_port())
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), port, str(served_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=240)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"OK {i}" in out, out

    served = json.loads(served_path.read_text())
    expected = json.loads(ref_path.read_text())
    assert served == expected


def test_round_failure_containment():
    """A failed round must preserve completed results and name exactly the
    requests that need re-queueing (SURVEY §5 failure containment; recovery
    = rebuild the server, serve(pending))."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from metalchat_tpu.config import LlamaConfig
    from metalchat_tpu.engine import generate
    from metalchat_tpu.models import init_random_params
    from metalchat_tpu.parallel.mesh import make_mesh
    from metalchat_tpu.parallel.multihost import (
        MultiHostRoundError,
        MultiHostServer,
    )

    cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
        max_seq_len=64, tie_word_embeddings=False,
    )
    params = init_random_params(cfg, dtype=jnp.float32, max_seq_len=64)
    mesh = make_mesh(dp=2, tp=4)
    prompts = [[3, 1, 4], [1, 5, 9], [2, 6, 5, 3, 5]]  # rounds: len3, len5

    server = MultiHostServer(params=params, config=cfg, mesh=mesh,
                             batch_size=2, max_new_tokens=6)
    healthy = server._round
    calls = {"n": 0}

    def flaky(toks, length):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("simulated peer loss")
        return healthy(toks, length)

    server._round = flaky
    try:
        server.serve(prompts)
        raise AssertionError("expected MultiHostRoundError")
    except MultiHostRoundError as err:
        # Round 1 (the two len-3 prompts) completed; round 2 (len-5) failed.
        assert err.round_index == 1
        assert err.pending_indices == [2]
        expected = np.asarray(generate(
            params, cfg, jnp.asarray([prompts[0]], jnp.int32),
            max_new_tokens=6))[0].tolist()
        assert err.completed[0] == expected
        # Recovery: serve the pending requests on a healthy server.
        server._round = healthy
        redo = server.serve([prompts[i] for i in err.pending_indices])
        assert len(redo) == 1 and len(redo[0]) == 6
