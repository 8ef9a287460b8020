"""Multi-host (multi-process) distributed tests on CPU.

SURVEY.md §4's TPU-build implication (c): multi-host logic is tested with a
multiprocess CPU mesh — two real processes coordinate through
jax.distributed and run a collective.
"""

import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

WORKER = textwrap.dedent(
    """
    import sys, os
    proc_id = int(sys.argv[1])
    port = sys.argv[2]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    sys.path.insert(0, {repo!r})
    import jax
    jax.config.update("jax_platforms", "cpu")
    from metalchat_tpu.parallel.distributed import initialize, make_hybrid_mesh
    initialize(coordinator_address=f"127.0.0.1:{{port}}", num_processes=2,
               process_id=proc_id)
    assert jax.process_count() == 2
    assert jax.device_count() == 4
    mesh = make_hybrid_mesh(dcn_dp=2, tp=2)
    assert dict(mesh.shape) == {{"dp": 2, "tp": 2}}, mesh.shape
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    out = multihost_utils.process_allgather(jnp.ones(4) * (proc_id + 1))
    total = float(out.sum())
    assert total == 12.0, total
    print(f"OK {{proc_id}} {{total}}")
    """
).format(repo=str(REPO))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.timeout(180)
def test_two_process_distributed(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    port = str(_free_port())
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), port],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=150)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"OK {i} 12.0" in out, out
