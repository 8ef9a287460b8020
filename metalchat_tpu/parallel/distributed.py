"""Multi-host distributed initialization + DCN-aware meshes.

BASELINE config 5: Llama-70B with weights+KV sharded across ≥2 hosts over
ICI/DCN. The reference has no distributed support at all (SURVEY.md §2.9);
here the NCCL-equivalent is `jax.distributed` (one process per host) + XLA
collectives over a hybrid mesh whose outer axis rides DCN and inner axes
ride ICI:

  * ``initialize()`` — jax.distributed.initialize from env/args (idempotent);
  * ``make_hybrid_mesh(dcn_dp, tp)`` — `mesh_utils.create_hybrid_device_mesh`
    so data parallelism crosses hosts on DCN while tensor parallelism stays
    inside each host's ICI domain (collective-bandwidth-correct placement);
  * the sharding rules in `parallel.mesh` apply unchanged: the mesh axes are
    still ("dp", "tp").

Single-process testing: `make_hybrid_mesh` degrades to a flat mesh when only
one process exists, so the same serving code runs everywhere.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh

from metalchat_tpu.utils import get_logger

_log = get_logger("metalchat_tpu.distributed")


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed (idempotent; no-op single-process).

    Defaults come from the standard env (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID) or cloud metadata autodetection.
    """
    from jax._src import distributed as _dist

    # Must not touch the XLA backend before distributed init — probe the
    # coordination client directly instead of jax.process_count().
    if _dist.global_state.client is not None:
        return  # already initialized
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        env = os.environ.get("JAX_NUM_PROCESSES")
        num_processes = int(env) if env else None
    if process_id is None:
        env = os.environ.get("JAX_PROCESS_ID")
        process_id = int(env) if env else None
    if coordinator_address is None and num_processes is None:
        return  # single-host run, nothing to do
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _log.info(
        "distributed initialized: process %d/%d, %d local / %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )


def make_hybrid_mesh(dcn_dp: Optional[int] = None, tp: Optional[int] = None) -> Mesh:
    """("dp","tp") mesh with dp spanning hosts (DCN) and tp inside ICI.

    dcn_dp defaults to the process count; tp to local device count. Weights
    are replicated across dp (all-gather-free decode), KV/batch split across
    hosts, and TP collectives (the per-token latency-critical ones) never
    leave a host's ICI domain.
    """
    n_procs = jax.process_count()
    n_local = jax.device_count() // n_procs
    dcn_dp = dcn_dp or n_procs
    tp = tp or (jax.device_count() // dcn_dp // max(1, (jax.device_count() // dcn_dp) // n_local) or n_local)
    per_slice_dp = jax.device_count() // (dcn_dp * tp)
    if dcn_dp * per_slice_dp * tp != jax.device_count():
        raise ValueError(
            f"dcn_dp={dcn_dp} × tp={tp} incompatible with {jax.device_count()} devices"
        )
    if n_procs > 1:
        devices = mesh_utils.create_hybrid_device_mesh(
            (per_slice_dp, tp), dcn_mesh_shape=(dcn_dp, 1),
            process_is_granule=True,
        )
        devices = devices.reshape(dcn_dp * per_slice_dp, tp)
    else:
        devices = np.asarray(jax.devices()).reshape(dcn_dp * per_slice_dp, tp)
    return Mesh(devices, axis_names=("dp", "tp"))
