"""Multi-host serving skeleton (BASELINE config 5).

SPMD serving over `jax.distributed`: every host runs the SAME loop over the
same jitted programs; arrays live sharded on a global hybrid mesh (tp inside
each host's ICI domain, dp across hosts on DCN — `make_hybrid_mesh`).
Request I/O is rank-0's job: it owns the queue, packs fixed-shape batches,
and `broadcast_one_to_all` replicates each batch's tokens so all processes
dispatch identical programs; generated tokens come back replicated, so
rank 0 can stream them to clients with no further communication.

This is batch-synchronous routing — the multi-host *skeleton* the
continuous-batching engine plugs into later (its scheduler state is already
host-local; only the packed step inputs need broadcasting). The reference
is single-process, single-device (SURVEY.md §2.9).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from metalchat_tpu.cache import KVCache, QuantizedKVCache
from metalchat_tpu.config import ModelConfig
from metalchat_tpu.engine.generate import generate
from metalchat_tpu.parallel.mesh import shard_cache, shard_params
from metalchat_tpu.sampling import SamplerConfig


@dataclass
class MultiHostServer:
    """Rank-0-routed, mesh-sharded batch server.

    All processes construct it with identical arguments (params may be
    host-local shards — `shard_params` places them on the global mesh).
    Only rank 0's `requests` matter; other ranks pass anything (ignored).
    """

    params: dict
    config: ModelConfig
    mesh: jax.sharding.Mesh
    batch_size: int = 4          # global batch per round (multiple of dp)
    max_new_tokens: int = 32
    quantized_kv: bool = False
    sampler: SamplerConfig = SamplerConfig.greedy()

    def __post_init__(self):
        self.params = shard_params(self.params, self.config, self.mesh)

    def _cache(self, prompt_len: int):
        cls = QuantizedKVCache if self.quantized_kv else KVCache
        limit = min(self.config.max_seq_len, prompt_len + self.max_new_tokens)
        return shard_cache(
            cls.create(self.config, self.batch_size, limit), self.mesh)

    def serve(
        self, requests: Optional[Sequence[Sequence[int]]]
    ) -> List[List[int]]:
        """Run all requests; returns rank-0's per-request token lists (other
        ranks receive the same replicated tokens — typically discarded).

        Rounds group requests of identical prompt length (token-exact vs
        the single-device path — no pad conditioning); short rounds repeat
        a real row and drop the copies. One jit entry per distinct prompt
        length; production callers bucket lengths upstream."""
        from jax.experimental import multihost_utils

        is_root = jax.process_index() == 0
        rounds: List[Tuple[int, List[Tuple[int, List[int]]]]] = []
        n_requests = 0
        if is_root and requests:
            n_requests = len(requests)
            by_len: dict = {}
            for i, p in enumerate(requests):
                by_len.setdefault(len(p), []).append((i, list(p)))
            for length in sorted(by_len):
                group = by_len[length]
                for c in range(0, len(group), self.batch_size):
                    rounds.append((length, group[c : c + self.batch_size]))
        n_rounds = int(multihost_utils.broadcast_one_to_all(
            np.asarray(len(rounds), np.int32)))

        results: List[List[int]] = [[] for _ in range(n_requests)]
        for r in range(n_rounds):
            length = int(multihost_utils.broadcast_one_to_all(np.asarray(
                rounds[r][0] if is_root else 0, np.int32)))
            toks = np.zeros((self.batch_size, length), np.int32)
            if is_root:
                batch = rounds[r][1]
                for j in range(self.batch_size):
                    toks[j] = batch[min(j, len(batch) - 1)][1]
            toks = multihost_utils.broadcast_one_to_all(toks)
            try:
                out = self._round(toks, length)
            except Exception as exc:  # noqa: BLE001 — containment boundary
                # Failure containment (SURVEY §5): a failed round (peer loss
                # surfaces as a collective/heartbeat error; bad compile as a
                # jit error) must not lose the work already done. Completed
                # results are preserved, the remaining rounds' requests are
                # reported, and the caller decides whether to re-queue them
                # on a rebuilt server (jax.distributed cannot shrink a live
                # mesh — recovery is re-initialize, then `serve(pending)`).
                pending = [idx for _, grp in rounds[r:] for idx, _ in grp]
                raise MultiHostRoundError(r, pending, results) from exc
            if is_root:
                for j, (idx, _) in enumerate(rounds[r][1]):
                    results[idx] = out[j].tolist()
        return results

    def _round(self, toks: np.ndarray, length: int) -> np.ndarray:
        out = generate(
            self.params, self.config, jnp.asarray(toks),
            max_new_tokens=self.max_new_tokens, sampler=self.sampler,
            cache=self._cache(length),
        )
        # Generated ids come back batch-sharded over dp (hosts). One
        # all-gather replicates them so every host can read the tokens.
        return np.asarray(jax.jit(
            lambda x: x,
            out_shardings=jax.sharding.NamedSharding(
                self.mesh, jax.sharding.PartitionSpec()),
        )(out))


class MultiHostRoundError(RuntimeError):
    """A serving round failed; carries everything needed to resume.

    `completed` holds token lists for requests that finished before the
    failure; `pending_indices` are request indices (into the original
    `serve(requests)` list) that still need serving — including the failed
    round's."""

    def __init__(self, round_index: int, pending_indices: List[int],
                 completed: List[List[int]]):
        super().__init__(
            f"multi-host serving round {round_index} failed; "
            f"{len(pending_indices)} requests pending re-queue")
        self.round_index = round_index
        self.pending_indices = pending_indices
        self.completed = completed


class MultiHostEngine:
    """SPMD continuous batching over a multi-process mesh (config 5).

    Every process constructs the same engine (weights tp-sharded over ICI,
    KV slots dp-sharded over DCN — `make_hybrid_mesh`) and runs the SAME
    scheduling loop in lockstep. The engine's host state is a deterministic
    function of (request intake, jitted step outputs); step outputs are
    replicated (ContinuousBatchingEngine spmd_mesh mode), so the only
    cross-process traffic besides the model collectives is rank 0
    broadcasting the request list. Generated tokens are identical on every
    process; rank 0 streams them to clients.

    Unlike `MultiHostServer` (batch-synchronous, one jit entry per prompt
    length, duplicated short-round rows), this runs the real mixed
    prefill+decode scheduler: chunked/bucketed prefill, decode bursts,
    per-row positions, per-request samplers.
    """

    def __init__(self, params, config: ModelConfig, mesh: jax.sharding.Mesh,
                 **engine_kw):
        from metalchat_tpu.engine.serving import ContinuousBatchingEngine

        self.mesh = mesh
        self.is_root = jax.process_index() == 0
        params = shard_params(params, config, mesh)
        self.engine = ContinuousBatchingEngine(
            params, config, spmd_mesh=mesh, **engine_kw)

    @staticmethod
    def _broadcast_json(obj, is_root: bool):
        import json

        from jax.experimental import multihost_utils

        payload = json.dumps(obj).encode() if is_root else b""
        n = int(multihost_utils.broadcast_one_to_all(
            np.asarray(len(payload), np.int32)))
        buf = np.zeros(n, np.uint8)
        if is_root:
            buf[:] = np.frombuffer(payload, np.uint8)
        buf = multihost_utils.broadcast_one_to_all(buf)
        return json.loads(bytes(buf).decode())

    def run(self, requests=None):
        """Serve `requests` (rank 0's; other ranks pass None). Returns
        {request_id: Completion} — identical token streams on every rank."""
        from metalchat_tpu.engine.serving import Request

        spec = None
        if self.is_root:
            spec = [
                {
                    "prompt": list(r.prompt),
                    "max_new_tokens": r.max_new_tokens,
                    "eos_ids": list(r.eos_ids),
                    "sampler": [r.sampler.temperature, r.sampler.top_k,
                                r.sampler.top_p],
                }
                for r in (requests or [])
            ]
        spec = self._broadcast_json(spec, self.is_root)
        from metalchat_tpu.sampling import SamplerConfig

        reqs = [
            Request(
                prompt=s["prompt"], max_new_tokens=s["max_new_tokens"],
                eos_ids=tuple(s["eos_ids"]),
                sampler=SamplerConfig(temperature=s["sampler"][0],
                                      top_k=int(s["sampler"][1]),
                                      top_p=s["sampler"][2]),
            )
            for s in spec
        ]
        # Identical submissions + deterministic scheduling + replicated step
        # outputs ⇒ identical `step()` sequences with NO further coordination.
        return self.engine.run(reqs)
