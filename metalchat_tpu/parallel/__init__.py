"""Parallelism: device meshes, sharding rules, distributed init.

The reference has no multi-device support at all (SURVEY.md §2.9); this
package is the from-scratch TPU-native communication layer: an ICI/DCN
`jax.sharding.Mesh`, NamedSharding rules for weights/KV (tensor parallel)
and batch (data parallel), with XLA emitting and overlapping the collectives.
"""

from metalchat_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    param_shardings,
    cache_shardings,
    shard_params,
    shard_cache,
)
from metalchat_tpu.parallel.pipeline import (  # noqa: F401
    make_pipeline_forward,
    make_pp_mesh,
    shard_cache_pp,
    shard_params_pp,
)
from metalchat_tpu.parallel.context import (  # noqa: F401
    context_parallel_prefill,
)
