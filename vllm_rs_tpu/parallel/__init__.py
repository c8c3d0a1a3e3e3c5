"""Parallelism: device mesh construction and parameter/KV shardings.

TPU-native replacement of the reference's entire multi-process stack
(src/runner/ IPC runners + NCCL Comm + distributed.rs TP wrappers,
SURVEY.md §2.2): a `jax.sharding.Mesh` with ("data", "model") axes and
NamedShardings on the weight/KV pytrees; XLA inserts the all-reduces that
the reference issues manually after o_proj and down_proj.
"""

from vllm_rs_tpu.parallel.mesh import make_mesh  # noqa: F401
from vllm_rs_tpu.parallel.sharding import (  # noqa: F401
    shard_kv_cache,
    shard_params,
)
