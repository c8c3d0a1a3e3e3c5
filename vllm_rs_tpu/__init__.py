"""vllm_rs_tpu — a TPU-native quantized LLM inference engine.

A from-scratch rebuild of the capability surface of `guoqingbao/vllm.rs`
(reference mounted at /root/reference) designed TPU-first:

- jax/XLA for the compute graph, Pallas for the hot kernels (paged attention,
  fused dequant-matmul, sampling),
- fixed-shape bucketed step functions under `jax.jit` instead of CUDA graphs,
- a paged KV cache expressed as dense block tables consumed by kernels,
- tensor parallelism via `jax.sharding.Mesh` + NamedSharding instead of
  NCCL + one-process-per-GPU runners,
- a host-side continuous-batching scheduler (prefill-first, chunked prefill,
  prefix caching) transcribed behaviorally from the reference
  (src/core/scheduler.rs, block_manager.rs, prefix_cache.rs).
"""

__version__ = "0.1.0"

from vllm_rs_tpu.config import (  # noqa: F401
    CacheConfig,
    EngineConfig,
    ModelConfig,
    SamplingParams,
)
