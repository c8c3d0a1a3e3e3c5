"""Host-side core runtime: sequences, paged block manager, prefix cache,
continuous-batching scheduler, and the engine loop.

These are device-agnostic Python (they only produce batch descriptors that
the jitted step functions consume), transcribed behaviorally from the
reference's `src/core/` (engine.rs / scheduler.rs / block_manager.rs /
prefix_cache.rs / sequence.rs).
"""

from vllm_rs_tpu.core.sequence import Sequence, SequenceStatus  # noqa: F401
from vllm_rs_tpu.core.block_manager import BlockManager  # noqa: F401
from vllm_rs_tpu.core.prefix_cache import PrefixCache  # noqa: F401
from vllm_rs_tpu.core.scheduler import Scheduler, ScheduledBatch  # noqa: F401
from vllm_rs_tpu.core.runner import ModelRunner  # noqa: F401
from vllm_rs_tpu.core.engine import LLMEngine, RequestOutput, StreamItem  # noqa: F401
