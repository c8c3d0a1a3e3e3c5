"""Request/sequence state.

Counterpart of the reference's `src/core/sequence.rs` (Sequence /
DecodeSequence / SequenceStatus, sequence.rs:7-144). There is no IPC-facing
DecodeSequence here: the runner reads the fields it needs directly when
building fixed-shape batch descriptors.
"""

from __future__ import annotations

import enum
import time
from typing import List, Optional

from vllm_rs_tpu.config import SamplingParams


class SequenceStatus(enum.Enum):
    WAITING = "waiting"
    RUNNING = "running"
    SWAPPED = "swapped"  # KV swapped out to host pool
    FINISHED = "finished"


class FinishReason(enum.Enum):
    STOP = "stop"  # EOS or stop token / stop string
    LENGTH = "length"  # max_tokens or max_model_len
    ABORT = "abort"  # cancelled / preempted beyond recovery


class Sequence:
    """One request's token + KV block state.

    token_ids = prompt + generated output. `num_cached_tokens` counts tokens
    whose KV is already present (prefix-cache hits + previously prefilled
    chunks); prefill is complete when num_cached_tokens >= prompt_len
    (chunked prefill semantics, reference scheduler.rs:718-785).
    """

    _counter = 0

    def __init__(
        self,
        prompt_token_ids: List[int],
        sampling_params: Optional[SamplingParams] = None,
        seq_id: Optional[int] = None,
        image_seed: Optional[int] = None,
    ):
        if seq_id is None:
            seq_id = Sequence._counter
            Sequence._counter += 1
        self.seq_id = seq_id
        self.prompt_token_ids = list(prompt_token_ids)
        self.output_token_ids: List[int] = []
        self.sampling_params = sampling_params or SamplingParams()
        self.status = SequenceStatus.WAITING
        self.finish_reason: Optional[FinishReason] = None
        # guided-decoding state (utils/guidance.GuidanceState) or None
        self.guidance = None
        # block count at swap-out time (CPU swap, scheduler.rs:830-1006)
        self.swapped_num_blocks = 0
        self.swapped_time = 0.0  # monotonic swap-out time (cooling period)
        # recurrent-state slot for hybrid GDN models (MambaCache slot id)
        self.mamba_slot = None
        # multimodal: vision embeddings [K, D] + their prompt positions
        self.mm_embeds = None
        self.mm_positions: List[int] = []
        # deepstack features [n_levels, K, D] (qwen3-VL)
        self.mm_deepstack = None
        # Qwen-VL mrope: [3, prompt_len] position table + decode delta
        self.mrope_table = None
        self.mrope_delta = 0
        # paged-KV block table (logical block ids into the device pool)
        self.block_table: List[int] = []
        # tokens whose KV already exists in the cache (prefix hits + chunks)
        self.num_cached_tokens = 0
        # preemption-by-recompute: output tokens that must be REPLAYED
        # through prefill (their KV was freed; decode would read garbage
        # otherwise). 0 for normal sequences.
        self.prefill_extra = 0
        # tokens matched from the prefix cache at admission (for usage stats)
        self.num_prefix_cached_tokens = 0
        # schedule() rounds this seq was held back by admission coalescing
        # (scheduler state, deterministic across multi-host replicas)
        self.admit_passovers = 0
        # optional extra hash seed for multimodal prefix hashing
        # (reference block_manager.rs:146-177)
        self.image_seed = image_seed
        # timing (reference GenerationOutput triplet, core/mod.rs:13-44)
        self.arrival_time = time.time()
        self.first_scheduled_time: Optional[float] = None
        self.first_token_time: Optional[float] = None
        self.finish_time: Optional[float] = None

    # -- lengths ----------------------------------------------------------

    @property
    def prompt_len(self) -> int:
        return len(self.prompt_token_ids)

    @property
    def num_tokens(self) -> int:
        return self.prompt_len + len(self.output_token_ids)

    @property
    def prefill_target(self) -> int:
        """Tokens prefill must cover: the prompt, plus any generated tokens
        being replayed after preemption-by-recompute."""
        return self.prompt_len + self.prefill_extra

    @property
    def prefill_done(self) -> bool:
        return self.num_cached_tokens >= self.prefill_target

    @property
    def num_prefill_remaining(self) -> int:
        return max(self.prefill_target - self.num_cached_tokens, 0)

    def token_at(self, i: int) -> int:
        if i < self.prompt_len:
            return self.prompt_token_ids[i]
        return self.output_token_ids[i - self.prompt_len]

    def all_token_ids(self) -> List[int]:
        return self.prompt_token_ids + self.output_token_ids

    @property
    def last_token_id(self) -> int:
        if self.output_token_ids:
            return self.output_token_ids[-1]
        return self.prompt_token_ids[-1]

    def append_token(self, token_id: int) -> None:
        self.output_token_ids.append(token_id)

    # -- lifecycle ---------------------------------------------------------

    def finish(self, reason: FinishReason) -> None:
        self.status = SequenceStatus.FINISHED
        self.finish_reason = reason
        self.finish_time = time.time()

    @property
    def is_finished(self) -> bool:
        return self.status == SequenceStatus.FINISHED

    def reset_for_recompute(self) -> None:
        """Preemption by recomputation: drop KV state, requeue as waiting.

        The reference swaps to CPU instead (block_manager.rs:910-990); we
        support both — this is the fallback when the swap pool is full.

        Already-generated tokens become part of the prefill replay
        (prefill_extra): their KV was freed with the blocks, so prefill
        must recompute positions [0, num_tokens) before decode resumes —
        re-prefilling only the prompt would leave decode reading freed
        KV for the output positions.
        """
        self.block_table = []
        self.num_cached_tokens = 0
        self.prefill_extra = len(self.output_token_ids)
        self.status = SequenceStatus.WAITING

    def __repr__(self) -> str:  # pragma: no cover
        return (
            f"Sequence(id={self.seq_id}, status={self.status.value}, "
            f"prompt={self.prompt_len}, out={len(self.output_token_ids)}, "
            f"cached={self.num_cached_tokens}, blocks={len(self.block_table)})"
        )
