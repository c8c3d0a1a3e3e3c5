"""Fixed-shape batch descriptor consumed by the jitted step functions.

TPU-first replacement for the reference's InputMetadata/FlashInferMetadata
(attention-rs) and its per-step host planning (core/runner.rs:978-1388):
instead of ragged cu_seqlens + indptr/indices planning, every step is a
dense padded [B, T] batch —
  - decode:  T == 1, B = decode bucket size
  - prefill: T == token bucket, B = number of prefill chunks in the step
Padding conventions:
  - token_ids / positions: pad 0 (masked out via slot sentinel + context_lens)
  - slot_mapping: pad == num_slots (out-of-bounds → scatter mode='drop')
  - block_tables: pad 0 (reads are masked by context_lens)
  - context_lens: 0 for inactive rows (attention output is garbage, never read)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class AttnMeta(NamedTuple):
    # absolute position of each query token, [B, T] int32
    positions: jax.Array
    # flat KV slot (block_id * block_size + offset) each query token writes,
    # [B, T] int32; padding = num_slots (dropped by scatter)
    slot_mapping: jax.Array
    # per-seq block table, [B, max_blocks] int32, padded with 0
    block_tables: jax.Array
    # KV length of each sequence *including* this step's new tokens, [B] int32
    context_lens: jax.Array
    # index of the last real query token per row (for logit gather), [B] int32
    last_token_idx: jax.Array
    # mamba-slot id per row (hybrid GDN models; 0 otherwise), [B] int32
    seq_slots: jax.Array = None
    # multimodal injection (VL prefill): vision embeddings [K, D] and their
    # flat targets into the [B*T] hidden rows (pad = B*T, dropped)
    mm_embeds: jax.Array = None
    mm_targets: jax.Array = None
    # Qwen-VL mrope positions [B, 3, T] (t/h/w); None = standard 1D rope
    mrope_positions: jax.Array = None
    # deepstack features [n_levels, K, D] added at mm_targets after the
    # first n_levels layers (qwen3-VL, reference layers/deepstack.rs)
    mm_deepstack: jax.Array = None
    # block-granular prefill KV write (set by prepare_prefill ONLY when
    # every chunk in the batch starts block-aligned and T % block == 0):
    # [B, T // block_size] int32 block index per covered block, pad =
    # num_blocks. One scatter row per BLOCK instead of per token — the
    # XLA scatter costs ~130 ns per update row regardless of width, which
    # made the per-layer prefill write 33% of the prefill step
    # (PERF_NOTES r3). None → per-row writes (unaligned chunks, VL image
    # slicing edge cases).
    block_write_idx: jax.Array = None
    # verify-deferred attention (on-device speculative loop): number of
    # tokens ALREADY IN THE POOL per row, [B] int32 (the T new positions'
    # KV stays out of the pool until one post-scan scatter). When set with
    # T > 1, eligible models split attention into a pool partial (decode
    # kernel, T folded into the GQA group dim) flash-merged with a dense
    # in-window causal partial — see ops/attention.py
    # paged_attention_verify_deferred. None → classic write-in-scan.
    pool_lens: jax.Array = None
    # FRESH-prefill marker (set by prepare_prefill when every row's chunk
    # starts at context 0, i.e. no prefix-cache hit and no earlier chunk):
    # the whole attention span is this step's own tokens, so eligible
    # models attend in-window over the fresh K/V and scatter ALL layers'
    # KV once after the layer scan — the classic write-in-scan path's
    # per-layer pool-slice copy + write-back was measured at 55% of the
    # prefill step (lab06b no_prefill_write, PERF_NOTES r5). Presence
    # (not value) routes the jit program: None → classic path.
    fresh_prefill: jax.Array = None
