"""On-device batched sampling.

Counterpart of the reference's logits_processor.rs (strategies
ArgMax/TopK/TopP/TopKThenTopP, logits_processor.rs:11-18) and its GPU
sampler, plus the batch repeat/frequency/presence penalties applied over
the last HISTORY_WINDOW output tokens (core/runner.rs:1522-1544).

Everything is vectorized over the batch and lives inside the jitted step —
no per-token host round trip. Greedy rows are handled by the same code path
(temperature == 0 → argmax) so one compiled step serves mixed batches.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

HISTORY_WINDOW = 128  # reference uses the last 128 output tokens


class SamplingState(NamedTuple):
    """Per-row sampling knobs, [B]-shaped (padded rows: temperature 0)."""

    temperature: jax.Array  # [B] f32; <= eps → greedy
    top_k: jax.Array  # [B] i32; 0 → disabled
    top_p: jax.Array  # [B] f32; >= 1 → disabled
    min_p: jax.Array  # [B] f32; 0 → disabled
    repetition_penalty: jax.Array  # [B] f32; 1 → disabled
    frequency_penalty: jax.Array  # [B] f32; 0 → disabled
    presence_penalty: jax.Array  # [B] f32; 0 → disabled
    # recent output token ids, [B, HISTORY_WINDOW] i32, pad == vocab_size
    history: jax.Array
    # per-row PRNG stream id (request seed, or seq_id when unseeded), [B] u32
    rng_fold: jax.Array
    # per-row output position (number of tokens generated so far), [B] i32;
    # (rng_fold, out_len) fully determines the sample → seeded requests are
    # reproducible across runs regardless of scheduling interleave
    out_len: jax.Array


def apply_penalties(logits: jax.Array, st: SamplingState) -> jax.Array:
    """Repetition/frequency/presence penalties over the history window."""
    B, V = logits.shape
    ones = jnp.ones(st.history.shape, dtype=logits.dtype)
    counts = jnp.zeros((B, V), dtype=logits.dtype)
    counts = counts.at[
        jnp.arange(B, dtype=jnp.int32)[:, None], st.history
    ].add(ones, mode="drop")
    seen = counts > 0

    rp = st.repetition_penalty[:, None]
    penalized = jnp.where(logits > 0, logits / rp, logits * rp)
    logits = jnp.where(seen & (rp != 1.0), penalized, logits)
    logits = logits - st.frequency_penalty[:, None] * counts
    logits = logits - st.presence_penalty[:, None] * seen.astype(logits.dtype)
    return logits


def _mask_top_k(sorted_desc: jax.Array, logits: jax.Array, top_k: jax.Array):
    B, V = logits.shape
    k = jnp.clip(top_k, 0, V)
    idx = jnp.where(k > 0, k - 1, V - 1)
    thresh = jnp.take_along_axis(sorted_desc, idx[:, None], axis=1)
    keep = (top_k <= 0)[:, None] | (logits >= thresh)
    return jnp.where(keep, logits, -jnp.inf)


def _mask_top_p(sorted_desc: jax.Array, logits: jax.Array, top_p: jax.Array):
    probs_sorted = jax.nn.softmax(sorted_desc, axis=-1)
    cum = jnp.cumsum(probs_sorted, axis=-1)
    # keep tokens whose cumulative mass (exclusive) is < top_p; the token
    # that crosses the boundary is kept
    keep_sorted = (cum - probs_sorted) < top_p[:, None]
    n_keep = jnp.maximum(jnp.sum(keep_sorted, axis=-1), 1)
    thresh = jnp.take_along_axis(sorted_desc, (n_keep - 1)[:, None], axis=1)
    keep = (top_p >= 1.0)[:, None] | (logits >= thresh)
    return jnp.where(keep, logits, -jnp.inf)


def _mask_min_p(logits: jax.Array, min_p: jax.Array):
    probs = jax.nn.softmax(logits, axis=-1)
    max_p = jnp.max(probs, axis=-1, keepdims=True)
    keep = (min_p <= 0.0)[:, None] | (probs >= min_p[:, None] * max_p)
    return jnp.where(keep, logits, -jnp.inf)


def sample(
    logits: jax.Array,  # [B, V] float32
    st: SamplingState,
    key: jax.Array,  # PRNGKey for this step
    *,
    needs_filters: bool = True,
    needs_penalties: bool = True,
    mask: Optional[jax.Array] = None,  # [B, V] bool, True = allowed
) -> jax.Array:
    """Sample one token per row → [B] int32.

    needs_filters / needs_penalties are *static* flags the runner computes
    from the batch (all-greedy steps skip the [B, V] sort entirely), giving
    the same fast path the reference gets from caching the sampling strategy
    at prefill (core/runner.rs:1390-1570). `mask` is the guided-decoding
    token bitmask, applied before penalties (runner.rs:1390-1570 order).
    """
    logits = logits.astype(jnp.float32)
    if mask is not None:
        logits = jnp.where(mask, logits, -jnp.inf)
    if needs_penalties:
        logits = apply_penalties(logits, st)

    greedy_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    is_greedy = st.temperature <= 1e-5
    if not needs_filters:
        return greedy_tok

    temp = jnp.maximum(st.temperature, 1e-5)[:, None]
    scaled = logits / temp
    sorted_desc = jnp.sort(scaled, axis=-1)[:, ::-1]
    masked = _mask_top_k(sorted_desc, scaled, st.top_k)
    masked = _mask_top_p(sorted_desc, masked, st.top_p)
    masked = _mask_min_p(masked, st.min_p)

    # per-row independent streams keyed by (stream id, output position)
    V = logits.shape[1]
    keys = jax.vmap(jax.random.fold_in, in_axes=(None, 0))(key, st.rng_fold)
    keys = jax.vmap(jax.random.fold_in)(keys, st.out_len.astype(jnp.uint32))
    uniform = jax.vmap(
        lambda k: jax.random.uniform(k, (V,), minval=1e-20, maxval=1.0)
    )(keys)
    gumbel = -jnp.log(-jnp.log(uniform))
    sampled = jnp.argmax(masked + gumbel, axis=-1).astype(jnp.int32)
    return jnp.where(is_greedy, greedy_tok, sampled)
