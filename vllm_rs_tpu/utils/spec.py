"""Prompt-lookup speculative decoding (draft-model-free).

A capability beyond the reference: propose the next k tokens by matching
the most recent n-gram against earlier context (prompt-lookup decoding),
then verify all k in ONE forward pass of T = k+1 tokens. At batch-1 decode
the TPU is MXU-pass-bound, so verifying k+1 tokens costs the same step
time as generating 1 — accepted drafts are nearly free throughput.

Greedy-only: acceptance compares the verifier's argmax to the draft
(exact — output is bit-identical to plain greedy decoding).
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp


def propose_prompt_lookup(
    token_ids: Sequence[int], k: int, *, ngram_max: int = 3, ngram_min: int = 1
) -> List[int]:
    """Match the trailing n-gram against earlier context; on a hit, draft
    the k tokens that followed the earlier occurrence."""
    n_tokens = len(token_ids)
    if n_tokens < ngram_min + 1 or k <= 0:
        return []
    for n in range(min(ngram_max, n_tokens - 1), ngram_min - 1, -1):
        tail = tuple(token_ids[-n:])
        # scan backwards for the most recent earlier occurrence
        for start in range(n_tokens - n - 1, -1, -1):
            if tuple(token_ids[start : start + n]) == tail:
                follow = token_ids[start + n : start + n + k]
                if follow:
                    return list(follow)
    return []


def propose_prompt_lookup_device(
    tok_buf: jax.Array,  # [B, Lbuf] i32 token history (zeros past cur_len)
    cur_len: jax.Array,  # [B] i32 tokens currently in the buffer
    *,
    k: int,
    ngram_max: int = 3,
    ngram_min: int = 1,
) -> jax.Array:
    """In-graph prompt-lookup proposer for the on-device speculative loop
    (VERDICT r3 item 1): the same largest-n / most-recent-occurrence policy
    as `propose_prompt_lookup`, vectorized over the batch so propose+verify
    can roll into one `lax.while_loop` program with zero host syncs.

    Always returns a full [B, k] draft: verification makes ANY draft content
    exact (a token is only emitted when the verifier's argmax equals it, or
    as the verifier's own bonus token), so rows without an n-gram hit and
    follows that run past the context simply draft garbage — they cost
    acceptance, never correctness.
    """
    B, L = tok_buf.shape
    iota = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
    follow = jnp.full((B,), -1, jnp.int32)
    for n in range(ngram_max, ngram_min - 1, -1):
        tail_idx = jnp.clip(
            cur_len[:, None] - n + jnp.arange(n, dtype=jnp.int32)[None, :],
            0,
            L - 1,
        )
        tail = jnp.take_along_axis(tok_buf, tail_idx, axis=1)  # [B, n]
        match = jnp.ones((B, L), bool)
        for j in range(n):
            # shifted[:, i] = tok_buf[:, i + j] (out-of-range → -1, never a
            # token id, so boundary columns can't match)
            if j:
                shifted = jnp.concatenate(
                    [tok_buf[:, j:], jnp.full((B, j), -1, tok_buf.dtype)],
                    axis=1,
                )
            else:
                shifted = tok_buf
            match = match & (shifted == tail[:, j : j + 1])
        # host policy: start <= cur_len - n - 1 (the tail itself excluded),
        # needs cur_len >= n + 1 tokens; most recent occurrence wins
        ok = (iota < (cur_len - n)[:, None]) & ((cur_len >= n + 1)[:, None])
        cand = jnp.where(match & ok, iota, -1)
        best_n = jnp.max(cand, axis=1)
        # largest n has priority: only fill rows still without a follow
        follow = jnp.where((follow < 0) & (best_n >= 0), best_n + n, follow)
    start = jnp.maximum(follow, 0)  # follow<0 rows draft from 0: garbage-safe
    fidx = jnp.clip(
        start[:, None] + jnp.arange(k, dtype=jnp.int32)[None, :], 0, L - 1
    )
    return jnp.take_along_axis(tok_buf, fidx, axis=1)  # [B, k]
