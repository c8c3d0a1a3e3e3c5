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
