"""Paged KV block table management.

Behavioral counterpart of the reference's `src/core/block_manager.rs`:
- ref-counted block pool with a free list (block_manager.rs:274-289)
- allocation with prefix-cache reuse (block_manager.rs:346-442)
- per-decode-step block append (block_manager.rs:241-253)
- prefix-cache retention of finished sequences + pressure eviction

Unlike the reference there is no runner-broadcast mirror
(block_manager.rs:746-874): under SPMD every host runs the same scheduler
deterministically, and the device sees only the batch descriptor arrays.

No copy-on-write is needed: prefix-cache entries are always *full* blocks
and new tokens are only ever written past `num_cached_tokens`, i.e. into
freshly allocated blocks.
"""

from __future__ import annotations

from collections import deque
from typing import List, Optional

from vllm_rs_tpu.core.prefix_cache import PrefixCache
from vllm_rs_tpu.core.sequence import Sequence


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


class BlockManager:
    def __init__(self, num_blocks: int, block_size: int, prefix_cache_enabled: bool = True):
        self.num_blocks = num_blocks
        self.block_size = block_size
        self.ref_counts: List[int] = [0] * num_blocks
        self.free_list = deque(range(num_blocks))
        self.prefix_cache = PrefixCache(block_size, enabled=prefix_cache_enabled)
        # hybrid models: called on every prompt allocation with
        # (seq, matched_hashes) → number of matched blocks actually usable
        # (the deepest recurrent-state snapshot boundary); also responsible
        # for restoring/resetting the sequence's mamba slot
        # (core/hybrid_state.py trim_hook; reference block_manager.rs:444-550)
        self.hybrid_trim = None

    # -- accounting ---------------------------------------------------------

    @property
    def num_free(self) -> int:
        return len(self.free_list)

    @property
    def num_reclaimable(self) -> int:
        """Blocks held only by the prefix cache (evictable on demand)."""
        return sum(
            1
            for b in self.prefix_cache._by_block
            if self.ref_counts[b] == 1
        )

    @property
    def num_available(self) -> int:
        return self.num_free + self.num_reclaimable

    @property
    def used_ratio(self) -> float:
        return 1.0 - self.num_free / self.num_blocks

    def blocks_needed(self, num_tokens: int) -> int:
        return _cdiv(num_tokens, self.block_size)

    # -- raw block ops ------------------------------------------------------

    def _alloc_block(self) -> int:
        b = self.free_list.popleft()
        assert self.ref_counts[b] == 0
        self.ref_counts[b] = 1
        return b

    def _ref(self, b: int) -> None:
        assert self.ref_counts[b] > 0, f"ref of free block {b}"
        self.ref_counts[b] += 1

    def _unref(self, b: int) -> None:
        assert self.ref_counts[b] > 0, f"double free of block {b}"
        self.ref_counts[b] -= 1
        if self.ref_counts[b] == 0:
            self.free_list.append(b)

    def _ensure_free(self, needed: int) -> bool:
        """Evict prefix-cache blocks until `needed` blocks are free."""
        if self.num_free >= needed:
            return True
        deficit = needed - self.num_free
        for b in self.prefix_cache.evict(deficit):
            self._unref(b)
        return self.num_free >= needed

    def alloc_blocks(self, n: int) -> Optional[List[int]]:
        """Allocate n fresh blocks, evicting reclaimable prefix-cache blocks
        on demand — the public path for swap-in, mirroring allocate_prompt's
        `_ensure_free` eviction so swapped sequences are not starved while
        free blocks sit in the prefix cache."""
        if not self._ensure_free(n):
            return None
        return [self._alloc_block() for _ in range(n)]

    # -- prompt allocation (reference block_manager.rs:346-442) --------------

    def can_allocate(self, seq: Sequence) -> bool:
        """Conservative check ignoring prefix hits (a hit only helps)."""
        return self.num_available >= self.blocks_needed(seq.prompt_len)

    def allocate_prompt(self, seq: Sequence) -> bool:
        """Allocate the full prompt's blocks, reusing cached prefix blocks.

        Sets seq.block_table and seq.num_cached_tokens. Guarantees at least
        one prompt token remains to be computed (so prefill always produces
        a logit row for sampling), mirroring the reference.
        """
        assert not seq.block_table, "sequence already allocated"
        if self.prefix_cache.enabled:
            hashes = self.prefix_cache.block_hashes(
                seq.prompt_token_ids, seq.image_seed
            )
            matched = self.prefix_cache.match_hashes(hashes)
        else:
            hashes, matched = [], []
        # never cache-hit the entire prefill span: leave >=1 token to
        # compute (prefill_target covers recompute replay tokens too)
        while len(matched) * self.block_size >= seq.prefill_target and matched:
            matched.pop()
        if self.hybrid_trim is not None:
            # hybrids: only blocks up to a recurrent-state snapshot boundary
            # are usable; the hook also restores/resets the mamba slot (a
            # recomputed sequence's slot holds stale state otherwise)
            matched = matched[: self.hybrid_trim(seq, hashes[: len(matched)])]
        total = self.blocks_needed(seq.prefill_target)
        fresh = total - len(matched)
        if not self._ensure_free(fresh):
            return False
        for b in matched:
            self._ref(b)
        seq.block_table = list(matched) + [self._alloc_block() for _ in range(fresh)]
        seq.num_cached_tokens = len(matched) * self.block_size
        seq.num_prefix_cached_tokens = seq.num_cached_tokens
        return True

    # -- decode append (reference block_manager.rs:241-253) ------------------

    def can_append(self, seq: Sequence) -> bool:
        needed = self.blocks_needed(seq.num_tokens) - len(seq.block_table)
        return needed <= 0 or self.num_available >= needed

    def append_slot(self, seq: Sequence, n_steps: int = 1) -> bool:
        """Ensure capacity for the KV slots written by the next n_steps
        decode steps (positions num_tokens-1 .. num_tokens-2+n_steps)."""
        needed = self.blocks_needed(seq.num_tokens + n_steps - 1) - len(seq.block_table)
        if needed <= 0:
            return True
        if not self._ensure_free(needed):
            return False
        for _ in range(needed):
            seq.block_table.append(self._alloc_block())
        return True

    # -- retention & freeing -------------------------------------------------

    def cache_sequence(self, seq: Sequence) -> None:
        """Insert a sequence's full blocks into the prefix cache
        (reference scheduler.rs postprocess → prefix_cache insert)."""
        retained = self.prefix_cache.insert(
            seq.all_token_ids(), seq.block_table, seq.image_seed
        )
        for b in retained:
            self._ref(b)

    def cache_prompt(self, seq: Sequence) -> None:
        """Insert the *prompt's* full blocks once prefill completes, so
        concurrent identical prompts share KV immediately."""
        n_full = seq.prompt_len // self.block_size
        retained = self.prefix_cache.insert(
            seq.prompt_token_ids[: n_full * self.block_size],
            seq.block_table[:n_full],
            seq.image_seed,
        )
        for b in retained:
            self._ref(b)

    def free_seq(self, seq: Sequence, cache: bool = True) -> None:
        if cache and seq.num_tokens > 0:
            self.cache_sequence(seq)
        for b in seq.block_table:
            self._unref(b)
        seq.block_table = []

    # -- prefix-cache pressure (reference scheduler.rs:1167-1175) ------------

    def prefix_cache_ratio(self) -> float:
        return self.prefix_cache.num_cached_blocks / max(self.num_blocks, 1)

    def evict_prefix_cache_to(self, target_ratio: float) -> int:
        target = int(target_ratio * self.num_blocks)
        excess = self.prefix_cache.num_cached_blocks - target
        if excess <= 0:
            return 0
        freed = self.prefix_cache.evict(excess)
        for b in freed:
            self._unref(b)
        return len(freed)

    def reset(self) -> None:
        for b in self.prefix_cache.clear():
            self._unref(b)

    def check_invariants(self) -> None:
        """Debug invariant: every block is free xor ref'd; free list unique."""
        assert len(set(self.free_list)) == len(self.free_list)
        for b in self.free_list:
            assert self.ref_counts[b] == 0
        n_zero = sum(1 for r in self.ref_counts if r == 0)
        assert n_zero == len(self.free_list)
