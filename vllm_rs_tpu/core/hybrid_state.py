"""Mamba/GDN prefix snapshots: prefix caching for hybrid models.

Hybrid models carry per-sequence recurrent state (conv + rec arrays in
mamba slots) alongside paged KV. A KV prefix hit alone would skip the
recurrent-state updates for the cached tokens, so round 1 force-disabled
the prefix cache for hybrids. This module is the reference's mamba
snapshot mechanism re-done host-side (src/core/block_manager.rs:444-550
snapshot store keyed by block boundary, src/core/runner.rs:676-741
capture/restore): the engine captures the recurrent state at exact
block-boundary token counts into a small snapshot pool, keyed by the
prefix cache's chained block hash at that boundary, and a later prompt
that matches cached KV blocks restores the deepest snapshotted boundary's
state and prefills only the remainder.

Capture points (both cover EXACTLY a block-aligned token count, so the
restored state and the reused KV blocks describe the same tokens):
  - after a non-final prefill chunk: the chunk budget is a multiple of the
    block size, so chunk ends land on block boundaries;
  - after a decode step whose state coverage (num_tokens - 1: the last
    sampled token has not been forwarded yet) lands on a boundary, at an
    every-N-blocks cadence.

Keying by chained hash makes staleness impossible: a snapshot is only ever
restored when the new prompt's own hash chain reproduces the key, i.e. the
token prefix is identical. Prefix-cache eviction of a block drops its
snapshot eagerly (hygiene; correctness never depends on it).
"""

from __future__ import annotations

from collections import OrderedDict
from typing import List, Optional, Tuple

from vllm_rs_tpu.core.prefix_cache import ROOT_HASH, _hash_block


class MambaSnapshotPool:
    """Fixed-capacity pool of recurrent-state snapshots, LRU-replaced.

    The device arrays live in the runner (lazily allocated, same sharding
    as the live state); this class owns the hash → (snap_slot, num_tokens)
    index and the capture/restore policy.
    """

    def __init__(
        self,
        runner,
        block_manager,
        num_slots: int,
        interval_blocks: int,
    ):
        self.runner = runner
        self.bm = block_manager
        self.block_size = block_manager.block_size
        self.num_slots = num_slots
        self.interval = max(1, interval_blocks)
        # hash → (snap_slot, covered_tokens); ordered for LRU replacement
        self.index: "OrderedDict[int, Tuple[int, int]]" = OrderedDict()
        self._free: List[int] = list(range(num_slots - 1, -1, -1))
        # per-sequence incremental hash chain: seq_id → (covered, chain
        # hash) so each capture hashes only the NEW tokens since the last
        # one (a from-scratch rehash per capture is quadratic over a long
        # generation). LRU-bounded; entries drop when a seq finishes.
        self._chains: "OrderedDict[int, Tuple[int, int]]" = OrderedDict()
        self._max_chains = max(1024, 4 * num_slots)

    # -- capture -------------------------------------------------------------

    def after_step(self, batch) -> None:
        """Called by the engine after postprocess: capture any sequence
        whose state coverage landed exactly on a block boundary."""
        bs = self.block_size
        if batch.kind == "prefill":
            for seq in batch.seqs:
                # postprocess already advanced num_cached_tokens; the GDN
                # state covers exactly the prefilled tokens (prefill_done
                # additionally sampled one token, which is not forwarded)
                covered = (
                    seq.prefill_target if seq.prefill_done else seq.num_cached_tokens
                )
                if covered and covered % bs == 0:
                    self._maybe_snapshot(seq, covered)
        else:
            if batch.drafts is not None:
                # verify steps advance recurrent state for rejected draft
                # positions too — state does not match the token history
                return
            for seq in batch.seqs:
                if seq.is_finished:
                    self._chains.pop(seq.seq_id, None)
                    if batch.n_steps > 1:
                        # multi-step overshoot: a finished row's state
                        # covers discarded tokens; single-step finishes
                        # are exact
                        continue
                covered = seq.num_tokens - 1
                if (
                    covered > 0
                    and covered % bs == 0
                    and (covered // bs) % self.interval == 0
                ):
                    self._maybe_snapshot(seq, covered)

    def _chain_to(self, seq, covered: int) -> int:
        """Chained block hash at `covered` tokens (block-aligned),
        extending the sequence's cached chain incrementally — identical
        output to prefix_cache.block_hashes(...)[-1] but O(new tokens)."""
        bs = self.block_size
        c0, parent = self._chains.get(seq.seq_id, (0, ROOT_HASH))
        if c0 > covered or c0 % bs:
            c0, parent = 0, ROOT_HASH  # chain ahead of a re-prefill: redo
        ids = seq.all_token_ids()
        seed = seq.image_seed
        for b in range(c0 // bs, covered // bs):
            blk = ids[b * bs : (b + 1) * bs]
            parent = _hash_block(
                parent, blk, seed if (seed is not None and b == 0) else None
            )
        self._chains[seq.seq_id] = (covered, parent)
        self._chains.move_to_end(seq.seq_id)
        while len(self._chains) > self._max_chains:
            self._chains.popitem(last=False)
        return parent

    def _maybe_snapshot(self, seq, covered: int) -> None:
        slot = getattr(seq, "mamba_slot", None)
        if slot is None:
            return
        if covered < self.block_size:
            return
        h = self._chain_to(seq, covered)
        if h in self.index:
            self.index.move_to_end(h)  # refresh LRU; content identical
            return
        snap = self._alloc_slot()
        if snap is None:
            return
        self.runner.snapshot_mamba_slot(slot, snap, self.num_slots)
        self.index[h] = (snap, covered)

    def _alloc_slot(self) -> Optional[int]:
        if self._free:
            return self._free.pop()
        if not self.index:
            return None
        _, (snap, _) = self.index.popitem(last=False)  # LRU
        return snap

    # -- restore (BlockManager.allocate_prompt hook) ---------------------------

    def trim_hook(self, seq, matched_hashes: List[int]) -> int:
        """Given the hash chain of the KV blocks a new prompt matched,
        return how many leading blocks are actually usable (the deepest
        snapshotted boundary) and restore that snapshot's state into the
        sequence's mamba slot. With no snapshot, no cached block is usable
        (the recurrent state for those tokens does not exist) — the slot is
        reset instead, which also covers preemption-by-recomputation reuse
        of a stale slot."""
        slot = getattr(seq, "mamba_slot", None)
        for i in range(len(matched_hashes) - 1, -1, -1):
            entry = self.index.get(matched_hashes[i])
            if entry is not None:
                snap, covered = entry
                assert covered == (i + 1) * self.block_size
                self.index.move_to_end(matched_hashes[i])
                if slot is not None:
                    self.runner.restore_mamba_slot(slot, snap)
                # seed the incremental chain so the first capture after a
                # restore also hashes only the new tokens
                self._chains[seq.seq_id] = (covered, matched_hashes[i])
                return i + 1
        if slot is not None:
            self.runner.reset_mamba_slot(slot)
        self._chains.pop(seq.seq_id, None)
        return 0

    # -- invalidation ----------------------------------------------------------

    def on_evict_hash(self, h: int) -> None:
        entry = self.index.pop(h, None)
        if entry is not None:
            self._free.append(entry[0])
