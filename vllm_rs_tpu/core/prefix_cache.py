"""Hash-chained prefix cache over KV blocks.

Behavioral transcription of the reference's `src/core/prefix_cache.rs`:
- block hash = H(parent_hash, block_tokens) chaining (prefix_cache.rs:343-348)
- optional image seed mixed into the first block covering an image
  (prefix_cache.rs:350-355)
- longest-prefix match (prefix_cache.rs:72-117)
- insert a finished sequence's full blocks (prefix_cache.rs:178-259)
- leaf-first LRU eviction (prefix_cache.rs:261-336)

Entirely host-side: it only deals in logical block ids; the device KV pool
never moves.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

ROOT_HASH = 0


_FNV_OFFSET = 1469598103934665603
_FNV_PRIME = 1099511628211
_M64 = (1 << 64) - 1


def _hash_block(parent_hash: int, tokens: Sequence[int], seed: Optional[int] = None) -> int:
    """Chained 64-bit FNV-1a of one block's tokens under its parent.

    Byte-for-byte identical to the native hash_token_blocks
    (csrc/gguf_dequant.cpp) so native and Python paths interoperate: parent
    hash as 8 LE bytes, then each token as 4 LE bytes; an image seed (VL
    prompts, block_manager.rs:146-177) is mixed as 8 extra LE bytes.
    """
    parent = parent_hash if parent_hash else _FNV_OFFSET
    h = _FNV_OFFSET
    for i in range(8):
        h ^= (parent >> (8 * i)) & 0xFF
        h = (h * _FNV_PRIME) & _M64
    for t in tokens:
        v = int(t) & 0xFFFFFFFF
        for i in range(4):
            h ^= (v >> (8 * i)) & 0xFF
            h = (h * _FNV_PRIME) & _M64
    if seed is not None:
        s = int(seed) & _M64
        for i in range(8):
            h ^= (s >> (8 * i)) & 0xFF
            h = (h * _FNV_PRIME) & _M64
    return h or 1  # avoid colliding with ROOT_HASH


class _Entry:
    __slots__ = ("hash", "parent", "block_id", "children", "access_id")

    def __init__(self, h: int, parent: int, block_id: int, access_id: int):
        self.hash = h
        self.parent = parent
        self.block_id = block_id
        self.children = 0
        self.access_id = access_id


class PrefixCache:
    """Trie of cached blocks keyed by chained hash.

    The cache holds a ref-count on every cached block (the BlockManager sees
    these as `ref_count >= 1` blocks that are not free but reclaimable).
    """

    def __init__(self, block_size: int, enabled: bool = True):
        self.block_size = block_size
        self.enabled = enabled
        self._entries: Dict[int, _Entry] = {}
        self._by_block: Dict[int, int] = {}  # block_id -> hash
        self._access_counter = 0
        # eviction listener (hash) — hybrid snapshot pools drop their
        # snapshot for an evicted block eagerly (core/hybrid_state.py)
        self.on_evict = None

    def __len__(self) -> int:
        return len(self._entries)

    @property
    def num_cached_blocks(self) -> int:
        return len(self._entries)

    # -- hashing -----------------------------------------------------------

    def block_hashes(
        self, token_ids: Sequence[int], image_seed: Optional[int] = None,
        image_first_block: int = 0,
    ) -> List[int]:
        """Chained hashes for every *full* block of token_ids."""
        n_full = len(token_ids) // self.block_size
        if image_seed is None and n_full >= 4:
            # native chained FNV-1a (csrc/gguf_dequant.cpp hash_token_blocks)
            from vllm_rs_tpu.native import native_hash_blocks

            import numpy as np

            out = native_hash_blocks(
                np.asarray(token_ids[: n_full * self.block_size], dtype=np.int32),
                self.block_size,
            )
            if out is not None:
                return [int(h) or 1 for h in out]
        hashes = []
        parent = ROOT_HASH
        for b in range(n_full):
            blk = token_ids[b * self.block_size : (b + 1) * self.block_size]
            seed = image_seed if (image_seed is not None and b == image_first_block) else None
            parent = _hash_block(parent, blk, seed)
            hashes.append(parent)
        return hashes

    # -- queries -----------------------------------------------------------

    def match_prefix(
        self, token_ids: Sequence[int], image_seed: Optional[int] = None,
        image_first_block: int = 0,
    ) -> List[int]:
        """Longest cached prefix → list of block ids (reference :72-117).

        Updates LRU access ids on the matched chain. The caller must bump
        ref-counts on the returned blocks.
        """
        if not self.enabled:
            return []
        return self.match_hashes(
            self.block_hashes(token_ids, image_seed, image_first_block)
        )

    def match_hashes(self, hashes: Sequence[int]) -> List[int]:
        """Longest cached prefix over a precomputed hash chain → block ids."""
        if not self.enabled:
            return []
        matched: List[int] = []
        self._access_counter += 1
        for h in hashes:
            e = self._entries.get(h)
            if e is None:
                break
            e.access_id = self._access_counter
            matched.append(e.block_id)
        return matched

    def contains_block(self, block_id: int) -> bool:
        return block_id in self._by_block

    # -- insertion ---------------------------------------------------------

    def insert(
        self,
        token_ids: Sequence[int],
        block_table: Sequence[int],
        image_seed: Optional[int] = None,
        image_first_block: int = 0,
    ) -> List[int]:
        """Cache a finished/evicted sequence's full blocks (reference :178-259).

        Returns the block ids *newly* retained by the cache (caller keeps a
        ref for each). Blocks already cached under the same hash are skipped;
        if the same content exists under a different block id we keep the
        existing entry (the caller's copy stays unshared and will be freed
        with the sequence).
        """
        if not self.enabled:
            return []
        retained: List[int] = []
        self._access_counter += 1
        hashes = self.block_hashes(token_ids, image_seed, image_first_block)
        parent = ROOT_HASH
        for h, block_id in zip(hashes, block_table):
            e = self._entries.get(h)
            if e is None:
                e = _Entry(h, parent, block_id, self._access_counter)
                self._entries[h] = e
                self._by_block[block_id] = h
                pe = self._entries.get(parent)
                if pe is not None:
                    pe.children += 1
                retained.append(block_id)
            else:
                e.access_id = self._access_counter
            parent = h
        return retained

    # -- eviction ----------------------------------------------------------

    def evict(self, num_blocks: int) -> List[int]:
        """Evict up to num_blocks leaf entries, LRU-first (reference :261-336).

        Returns the freed block ids (caller drops its cache ref for each).
        Only leaves are evictable so the trie never dangles; evicting a leaf
        may expose its parent as the next candidate within the same call.
        """
        freed: List[int] = []
        if not self._entries:
            return freed
        while len(freed) < num_blocks and self._entries:
            # leaf = entry with no children
            leaf = None
            for e in self._entries.values():
                if e.children == 0 and (leaf is None or e.access_id < leaf.access_id):
                    leaf = e
            if leaf is None:  # pragma: no cover — cycle impossible in a trie
                break
            del self._entries[leaf.hash]
            del self._by_block[leaf.block_id]
            pe = self._entries.get(leaf.parent)
            if pe is not None:
                pe.children -= 1
            freed.append(leaf.block_id)
            if self.on_evict is not None:
                self.on_evict(leaf.hash)
        return freed

    def evict_blocks(self, block_ids: Sequence[int]) -> List[int]:
        """Force-evict specific blocks and all their descendants."""
        freed: List[int] = []
        targets = set(block_ids)
        # repeatedly remove leaves in target set or descendants of removed
        changed = True
        doomed_hashes = {self._by_block[b] for b in targets if b in self._by_block}
        # collect descendants
        while changed:
            changed = False
            for e in list(self._entries.values()):
                if e.parent in doomed_hashes and e.hash not in doomed_hashes:
                    doomed_hashes.add(e.hash)
                    changed = True
        for h in doomed_hashes:
            e = self._entries.pop(h, None)
            if e is None:
                continue
            del self._by_block[e.block_id]
            pe = self._entries.get(e.parent)
            if pe is not None:
                pe.children -= 1
            freed.append(e.block_id)
            if self.on_evict is not None:
                self.on_evict(h)
        return freed

    def clear(self) -> List[int]:
        freed = list(self._by_block.keys())
        if self.on_evict is not None:
            for h in list(self._entries):
                self.on_evict(h)
        self._entries.clear()
        self._by_block.clear()
        return freed
