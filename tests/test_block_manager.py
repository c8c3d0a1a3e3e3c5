"""BlockManager + PrefixCache behavior (reference block_manager.rs /
prefix_cache.rs inline tests, prefix_cache.rs:358-404)."""

import pytest

from vllm_rs_tpu.config import SamplingParams
from vllm_rs_tpu.core.block_manager import BlockManager
from vllm_rs_tpu.core.prefix_cache import PrefixCache
from vllm_rs_tpu.core.sequence import Sequence

BS = 4


def seq_of(tokens, **kw):
    return Sequence(list(tokens), SamplingParams(**kw))


def test_allocate_and_free():
    bm = BlockManager(num_blocks=16, block_size=BS)
    s = seq_of(range(10))  # 10 tokens → 3 blocks
    assert bm.allocate_prompt(s)
    assert len(s.block_table) == 3
    assert bm.num_free == 13
    assert s.num_cached_tokens == 0
    bm.free_seq(s, cache=False)
    assert bm.num_free == 16
    bm.check_invariants()


def test_append_slot_allocates_on_boundary():
    bm = BlockManager(num_blocks=16, block_size=BS)
    s = seq_of(range(4))  # exactly one block
    assert bm.allocate_prompt(s)
    assert len(s.block_table) == 1
    s.append_token(1)  # num_tokens=5 → needs 2 blocks
    assert bm.append_slot(s)
    assert len(s.block_table) == 2
    # next three appends stay within block 2
    for _ in range(3):
        s.append_token(1)
        assert bm.append_slot(s)
        assert len(s.block_table) == 2
    s.append_token(1)
    assert bm.append_slot(s)
    assert len(s.block_table) == 3


def test_prefix_cache_reuse():
    bm = BlockManager(num_blocks=32, block_size=BS)
    prompt = list(range(100, 100 + 12))  # 3 full blocks
    s1 = seq_of(prompt + [7])
    assert bm.allocate_prompt(s1)
    s1.append_token(1)
    bm.free_seq(s1, cache=True)  # 3 full blocks cached
    assert bm.prefix_cache.num_cached_blocks == 3

    s2 = seq_of(prompt + [9, 9])  # same 12-token prefix
    assert bm.allocate_prompt(s2)
    assert s2.num_cached_tokens == 12
    assert s2.block_table[:3] == s1.block_table[:3] or len(set(s2.block_table)) == len(s2.block_table)
    bm.free_seq(s2, cache=False)
    bm.check_invariants()


def test_never_full_prefix_hit():
    """At least one prompt token must be computed (reference guarantees a
    logit row for sampling)."""
    bm = BlockManager(num_blocks=32, block_size=BS)
    prompt = list(range(8))  # exactly 2 blocks
    s1 = seq_of(prompt)
    bm.allocate_prompt(s1)
    bm.free_seq(s1, cache=True)
    s2 = seq_of(prompt)  # identical prompt, aligned to block boundary
    bm.allocate_prompt(s2)
    assert s2.num_cached_tokens < s2.prompt_len
    assert s2.num_cached_tokens == 4  # one matched block dropped


def test_eviction_under_pressure():
    bm = BlockManager(num_blocks=8, block_size=BS)
    s1 = seq_of(range(16))  # 4 blocks
    assert bm.allocate_prompt(s1)
    bm.free_seq(s1, cache=True)  # 4 cached blocks, 4 free
    s2 = seq_of(range(200, 232))  # 8 blocks needed → must evict cache
    assert bm.allocate_prompt(s2)
    assert len(s2.block_table) == 8
    assert bm.prefix_cache.num_cached_blocks == 0
    bm.free_seq(s2, cache=False)
    bm.check_invariants()


def test_prefix_cache_lru_leaf_eviction():
    pc = PrefixCache(block_size=BS)
    a = list(range(8))
    b = list(range(8)) + [99, 98, 97, 96]
    pc.insert(a, [0, 1])
    pc.insert(b, [0, 1, 2])
    assert pc.num_cached_blocks == 3
    # block 2 is the only leaf of the longer chain; block 1 has a child
    freed = pc.evict(1)
    assert freed == [2]
    # now 1 is a leaf again
    freed = pc.evict(2)
    assert set(freed) == {0, 1}


def test_prefix_cache_image_seed_differentiates():
    pc = PrefixCache(block_size=BS)
    toks = list(range(8))
    pc.insert(toks, [0, 1], image_seed=111)
    assert pc.match_prefix(toks, image_seed=111) == [0, 1]
    assert pc.match_prefix(toks, image_seed=222) == []
    assert pc.match_prefix(toks) == []


def test_shared_block_refcounts():
    bm = BlockManager(num_blocks=16, block_size=BS)
    prompt = list(range(8)) + [5]
    s1 = seq_of(prompt)
    bm.allocate_prompt(s1)
    bm.free_seq(s1, cache=True)
    free_after_s1 = bm.num_free
    s2 = seq_of(prompt + [6])
    s3 = seq_of(prompt + [7])
    bm.allocate_prompt(s2)
    bm.allocate_prompt(s3)
    # both share the two cached prefix blocks
    assert s2.block_table[:2] == s3.block_table[:2]
    bm.free_seq(s2, cache=False)
    bm.free_seq(s3, cache=False)
    assert bm.num_free == free_after_s1
    bm.check_invariants()
