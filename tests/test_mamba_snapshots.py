"""Mamba prefix snapshots (core/hybrid_state.py): hybrids get prefix
caching — recurrent state is captured at block-boundary token counts and
restored on prefix hits, bit-identically (reference
block_manager.rs:444-550, core/runner.rs:676-741)."""

import jax

from vllm_rs_tpu.config import (
    CacheConfig,
    EngineConfig,
    ModelConfig,
    SamplingParams,
    SchedulerConfig,
)


def _hybrid_engine(chunk=8, snapshot_slots=16, interval=1, multi_step=1):
    from vllm_rs_tpu.core.engine import LLMEngine
    from vllm_rs_tpu.core.runner import ModelRunner
    from vllm_rs_tpu.models.qwen3_next import Qwen3NextForCausalLM

    cfg = ModelConfig(
        model_type="qwen3_next",
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=4,
        num_attention_heads=4,
        num_key_value_heads=2,
        vocab_size=128,
        qk_norm=True,
        eos_token_ids=(0,),
        extra=(
            ("linear_num_key_heads", 2),
            ("linear_num_value_heads", 4),
            ("linear_key_head_dim", 8),
            ("linear_value_head_dim", 8),
            ("linear_conv_kernel_dim", 4),
            ("full_attention_interval", 4),
        ),
    )
    ec = EngineConfig(
        model=cfg,
        cache=CacheConfig(
            block_size=4, num_blocks=64, mamba_slots=8,
            mamba_snapshot_slots=snapshot_slots,
            mamba_snapshot_interval_blocks=interval,
        ),
        scheduler=SchedulerConfig(
            max_num_seqs=4, chunk_size=chunk, max_model_len=128,
            prefill_buckets=(8, 16, 32), multi_step_decode=multi_step,
        ),
        prefill_buckets=(8, 16, 32),
        decode_buckets=(4,),
    )
    m = Qwen3NextForCausalLM(cfg, block_size=4)
    params = m.init_params(jax.random.PRNGKey(0))
    return LLMEngine(ec, ModelRunner(m, params, ec))


SP = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)


class TestPrefillSnapshots:
    def test_multiturn_cached_and_bitexact(self):
        """Turn 2 extends turn 1's conversation: cached_tokens > 0 and the
        output is bit-identical to a cold engine prefilling everything."""
        engine = _hybrid_engine(chunk=8)
        prompt1 = list(range(2, 26))  # 24 tokens: chunks 8/8/8, all aligned
        out1 = engine.generate([prompt1], SP)[0]
        assert out1.cached_tokens == 0
        prompt2 = prompt1 + out1.output_token_ids + [29, 30]
        out2 = engine.generate([prompt2], SP)[0]
        # prefill snapshots landed at 8, 16 and 24 tokens and decode
        # boundaries (interval=1) at 28; turn 1's conversation (30 tokens)
        # has 7 full cached blocks → the deepest snapshot is 28
        assert out2.cached_tokens == 28
        cold = _hybrid_engine(chunk=8).generate([prompt2], SP)[0]
        assert out2.output_token_ids == cold.output_token_ids

    def test_snapshots_disabled(self):
        """mamba_snapshot_slots=0 reverts to prefix-cache-off hybrids."""
        engine = _hybrid_engine(snapshot_slots=0)
        prompt1 = list(range(2, 26))
        out1 = engine.generate([prompt1], SP)[0]
        prompt2 = prompt1 + out1.output_token_ids + [29, 30]
        out2 = engine.generate([prompt2], SP)[0]
        assert out2.cached_tokens == 0
        cold = _hybrid_engine(snapshot_slots=0).generate([prompt2], SP)[0]
        assert out2.output_token_ids == cold.output_token_ids

    def test_shared_prompt_prefix(self):
        """A second request with the same long prompt + different tail hits
        the prefill-time snapshots even while no decode happened at an
        aligned boundary."""
        engine = _hybrid_engine(chunk=8)
        base = list(range(40, 64))  # 24 tokens
        engine.generate([base + [1, 2, 3]], SP)
        out = engine.generate([base + [4, 5, 6]], SP)[0]
        assert out.cached_tokens == 24
        cold = _hybrid_engine(chunk=8).generate([base + [4, 5, 6]], SP)[0]
        assert out.output_token_ids == cold.output_token_ids


class TestDecodeSnapshots:
    def test_decode_boundary_capture(self):
        """Decode steps landing exactly on block boundaries snapshot too:
        state computed token-by-token restores bit-identically against a
        cold chunked prefill of the same tokens."""
        engine = _hybrid_engine(chunk=8, interval=1)
        prompt1 = list(range(2, 12))  # 10 tokens
        sp = SamplingParams(temperature=0.0, max_tokens=7, ignore_eos=True)
        out1 = engine.generate([prompt1], sp)[0]
        # decode covered counts 10..16 → boundaries at 12 and 16
        convo = prompt1 + out1.output_token_ids  # 17 tokens
        prompt2 = convo + [29, 30]
        out2 = engine.generate([prompt2], sp)[0]
        assert out2.cached_tokens == 16
        cold = _hybrid_engine(chunk=8, interval=1).generate([prompt2], sp)[0]
        assert out2.output_token_ids == cold.output_token_ids

    def test_multistep_decode_alignment(self):
        """Multi-step decode (k=4, block 4): boundaries are only captured
        when a step lands exactly on one; output stays bit-exact."""
        engine = _hybrid_engine(chunk=8, interval=1, multi_step=4)
        prompt1 = list(range(2, 14))  # 12 tokens
        sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
        out1 = engine.generate([prompt1], sp)[0]
        convo = prompt1 + out1.output_token_ids
        prompt2 = convo + [29, 30]
        out2 = engine.generate([prompt2], sp)[0]
        cold = _hybrid_engine(chunk=8, interval=1).generate([prompt2], sp)[0]
        assert out2.output_token_ids == cold.output_token_ids
        assert out2.cached_tokens > 0  # 12 and 16 both land (12+4k)


class TestPoolHygiene:
    def test_lru_capacity(self):
        """The pool never exceeds its capacity; old snapshots are replaced."""
        engine = _hybrid_engine(chunk=8, snapshot_slots=2)
        for i in range(5):
            engine.generate([[i + 1] * 12], SP)
        pool = engine._mamba_pool
        assert len(pool.index) <= 2
        assert len(pool._free) + len(pool.index) == 2

    def test_eviction_frees_slots(self):
        engine = _hybrid_engine(chunk=8)
        engine.generate([list(range(2, 26))], SP)
        pool = engine._mamba_pool
        held = len(pool.index)
        assert held > 0
        engine.block_manager.reset()  # clears the prefix cache → on_evict
        assert len(pool.index) == 0
        assert len(pool._free) == pool.num_slots
        engine.block_manager.check_invariants()

    def test_slot_reuse_still_isolated(self):
        """Restores and resets keep slots isolated across many requests."""
        engine = _hybrid_engine(chunk=8)
        sp = SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True)
        solo = _hybrid_engine(chunk=8).generate([[5, 6, 7]], sp)[0]
        for _ in range(10):
            outs = engine.generate([[5, 6, 7], [20, 21, 22]], [sp, sp])
            assert outs[0].output_token_ids == solo.output_token_ids


class TestIncrementalChain:
    def test_chain_matches_block_hashes(self):
        """_chain_to hashes only the new tokens but must produce exactly
        prefix_cache.block_hashes(tokens[:covered])[-1], including across
        incremental extensions and image seeds."""
        engine = _hybrid_engine(chunk=8)
        pool = engine._mamba_pool
        pc = engine.block_manager.prefix_cache

        class FakeSeq:
            seq_id = 9001
            image_seed = None

            def __init__(self, ids):
                self._ids = ids

            def all_token_ids(self):
                return self._ids

        ids = list(range(2, 66))  # 64 tokens, block_size 4
        seq = FakeSeq(ids)
        for covered in (4, 12, 24, 64):
            got = pool._chain_to(seq, covered)
            want = pc.block_hashes(ids[:covered])[-1]
            assert got == want, covered
        # image-seeded prompts mix the seed into block 0
        seq2 = FakeSeq(ids)
        seq2.seq_id = 9002
        seq2.image_seed = 0xDEADBEEF
        for covered in (4, 16):
            got = pool._chain_to(seq2, covered)
            want = pc.block_hashes(ids[:covered], 0xDEADBEEF)[-1]
            assert got == want, covered
        # a shrink (preemption re-prefill) resets and stays correct
        got = pool._chain_to(seq, 8)
        assert got == pc.block_hashes(ids[:8])[-1]

    def test_chain_index_bounded(self):
        engine = _hybrid_engine(chunk=8)
        pool = engine._mamba_pool
        pool._max_chains = 8

        class FakeSeq:
            image_seed = None

            def __init__(self, sid):
                self.seq_id = sid

            def all_token_ids(self):
                return list(range(2, 10))

        for sid in range(32):
            pool._chain_to(FakeSeq(sid), 8)
        assert len(pool._chains) <= 8
