"""Block-granular prefill KV writes (ops/kv_cache.write_kv_layer).

Parity vs the per-row path for aligned chunks, tail-garbage safety, the
runner's host-side alignment detection, and end-to-end generation
equality between aligned (block path) and unaligned (row fallback)
chunkings.
"""

import jax
import jax.numpy as jnp
import numpy as np

from vllm_rs_tpu.ops.kv_cache import write_kv_layer

BS = 4  # block size


def _mk(B=3, T=8, Hk=2, D=4, nb=16, seed=0):
    rs = np.random.RandomState(seed)
    S = nb * BS
    kv = jnp.asarray(rs.randn(2, S, Hk * D), jnp.bfloat16)
    k = jnp.asarray(rs.randn(B, T, Hk, D), jnp.bfloat16)
    v = jnp.asarray(rs.randn(B, T, Hk, D), jnp.bfloat16)
    return kv, k, v, S


def test_block_write_matches_row_write_on_valid_rows():
    kv, k, v, S = _mk()
    B, T = 3, 8
    # seq0: full 8 tokens at blocks 2,3; seq1: 5 tokens at block 5(+tail
    # into 6); seq2: all padding
    slots = np.full((B, T), S, np.int32)
    slots[0] = np.arange(2 * BS, 2 * BS + 8)
    slots[1, :5] = np.arange(5 * BS, 5 * BS + 5)
    bw = np.full((B, T // BS), S // BS, np.int32)
    bw[0] = [2, 3]
    bw[1] = [5, 6]
    sl = jnp.asarray(slots)
    want = write_kv_layer(kv, k, v, sl)
    got = write_kv_layer(kv, k, v, sl, block_write_idx=jnp.asarray(bw))
    wantn, gotn = np.asarray(want), np.asarray(got)
    # every VALID slot matches the row path
    for b in range(B):
        for t in range(T):
            s = slots[b, t]
            if s < S:
                np.testing.assert_array_equal(gotn[:, s], wantn[:, s])
    # tail garbage lands ONLY inside covered blocks (here block 6 rows 1-3
    # and block 6 row 0 is the chunk tail); everything outside covered
    # blocks is untouched
    covered = {2, 3, 5, 6}
    for blk in range(S // BS):
        if blk in covered:
            continue
        np.testing.assert_array_equal(
            gotn[:, blk * BS : (blk + 1) * BS],
            np.asarray(kv)[:, blk * BS : (blk + 1) * BS],
        )


def _engine(chunk_size):
    from vllm_rs_tpu.config import (
        CacheConfig, EngineConfig, ModelConfig, SchedulerConfig,
    )
    from vllm_rs_tpu.core.engine import LLMEngine
    from vllm_rs_tpu.core.runner import ModelRunner
    from vllm_rs_tpu.models.llama import CausalLM

    cfg = ModelConfig(
        model_type="llama", hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        vocab_size=256, eos_token_ids=(0,),
    )
    ec = EngineConfig(
        model=cfg,
        cache=CacheConfig(block_size=BS, num_blocks=128),
        scheduler=SchedulerConfig(max_num_seqs=4, chunk_size=chunk_size,
                                  max_model_len=256,
                                  prefill_buckets=(8, 16, 32)),
        prefill_buckets=(8, 16, 32), decode_buckets=(4,),
    )
    m = CausalLM(cfg, block_size=BS)
    params = m.init_params(jax.random.PRNGKey(0))
    return LLMEngine(ec, ModelRunner(m, params, ec))


def test_generation_identical_across_chunk_alignments():
    """chunk 16 (block-aligned mid-chunks → block writes) vs chunk 7
    (unaligned mid-chunks → per-row fallback) must generate identical
    tokens for a multi-chunk prompt."""
    from vllm_rs_tpu.config import SamplingParams

    prompt = list(range(2, 2 + 29))  # 29 tokens: several chunks either way
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    out_a = _engine(16).generate([prompt], sp)[0].output_token_ids
    out_b = _engine(7).generate([prompt], sp)[0].output_token_ids
    assert out_a == out_b


def test_runner_alignment_detection():
    from vllm_rs_tpu.config import SamplingParams
    from vllm_rs_tpu.core.scheduler import ScheduledBatch
    from vllm_rs_tpu.core.sequence import Sequence

    eng = _engine(16)
    sp = SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True)
    # aligned: fresh prompt starting at 0
    seq = Sequence(list(range(2, 18)), sp)
    assert eng.block_manager.allocate_prompt(seq)
    batch = ScheduledBatch(kind="prefill", seqs=[seq], chunk_sizes=[16])
    _, meta = eng.runner.prepare_prefill(batch)
    assert meta.block_write_idx is not None
    nb = eng.runner.num_slots // BS
    assert int(meta.block_write_idx[0, 0]) < nb

    # unaligned: chunk resumes mid-block
    seq2 = Sequence(list(range(2, 18)), sp)
    assert eng.block_manager.allocate_prompt(seq2)
    seq2.num_cached_tokens = 6  # not a block multiple
    batch2 = ScheduledBatch(kind="prefill", seqs=[seq2], chunk_sizes=[8])
    _, meta2 = eng.runner.prepare_prefill(batch2)
    assert meta2.block_write_idx is None
