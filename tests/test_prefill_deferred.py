"""Fresh-prefill deferred path: in-window attention + one post-scan
block-granularity KV scatter (models/llama.py fresh_prefill branch).

The classic write-in-scan prefill pays a per-layer pool-slice copy +
write-back, measured at 55% of the prefill step at the batch-256 marquee
shape (lab06b no_prefill_write, PERF_NOTES r5). The deferred path must be
a pure optimization: on the CPU reference backend both paths compute the
same f32 attention over the same key set, so outputs are BIT-identical.
"""

import jax
import numpy as np
import pytest

from vllm_rs_tpu.config import (
    CacheConfig,
    EngineConfig,
    ModelConfig,
    SamplingParams,
    SchedulerConfig,
)
from vllm_rs_tpu.core.engine import LLMEngine
from vllm_rs_tpu.core.runner import ModelRunner
from vllm_rs_tpu.models.llama import CausalLM


def _engine(model_kw=None, sched_kw=None, cache_kw=None):
    cfg = ModelConfig(
        model_type="qwen3",
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        vocab_size=256,
        qk_norm=True,
        eos_token_ids=(0,),
        **(model_kw or {}),
    )
    ec = EngineConfig(
        model=cfg,
        cache=CacheConfig(block_size=4, num_blocks=64, **(cache_kw or {})),
        scheduler=SchedulerConfig(
            max_num_seqs=4, chunk_size=16, max_model_len=128,
            prefill_buckets=(8, 16), **(sched_kw or {}),
        ),
        prefill_buckets=(8, 16),
        decode_buckets=(4,),
    )
    m = CausalLM(cfg, block_size=4)
    params = m.init_params(jax.random.PRNGKey(0))
    return LLMEngine(ec, ModelRunner(m, params, ec))


def _gen(engine, prompts, max_tokens=6):
    sp = SamplingParams(temperature=0.0, max_tokens=max_tokens, ignore_eos=True)
    return [
        o.output_token_ids for o in engine.generate(list(prompts), sp)
    ]


PROMPTS = [list(np.random.RandomState(i).randint(1, 255, size=n))
           for i, n in ((0, 9), (1, 13), (2, 7))]


def test_fresh_deferred_matches_classic(monkeypatch):
    got = _gen(_engine(), PROMPTS)
    monkeypatch.setenv("VLLM_RS_TPU_PREFILL_DEFERRED", "0")
    ref = _gen(_engine(), PROMPTS)
    assert got == ref


def test_fresh_deferred_sliding_window(monkeypatch):
    kw = {"model_kw": {"sliding_window": 6}}
    got = _gen(_engine(**kw), PROMPTS)
    monkeypatch.setenv("VLLM_RS_TPU_PREFILL_DEFERRED", "0")
    ref = _gen(_engine(**kw), PROMPTS)
    assert got == ref


def test_chunked_long_prompt_mixes_paths(monkeypatch):
    """A prompt longer than chunk_size: chunk 1 is fresh (deferred), later
    chunks have cached context (classic) — the mix must equal the all-
    classic run token-for-token."""
    long_prompt = list(np.random.RandomState(7).randint(1, 255, size=40))
    got = _gen(_engine(), [long_prompt])
    monkeypatch.setenv("VLLM_RS_TPU_PREFILL_DEFERRED", "0")
    ref = _gen(_engine(), [long_prompt])
    assert got == ref


def test_prefix_hit_second_run_consistent():
    """Run 1 prefills fresh (deferred); run 2 hits the prefix cache and
    prefills the tail classically — same tokens either way (the CPU
    reference computes identical f32 attention in both paths)."""
    engine = _engine()
    prompt = list(np.random.RandomState(3).randint(1, 255, size=17))
    out1 = _gen(engine, [prompt])
    out2 = _gen(engine, [prompt])
    assert out1 == out2


def test_fp8_pool_layer0_contents_identical(monkeypatch):
    """fp8 KV pool: LAYER 0's stored fp8 rows must be bit-identical
    between the paths (they depend only on the embeddings — the scatter
    casts the same bf16 rows to the same fp8 bits). Deeper layers may
    differ in low bits by design: the deferred path ATTENDS over the
    fresh bf16 K/V while classic attends over the fp8-stored values (the
    decode self-column philosophy — fresh tokens attend at full
    precision), and that difference propagates through the residual."""

    def layer0_after_prefill():
        eng = _engine(cache_kw={"kv_dtype": "float8_e4m3fn"})
        sp = SamplingParams(temperature=0.0, max_tokens=1, ignore_eos=True)
        eng.add_request(list(PROMPTS[0]), sp)
        eng.step()  # one prefill step
        return np.asarray(
            jax.lax.bitcast_convert_type(eng.runner.kv[0], jax.numpy.uint8)
        )

    got = layer0_after_prefill()
    monkeypatch.setenv("VLLM_RS_TPU_PREFILL_DEFERRED", "0")
    ref = layer0_after_prefill()
    assert np.array_equal(got, ref)


def test_unaligned_chunks_use_rowwise_scatter(monkeypatch):
    """block_write_idx is None when the tier does not cover whole blocks
    (T % block_size != 0 — here tier 8 with block_size 16): the deferred
    path must fall back to the per-token scatter and still match."""
    cfg = ModelConfig(
        model_type="qwen3", hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        vocab_size=256, qk_norm=True, eos_token_ids=(0,),
    )
    ec = EngineConfig(
        model=cfg,
        cache=CacheConfig(block_size=16, num_blocks=16),
        scheduler=SchedulerConfig(
            max_num_seqs=4, chunk_size=16, max_model_len=128,
            prefill_buckets=(8, 16),
        ),
        prefill_buckets=(8, 16),
        decode_buckets=(4,),
    )
    m = CausalLM(cfg, block_size=16)
    params = m.init_params(jax.random.PRNGKey(0))
    e1 = LLMEngine(ec, ModelRunner(m, params, ec))
    got = _gen(e1, PROMPTS[:1])
    monkeypatch.setenv("VLLM_RS_TPU_PREFILL_DEFERRED", "0")
    e2 = LLMEngine(ec, ModelRunner(m, params, ec))
    ref = _gen(e2, PROMPTS[:1])
    assert got == ref
