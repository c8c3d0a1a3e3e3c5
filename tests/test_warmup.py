"""Startup warmup: bucket programs compile before serving, first real
request hits a warm executable (reference warmup_capture, runner.rs:1612 +
graph.rs:370-377 planned_graph_capture_batches)."""

import jax

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


def _engine(multi_step=1, spec_k=0):
    cfg = ModelConfig(
        model_type="llama",
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        vocab_size=128,
        eos_token_ids=(0,),
    )
    ec = EngineConfig(
        model=cfg,
        cache=CacheConfig(block_size=4, num_blocks=64),
        scheduler=SchedulerConfig(
            max_num_seqs=4, chunk_size=16, max_model_len=96,
            prefill_buckets=(8, 16), multi_step_decode=multi_step,
            spec_decode_k=spec_k,
        ),
        prefill_buckets=(8, 16),
        decode_buckets=(4,),
    )
    m = CausalLM(cfg, block_size=4)
    params = m.init_params(jax.random.PRNGKey(0))
    return LLMEngine(ec, ModelRunner(m, params, ec))


class TestWarmup:
    def test_decode_warmup_compiles_then_zero_recompiles(self):
        eng = _engine()
        r = eng.runner
        n = r.warmup(mode="decode")
        assert n > 0
        before = r.compile_cache_size()
        # a real short-context decode request must hit warm executables
        sp = SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True)
        eng.generate([[5, 6, 7]], sp)
        # (prefill compiles are expected — decode mode doesn't warm them;
        # count only decode-program growth via the step caches)
        assert r.compile_cache_size() - before <= 1  # the one prefill bucket

    def test_full_warmup_covers_prefill(self):
        eng = _engine()
        r = eng.runner
        r.warmup(mode="full")
        before = r.compile_cache_size()
        sp = SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True)
        eng.generate([[5, 6, 7]], sp)
        assert r.compile_cache_size() == before  # zero compiles after warmup

    def test_sampled_request_also_warm(self):
        eng = _engine()
        r = eng.runner
        r.warmup(mode="full")
        before = r.compile_cache_size()
        sp = SamplingParams(temperature=0.9, seed=1, max_tokens=4, ignore_eos=True)
        eng.generate([[5, 6, 7]], sp)
        assert r.compile_cache_size() == before

    def test_multi_step_and_verify_warm(self):
        eng = _engine(multi_step=4, spec_k=2)
        r = eng.runner
        r.warmup(mode="full", multi_step=4, spec_k=2)
        before = r.compile_cache_size()
        sp = SamplingParams(temperature=0.0, max_tokens=9, ignore_eos=True)
        eng.generate([[5, 6, 7, 5, 6]], sp)
        assert r.compile_cache_size() == before

    def test_none_mode_is_noop(self):
        eng = _engine()
        assert eng.runner.warmup(mode="none") == 0
        assert eng.runner.compile_cache_size() == 0
