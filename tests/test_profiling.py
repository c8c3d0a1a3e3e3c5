"""Per-step timing surface + xprof capture hooks (utils/profiling.py)."""

import os

import jax

from vllm_rs_tpu.config import (
    CacheConfig,
    EngineConfig,
    ModelConfig,
    SamplingParams,
    SchedulerConfig,
)


def _engine():
    from vllm_rs_tpu.core.engine import LLMEngine
    from vllm_rs_tpu.core.runner import ModelRunner
    from vllm_rs_tpu.models.llama import CausalLM

    cfg = ModelConfig(
        model_type="llama", hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        vocab_size=128, eos_token_ids=(0,),
    )
    ec = EngineConfig(
        model=cfg,
        cache=CacheConfig(block_size=4, num_blocks=64),
        scheduler=SchedulerConfig(
            max_num_seqs=4, chunk_size=16, max_model_len=64,
            prefill_buckets=(8, 16),
        ),
        prefill_buckets=(8, 16),
        decode_buckets=(4,),
    )
    m = CausalLM(cfg, block_size=4)
    params = m.init_params(jax.random.PRNGKey(0))
    return LLMEngine(ec, ModelRunner(m, params, ec))


class TestStepTimings:
    def test_usage_stats_has_timings(self):
        engine = _engine()
        engine.generate(
            [[3, 4, 5, 6, 7]],
            SamplingParams(temperature=0.0, max_tokens=5, ignore_eos=True),
        )
        stats = engine.usage_stats()
        st = stats["step_timings"]
        assert st["prefill"]["steps"] >= 1
        assert st["decode"]["steps"] >= 1
        assert st["decode"]["p50_ms"] > 0
        assert st["decode"]["tokens_per_s"] > 0


class TestStepProfiler:
    def test_bounded_capture(self, tmp_path):
        from vllm_rs_tpu.utils.profiling import StepProfiler

        engine = _engine()
        prof = StepProfiler(str(tmp_path / "trace"), max_steps=2)
        engine.profiler = prof
        assert prof.start()
        assert not prof.start()  # already active
        engine.generate(
            [[3, 4, 5, 6, 7]],
            SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True),
        )
        # >= 3 steps ran (1 prefill + 6 decodes) → auto-stopped after 2
        assert not prof.active
        assert not prof.stop()  # idempotent
        # a trace actually landed on disk
        assert any(os.scandir(str(tmp_path / "trace")))
