"""Per-layer sliding-window (gemma3 pattern) tests."""

import dataclasses

import jax
import numpy as np

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


def _engine(layer_windows=(), sliding_window=0):
    cfg = ModelConfig(
        model_type="gemma3" if layer_windows else "llama",
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        vocab_size=128,
        sliding_window=sliding_window,
        layer_windows=layer_windows,
        norm_plus_one=bool(layer_windows),
        embed_scale=8.0 if layer_windows else 1.0,
        eos_token_ids=(0,),
    )
    ec = EngineConfig(
        model=cfg,
        cache=CacheConfig(block_size=4, num_blocks=64),
        scheduler=SchedulerConfig(
            max_num_seqs=4, chunk_size=32, max_model_len=64, prefill_buckets=(8, 32)
        ),
        prefill_buckets=(8, 32),
        decode_buckets=(4,),
    )
    m = CausalLM(cfg, block_size=4)
    params = m.init_params(jax.random.PRNGKey(0))
    return LLMEngine(ec, ModelRunner(m, params, ec))


class TestLayerTypesConfig:
    def test_pattern_derivation(self):
        cfg = ModelConfig.from_hf_dict(
            {
                "model_type": "gemma3",
                "num_hidden_layers": 6,
                "sliding_window": 512,
                "sliding_window_pattern": 3,
            }
        )
        assert cfg.layer_windows == (512, 512, 0, 512, 512, 0)

    def test_layer_types_list(self):
        cfg = ModelConfig.from_hf_dict(
            {
                "model_type": "gemma3",
                "num_hidden_layers": 2,
                "sliding_window": 128,
                "layer_types": ["sliding_attention", "full_attention"],
            }
        )
        assert cfg.layer_windows == (128, 0)


class TestSlidingGeneration:
    def test_mixed_layers_generate(self):
        engine = _engine(layer_windows=(4, 0))
        outs = engine.generate(
            [list(range(2, 22))],
            SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True),
        )
        assert len(outs[0].output_token_ids) == 6

    def test_window_changes_output(self):
        """Tight per-layer windows must change logits on long contexts."""
        sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
        prompt = list(range(2, 30))
        o_global = _engine(layer_windows=(0, 0)).generate([prompt], sp)
        o_window = _engine(layer_windows=(4, 4)).generate([prompt], sp)
        assert (
            o_global[0].output_token_ids != o_window[0].output_token_ids
        ), "a 4-token window on a 28-token context should alter greedy output"

    def test_huge_window_equals_global(self):
        sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
        prompt = list(range(2, 20))
        o_global = _engine(layer_windows=(0, 0)).generate([prompt], sp)
        o_window = _engine(layer_windows=(64, 64)).generate([prompt], sp)
        assert o_global[0].output_token_ids == o_window[0].output_token_ids
