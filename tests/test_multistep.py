"""On-device multi-step decode: equivalence with single-step."""

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


def _engine(multi_step=1):
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
            max_num_seqs=4, chunk_size=16, max_model_len=64,
            prefill_buckets=(8, 16), multi_step_decode=multi_step,
        ),
        prefill_buckets=(8, 16),
        decode_buckets=(4,),
    )
    m = CausalLM(cfg, block_size=4)
    params = m.init_params(jax.random.PRNGKey(0))
    return LLMEngine(ec, ModelRunner(m, params, ec))


class TestMultiStep:
    def test_greedy_equivalence(self):
        sp = SamplingParams(temperature=0.0, max_tokens=13, ignore_eos=True)
        prompt = [5, 6, 7, 8, 9]
        o1 = _engine(1).generate([prompt], sp)
        o4 = _engine(4).generate([prompt], sp)
        assert o1[0].output_token_ids == o4[0].output_token_ids
        assert len(o4[0].output_token_ids) == 13

    def test_sampled_seeded_equivalence(self):
        """Per-row PRNG keyed on (seed, out_len) makes multi-step sampling
        bit-identical to single-step."""
        sp = SamplingParams(temperature=0.8, seed=7, top_k=20, max_tokens=10, ignore_eos=True)
        prompt = [3, 4, 5]
        o1 = _engine(1).generate([prompt], sp)
        o4 = _engine(4).generate([prompt], sp)
        assert o1[0].output_token_ids == o4[0].output_token_ids

    def test_penalties_equivalence(self):
        sp = SamplingParams(
            temperature=0.0, max_tokens=12, ignore_eos=True,
            repetition_penalty=1.3, frequency_penalty=0.2,
        )
        prompt = [9, 10, 11]
        o1 = _engine(1).generate([prompt], sp)
        o4 = _engine(4).generate([prompt], sp)
        assert o1[0].output_token_ids == o4[0].output_token_ids

    def test_batch_mixed_lengths(self):
        sp_a = SamplingParams(temperature=0.0, max_tokens=9, ignore_eos=True)
        sp_b = SamplingParams(temperature=0.0, max_tokens=5, ignore_eos=True)
        e = _engine(4)
        outs = e.generate([[5, 6, 7], [20, 21, 22, 23]], [sp_a, sp_b])
        assert len(outs[0].output_token_ids) == 9
        assert len(outs[1].output_token_ids) == 5

    def test_eos_mid_multistep_discards_tail(self):
        """A sequence hitting EOS inside a multi-step window stops there."""
        e = _engine(4)
        sp = SamplingParams(temperature=0.0, max_tokens=16)  # eos 0 honored
        outs = e.generate([[5, 6, 7]], sp)
        toks = outs[0].output_token_ids
        assert 0 not in toks[:-1]  # nothing after an EOS
