"""Prompt-lookup speculative decoding: proposal + exact greedy equivalence."""

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
from vllm_rs_tpu.utils.spec import propose_prompt_lookup


class TestProposer:
    def test_ngram_hit(self):
        # "1 2 3" appeared before; tail "2 3" → draft what followed: 4 5
        toks = [1, 2, 3, 4, 5, 9, 9, 2, 3]
        assert propose_prompt_lookup(toks, 2) == [4, 5]

    def test_no_hit(self):
        assert propose_prompt_lookup([1, 2, 3, 4], 4) == []

    def test_k_clamp(self):
        toks = [1, 2, 3, 4, 5, 1, 2]
        assert propose_prompt_lookup(toks, 10) == [3, 4, 5, 1, 2]

    def test_most_recent_match_wins(self):
        toks = [5, 1, 5, 2, 5]
        # tail "5": most recent earlier occurrence at index 2 → follows 2
        assert propose_prompt_lookup(toks, 1) == [2]


def _engine(spec_k=0):
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
            prefill_buckets=(8, 16), spec_decode_k=spec_k,
        ),
        prefill_buckets=(8, 16),
        decode_buckets=(4,),
    )
    m = CausalLM(cfg, block_size=4)
    params = m.init_params(jax.random.PRNGKey(0))
    return LLMEngine(ec, ModelRunner(m, params, ec))


class TestSpecDecode:
    def test_greedy_bit_equivalence(self):
        sp = SamplingParams(temperature=0.0, max_tokens=20, ignore_eos=True)
        # a repetitive prompt gives the proposer hits
        prompt = [5, 6, 7, 5, 6, 7, 5, 6]
        base = _engine(0).generate([prompt], sp)
        spec = _engine(4).generate([prompt], sp)
        assert base[0].output_token_ids == spec[0].output_token_ids

    def test_non_repetitive_prompt(self):
        sp = SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True)
        prompt = [3, 14, 25, 36, 47]
        base = _engine(0).generate([prompt], sp)
        spec = _engine(4).generate([prompt], sp)
        assert base[0].output_token_ids == spec[0].output_token_ids

    def test_sampled_seqs_not_speculated(self):
        """Non-greedy sequences bypass speculation but still decode."""
        sp = SamplingParams(temperature=0.8, seed=3, max_tokens=8, ignore_eos=True)
        outs = _engine(4).generate([[5, 6, 7, 5, 6]], sp)
        assert len(outs[0].output_token_ids) == 8

    def test_mixed_greedy_sampled_batch_not_speculated(self):
        """A batch mixing greedy and sampled seqs must NOT speculate: the
        verifier argmaxes every row, which would hand sampled seqs greedy
        tokens. Sampled output must be identical with spec on and off."""
        sp_g = SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True)
        sp_s = SamplingParams(temperature=0.9, seed=7, max_tokens=10, ignore_eos=True)
        prompts = [[5, 6, 7, 5, 6], [11, 12, 13]]
        base = _engine(0).generate(prompts, [sp_g, sp_s])
        spec = _engine(4).generate(prompts, [sp_g, sp_s])
        assert [o.output_token_ids for o in base] == [
            o.output_token_ids for o in spec
        ]

    def test_batch_mixed(self):
        e = _engine(4)
        sp_a = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)
        sp_b = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
        outs = e.generate([[5, 6, 5, 6, 5], [20, 21, 22]], [sp_a, sp_b])
        assert len(outs[0].output_token_ids) == 12
        assert len(outs[1].output_token_ids) == 6
        # equivalence vs unspeculated engine
        base = _engine(0).generate([[5, 6, 5, 6, 5], [20, 21, 22]], [sp_a, sp_b])
        assert [o.output_token_ids for o in outs] == [
            o.output_token_ids for o in base
        ]
