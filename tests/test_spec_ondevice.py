"""On-device speculative loop (run_spec_multi): propose + verify rolled
into one device program (VERDICT r3 item 1). The contract is the same as
single-step spec decode — bit-identical to plain greedy decoding — plus
budget/capacity bounds and acceptance-stat accounting."""

import jax
import jax.numpy as jnp
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
from vllm_rs_tpu.utils.spec import (
    propose_prompt_lookup,
    propose_prompt_lookup_device,
)


def _engine(spec_k=0, multi_step=1, max_model_len=96, seed=0, spec_adaptive=False):
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
        cache=CacheConfig(block_size=4, num_blocks=128),
        scheduler=SchedulerConfig(
            max_num_seqs=4, chunk_size=16, max_model_len=max_model_len,
            prefill_buckets=(8, 16), spec_decode_k=spec_k,
            multi_step_decode=multi_step, spec_adaptive=spec_adaptive,
        ),
        prefill_buckets=(8, 16),
        decode_buckets=(4,),
    )
    m = CausalLM(cfg, block_size=4)
    params = m.init_params(jax.random.PRNGKey(seed))
    return LLMEngine(ec, ModelRunner(m, params, ec))


class TestDeviceProposer:
    """The in-graph proposer must agree with the host proposer wherever the
    host proposes (device drafts past the host's truncation point are
    garbage-safe and not compared)."""

    def _device(self, toks, k):
        buf = np.zeros((1, 32), dtype=np.int32)
        buf[0, : len(toks)] = toks
        d = propose_prompt_lookup_device(
            jnp.asarray(buf), jnp.asarray([len(toks)], dtype=jnp.int32), k=k
        )
        return [int(x) for x in np.asarray(d)[0]]

    def test_matches_host_on_hit(self):
        toks = [1, 2, 3, 4, 5, 9, 9, 2, 3]
        host = propose_prompt_lookup(toks, 2)
        assert self._device(toks, 2) == host == [4, 5]

    def test_most_recent_match_wins(self):
        toks = [5, 1, 5, 2, 5]
        assert self._device(toks, 1) == propose_prompt_lookup(toks, 1) == [2]

    def test_largest_ngram_priority(self):
        # tail [2, 3]: 2-gram match at idx 0 (follows 7); a 1-gram match of
        # [3] at idx 1 would follow 9 — the 2-gram must win, like the host
        toks = [2, 3, 7, 9, 2, 3]
        host = propose_prompt_lookup(toks, 1)
        assert self._device(toks, 1) == host == [7]

    def test_host_truncation_prefix_agrees(self):
        # host drafts only 2 follow tokens; device pads to k — the common
        # prefix must agree
        toks = [1, 2, 3, 4, 5, 1, 2, 3]
        host = propose_prompt_lookup(toks, 8)
        dev = self._device(toks, 8)
        assert dev[: len(host)] == host

    def test_batch_rows_independent(self):
        buf = np.zeros((2, 32), dtype=np.int32)
        rows = [[1, 2, 3, 4, 1, 2], [9, 8, 7, 9, 8]]
        for i, r in enumerate(rows):
            buf[i, : len(r)] = r
        d = np.asarray(
            propose_prompt_lookup_device(
                jnp.asarray(buf),
                jnp.asarray([len(r) for r in rows], dtype=jnp.int32),
                k=2,
            )
        )
        assert list(d[0]) == propose_prompt_lookup(rows[0], 2) == [3, 4]
        assert list(d[1]) == propose_prompt_lookup(rows[1], 2) == [7, 9]


class TestSpecOndeviceLoop:
    def test_greedy_bit_equivalence_repetitive(self):
        sp = SamplingParams(temperature=0.0, max_tokens=24, ignore_eos=True)
        prompt = [5, 6, 7, 5, 6, 7, 5, 6]
        base = _engine(0).generate([prompt], sp)
        spec = _engine(spec_k=4, multi_step=8).generate([prompt], sp)
        assert base[0].output_token_ids == spec[0].output_token_ids

    def test_greedy_bit_equivalence_non_repetitive(self):
        sp = SamplingParams(temperature=0.0, max_tokens=16, ignore_eos=True)
        prompt = [3, 14, 25, 36, 47]
        base = _engine(0).generate([prompt], sp)
        spec = _engine(spec_k=4, multi_step=8).generate([prompt], sp)
        assert base[0].output_token_ids == spec[0].output_token_ids

    def test_batch_unequal_budgets(self):
        e = _engine(spec_k=4, multi_step=8)
        sp_a = SamplingParams(temperature=0.0, max_tokens=17, ignore_eos=True)
        sp_b = SamplingParams(temperature=0.0, max_tokens=5, ignore_eos=True)
        prompts = [[5, 6, 5, 6, 5], [20, 21, 22]]
        outs = e.generate(prompts, [sp_a, sp_b])
        assert len(outs[0].output_token_ids) == 17
        assert len(outs[1].output_token_ids) == 5
        base = _engine(0).generate(prompts, [sp_a, sp_b])
        assert [o.output_token_ids for o in outs] == [
            o.output_token_ids for o in base
        ]

    def test_sampled_batch_falls_back(self):
        """Non-greedy rows disable the loop; sampled output is identical
        with the loop configured on and off (seeded determinism)."""
        sp_s = SamplingParams(temperature=0.9, seed=7, max_tokens=10, ignore_eos=True)
        prompt = [11, 12, 13]
        base = _engine(0).generate([prompt], sp_s)
        spec = _engine(spec_k=4, multi_step=8).generate([prompt], sp_s)
        assert base[0].output_token_ids == spec[0].output_token_ids

    def test_acceptance_stats_accumulate(self):
        e = _engine(spec_k=4, multi_step=8)
        sp = SamplingParams(temperature=0.0, max_tokens=20, ignore_eos=True)
        e.generate([[5, 6, 7, 5, 6, 7, 5, 6]], sp)
        st = getattr(e.runner, "spec_stats", None)
        assert st is not None and st["vsteps"] > 0
        # every verify iteration emits at least 1 token
        assert st["emitted"] >= st["vsteps"]
        # EOS/budget overshoot is discarded on the host, so emitted can
        # exceed max_tokens but the request output cannot
        assert st["emitted"] >= 20

    def test_respects_max_model_len(self):
        sp = SamplingParams(temperature=0.0, max_tokens=100, ignore_eos=True)
        e = _engine(spec_k=4, multi_step=8, max_model_len=32)
        outs = e.generate([[5, 6, 7, 5, 6, 7]], sp)
        assert len(outs[0].output_token_ids) == 32 - 6
        base = _engine(0, max_model_len=32).generate([[5, 6, 7, 5, 6, 7]], sp)
        assert outs[0].output_token_ids == base[0].output_token_ids

    def test_eos_respected(self):
        """EOS inside a burst finishes the request; overshoot discarded."""
        sp = SamplingParams(temperature=0.0, max_tokens=40)
        prompt = [5, 6, 7, 5, 6, 7]
        base = _engine(0, seed=3).generate([prompt], sp)
        spec = _engine(spec_k=4, multi_step=8, seed=3).generate([prompt], sp)
        assert base[0].output_token_ids == spec[0].output_token_ids


class TestAdaptiveGate:
    def test_low_acceptance_falls_back_to_plain(self):
        """At low measured acceptance the engine decodes plain for 7 of 8
        spec-eligible bursts (outputs bit-identical either way); with the
        gate disabled every burst runs the spec loop."""
        import numpy as np

        def run(adaptive):
            e = _engine(multi_step=8, spec_k=4, spec_adaptive=adaptive)
            sp = SamplingParams(temperature=0.0, max_tokens=64, ignore_eos=True)
            prompt = list(np.random.RandomState(0).randint(1, 120, size=12))
            out = e.generate([prompt], sp)[0]
            st = getattr(e.runner, "spec_stats", None) or {}
            return out.output_token_ids, st.get("vsteps", 0)

        toks_a, vsteps_a = run(True)
        toks_b, vsteps_b = run(False)
        assert toks_a == toks_b  # greedy-exact regardless of the gate
        assert vsteps_a > 0  # optimistic first burst probes the spec loop
        if vsteps_b > vsteps_a:
            # acceptance was low: the gate skipped most spec bursts
            assert vsteps_a < vsteps_b

    def test_gate_state_machine(self):
        """Unit: low-acceptance observation → 7 plain bursts, then a
        re-probe; high acceptance keeps spec on."""
        e = _engine(multi_step=8, spec_k=4, spec_adaptive=True)
        assert e._spec_allow()  # optimistic start
        e.runner.spec_stats = {"emitted": 10, "vsteps": 10}
        e._spec_observe({"emitted": 0, "vsteps": 0})  # acceptance 1.0 < 1.5
        allows = [e._spec_allow() for _ in range(8)]
        assert allows == [False] * 7 + [True]
        # high acceptance: gate stays open
        e.runner.spec_stats = {"emitted": 30, "vsteps": 20}
        e._spec_observe({"emitted": 10, "vsteps": 10})  # acceptance 2.0
        assert e._spec_allow()
