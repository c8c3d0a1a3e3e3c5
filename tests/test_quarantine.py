"""Per-executable INTERNAL quarantine (core/runner.py).

Some compiled program shapes die deterministically at runtime with
"INTERNAL: TPU backend error" (PERF_NOTES r3 #4); blind retry cannot help.
The runner must quarantine the (kind, B, T, MB) executable and re-bucket
the batch to the nearest larger clean shape so generation completes
(reference analog: engine-loop error containment, engine.rs:1707-1745 —
which merely cancels; re-bucketing completes the requests).
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
from vllm_rs_tpu.core import LLMEngine, ModelRunner
from vllm_rs_tpu.models.llama import CausalLM


def _engine(multi_step=1):
    cfg = ModelConfig(
        model_type="qwen3", hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        vocab_size=256, eos_token_ids=(0,),
    )
    ecfg = EngineConfig(
        model=cfg,
        cache=CacheConfig(block_size=4, num_blocks=64),
        scheduler=SchedulerConfig(
            max_num_seqs=8, chunk_size=32, max_model_len=128,
            prefill_buckets=(8, 16, 32), multi_step_decode=multi_step,
        ),
        prefill_buckets=(8, 16, 32),
        decode_buckets=(4, 8),
    )
    model = CausalLM(cfg, block_size=4)
    params = model.init_params(jax.random.PRNGKey(7))
    return LLMEngine(ecfg, ModelRunner(model, params, ecfg))


@pytest.fixture(autouse=True)
def _no_retry_sleep(monkeypatch):
    # _dispatch_with_retry backs off 2s/4s before giving up on a
    # deterministic fault — pointless in tests
    import vllm_rs_tpu.core.runner as runner_mod

    monkeypatch.setattr(runner_mod.time, "sleep", lambda s: None)


def test_decode_bucket_quarantined_and_rebucketed():
    engine = _engine()
    runner = engine.runner
    real = runner._jit_step
    injected = []

    def fake(params, kv, token_ids, meta, st, key, mask, **kw):
        if token_ids.shape == (4, 1):  # the B=4 decode executable "dies"
            injected.append(token_ids.shape)
            raise RuntimeError("INTERNAL: TPU backend error (injected)")
        return real(params, kv, token_ids, meta, st, key, mask, **kw)

    runner._jit_step = fake
    out = engine.generate(
        [[1, 2, 3, 4, 5]],
        SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True),
    )[0]
    # generation completed via the neighbor bucket (B=8)
    assert len(out.output_token_ids) == 6
    assert any(key[0] == "decode" and key[1] == 4 for key in runner._quarantined)
    # _dispatch_with_retry exhausts its 3 attempts once, then the shape is
    # never dispatched again
    assert len(injected) == 3

    # a second generation must not re-trip the quarantined shape
    out2 = engine.generate(
        [[1, 2, 3, 4, 5]],
        SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True),
    )[0]
    assert len(out2.output_token_ids) == 6
    assert len(injected) == 3  # no new hits on the dead executable

    # and outputs are bit-identical to an uninjected engine (pure padding)
    clean = _engine()
    ref = clean.generate(
        [[1, 2, 3, 4, 5]],
        SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True),
    )[0]
    assert out.output_token_ids == ref.output_token_ids == out2.output_token_ids


def test_multi_step_quarantine():
    engine = _engine(multi_step=4)
    runner = engine.runner
    import functools

    real = jax.jit(
        runner._multi_step_impl,
        static_argnames=("n_steps", "needs_filters", "needs_penalties"),
        donate_argnames=("kv",),
    )
    injected = []

    def fake(params, kv, start_tokens, *rest, **kw):
        if start_tokens.shape[0] == 4:
            injected.append(start_tokens.shape)
            raise RuntimeError("INTERNAL: TPU backend error (injected)")
        return real(params, kv, start_tokens, *rest, **kw)

    runner._jit_multi = fake
    out = engine.generate(
        [[1, 2, 3, 4, 5]],
        SamplingParams(temperature=0.0, max_tokens=9, ignore_eos=True),
    )[0]
    assert len(out.output_token_ids) == 9
    assert any(k[0] == "multi" and k[1] == 4 for k in runner._quarantined)
    assert injected  # the dead shape was hit, then avoided


def test_non_internal_errors_still_raise():
    engine = _engine()
    runner = engine.runner

    def fake(*a, **kw):
        raise ValueError("RESOURCE_EXHAUSTED: out of memory (injected)")

    runner._jit_step = fake
    with pytest.raises(Exception, match="RESOURCE_EXHAUSTED"):
        engine.generate(
            [[1, 2, 3]], SamplingParams(temperature=0.0, max_tokens=2)
        )
    assert not runner._quarantined


def test_next_shape_ladder_exhausts():
    engine = _engine()
    runner = engine.runner
    # MB escalates first, then B; at the top of both ladders (non-prefill)
    # the ladder must raise rather than loop
    top = (runner.decode_buckets[-1], 1, runner.max_blocks_per_seq)
    with pytest.raises(RuntimeError, match="no clean executable shape"):
        runner._next_shape("decode", top)
    b, t, mb = runner._next_shape("decode", (4, 1, 8))
    assert (b, t) == (4, 1) and mb > 8
