"""Tensor parallelism on the virtual CPU mesh: sharded execution must be
numerically equivalent to single-device execution (reference tests TP only
on real multi-GPU; jax lets us simulate — SURVEY.md §4)."""

import dataclasses

import jax
import numpy as np
import pytest

from vllm_rs_tpu.config import SamplingParams
from vllm_rs_tpu.core.engine import LLMEngine
from vllm_rs_tpu.core.runner import ModelRunner
from vllm_rs_tpu.models.llama import CausalLM
from vllm_rs_tpu.parallel import make_mesh, shard_params


def _generate(ecfg, params, mesh=None):
    model = CausalLM(ecfg.model, block_size=ecfg.cache.block_size)
    if mesh is not None:
        params = shard_params(params, mesh)
    runner = ModelRunner(model, params, ecfg, mesh=mesh)
    engine = LLMEngine(ecfg, runner)
    prompts = [list(np.random.RandomState(7).randint(1, 255, size=9))]
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    return engine.generate(prompts, sp)[0].output_token_ids


@pytest.mark.parametrize("tp", [2, 4])
def test_tp_matches_single_device(tiny_engine_config, tp):
    if len(jax.devices()) < tp:
        pytest.skip("needs virtual multi-device CPU")
    ecfg = dataclasses.replace(tiny_engine_config, tp_size=tp)
    model = CausalLM(ecfg.model, block_size=ecfg.cache.block_size)
    params = model.init_params(jax.random.PRNGKey(0))
    single = _generate(dataclasses.replace(ecfg, tp_size=1), params)
    mesh = make_mesh(tp_size=tp)
    sharded = _generate(ecfg, params, mesh=mesh)
    assert single == sharded


def test_tp_quantized(tiny_engine_config):
    if len(jax.devices()) < 2:
        pytest.skip("needs virtual multi-device CPU")
    ecfg = dataclasses.replace(tiny_engine_config, tp_size=2)
    model = CausalLM(ecfg.model, block_size=ecfg.cache.block_size)
    params = model.init_params(jax.random.PRNGKey(0), quant="int8", quant_group=32)
    mesh = make_mesh(tp_size=2)
    toks = _generate(ecfg, params, mesh=mesh)
    assert len(toks) == 6
