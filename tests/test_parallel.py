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


def test_tp_moe_matches_single_device():
    if len(jax.devices()) < 2:
        pytest.skip("needs virtual multi-device CPU")
    from tests.test_moe import _moe_engine  # tiny MoE engine builder
    from vllm_rs_tpu.models.qwen3_moe import MoECausalLM
    from vllm_rs_tpu.config import CacheConfig, EngineConfig, ModelConfig, SchedulerConfig

    model_cfg = ModelConfig(
        model_type="qwen3_moe", hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        vocab_size=256, qk_norm=True, num_experts=4, num_experts_per_tok=2,
        moe_intermediate_size=32, eos_token_ids=(0,),
    )
    ecfg = EngineConfig(
        model=model_cfg,
        cache=CacheConfig(block_size=4, num_blocks=64),
        scheduler=SchedulerConfig(max_num_seqs=4, chunk_size=32, max_model_len=128,
                                  prefill_buckets=(8, 32)),
        prefill_buckets=(8, 32), decode_buckets=(4,),
    )
    model = MoECausalLM(model_cfg, block_size=4)
    params = model.init_params(jax.random.PRNGKey(0))
    sp = SamplingParams(temperature=0.0, max_tokens=5, ignore_eos=True)
    prompts = [[5, 6, 7, 8, 9]]

    def gen(mesh, p):
        runner = ModelRunner(MoECausalLM(model_cfg, block_size=4), p, ecfg, mesh=mesh)
        return LLMEngine(ecfg, runner).generate(prompts, sp)[0].output_token_ids

    single = gen(None, params)
    mesh = make_mesh(tp_size=2)
    sharded = gen(mesh, shard_params(params, mesh))
    assert single == sharded


def test_tp_gemma4_matches_single_device():
    """Heterogeneous KV pools under TP: the sliding pool's 2 kv-heads shard
    across tp=2 while the global pool's single head replicates
    (kv_head_counts per-pool plan)."""
    if len(jax.devices()) < 2:
        pytest.skip("needs virtual multi-device CPU")
    from tests.test_gemma4 import HF, make_engine
    from vllm_rs_tpu.config import ModelConfig
    from vllm_rs_tpu.models.gemma4 import Gemma4ForCausalLM

    cfg = ModelConfig.from_hf_dict(HF)
    model, params, base = make_engine(cfg)
    ecfg = dataclasses.replace(base.econfig, tp_size=2)
    sp = SamplingParams(temperature=0.0, max_tokens=5, ignore_eos=True)
    prompts = [list(np.random.RandomState(11).randint(1, 255, size=9))]
    single = base.generate(prompts, sp)[0].output_token_ids
    mesh = make_mesh(tp_size=2)
    runner = ModelRunner(
        Gemma4ForCausalLM(cfg, block_size=4),
        shard_params(params, mesh), ecfg, mesh=mesh,
    )
    sharded = LLMEngine(ecfg, runner).generate(prompts, sp)[0].output_token_ids
    assert single == sharded


def test_tp_llama4_matches_single_device():
    """Interleaved dense/MoE per-layer dicts + fused shared expert under TP."""
    if len(jax.devices()) < 2:
        pytest.skip("needs virtual multi-device CPU")
    from tests.test_llama4 import HF, make_engine
    from vllm_rs_tpu.config import ModelConfig
    from vllm_rs_tpu.models.llama4 import Llama4ForCausalLM

    cfg = ModelConfig.from_hf_dict(HF)
    model, params, base = make_engine(cfg)
    sp = SamplingParams(temperature=0.0, max_tokens=5, ignore_eos=True)
    prompts = [list(np.random.RandomState(3).randint(1, 255, size=9))]
    single = base.generate(prompts, sp)[0].output_token_ids
    mesh = make_mesh(tp_size=2)
    ecfg = dataclasses.replace(base.econfig, tp_size=2)
    runner = ModelRunner(
        Llama4ForCausalLM(cfg, block_size=4),
        shard_params(params, mesh), ecfg, mesh=mesh,
    )
    sharded = LLMEngine(ecfg, runner).generate(prompts, sp)[0].output_token_ids
    assert single == sharded


def test_tp_mla_matches_single_device():
    if len(jax.devices()) < 2:
        pytest.skip("needs virtual multi-device CPU")
    from tests.test_mla import _mla_engine
    from vllm_rs_tpu.models.deepseek3 import DeepseekV3

    base = _mla_engine()
    ecfg = base.econfig
    model = DeepseekV3(ecfg.model, block_size=4)
    params = base.runner.params
    sp = SamplingParams(temperature=0.0, max_tokens=5, ignore_eos=True)
    prompts = [[5, 6, 7]]
    single = base.generate(prompts, sp)[0].output_token_ids
    mesh = make_mesh(tp_size=2)
    runner = ModelRunner(model, shard_params(params, mesh), ecfg, mesh=mesh)
    sharded = LLMEngine(ecfg, runner).generate(prompts, sp)[0].output_token_ids
    assert single == sharded


def test_tp_hybrid_gdn_matches_single_device():
    """Hybrid GDN trunk under TP: full-attention layers shard kv-heads,
    the GDN conv/rec slot state replicates (sharding.py plan); includes a
    prefix-hit turn so mamba snapshot capture/restore run on the mesh."""
    if len(jax.devices()) < 2:
        pytest.skip("needs virtual multi-device CPU")
    from vllm_rs_tpu.config import CacheConfig, EngineConfig, ModelConfig, SchedulerConfig
    from vllm_rs_tpu.models.qwen3_next import Qwen3NextForCausalLM

    model_cfg = ModelConfig(
        model_type="qwen3_next", hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        vocab_size=128, qk_norm=True, eos_token_ids=(0,),
        extra=(
            ("linear_num_key_heads", 2), ("linear_num_value_heads", 4),
            ("linear_key_head_dim", 8), ("linear_value_head_dim", 8),
            ("linear_conv_kernel_dim", 4), ("full_attention_interval", 4),
        ),
    )
    ecfg = EngineConfig(
        model=model_cfg,
        cache=CacheConfig(block_size=4, num_blocks=64, mamba_slots=8,
                          mamba_snapshot_slots=8,
                          mamba_snapshot_interval_blocks=1),
        scheduler=SchedulerConfig(max_num_seqs=4, chunk_size=8, max_model_len=128,
                                  prefill_buckets=(8, 16, 32)),
        prefill_buckets=(8, 16, 32), decode_buckets=(4,),
    )
    sp = SamplingParams(temperature=0.0, max_tokens=5, ignore_eos=True)
    base = list(range(2, 26))  # 24 tokens: 3 aligned chunks -> snapshots

    def run(mesh, p):
        runner = ModelRunner(
            Qwen3NextForCausalLM(model_cfg, block_size=4), p, ecfg, mesh=mesh
        )
        engine = LLMEngine(ecfg, runner)
        first = engine.generate([base + [1, 2, 3]], sp)[0]
        second = engine.generate([base + [4, 5, 6]], sp)[0]
        return first.output_token_ids, second.output_token_ids, second.cached_tokens

    model = Qwen3NextForCausalLM(model_cfg, block_size=4)
    params = model.init_params(jax.random.PRNGKey(0))
    s1, s2, s_cached = run(None, params)
    mesh = make_mesh(tp_size=2)
    t1, t2, t_cached = run(mesh, shard_params(params, mesh))
    assert s1 == t1
    assert s2 == t2
    assert s_cached == t_cached == 24  # snapshot restore fired on the mesh


def test_tp_fp8_kv_matches_single_device():
    """fp8-e4m3 KV pool sharded over kv-heads behaves identically to the
    single-device pool (the fp8 rows convert on read either way)."""
    if len(jax.devices()) < 2:
        pytest.skip("needs virtual multi-device CPU")
    from vllm_rs_tpu.config import CacheConfig, EngineConfig, ModelConfig, SchedulerConfig

    model_cfg = ModelConfig(
        model_type="llama", hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        vocab_size=128, eos_token_ids=(0,),
    )
    ecfg = EngineConfig(
        model=model_cfg,
        cache=CacheConfig(block_size=4, num_blocks=64, kv_dtype="float8_e4m3fn"),
        scheduler=SchedulerConfig(max_num_seqs=4, chunk_size=16, max_model_len=64,
                                  prefill_buckets=(8, 16)),
        prefill_buckets=(8, 16), decode_buckets=(4,),
    )
    model = CausalLM(model_cfg, block_size=4)
    params = model.init_params(jax.random.PRNGKey(0))
    single = _generate(ecfg, params)
    mesh = make_mesh(tp_size=2)
    sharded = _generate(dataclasses.replace(ecfg, tp_size=2), params, mesh=mesh)
    assert single == sharded
