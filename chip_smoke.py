"""On-chip smoke: drive a tiny engine of every model family on the real
TPU. Interpret-mode tests do not enforce Mosaic lowering rules (sub-128
tiles, layout constraints) — this catches what they cannot.

Usage: python chip_smoke.py   (~10 min of compiles through the tunnel)
"""
import sys
import time

import jax
import numpy as np

from vllm_rs_tpu.config import (
    CacheConfig, EngineConfig, ModelConfig, SamplingParams, SchedulerConfig,
)
from vllm_rs_tpu.core.engine import LLMEngine
from vllm_rs_tpu.core.runner import ModelRunner


def engine_for(cfg, cls, *, quant=None, mamba_slots=0, block_size=16,
               kv_dtype="bfloat16"):
    # TPU-realistic dims: head_dim 128, lane-aligned features
    ecfg = EngineConfig(
        model=cfg,
        cache=CacheConfig(block_size=block_size, num_blocks=64,
                          mamba_slots=mamba_slots, kv_dtype=kv_dtype),
        scheduler=SchedulerConfig(
            max_num_seqs=4, chunk_size=128, max_model_len=512,
            prefill_buckets=(32, 128), multi_step_decode=4,
        ),
        prefill_buckets=(32, 128),
        decode_buckets=(4,),
        quant=quant,
    )
    model = cls(cfg, block_size=block_size)
    params = model.init_params(jax.random.PRNGKey(0), quant=quant)
    return LLMEngine(ecfg, ModelRunner(model, params, ecfg))


def drive(name, engine, n=6):
    t0 = time.time()
    prompt = list(np.random.RandomState(0).randint(1, 250, size=40))
    out = engine.generate(
        [prompt], SamplingParams(temperature=0.0, max_tokens=n, ignore_eos=True)
    )[0]
    assert len(out.output_token_ids) == n, (name, out)
    print(f"{name:12s} OK {out.output_token_ids} ({time.time()-t0:.0f}s)", flush=True)


CASES = []


def case(f):
    CASES.append(f)
    return f


@case
def llama_int4():
    from vllm_rs_tpu.models.llama import CausalLM

    cfg = ModelConfig(
        model_type="llama", hidden_size=512, intermediate_size=1024,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=128, vocab_size=256, eos_token_ids=(0,),
    )
    drive("llama-int4", engine_for(cfg, CausalLM, quant="int4"))


@case
def llama_fp8_kv():
    # fp8-e4m3 KV pool: the Mosaic kernels convert fp8 pages in-kernel —
    # interpret-mode tests cannot verify the fp8 load/convert lowering
    from vllm_rs_tpu.models.llama import CausalLM

    cfg = ModelConfig(
        model_type="llama", hidden_size=512, intermediate_size=1024,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=128, vocab_size=256, eos_token_ids=(0,),
    )
    drive("llama-fp8kv", engine_for(cfg, CausalLM, kv_dtype="float8_e4m3fn"))


@case
def llama_int8_kv():
    from vllm_rs_tpu.models.llama import CausalLM

    cfg = ModelConfig(
        model_type="llama", hidden_size=512, intermediate_size=1024,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=128, vocab_size=256, eos_token_ids=(0,),
    )
    drive("llama-int8kv", engine_for(cfg, CausalLM, kv_dtype="int8"))


@case
def moe_int4():
    from vllm_rs_tpu.models.qwen3_moe import MoECausalLM

    cfg = ModelConfig(
        model_type="qwen3_moe", hidden_size=512, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=128, vocab_size=256, qk_norm=True, num_experts=4,
        num_experts_per_tok=2, moe_intermediate_size=256, eos_token_ids=(0,),
    )
    drive("moe-int4", engine_for(cfg, MoECausalLM, quant="int4"))


@case
def mla():
    from vllm_rs_tpu.models.deepseek3 import DeepseekV3

    cfg = ModelConfig(
        model_type="deepseek_v3", hidden_size=512, intermediate_size=1024,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        vocab_size=256, kv_lora_rank=256, qk_nope_head_dim=128,
        qk_rope_head_dim=64, v_head_dim=128, num_experts=4,
        num_experts_per_tok=2, moe_intermediate_size=256,
        first_k_dense_replace=1, eos_token_ids=(0,),
    )
    drive("mla-moe", engine_for(cfg, DeepseekV3))


@case
def gdn_hybrid():
    from vllm_rs_tpu.models.qwen3_next import Qwen3NextForCausalLM

    cfg = ModelConfig(
        model_type="qwen3_next", hidden_size=512, intermediate_size=1024,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=128, vocab_size=256, qk_norm=True, eos_token_ids=(0,),
        extra=(
            ("linear_num_key_heads", 2), ("linear_num_value_heads", 2),
            ("linear_key_head_dim", 128), ("linear_value_head_dim", 128),
            ("linear_conv_kernel_dim", 4), ("full_attention_interval", 2),
        ),
    )
    drive("gdn-hybrid", engine_for(cfg, Qwen3NextForCausalLM, mamba_slots=4))


@case
def gemma4():
    from vllm_rs_tpu.models.gemma4 import Gemma4ForCausalLM

    cfg = ModelConfig.from_hf_dict({
        "model_type": "gemma4", "hidden_size": 512, "intermediate_size": 1024,
        "num_hidden_layers": 2, "num_attention_heads": 4,
        "num_key_value_heads": 2, "head_dim": 128, "vocab_size": 256,
        "rope_theta": 1000000.0, "rope_local_base_freq": 10000.0,
        "sliding_window": 64,
        "layer_types": ["sliding_attention", "full_attention"],
        "global_head_dim": 128, "num_global_key_value_heads": 1,
        "eos_token_id": 0, "tie_word_embeddings": True,
        "hidden_activation": "gelu_pytorch_tanh",
    })
    drive("gemma4", engine_for(cfg, Gemma4ForCausalLM))


@case
def llama4():
    from vllm_rs_tpu.models.llama4 import Llama4ForCausalLM

    cfg = ModelConfig.from_hf_dict({
        "model_type": "llama4", "hidden_size": 512, "intermediate_size": 512,
        "intermediate_size_mlp": 1024, "num_hidden_layers": 2,
        "num_attention_heads": 4, "num_key_value_heads": 2, "head_dim": 128,
        "vocab_size": 256, "rope_theta": 10000.0, "num_local_experts": 4,
        "num_experts_per_tok": 1, "interleave_moe_layer_step": 2,
        "attention_chunk_size": 64, "use_qk_norm": True,
        "attn_temperature_tuning": True, "eos_token_id": 0,
    })
    drive("llama4", engine_for(cfg, Llama4ForCausalLM))


if __name__ == "__main__":
    only = sys.argv[1:] or None
    failures = []
    for f in CASES:
        if only and f.__name__ not in only:
            continue
        try:
            f()
        except Exception as e:  # noqa: BLE001 — report all, fail at end
            failures.append((f.__name__, e))
            print(f"{f.__name__:12s} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)
    if failures:
        sys.exit(1)
    print("CHIP SMOKE OK")
