"""MLA decode crossover lab: XLA page-gather vs dedicated Pallas kernel.

Engine-level (the only trustworthy instrument — PERF_NOTES): a 12-layer
DeepSeek-geometry MLA-MoE model, int4 trunk, batch-mode decode at several
batch sizes, backend forced via VLLM_RS_TPU_MLA_BACKEND. Run one
(batch, backend) per process — the jit cache would otherwise pin the
first-traced backend:

  for B in 32 128 256; do for be in gather pallas; do
    VLLM_RS_TPU_MLA_BACKEND=$be python mla_lab.py --batch $B; done; done

Round-2 gather baseline (same geometry): B=1 194 tok/s, B=32 4,015.
Crossover table recorded in PERF_NOTES round 3.
"""

import argparse
import json
import os
import time

import numpy as np


def build(batch: int):
    import jax

    from vllm_rs_tpu.config import (
        CacheConfig, EngineConfig, ModelConfig, SchedulerConfig,
    )
    from vllm_rs_tpu.core.engine import LLMEngine
    from vllm_rs_tpu.core.runner import ModelRunner
    from vllm_rs_tpu.models.deepseek3 import DeepseekV3

    model = ModelConfig(
        model_type="deepseek_v3",
        hidden_size=1024,
        intermediate_size=4096,
        num_hidden_layers=12,
        num_attention_heads=16,
        num_key_value_heads=16,
        vocab_size=32768,
        num_experts=16,
        num_experts_per_tok=4,
        moe_intermediate_size=512,
        shared_expert_intermediate_size=512,
        first_k_dense_replace=1,
        router_scoring="sigmoid",
        router_bias=True,
        n_group=4,
        topk_group=2,
        routed_scaling_factor=2.0,
        q_lora_rank=0,
        kv_lora_rank=512,
        qk_nope_head_dim=128,
        qk_rope_head_dim=64,
        v_head_dim=128,
        eos_token_ids=(0,),
    )
    # 64-slot blocks, room for `batch` seqs at ctx <= 256
    blocks = max(512, batch * 4 + 64)
    econfig = EngineConfig(
        model=model,
        cache=CacheConfig(block_size=64, num_blocks=blocks),
        scheduler=SchedulerConfig(
            max_num_seqs=max(batch, 8), chunk_size=2048, max_model_len=512,
            multi_step_decode=16, max_consecutive_prefills=10_000,
        ),
        quant="int4",
    )
    m = DeepseekV3(model, block_size=64)
    params = m.init_params(jax.random.PRNGKey(0), quant="int4", quant_group=128)
    return LLMEngine(econfig, ModelRunner(m, params, econfig))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--prompt-tokens", type=int, default=128)
    ap.add_argument("--decode-tokens", type=int, default=64)
    args = ap.parse_args()

    from vllm_rs_tpu.config import SamplingParams

    backend = os.environ.get("VLLM_RS_TPU_MLA_BACKEND", "auto")
    engine = build(args.batch)
    vocab = engine.econfig.model.vocab_size
    rs = np.random.RandomState(0)
    sp = SamplingParams(
        temperature=0.0, max_tokens=args.decode_tokens, ignore_eos=True
    )

    def run():
        prompts = [
            list(rs.randint(1, vocab - 1, size=args.prompt_tokens))
            for _ in range(args.batch)
        ]
        t0 = time.time()
        outs = engine.generate(prompts, sp)
        wall = time.time() - t0
        return sum(len(o.output_token_ids) for o in outs), wall

    run()  # warmup
    toks, wall = run()
    print(
        json.dumps(
            {
                "metric": f"mla12_batch{args.batch}_decode",
                "backend": backend,
                "value": round(toks / wall, 1),
                "unit": "tokens/s/chip",
                "decode_tokens": toks,
                "wall_s": round(wall, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
