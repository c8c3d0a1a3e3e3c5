"""Headline benchmark: Llama-3.1-8B-architecture INT4 batch-1 decode tok/s
on one TPU chip (BASELINE.md north star: reference gets 120.74 tok/s on
A100 40GB for Llama-3.1-8B ISQ Q4K; v5e weight-streaming roofline ≈ 182).

Weights are randomly initialized then group-quantized on device — decode
throughput does not depend on weight values. Prints ONE JSON line.

Usage: python bench.py [--size tiny|8b] [--decode-tokens N]
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def build(size: str):
    import jax

    from vllm_rs_tpu.config import (
        CacheConfig,
        EngineConfig,
        ModelConfig,
        SchedulerConfig,
    )
    from vllm_rs_tpu.core.engine import LLMEngine
    from vllm_rs_tpu.core.runner import ModelRunner
    from vllm_rs_tpu.models.llama import CausalLM

    if size == "8b":
        # Llama-3.1-8B architecture (HF config values)
        model = ModelConfig(
            model_type="llama",
            hidden_size=4096,
            intermediate_size=14336,
            num_hidden_layers=32,
            num_attention_heads=32,
            num_key_value_heads=8,
            vocab_size=128256,
            max_position_embeddings=8192,
            rope_theta=500000.0,
            eos_token_ids=(128001,),
        )
        cache = CacheConfig(block_size=16, num_blocks=512)  # 8192 slots
        # multi-step on-device decode: 32 tokens per engine step amortizes
        # the host round trip (this dev environment tunnels the TPU with
        # ~70ms RTT; on directly-attached hosts the sync cost is ~us)
        sched = SchedulerConfig(
            max_num_seqs=8, chunk_size=1024, max_model_len=2048,
            multi_step_decode=64,
        )
        quant = "int4"
    else:
        model = ModelConfig(
            model_type="llama",
            hidden_size=512,
            intermediate_size=1536,
            num_hidden_layers=4,
            num_attention_heads=8,
            num_key_value_heads=4,
            vocab_size=2048,
            eos_token_ids=(0,),
        )
        cache = CacheConfig(block_size=16, num_blocks=128)
        sched = SchedulerConfig(max_num_seqs=8, chunk_size=512, max_model_len=1024)
        quant = "int4"

    econfig = EngineConfig(model=model, cache=cache, scheduler=sched, quant=quant)
    m = CausalLM(model, block_size=cache.block_size)
    t0 = time.time()
    params = m.init_params(jax.random.PRNGKey(0), quant=quant, quant_group=128)
    params = jax.block_until_ready(params)
    print(f"# init_params: {time.time() - t0:.1f}s", file=sys.stderr)
    runner = ModelRunner(m, params, econfig)
    return LLMEngine(econfig, runner)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="8b", choices=["tiny", "8b"])
    ap.add_argument("--prompt-tokens", type=int, default=128)
    ap.add_argument("--decode-tokens", type=int, default=128)
    args = ap.parse_args()

    import numpy as np

    from vllm_rs_tpu.config import SamplingParams

    engine = build(args.size)
    vocab = engine.econfig.model.vocab_size
    rs = np.random.RandomState(0)

    def run_once(n_decode):
        prompt = list(rs.randint(1, vocab - 1, size=args.prompt_tokens))
        sid = engine.add_request(
            prompt,
            SamplingParams(temperature=0.0, max_tokens=n_decode, ignore_eos=True),
        )
        # prefill steps until running
        t_first = None
        n_steps = 0
        t0 = time.time()
        while not engine.requests[sid].seq.is_finished:
            engine.step()
            n_steps += 1
            if t_first is None and engine.requests[sid].seq.output_token_ids:
                t_first = time.time()
        t_end = time.time()
        seq = engine.requests[sid].seq
        n_out = len(seq.output_token_ids)
        decode_time = t_end - t_first if t_first else t_end - t0
        return n_out, decode_time, (t_first - t0 if t_first else 0.0)

    # warmup (compilation of prefill + decode buckets incl. the full
    # multi-step program: 65 = 1 + 64 so the k=64 executable compiles here)
    run_once(65)
    n_out, decode_time, ttft = run_once(args.decode_tokens)
    decode_tps = (n_out - 1) / decode_time if decode_time > 0 else 0.0

    baseline = 120.74  # reference: Llama-3.1-8B ISQ-Q4K on A100 (BASELINE.md)
    print(
        json.dumps(
            {
                "metric": "decode_tokens_per_sec_batch1_8b_int4",
                "value": round(decode_tps, 2),
                "unit": "tokens/s/chip",
                "vs_baseline": round(decode_tps / baseline, 4),
                "ttft_s": round(ttft, 3),
                "decode_tokens": n_out,
                "size": args.size,
            }
        )
    )


if __name__ == "__main__":
    main()
