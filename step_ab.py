"""A/B the lm_head implementation at the multi-step-program level.

Differenced timing: run the k=8 and k=32 multi-step decode programs and
difference → per-token time with fixed overheads (tunnel RTT, dispatch)
cancelled. Alternating measurements inside ONE process kills chip/tunnel
drift between runs.
"""
import os
import sys
import time

import jax
import numpy as np

IMPL = "default"

from vllm_rs_tpu.config import (
    CacheConfig, EngineConfig, ModelConfig, SamplingParams, SchedulerConfig,
)
from vllm_rs_tpu.core.runner import ModelRunner
from vllm_rs_tpu.core.scheduler import ScheduledBatch
from vllm_rs_tpu.core.sequence import Sequence
from vllm_rs_tpu.models.llama import CausalLM

model_cfg = ModelConfig(
    model_type="llama", hidden_size=4096, intermediate_size=14336,
    num_hidden_layers=32, num_attention_heads=32, num_key_value_heads=8,
    vocab_size=128256, max_position_embeddings=8192, rope_theta=500000.0,
    eos_token_ids=(128001,),
)
econfig = EngineConfig(
    model=model_cfg, cache=CacheConfig(block_size=16, num_blocks=512),
    scheduler=SchedulerConfig(max_num_seqs=8, chunk_size=1024, max_model_len=2048),
    quant="int4", decode_buckets=(8,),
)
m = CausalLM(model_cfg, block_size=16)
t0 = time.time()
params = jax.block_until_ready(
    m.init_params(jax.random.PRNGKey(0), quant="int4", quant_group=128)
)
print(f"# init {time.time()-t0:.0f}s", file=sys.stderr)
runner = ModelRunner(m, params, econfig)

seq = Sequence(list(range(1, 120)), SamplingParams(temperature=0.0, max_tokens=600, ignore_eos=True))
seq.block_table = list(range(48))
seq.num_cached_tokens = 119
seq.append_token(3)
batch = ScheduledBatch(kind="decode", seqs=[seq])


def run_k(k, n=3):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = runner.run_multi(batch, k)
        _ = np.asarray(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


# compile both programs
run_k(8, n=1)
run_k(32, n=1)
per_tok = []
for rep in range(4):
    t8 = run_k(8)
    t32 = run_k(32)
    per_tok.append((t32 - t8) / 24)
    print(f"# rep{rep}: k8={t8*1e3:.1f}ms k32={t32*1e3:.1f}ms -> {per_tok[-1]*1e3:.2f} ms/tok", file=sys.stderr)
print(f"{IMPL}: per-token {np.median(per_tok)*1e3:.2f} ms (median of {len(per_tok)})")
