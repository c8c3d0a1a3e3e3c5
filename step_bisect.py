"""In-situ decode-step component costs via program bisection.

Builds the real 8B int4 multi-step program, then recompiles it with one
component stubbed out at a time; the k32-vs-k8 differenced per-token time
drop is that component's true in-situ cost (all in ONE process to cancel
chip/tunnel drift).
"""
import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

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


def measure(tag):
    # fresh jit wrapper each time so patched functions re-trace
    jit_multi = jax.jit(
        runner._multi_step_impl,
        static_argnames=("n_steps", "needs_filters", "needs_penalties"),
    )
    st, nf, npen, _ = runner.prepare_sampling([seq], 8)
    bt = np.zeros((8, 128), np.int32)
    bt[0, :48] = range(48)
    args = (
        runner.params, runner.kv,
        jnp.asarray(np.full((8,), 3, np.int32)),
        jnp.asarray(np.full((8,), 118, np.int32)),
        jnp.asarray(bt),
        jnp.asarray(np.array([True] * 1 + [False] * 7)),
        jnp.zeros((8,), jnp.int32),
        st, runner._base_key,
    )

    def run_k(k, n=3):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            _, out = jit_multi(*args, n_steps=k, needs_filters=nf, needs_penalties=npen)
            np.asarray(out)
            ts.append(time.perf_counter() - t0)
        return min(ts)

    run_k(8, n=1); run_k(32, n=1)
    vals = []
    for _ in range(3):
        vals.append((run_k(32) - run_k(8)) / 24)
    v = float(np.median(vals)) * 1e3
    print(f"{tag:24s} {v:6.2f} ms/tok", flush=True)
    return v


base = measure("full step")

# --- stub the lm_head -------------------------------------------------------
import vllm_rs_tpu.models.llama as ml

orig_logits = CausalLM.compute_logits

def no_head(self, params, hidden, meta):
    from vllm_rs_tpu.models.layers import gather_last_hidden
    last = gather_last_hidden(hidden, meta)  # [B, D]
    V = self.config.vocab_size
    reps = -(-V // last.shape[-1])
    return jnp.tile(last.astype(jnp.float32), (1, reps))[:, :V]

CausalLM.compute_logits = no_head
nohead = measure("no lm_head")
CausalLM.compute_logits = orig_logits

# --- stub decode attention --------------------------------------------------
import vllm_rs_tpu.models.layers as layers_mod

orig_attn_def = layers_mod.attention_block_deferred

def no_attn(lp, h, meta, kv_l, config, **kw):
    from vllm_rs_tpu.models.layers import linear, qkv_rope
    B, T, _ = h.shape
    q, k, v = qkv_rope(lp, h, meta, config)  # keep projections + rope
    o = linear(lp["o"], q.reshape(B, T, -1))
    return o, k, v

layers_mod.attention_block_deferred = no_attn
ml.attention_block_deferred = no_attn
noattn = measure("no paged attention")
layers_mod.attention_block_deferred = orig_attn_def
ml.attention_block_deferred = orig_attn_def

# --- stub the KV scatter ----------------------------------------------------
import vllm_rs_tpu.ops.attention as attn_mod

orig_scatter = attn_mod.scatter_deferred_kv
no_scatter = lambda kv, k, v, s: kv  # noqa: E731
attn_mod.scatter_deferred_kv = no_scatter
ml.scatter_deferred_kv = no_scatter
noscat = measure("no kv scatter")
attn_mod.scatter_deferred_kv = orig_scatter
ml.scatter_deferred_kv = orig_scatter

print(f"# head={base-nohead:.2f} attn={base-noattn:.2f} scatter={base-noscat:.2f} rest={nohead+noattn+noscat-2*base:.2f}")
