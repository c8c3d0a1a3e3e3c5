"""In-situ decode-step component costs for the 0.6b batch-256 regime
(step_bisect.py adapted — k32-vs-k8 differenced in one process)."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from vllm_rs_tpu.config import (
    CacheConfig, EngineConfig, ModelConfig, SamplingParams, SchedulerConfig,
)
from vllm_rs_tpu.core.runner import ModelRunner
from vllm_rs_tpu.core.sequence import Sequence
from vllm_rs_tpu.models.llama import CausalLM

B = 256
CTX = 192
BS = 64
model_cfg = ModelConfig(
    model_type="qwen3", hidden_size=1024, intermediate_size=3072,
    num_hidden_layers=28, num_attention_heads=16, num_key_value_heads=8,
    head_dim=128, vocab_size=151936, max_position_embeddings=32768,
    rope_theta=1000000.0, qk_norm=True, tie_word_embeddings=True,
    eos_token_ids=(151645,),
)
econfig = EngineConfig(
    model=model_cfg, cache=CacheConfig(block_size=BS, num_blocks=1024),
    scheduler=SchedulerConfig(max_num_seqs=B, chunk_size=2048, max_model_len=1024),
    decode_buckets=(B,),
)
m = CausalLM(model_cfg, block_size=BS)
t0 = time.time()
params = jax.block_until_ready(m.init_params(jax.random.PRNGKey(0)))
print(f"# init {time.time()-t0:.0f}s", file=sys.stderr)
runner = ModelRunner(m, params, econfig)

pages = -(-CTX // BS)
MBT = 6  # block-table tier

seqs = []
for r in range(B):
    s = Sequence(list(range(1, CTX)), SamplingParams(temperature=0.0, max_tokens=600, ignore_eos=True))
    s.block_table = list(range(r * pages, (r + 1) * pages))
    s.num_cached_tokens = CTX - 1
    s.append_token(3)
    seqs.append(s)


def measure(tag):
    jit_multi = jax.jit(
        runner._multi_step_impl,
        static_argnames=("n_steps", "needs_filters", "needs_penalties"),
    )
    st, nf, npen, _ = runner.prepare_sampling(seqs, B)
    bt = np.zeros((B, MBT), np.int32)
    for r in range(B):
        bt[r, :pages] = seqs[r].block_table
    args = (
        runner.params, runner.kv,
        jnp.asarray(np.full((B,), 3, np.int32)),
        jnp.asarray(np.full((B,), CTX - 1, np.int32)),
        jnp.asarray(bt),
        jnp.asarray(np.array([True] * B)),
        jnp.zeros((B,), jnp.int32),
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
    print(f"{tag:24s} {v:6.2f} ms/step({B} rows)", flush=True)
    return v


base = measure("full step")

import vllm_rs_tpu.models.llama as ml

orig_logits = CausalLM.compute_logits

def no_head(self, params, hidden, meta):
    from vllm_rs_tpu.models.layers import gather_last_hidden
    last = gather_last_hidden(hidden, meta)
    V = self.config.vocab_size
    reps = -(-V // last.shape[-1])
    return jnp.tile(last.astype(jnp.float32), (1, reps))[:, :V]

CausalLM.compute_logits = no_head
nohead = measure("no lm_head")
CausalLM.compute_logits = orig_logits

import vllm_rs_tpu.models.layers as layers_mod

orig_attn_def = layers_mod.attention_block_deferred

def no_attn(lp, h, meta, kv_l, config, **kw):
    from vllm_rs_tpu.models.layers import linear, qkv_rope
    B_, T, _ = h.shape
    q, k, v = qkv_rope(lp, h, meta, config)
    o = linear(lp["o"], q.reshape(B_, T, -1))
    return o, k, v

layers_mod.attention_block_deferred = no_attn
ml.attention_block_deferred = no_attn
noattn = measure("no paged attention")
layers_mod.attention_block_deferred = orig_attn_def
ml.attention_block_deferred = orig_attn_def

import vllm_rs_tpu.ops.attention as attn_mod

orig_scatter = attn_mod.scatter_deferred_kv
no_scatter = lambda kv, k, v, s: kv  # noqa: E731
attn_mod.scatter_deferred_kv = no_scatter
ml.scatter_deferred_kv = no_scatter
noscat = measure("no kv scatter")
attn_mod.scatter_deferred_kv = orig_scatter
ml.scatter_deferred_kv = orig_scatter

# sampling: stub the sampler to plain argmax-free passthrough
import vllm_rs_tpu.ops.sampling as samp_mod

orig_sample = samp_mod.sample
def no_sample(logits, st, key, **kw):
    return jnp.zeros((logits.shape[0],), jnp.int32)
samp_mod.sample = no_sample
import vllm_rs_tpu.core.runner as runner_mod
runner_mod.sample = no_sample
nosamp = measure("no sampling")
samp_mod.sample = orig_sample
runner_mod.sample = orig_sample

print(
    f"# head={base-nohead:.2f} attn={base-noattn:.2f} "
    f"scatter={base-noscat:.2f} sampling={base-nosamp:.2f}",
    flush=True,
)
