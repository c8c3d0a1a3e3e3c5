import sys, time, functools
import jax, jax.numpy as jnp, numpy as np

from vllm_rs_tpu.config import CacheConfig, EngineConfig, ModelConfig, SamplingParams, SchedulerConfig
from vllm_rs_tpu.core.runner import ModelRunner
from vllm_rs_tpu.core.scheduler import ScheduledBatch
from vllm_rs_tpu.core.sequence import Sequence
from vllm_rs_tpu.models.llama import CausalLM

D, I, V = 4096, 14336, 128256
model_cfg = ModelConfig(model_type="llama", hidden_size=D, intermediate_size=I,
    num_hidden_layers=32, num_attention_heads=32, num_key_value_heads=8,
    vocab_size=V, max_position_embeddings=8192, rope_theta=500000.0,
    eos_token_ids=(128001,))
econfig = EngineConfig(model=model_cfg,
    cache=CacheConfig(block_size=16, num_blocks=512),
    scheduler=SchedulerConfig(max_num_seqs=8, chunk_size=1024, max_model_len=2048),
    quant="int4", decode_buckets=(8,))
m = CausalLM(model_cfg, block_size=16)
params = m.init_params(jax.random.PRNGKey(0), quant="int4", quant_group=128)
params = jax.block_until_ready(params)
runner = ModelRunner(m, params, econfig)

seq = Sequence(list(range(1, 120)), SamplingParams(temperature=0.0, max_tokens=256, ignore_eos=True))
seq.block_table = list(range(8)); seq.num_cached_tokens = 119; seq.append_token(3)
batch = ScheduledBatch(kind="decode", seqs=[seq])
token_ids, meta = runner.prepare_decode(batch)
kv = runner.kv

def timed(name, fn, R1=1, R2=5, n=2):
    fs = {}
    for R in (R1, R2):
        def run(kv, R=R):
            def body(i, carry):
                kv, acc = carry
                kv2, out = fn(kv)
                return (kv2, acc + jnp.sum(out.astype(jnp.float32)))
            kv, acc = jax.lax.fori_loop(0, R, body, (kv, jnp.float32(0)))
            return acc
        fs[R] = jax.jit(run)
        float(np.asarray(fs[R](kv)))
    def meas(R):
        t0 = time.perf_counter()
        for _ in range(n): v = float(np.asarray(fs[R](kv)))
        return (time.perf_counter() - t0) / n
    tA, tB = meas(R1), meas(R2)
    dt = (tB - tA) / (R2 - R1)
    print(f"{name:34s} {dt*1e3:8.2f} ms/step")
    return dt

which = sys.argv[1] if len(sys.argv) > 1 else "step"

def fwd_only(kv):
    kv, h = m.forward(params, token_ids, meta, kv)
    return kv, h

if which == "step":
    timed("model.step (fwd+logits)", lambda kv: m.step(params, token_ids, meta, kv))
elif which == "fwd":
    timed("forward only (no lm_head)", fwd_only)
elif which == "noattn":
    import vllm_rs_tpu.models.layers as ml
    ml.paged_attention = lambda q, k, v, kv_l, meta, **kw: (q, kv_l)
    timed("forward, attention stubbed", fwd_only)

elif which == "attn":
    from vllm_rs_tpu.ops.attention import paged_attention
    q = jax.random.normal(jax.random.PRNGKey(1), (8, 1, 32, 128), jnp.bfloat16)
    kn = jax.random.normal(jax.random.PRNGKey(2), (8, 1, 8, 128), jnp.bfloat16)
    def attn_only(kv):
        def f(carry, kv_l):
            out, kv_l2 = paged_attention(q, kn, kn, kv_l, meta, block_size=16, scale=0.088)
            return carry + jnp.sum(out.astype(jnp.float32)), kv_l2
        acc, kv2 = jax.lax.scan(f, jnp.float32(0), kv)
        return kv2, acc
    timed("attention+kvwrite x32 layers", attn_only)
elif which == "head":
    hid = jax.random.normal(jax.random.PRNGKey(3), (8, 1, D), jnp.bfloat16)
    timed("lm_head+norm only", lambda kv: (kv, m.compute_logits(params, hid, meta)))
