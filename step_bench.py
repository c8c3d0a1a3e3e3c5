"""Full 8B decode-step timing under different quant matmul backends."""
import os, sys, time
import jax, jax.numpy as jnp, numpy as np

BACKEND = sys.argv[1]  # pallas | reference
QUANT = sys.argv[2] if len(sys.argv) > 2 else "int4"

import vllm_rs_tpu.ops.quant_matmul as qm
_orig = qm.quant_matmul
def forced(x, qt, backend="auto"):
    return _orig(x, qt, backend=BACKEND)
qm.quant_matmul = forced
import vllm_rs_tpu.models.layers as ml
ml.quant_matmul = forced

from vllm_rs_tpu.config import CacheConfig, EngineConfig, ModelConfig, SamplingParams, SchedulerConfig
from vllm_rs_tpu.core.runner import ModelRunner
from vllm_rs_tpu.core.scheduler import ScheduledBatch
from vllm_rs_tpu.core.sequence import Sequence
from vllm_rs_tpu.models.llama import CausalLM

import os as _os
D, I, V = 4096, 14336, int(_os.environ.get("VOCAB", "128256"))
model_cfg = ModelConfig(model_type="llama", hidden_size=D, intermediate_size=I,
    num_hidden_layers=int(_os.environ.get("LAYERS", "32")), num_attention_heads=32, num_key_value_heads=8,
    vocab_size=V, max_position_embeddings=8192, rope_theta=500000.0,
    eos_token_ids=(128001,))
econfig = EngineConfig(model=model_cfg,
    cache=CacheConfig(block_size=16, num_blocks=512),
    scheduler=SchedulerConfig(max_num_seqs=8, chunk_size=1024, max_model_len=int(__import__("os").environ.get("MML", "2048"))),
    quant=QUANT, decode_buckets=(8,))
m = CausalLM(model_cfg, block_size=16)
t0 = time.time()
params = m.init_params(jax.random.PRNGKey(0), quant=QUANT, quant_group=128)
params = jax.block_until_ready(params)
print(f"# init {time.time()-t0:.0f}s", file=sys.stderr)
runner = ModelRunner(m, params, econfig)

seq = Sequence(list(range(1, 120)), SamplingParams(temperature=0.0, max_tokens=256, ignore_eos=True))
seq.block_table = list(range(8))
seq.num_cached_tokens = 119
seq.append_token(3)
batch = ScheduledBatch(kind="decode", seqs=[seq])

token_ids, meta = runner.prepare_decode(batch)
st, nf, npen, mask = runner.prepare_sampling(batch.seqs, token_ids.shape[0])
kv = runner.kv
def step(kv):
    return runner._jit_step(runner.params, kv, token_ids, meta, st, runner._base_key, mask,
                            needs_filters=nf, needs_penalties=npen)
for _ in range(3):
    kv, tok, _ = step(kv)
jax.block_until_ready(tok)
N = 25
t0 = time.perf_counter()
for _ in range(N):
    kv, tok, _ = step(kv)
jax.block_until_ready(tok)
dt = (time.perf_counter() - t0) / N
wbytes = 32 * (4*D*D + 3*D*I) * (0.5 if QUANT == "int4" else 1) + D*V
print(f"{BACKEND}/{QUANT}: step {dt*1e3:.2f} ms = {1/dt:.1f} tok/s  (weight-stream {wbytes/dt/1e9:.0f} GB/s)")

# separate compute from host-transfer latency
t0 = time.perf_counter()
for _ in range(N):
    kv, tok, _ = step(kv)
    v = int(np.asarray(tok)[0])  # force device->host round trip per step
dt2 = (time.perf_counter() - t0) / N
print(f"with per-step host fetch: {dt2*1e3:.2f} ms = {1/dt2:.1f} tok/s")

# one fetch at the end of 25 chained steps
t0 = time.perf_counter()
for _ in range(N):
    kv, tok, _ = step(kv)
v = int(np.asarray(tok)[0])
dt3 = (time.perf_counter() - t0) / N
print(f"chained, one final fetch: {dt3*1e3:.2f} ms/step = {1/dt3:.1f} tok/s")

# pure RTT: fetch a tiny array repeatedly
small = jnp.zeros((4,), jnp.int32)
t0 = time.perf_counter()
for _ in range(10):
    _ = np.asarray(small) 
    small = small + 1
print(f"tiny transfer+op RTT: {(time.perf_counter()-t0)/10*1e3:.2f} ms")
