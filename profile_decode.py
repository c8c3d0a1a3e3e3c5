"""Component-level profiling of the batch-1 decode step at 8B shapes.

Usage: python profile_decode.py   (on the real TPU chip)
Not part of the test suite — a perf-investigation tool.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=20, warmup=3, **kw):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args, **kw))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    from vllm_rs_tpu.quant.pack import quantize_int4, quantize_int8

    key = jax.random.PRNGKey(0)
    D, I, V = 4096, 14336, 128256
    M = 8  # decode bucket

    x = jax.random.normal(key, (M, D), dtype=jnp.bfloat16)
    xi = jax.random.normal(key, (M, I), dtype=jnp.bfloat16)

    def mk_int4(K, N):
        w = jax.random.normal(key, (K, N), dtype=jnp.float32) * 0.02
        return quantize_int4(w, group=128)

    from vllm_rs_tpu.ops.pallas.quant_matmul import quant_matmul_pallas

    for name, K, N, xx in (
        ("qkv-ish  [4096->4096]", D, D, x),
        ("gate/up  [4096->14336]", D, I, x),
        ("down     [14336->4096]", I, D, xi),
    ):
        qt = mk_int4(K, N)
        f = jax.jit(lambda a, q=qt: quant_matmul_pallas(a, q))
        t = timeit(f, xx)
        bytes_w = K * N // 2 + (K // 128) * N * 8
        print(f"int4 {name}: {t*1e6:9.1f} us  ({bytes_w/t/1e9:7.1f} GB/s weight stream)")

    # lm_head int8
    w8 = quantize_int8(jax.random.normal(key, (D, V), dtype=jnp.float32) * 0.02, group=128)
    f8 = jax.jit(lambda a: quant_matmul_pallas(a, w8))
    t = timeit(f8, x)
    print(f"int8 lm_head [4096->128256]: {t*1e6:9.1f} us ({(D*V + D//128*V*4)/t/1e9:7.1f} GB/s)")

    # paged attention decode at 8B shapes
    from vllm_rs_tpu.ops.attention import paged_attention
    from vllm_rs_tpu.ops.attn_meta import AttnMeta

    Hq, Hk, Dh = 32, 8, 128
    S = 8192
    block_size = 16
    MB = 128  # max blocks/seq = 2048 tokens
    kc = jax.random.normal(key, (S, Hk * Dh), dtype=jnp.bfloat16)
    vc = jax.random.normal(key, (S, Hk * Dh), dtype=jnp.bfloat16)
    q = jax.random.normal(key, (M, 1, Hq, Dh), dtype=jnp.bfloat16)
    kn = jax.random.normal(key, (M, 1, Hk, Dh), dtype=jnp.bfloat16)
    meta = AttnMeta(
        positions=jnp.full((M, 1), 511, jnp.int32),
        slot_mapping=jnp.arange(M, dtype=jnp.int32)[:, None] * 16 + 511 % 16,
        block_tables=jnp.tile(jnp.arange(MB, dtype=jnp.int32)[None], (M, 1)),
        context_lens=jnp.full((M,), 512, jnp.int32),
        last_token_idx=jnp.zeros((M,), jnp.int32),
    )
    f_attn = jax.jit(
        lambda q, kn, vn, kc, vc: paged_attention(
            q, kn, vn, kc, vc, meta, block_size=block_size, scale=0.088
        )[0]
    )
    t = timeit(f_attn, q, kn, kn, kc, vc)
    # bytes touched: whole block table span = MB*16 slots
    by = 2 * MB * 16 * Hk * Dh * 2 * M
    print(f"paged attn decode (ctx 512/2048 pages, B={M}): {t*1e6:9.1f} us ({by/t/1e9:7.1f} GB/s)")

    # full jitted decode step on the tiny-8b runner
    from vllm_rs_tpu.config import CacheConfig, EngineConfig, ModelConfig, SamplingParams, SchedulerConfig
    from vllm_rs_tpu.core.runner import ModelRunner
    from vllm_rs_tpu.core.scheduler import ScheduledBatch
    from vllm_rs_tpu.core.sequence import Sequence
    from vllm_rs_tpu.models.llama import CausalLM

    model_cfg = ModelConfig(
        model_type="llama", hidden_size=D, intermediate_size=I,
        num_hidden_layers=32, num_attention_heads=Hq, num_key_value_heads=Hk,
        vocab_size=V, max_position_embeddings=8192, rope_theta=500000.0,
        eos_token_ids=(128001,),
    )
    econfig = EngineConfig(
        model=model_cfg,
        cache=CacheConfig(block_size=16, num_blocks=512),
        scheduler=SchedulerConfig(max_num_seqs=8, chunk_size=1024, max_model_len=2048),
        quant="int4",
    )
    m = CausalLM(model_cfg, block_size=16)
    t0 = time.time()
    params = m.init_params(jax.random.PRNGKey(0), quant="int4", quant_group=128)
    params = jax.block_until_ready(params)
    print(f"# init: {time.time()-t0:.1f}s")
    runner = ModelRunner(m, params, econfig)

    seq = Sequence(list(range(1, 120)), SamplingParams(temperature=0.0, max_tokens=256, ignore_eos=True))
    seq.block_table = list(range(8))
    seq.num_cached_tokens = 119
    seq.append_token(3)
    batch = ScheduledBatch(kind="decode", seqs=[seq])

    # measure: full runner.run (incl host), then jitted step only
    for _ in range(3):
        runner.run(batch)
    t0 = time.perf_counter()
    NSTEP = 20
    for _ in range(NSTEP):
        runner.run(batch)
    t_run = (time.perf_counter() - t0) / NSTEP
    print(f"runner.run decode step: {t_run*1e3:8.2f} ms  ({1/t_run:6.1f} tok/s)")

    token_ids, meta = runner.prepare_decode(batch)
    st, nf, npen, mask = runner.prepare_sampling(batch.seqs, token_ids.shape[0])
    kv = runner.kv
    f_step = lambda kv: runner._jit_step(
        runner.params, kv, token_ids, meta, st, runner._base_key, mask,
        needs_filters=nf, needs_penalties=npen,
    )
    for _ in range(3):
        kv, tok, _ = f_step(kv)
    jax.block_until_ready(tok)
    t0 = time.perf_counter()
    for _ in range(NSTEP):
        kv, tok, _ = f_step(kv)
    jax.block_until_ready(tok)
    t_step = (time.perf_counter() - t0) / NSTEP
    print(f"jitted step only:       {t_step*1e3:8.2f} ms  ({1/t_step:6.1f} tok/s)")

    # forward without sampling
    f_fwd = jax.jit(lambda kv: m.step(params, token_ids, meta, kv))
    kv2, logits = f_fwd(kv)
    jax.block_until_ready(logits)
    t0 = time.perf_counter()
    for _ in range(NSTEP):
        kv2, logits = f_fwd(kv2)
    jax.block_until_ready(logits)
    print(f"model.step only:        {(time.perf_counter()-t0)/NSTEP*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
