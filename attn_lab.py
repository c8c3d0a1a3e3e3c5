"""Decode paged-attention kernel lab: in-situ-style chained timing.

Measures the per-layer decode attention cost for bench-realistic shapes:
B=8 rows (1 active), context ~376, block_size 16, varying block-table
width (MB tier) and pages-per-step (P).
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from vllm_rs_tpu.ops.attn_meta import AttnMeta
from vllm_rs_tpu.ops.pallas.paged_attention import paged_attention_decode_pallas

key = jax.random.PRNGKey(0)
B, Hq, Hk, D, bs = 8, 32, 8, 128, 16
S = 8192
L = 32

k_cache = jax.random.normal(key, (S, Hk * D), jnp.bfloat16)
v_cache = jax.random.normal(key, (S, Hk * D), jnp.bfloat16)
q = jax.random.normal(key, (B, 1, Hq, D), jnp.bfloat16)
ks = jax.random.normal(key, (B, 1, Hk, D), jnp.bfloat16)
vs = jax.random.normal(key, (B, 1, Hk, D), jnp.bfloat16)


def run_case(MB, P, ctx, active_rows=1):
    bt = np.zeros((B, MB), np.int32)
    cl = np.zeros((B,), np.int32)
    for r in range(active_rows):
        blocks = -(-ctx // bs)
        bt[r, :blocks] = np.arange(blocks) + r * blocks
        cl[r] = ctx
    meta = AttnMeta(
        positions=jnp.full((B, 1), ctx - 1, jnp.int32),
        slot_mapping=jnp.full((B, 1), S, jnp.int32),
        block_tables=jnp.asarray(bt),
        context_lens=jnp.asarray(cl),
        last_token_idx=jnp.zeros((B,), jnp.int32),
    )

    def one(h, _):
        o = paged_attention_decode_pallas(
            h, k_cache, v_cache, meta,
            block_size=bs, scale=0.088, pages_per_step=P,
            k_self=ks, v_self=vs,
        )
        return o, None

    def run(h, R):
        def outer(i, h):
            h2, _ = jax.lax.scan(lambda h, x: one(h, x), h, None, length=L)
            return h2
        return jnp.sum(jax.lax.fori_loop(0, R, outer, h))

    fs = {R: jax.jit(functools.partial(run, R=R)) for R in (2, 10)}

    def m(R, n=3):
        float(np.asarray(fs[R](q)))
        t0 = time.perf_counter()
        for _ in range(n):
            float(np.asarray(fs[R](q)))
        return (time.perf_counter() - t0) / n

    per_layer = (m(10) - m(2)) / (8 * L)
    total = per_layer * L * 1e3
    print(
        f"MB={MB:4d} P={P:2d} ctx={ctx} rows={active_rows}: "
        f"{per_layer*1e6:7.1f} us/layer -> {total:5.2f} ms/step(32L)",
        flush=True,
    )


if "base" in sys.argv:
    for MB, P in ((32, 8), (32, 16), (32, 32), (128, 8), (128, 16), (128, 32)):
        run_case(MB, P, ctx=376)
    run_case(32, 8, ctx=376, active_rows=8)
    run_case(128, 8, ctx=1920, active_rows=1)


# -- variant: host-precomputed clamped walk table ---------------------------


def run_case_precomputed(MB, P, ctx, active_rows=1):
    bt = np.zeros((B, MB), np.int32)
    cl = np.zeros((B,), np.int32)
    for r in range(active_rows):
        blocks = -(-ctx // bs)
        bt[r, :blocks] = np.arange(blocks) + r * blocks
        cl[r] = ctx
    # clamp walk indices on the host: walk[b, p] = bt[b, min(p, last)]
    last = np.maximum(cl - 1, 0) // bs
    walk = bt[np.arange(B)[:, None], np.minimum(np.arange(MB)[None, :], last[:, None])]
    meta = AttnMeta(
        positions=jnp.full((B, 1), ctx - 1, jnp.int32),
        slot_mapping=jnp.full((B, 1), S, jnp.int32),
        block_tables=jnp.asarray(walk),
        context_lens=jnp.asarray(cl),
        last_token_idx=jnp.zeros((B,), jnp.int32),
    )

    def one(h, _):
        o = paged_attention_decode_pallas(
            h, k_cache, v_cache, meta,
            block_size=bs, scale=0.088, pages_per_step=P,
            k_self=ks, v_self=vs, precomputed_walk=True,
        )
        return o, None

    def runner(h, R):
        def outer(i, h):
            h2, _ = jax.lax.scan(lambda h, x: one(h, x), h, None, length=L)
            return h2
        return jnp.sum(jax.lax.fori_loop(0, R, outer, h))

    fs = {R: jax.jit(functools.partial(runner, R=R)) for R in (2, 10)}

    def m(R, n=3):
        float(np.asarray(fs[R](q)))
        t0 = time.perf_counter()
        for _ in range(n):
            float(np.asarray(fs[R](q)))
        return (time.perf_counter() - t0) / n

    per_layer = (m(10) - m(2)) / (8 * L)
    print(
        f"PRECOMP MB={MB:4d} P={P:2d} ctx={ctx} rows={active_rows}: "
        f"{per_layer*1e6:7.1f} us/layer -> {per_layer*L*1e3:5.2f} ms/step(32L)",
        flush=True,
    )


run_case_precomputed(32, 8, 376)
run_case_precomputed(32, 16, 376)
run_case_precomputed(128, 8, 376)
run_case_precomputed(128, 8, 1920)
