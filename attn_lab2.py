"""Does scanning the KV pool as scan-xs force per-layer 32MB slice copies
into the pallas operand? Compare: (a) per-layer caches scanned as xs (the
engine's deferred-decode structure), (b) the same total work with a single
cache closed over (no slicing)."""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from vllm_rs_tpu.ops.attn_meta import AttnMeta
from vllm_rs_tpu.ops.pallas.paged_attention import paged_attention_decode_pallas

key = jax.random.PRNGKey(0)
B, Hq, Hk, D, bs = 8, 32, 8, 128, 16
S, L = 8192, 32
F = Hk * D

kv_pool = jax.random.normal(key, (L, 2, S, F), jnp.bfloat16)  # 1.07 GB
q = jax.random.normal(key, (B, 1, Hq, D), jnp.bfloat16)
ks = jax.random.normal(key, (B, 1, Hk, D), jnp.bfloat16)
vs = jax.random.normal(key, (B, 1, Hk, D), jnp.bfloat16)

MB, ctx = 128, 376
bt = np.zeros((B, MB), np.int32)
cl = np.zeros((B,), np.int32)
blocks = -(-ctx // bs)
bt[0, :blocks] = np.arange(blocks)
cl[0] = ctx
meta = AttnMeta(
    positions=jnp.full((B, 1), ctx - 1, jnp.int32),
    slot_mapping=jnp.full((B, 1), S, jnp.int32),
    block_tables=jnp.asarray(bt),
    context_lens=jnp.asarray(cl),
    last_token_idx=jnp.zeros((B,), jnp.int32),
)


def attn(h, kv_l):
    o = paged_attention_decode_pallas(
        h, kv_l[0], kv_l[1], meta,
        block_size=bs, scale=0.088, k_self=ks, v_self=vs,
    )
    return (o + h).astype(jnp.bfloat16)


def timed(make_run, tag):
    fs = {R: jax.jit(functools.partial(make_run, R=R)) for R in (2, 10)}

    def m(R, n=3):
        float(np.asarray(fs[R](q, kv_pool)))
        t0 = time.perf_counter()
        for _ in range(n):
            float(np.asarray(fs[R](q, kv_pool)))
        return (time.perf_counter() - t0) / n

    per_layer = (m(10) - m(2)) / (8 * L)
    print(f"{tag:28s} {per_layer*1e6:7.1f} us/layer -> {per_layer*L*1e3:5.2f} ms/step(32L)", flush=True)


def run_scan_xs(h, pool, R):
    def outer(i, h):
        h2, _ = jax.lax.scan(lambda h, kv_l: (attn(h, kv_l), None), h, pool)
        return h2
    return jnp.sum(jax.lax.fori_loop(0, R, outer, h))


def run_closure(h, pool, R):
    # same calls but the kernel reads the SAME layer each time (no slicing)
    kv0 = pool[0]

    def outer(i, h):
        def body(j, h):
            return attn(h, kv0)
        return jax.lax.fori_loop(0, L, body, h)
    return jnp.sum(jax.lax.fori_loop(0, R, outer, h))


def run_dynslice(h, pool, R):
    # explicit per-layer dynamic_slice consumed by the kernel
    def outer(i, h):
        def body(j, h):
            kv_l = jax.lax.dynamic_index_in_dim(pool, j, axis=0, keepdims=False)
            return attn(h, kv_l)
        return jax.lax.fori_loop(0, L, body, h)
    return jnp.sum(jax.lax.fori_loop(0, R, outer, h))


timed(run_closure, "closure same-layer")
timed(run_scan_xs, "scan-xs slicing")
timed(run_dynslice, "fori dynamic_slice")
