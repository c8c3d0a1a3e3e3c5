"""Deferred-KV scatter lab: why does installing [L, B, F] rows into the
[L, 2, S, F] pool cost 2 ms (~55x its bytes) at B=256, and what fixes it?

Variants:
  xla       — production .at[].set(mode="drop")
  xla_uniq  — + unique_indices=True
  pallas    — grid (L,) kernel; per-row DMAs from VMEM staging into the
              HBM pool at slot offsets (input_output_aliased)
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

L, B, F = 28, 256, 1024
S = 65536
BS = 64

key = jax.random.PRNGKey(0)
kv = jnp.zeros((L, 2, S, F), jnp.bfloat16)
k_news = jax.random.normal(key, (L, B, F), jnp.bfloat16)
v_news = jax.random.normal(key, (L, B, F), jnp.bfloat16)
slots = jnp.asarray((np.arange(B) * 97) % S, jnp.int32).reshape(B, 1)


def xla_scatter(kv, k_news, v_news, slot_mapping, unique=False):
    L_, _, S_, F_ = kv.shape
    sl = slot_mapping.reshape(-1)
    flat = kv.reshape(L_ * 2 * S_, F_)
    l_idx = jnp.arange(L_, dtype=jnp.int32)[:, None]
    valid = sl[None, :] < S_
    oob = L_ * 2 * S_
    k_idx = jnp.where(valid, (l_idx * 2) * S_ + sl[None, :], oob)
    v_idx = jnp.where(valid, (l_idx * 2 + 1) * S_ + sl[None, :], oob)
    kw = dict(mode="drop")
    if unique:
        kw["unique_indices"] = True
    flat = flat.at[k_idx.reshape(-1)].set(k_news.reshape(-1, F_).astype(flat.dtype), **kw)
    flat = flat.at[v_idx.reshape(-1)].set(v_news.reshape(-1, F_).astype(flat.dtype), **kw)
    return flat.reshape(L_, 2, S_, F_)


def _scatter_kernel(slots_ref, k_ref, v_ref, pool_ref, out_ref, sem):
    # grid (L,): write B K-rows and B V-rows of this layer into the pool.
    # Sources stay in HBM (VMEM sublane slicing at row granularity is not
    # lowerable); HBM->HBM row DMAs, all in flight at once, one drain.
    del pool_ref  # aliased with out_ref
    li = pl.program_id(0)

    def copies():
        for plane, src in ((0, k_ref), (1, v_ref)):
            for b in range(B):
                s = slots_ref[b]
                yield s, pltpu.make_async_copy(
                    src.at[li, pl.ds(b, 1)],
                    out_ref.at[li, plane, pl.ds(s, 1)],
                    sem.at[plane],
                )

    for s, dma in copies():
        @pl.when(s < S)
        def _(dma=dma):
            dma.start()
    for s, dma in copies():
        @pl.when(s < S)
        def _(dma=dma):
            dma.wait()


@functools.partial(jax.jit, donate_argnums=(0,))
def pallas_scatter(kv, k_news, v_news, slot_mapping):
    sl = slot_mapping.reshape(-1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # k rows stay in HBM
            pl.BlockSpec(memory_space=pltpu.ANY),  # v rows stay in HBM
            pl.BlockSpec(memory_space=pltpu.ANY),  # pool stays in HBM
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA((2,))],
    )
    return pl.pallas_call(
        _scatter_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(kv.shape, kv.dtype),
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(sl, k_news, v_news, kv)


def timeit(tag, fn):
    global kv
    # chain R applications in-graph, differenced
    def run(kv, R):
        def body(i, kv):
            return fn(kv, k_news, v_news, slots)
        return jax.lax.fori_loop(0, R, body, kv)

    fs = {R: jax.jit(functools.partial(run, R=R), donate_argnums=(0,)) for R in (2, 10)}

    def m(R, n=3):
        global kv
        kv = fs[R](kv)
        jax.block_until_ready(kv)
        t0 = time.perf_counter()
        for _ in range(n):
            kv = fs[R](kv)
            np.asarray(kv[0, 0, 0, :1])
        return (time.perf_counter() - t0) / n

    per = (m(10) - m(2)) / 8
    print(f"{tag:10s} {per*1e3:7.3f} ms/scatter", flush=True)


timeit("xla", lambda kv, k, v, s: xla_scatter(kv, k, v, s))
timeit("xla_uniq", lambda kv, k, v, s: xla_scatter(kv, k, v, s, unique=True))
timeit("pallas", lambda kv, k, v, s: pallas_scatter(kv, k, v, s))
