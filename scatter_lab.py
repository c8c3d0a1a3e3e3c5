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

_kk, _kv = jax.random.split(jax.random.PRNGKey(0))  # distinct K/V so a
kv = jnp.zeros((L, 2, S, F), jnp.bfloat16)          # plane swap is caught
k_news = jax.random.normal(_kk, (L, B, F), jnp.bfloat16)
v_news = jax.random.normal(_kv, (L, B, F), jnp.bfloat16)
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


def _scatter_kernel_flat(slots_ref, k_ref, v_ref, pool_ref, out_ref, sem):
    # grid (L,): same row DMAs but over FLAT 1-D memrefs — Mosaic rejects
    # 1-row slices of (8,128)-tiled 2-D memrefs; 1-D slices only need lane
    # alignment and every offset here is a multiple of F=1024.
    del pool_ref
    li = pl.program_id(0)

    def copies():
        for plane, src in ((0, k_ref), (1, v_ref)):
            for b in range(B):
                s = slots_ref[b]
                yield s, pltpu.make_async_copy(
                    src.at[pl.ds((li * B + b) * F, F)],
                    out_ref.at[pl.ds(((2 * li + plane) * S + s) * F, F)],
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
def pallas_scatter_flat(kv, k_news, v_news, slot_mapping):
    sl = slot_mapping.reshape(-1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA((2,))],
    )
    out = pl.pallas_call(
        _scatter_kernel_flat,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((L * 2 * S * F,), kv.dtype),
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(sl, k_news.reshape(-1), v_news.reshape(-1), kv.reshape(-1))
    return out.reshape(L, 2, S, F)


HK, D = 8, 128


def _scatter_kernel_3d(slots_ref, k_ref, v_ref, pool_ref, out_ref, sem):
    # grid (L,): row DMAs over [rows, Hk, D]-shaped memrefs — only the
    # UNTILED leading dim is sliced; the tiled trailing dims (Hk, D) stay
    # full-extent (the pattern the paged-attention page DMAs use).
    del pool_ref
    li = pl.program_id(0)

    def copies():
        for plane, src in ((0, k_ref), (1, v_ref)):
            for b in range(B):
                s = slots_ref[b]
                yield s, pltpu.make_async_copy(
                    src.at[pl.ds(li * B + b, 1)],
                    out_ref.at[pl.ds((2 * li + plane) * S + s, 1)],
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
def pallas_scatter_3d(kv, k_news, v_news, slot_mapping):
    sl = slot_mapping.reshape(-1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA((2,))],
    )
    out = pl.pallas_call(
        _scatter_kernel_3d,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((L * 2 * S, HK, D), kv.dtype),
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(
        sl,
        k_news.reshape(L * B, HK, D),
        v_news.reshape(L * B, HK, D),
        kv.reshape(L * 2 * S, HK, D),
    )
    return out.reshape(L, 2, S, F)


def check(fn):
    """Written-row verification against k_news/v_news (includes a pad
    slot). Reuses (donates) the single global pool — a reference XLA pool
    plus a test pool would be 3 x 7.5 GB and OOM the chip."""
    global kv
    sl = np.asarray(slots).copy()
    sl[5, 0] = S  # pad row: must be dropped
    sl_j = jnp.asarray(sl)
    kv = fn(kv, k_news, v_news, sl_j)
    flat = sl_j.reshape(-1)
    valid = (flat < S)[None, :, None]
    li = jnp.arange(L)[:, None]
    safe = jnp.minimum(flat, S - 1)[None, :]
    got_k = kv[li, 0, safe]  # [L, B, F]
    got_v = kv[li, 1, safe]
    ok = bool(
        jnp.all(jnp.where(valid, got_k == k_news, True))
        & jnp.all(jnp.where(valid, got_v == v_news, True))
    )
    # spot-check unwritten rows stayed zero (pool starts zeroed): catches
    # out-of-place writes the written-row check can't see
    unwritten = np.setdiff1d(np.arange(64), sl.reshape(-1) % S)[:8]
    for s_un in unwritten:
        if s_un in sl.reshape(-1):
            continue
        ok = ok and not bool(jnp.any(kv[:, :, int(s_un)] != 0))
    print(f"parity: {'OK' if ok else 'MISMATCH'}", flush=True)
    return ok


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


if __name__ == "__main__":
    which = sys.argv[1:] or ["xla", "xla_uniq", "pallas_3d"]
    if "xla" in which:
        timeit("xla", lambda kv, k, v, s: xla_scatter(kv, k, v, s))
    if "xla_uniq" in which:
        timeit("xla_uniq", lambda kv, k, v, s: xla_scatter(kv, k, v, s, unique=True))
    if "pallas" in which:
        # REJECTED by Mosaic: 1-row slices of (8,128)-tiled memrefs are not
        # lowerable ("Slice shape along dimension 1 must be aligned to 8")
        timeit("pallas", lambda kv, k, v, s: pallas_scatter(kv, k, v, s))
    if "pallas_3d" in which:
        # WORKS on hardware (parity OK) but 64.9 ms/scatter vs xla_uniq's
        # 1.9 ms in situ: 2 KB row DMAs are issue-rate-bound (~4.5 us each
        # on the scalar core), not bandwidth-bound. Not wired.
        check(pallas_scatter_3d)
        timeit("pallas_3d", lambda kv, k, v, s: pallas_scatter_3d(kv, k, v, s))
    if "pallas_flat" in which:
        # compiles but DIES AT RUNTIME on v5e (FailedPrecondition) — flat
        # 1-D element-offset DMAs are not safe; use pallas_3d addressing
        check(pallas_scatter_flat)
        timeit("pallas_flat", lambda kv, k, v, s: pallas_scatter_flat(kv, k, v, s))
