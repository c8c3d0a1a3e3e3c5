"""Deferred-KV pool scatter as direct HBM row DMAs.

Installing the decode step's [L, B, F] K/V rows into the [L, 2, S, F]
pool via an XLA scatter runs at ~15 GB/s effective (scatter_lab.py:
2 ms for 29 MB at B=256 even with unique_indices) — the scatter engine
serializes on index handling. This kernel instead issues one HBM→HBM
row DMA per (layer, plane, row) with all copies in flight at once,
writing straight into the pool through input/output aliasing: the row
addresses are data (scalar-prefetched slots), which plain BlockSpec
index maps could express only block-aligned.

Reference counterpart: the slot_mapping KV write the reference performs
inside its paged-attention CUDA kernels (attention-rs; call site
src/models/layers/attention.rs:607-616) — on TPU the write is a
separate kernel so the layer scan can keep the pool read-only (see
models/llama.py deferred path).

Padding rows carry slot == S and are skipped (`pl.when`), matching the
XLA path's mode="drop".
"""

from __future__ import annotations

import functools

import jax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _scatter_kernel(slots_ref, k_ref, v_ref, pool_ref, out_ref, sem, *, B, S):
    # grid (L,): write B K-rows and B V-rows of this layer into the pool.
    # Sources stay in HBM (VMEM sublane slicing at row granularity is not
    # lowerable); HBM→HBM row DMAs, all in flight at once, one drain.
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
def scatter_rows_pallas(
    kv: jax.Array,  # [L, 2, S, F]
    k_news: jax.Array,  # [L, B, F] (pool dtype)
    v_news: jax.Array,  # [L, B, F]
    slots: jax.Array,  # [B] int32, pad == S (skipped)
) -> jax.Array:
    L, _, S, F = kv.shape
    B = slots.shape[0]
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
        functools.partial(_scatter_kernel, B=B, S=S),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(kv.shape, kv.dtype),
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(slots, k_news.astype(kv.dtype), v_news.astype(kv.dtype), kv)
