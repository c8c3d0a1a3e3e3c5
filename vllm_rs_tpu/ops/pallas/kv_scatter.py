"""Deferred-KV pool scatter as direct HBM row DMAs — EXPERIMENTAL.

Installing the decode step's [L, B, F] K/V rows into the [L, 2, S, F]
pool via an XLA scatter runs at ~15 GB/s effective (1.9 ms in situ for
29 MB at B=256, step_bisect06) — the scatter engine serializes on index
handling. This kernel instead issues one HBM→HBM row DMA per
(layer, plane, row) with all copies in flight at once, writing straight
into the pool through input/output aliasing: the row addresses are data
(scalar-prefetched slots), which plain BlockSpec index maps could
express only block-aligned.

Addressing (the one form Mosaic accepts AND that runs on hardware —
scatter_lab.py `pallas_3d`): memrefs are reshaped to [rows, Hk, D] so
the DMA slices only the UNTILED leading dim; the tiled trailing dims
stay full-extent. 1-row slices of the sublane-tiled dim of 2-D/4-D
memrefs are rejected by Mosaic ("Slice shape along dimension 1 must be
aligned to 8"), and the flat 1-D variant compiles but dies at runtime
with FailedPrecondition on v5e (scatter_lab.py `pallas_flat`).

**Status: parity-verified on hardware but NOT wired into production.**
Measured on v5e at the B=256 bench shape (L=28, F=1024, 29 MB): 64.9
ms/scatter vs the XLA unique-indices scatter's 1.9 ms in situ — ~4.5 µs
per row DMA; 2 KB HBM→HBM row copies are issue-rate-bound on the scalar
core, not bandwidth-bound. Kept as the measured baseline for a future
coalesced (multi-row-run) schedule; production uses
ops/attention.py::scatter_deferred_kv's XLA path.

Reference counterpart: the slot_mapping KV write the reference performs
inside its paged-attention CUDA kernels (attention-rs; call site
src/models/layers/attention.rs:607-616) — on TPU the write is a
separate kernel so the layer scan can keep the pool read-only (see
models/llama.py deferred path).

Preconditions:
- Padding rows carry slot == S and are skipped (`pl.when`), matching the
  XLA path's mode="drop".
- Non-pad slots MUST be unique: the row DMAs are all in flight
  concurrently, so duplicate slots race (the XLA .at[].set path would
  pick one writer deterministically). Decode slot allocation guarantees
  this — every running sequence owns a distinct (block, offset) for the
  token it appends (core/block_manager.py may_append); the runner
  additionally gives padded rows distinct OOB slots.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _scatter_kernel_3d(slots_ref, k_ref, v_ref, pool_ref, out_ref, sem, *, B, S):
    # grid (L,): write B K-rows and B V-rows of this layer into the pool.
    # Sources stay in HBM (VMEM sublane slicing at row granularity is not
    # lowerable); HBM→HBM row DMAs over [rows, Hk, D] memrefs slicing only
    # the untiled leading dim, all in flight at once, one drain.
    del pool_ref  # aliased with out_ref
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


def supported(kv_shape, dtype, head_dim: int = 128) -> bool:
    """Row slices need the trailing dims tiled-aligned: D a multiple of 128
    lanes, Hk*D % (8*128) == 0, and a 2-byte pool dtype (bf16)."""
    F = kv_shape[-1]
    return (
        F % 1024 == 0
        and head_dim % 128 == 0
        and F % head_dim == 0
        and dtype == jnp.bfloat16
    )


@functools.partial(
    jax.jit, donate_argnums=(0,), static_argnames=("head_dim", "interpret")
)
def scatter_rows_pallas(
    kv: jax.Array,  # [L, 2, S, F]
    k_news: jax.Array,  # [L, B, F] (pool dtype)
    v_news: jax.Array,  # [L, B, F]
    slots: jax.Array,  # [B] int32, pad == S (skipped); non-pad slots unique
    head_dim: int = 128,
    interpret: bool = False,
) -> jax.Array:
    L, _, S, F = kv.shape
    B = slots.shape[0]
    Hk = F // head_dim
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
    out = pl.pallas_call(
        functools.partial(_scatter_kernel_3d, B=B, S=S),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((L * 2 * S, Hk, head_dim), kv.dtype),
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(
        slots.reshape(-1),
        k_news.astype(kv.dtype).reshape(L * B, Hk, head_dim),
        v_news.astype(kv.dtype).reshape(L * B, Hk, head_dim),
        kv.reshape(L * 2 * S, Hk, head_dim),
    )
    return out.reshape(L, 2, S, F)
