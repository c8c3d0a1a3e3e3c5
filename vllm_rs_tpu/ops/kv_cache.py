"""Paged KV cache storage.

Layout (per layer, stacked over layers):
    bf16/fp8: kv_cache [num_layers, 2, num_slots, kv_heads * head_dim]
              (dtype bfloat16 or float8_e4m3fn — fp8 is scale-free, the
              reference's KV quant format, kvcache_allocator.rs:188-193)
    int8: (data  [num_layers, 2, num_slots, kv_heads * head_dim] int8,
           scales[num_layers, 2, num_slots, kv_heads] float32)
with num_slots = num_blocks * block_size a flat "slot" axis and the head
axis flattened into the feature axis. Slot-major so one *page* (block_size
slots × all kv heads) is a single contiguous run of
block_size*kv_heads*head_dim*2 bytes: the paged-attention kernel fetches a
page with ONE contiguous DMA descriptor and addresses a head as a
lane-aligned column slice (head_dim = 128 = one lane tile). Two rejected
layouts, both measured on v5e: head-major [Hk, S, D] decomposes a page
fetch into kv_heads strided 4KB chunks (~8x slower — DMA descriptor
overhead dominates small transfers), and keeping a trailing [..., Hk, D]
split forces a reshape at the pallas_call boundary that XLA materializes
as a full copy of the cache (~630us/layer). Writes go through
`slot_mapping` scatters (the equivalent of the reference's slot_mapping KV
write inside its paged-attention kernels); reads gather whole blocks
through block tables.

Sharded layout: kv_heads is split over the mesh "model" axis (see
parallel/sharding.py), so each chip holds its local heads for every block —
the direct analogue of the reference's kv_head_shard (distributed.rs:498-538).

Quantized KV (int8, the reference's FP8-KV analogue) stores per-slot
per-head scales alongside; see ops/kv_quant.py.
"""

from __future__ import annotations

from typing import Tuple, Union

import jax
import jax.numpy as jnp

from vllm_rs_tpu.config import CacheConfig, ModelConfig
from vllm_rs_tpu.ops.kv_quant import dequantize_kv_rows, quantize_kv_rows

# per-layer cache: float array [2, S, Hk*D] (bf16 or fp8-e4m3) or the
# (int8 data, f32 scales) pair
KVLayer = Union[jax.Array, Tuple[jax.Array, jax.Array]]


def resolve_kv_dtype(dtype):
    """Map a CLI/config kv-dtype name to a jnp dtype for PLAIN-array pools.

    "int8" is NOT a plain-array dtype (it needs the paired (data, scales)
    layout) — callers that only support single-array pools must reject it.
    fp8-e4m3 (the reference's KV quant format, kvcache_allocator.rs:188-193)
    is scale-free: e4m3's dynamic range covers post-norm K/V rows directly,
    so it stores as a plain array and every consumer just converts on read.
    """
    if dtype is None:
        return jnp.bfloat16
    if isinstance(dtype, str):
        names = {
            "bfloat16": jnp.bfloat16,
            "float16": jnp.float16,
            "float8_e4m3fn": jnp.float8_e4m3fn,
        }
        if dtype == "int8":
            raise ValueError(
                "int8 KV uses the paired (data, scales) layout; this cache "
                "only supports plain-array dtypes — use float8_e4m3fn"
            )
        if dtype not in names:
            raise ValueError(f"unsupported kv dtype: {dtype!r}")
        return names[dtype]
    return dtype


def init_kv_cache(
    model: ModelConfig, cache: CacheConfig, tp_size: int = 1, dtype=None
):
    """Allocate the KV pool (stacked over layers; see module docstring)."""
    L = model.num_hidden_layers
    S = cache.num_slots
    HkD = model.num_key_value_heads * model.head_dim_
    if (dtype or cache.kv_dtype) == "int8":
        return (
            jnp.zeros((L, 2, S, HkD), dtype=jnp.int8),
            jnp.zeros((L, 2, S, model.num_key_value_heads), dtype=jnp.float32),
        )
    return jnp.zeros((L, 2, S, HkD), dtype=resolve_kv_dtype(dtype or cache.kv_dtype))


def is_quantized_kv(kv_l: KVLayer) -> bool:
    return isinstance(kv_l, tuple)


def kv_slots(kv_l: KVLayer) -> int:
    return (kv_l[0] if is_quantized_kv(kv_l) else kv_l).shape[1]


def unique_pad_slots(slots: jax.Array, num_slots: int) -> jax.Array:
    """Replace pad slots (== num_slots) with DISTINCT out-of-bounds indices
    so KV scatters can claim unique_indices=True (pads are still dropped).
    Valid slots are unique by construction (one slot per token); without
    the uniqueness promise XLA emits a serializing scatter that costs ~55x
    its bytes on TPU (scatter_lab.py, B=256 decode step)."""
    n = slots.shape[0]
    oob = num_slots + jnp.arange(n, dtype=slots.dtype)
    return jnp.where(slots < num_slots, slots, oob)


def scatter_block_windows(
    flat: jax.Array,  # [R, F]
    row_starts: jax.Array,  # [G] int32 window start rows; OOB starts drop
    updates: jax.Array,  # [G, bs, F]
) -> jax.Array:
    """Scatter [bs, F] row WINDOWS into a flat [R, F] pool view.

    The window formulation is the whole point: the obvious alternative —
    reshape the pool to [nb, bs*F] and scatter one row per block — merges
    the block dim into the MINOR dim, which under TPU tiled layouts is
    not a bitcast: XLA materializes a full-pool relayout copy (measured
    343 ms per prefill step at the batch-256 marquee shape = 55% of the
    step, and a 10.5 GB HLO temp → OOM when the deferred path tried it
    at whole-pool scale — PERF_NOTES r5). A window scatter keeps the
    [*, F] layout (only major dims merge on the way in, a true bitcast)
    while still issuing one scatter index per BLOCK.

    `row_starts` must be unique and bs-aligned; callers pad with DISTINCT
    out-of-bounds starts (dropped by FILL_OR_DROP) to keep the
    unique_indices promise honest — without it XLA emits a serializing
    scatter (~55x its bytes on TPU)."""
    dnums = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(1, 2),
        inserted_window_dims=(),
        scatter_dims_to_operand_dims=(0,),
    )
    return jax.lax.scatter(
        flat,
        row_starts[:, None],
        updates.astype(flat.dtype),
        dnums,
        indices_are_sorted=False,
        unique_indices=True,
        mode=jax.lax.GatherScatterMode.FILL_OR_DROP,
    )


def write_kv_layer(
    kv_l: KVLayer,
    k_new: jax.Array,  # [B, T, Hk, D]
    v_new: jax.Array,
    slot_mapping: jax.Array,  # [B, T] int32, pad == S (dropped)
    block_write_idx: jax.Array = None,  # [B, T//bs] int32, pad = num_blocks
) -> KVLayer:
    """Scatter this step's K/V rows into the per-layer pool.

    With `block_write_idx` (block-aligned prefill chunks — see
    AttnMeta.block_write_idx) the write runs at BLOCK granularity: one
    scatter index per covered block (a [bs, F] window), bs× fewer update
    rows than the per-token path. Rows past a chunk's end inside a
    covered block receive padding garbage — safe, they sit beyond the
    sequence's context in its own block (masked everywhere, overwritten
    by decode)."""
    if block_write_idx is not None and not is_quantized_kv(kv_l):
        S = kv_slots(kv_l)
        F = kv_l.shape[-1]
        G = block_write_idx.size
        M = slot_mapping.size
        bs = M // G
        nb = S // bs
        blk = block_write_idx.reshape(-1)
        valid = blk < nb
        g = jnp.arange(G, dtype=blk.dtype)
        # distinct, non-overlapping OOB windows for pads
        oob = 2 * S + g * bs
        flat = kv_l.reshape(2 * S, F)  # major-dim merge: true bitcast
        flat = scatter_block_windows(
            flat, jnp.where(valid, blk * bs, oob), k_new.reshape(G, bs, F)
        )
        flat = scatter_block_windows(
            flat, jnp.where(valid, S + blk * bs, oob), v_new.reshape(G, bs, F)
        )
        return flat.reshape(2, S, F)
    M = slot_mapping.size
    flat_slots = unique_pad_slots(slot_mapping.reshape(-1), kv_slots(kv_l))
    k_flat = k_new.reshape(M, -1)
    v_flat = v_new.reshape(M, -1)
    _u = dict(mode="drop", unique_indices=True)
    if is_quantized_kv(kv_l):
        data, scales = kv_l
        Hk = scales.shape[-1]
        kq, ks = quantize_kv_rows(k_flat, Hk)
        vq, vs = quantize_kv_rows(v_flat, Hk)
        data = data.at[0, flat_slots].set(kq, **_u)
        data = data.at[1, flat_slots].set(vq, **_u)
        scales = scales.at[0, flat_slots].set(ks, **_u)
        scales = scales.at[1, flat_slots].set(vs, **_u)
        return (data, scales)
    kv_l = kv_l.at[0, flat_slots].set(k_flat.astype(kv_l.dtype), **_u)
    kv_l = kv_l.at[1, flat_slots].set(v_flat.astype(kv_l.dtype), **_u)
    return kv_l


def write_kv(
    k_cache: jax.Array,
    v_cache: jax.Array,
    k_new: jax.Array,
    v_new: jax.Array,
    slot_mapping: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """bf16 two-array form (kept for the Pallas kernel path + tests)."""
    M = slot_mapping.size
    flat_slots = unique_pad_slots(slot_mapping.reshape(-1), k_cache.shape[0])
    k_flat = k_new.reshape(M, -1).astype(k_cache.dtype)
    v_flat = v_new.reshape(M, -1).astype(v_cache.dtype)
    k_cache = k_cache.at[flat_slots].set(k_flat, mode="drop", unique_indices=True)
    v_cache = v_cache.at[flat_slots].set(v_flat, mode="drop", unique_indices=True)
    return k_cache, v_cache


def gather_pages(
    cache: jax.Array,  # [S, Hk*D]
    block_tables: jax.Array,  # [B, MB] int32
    block_size: int,
    num_kv_heads: int,
) -> jax.Array:
    """Gather each sequence's KV pages: → [B, MB * block_size, Hk, D].

    Row j of the result is the KV of absolute token position j (block tables
    are ordered), so causal masks can be built from plain iota. Reference
    counterpart: the block_tables walk inside paged-attention kernels.
    """
    S, HkD = cache.shape
    num_blocks = S // block_size
    paged = cache.reshape(num_blocks, block_size, HkD)
    out = paged[block_tables]  # [B, MB, bs, Hk*D]
    B, MB = block_tables.shape
    return out.reshape(B, MB * block_size, num_kv_heads, HkD // num_kv_heads)


def gather_kv_layer(
    kv_l: KVLayer,
    block_tables: jax.Array,
    block_size: int,
    num_kv_heads: int,
    dtype=jnp.bfloat16,
) -> Tuple[jax.Array, jax.Array]:
    """Gather + (if needed) dequantize pages → (k, v) each [B, C, Hk, D]."""
    if not is_quantized_kv(kv_l):
        return (
            gather_pages(kv_l[0], block_tables, block_size, num_kv_heads),
            gather_pages(kv_l[1], block_tables, block_size, num_kv_heads),
        )
    data, scales = kv_l
    S = data.shape[1]
    nb = S // block_size
    B, MB = block_tables.shape
    C = MB * block_size
    dq = data.reshape(2, nb, block_size, -1)[:, block_tables]  # [2,B,MB,bs,HkD]
    sq = scales.reshape(2, nb, block_size, -1)[:, block_tables]  # [2,B,MB,bs,Hk]
    dq = dq.reshape(2, B, C, dq.shape[-1])
    sq = sq.reshape(2, B, C, num_kv_heads)
    k = dequantize_kv_rows(dq[0], sq[0], dtype).reshape(B, C, num_kv_heads, -1)
    v = dequantize_kv_rows(dq[1], sq[1], dtype).reshape(B, C, num_kv_heads, -1)
    return k, v
