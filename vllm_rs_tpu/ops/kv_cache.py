"""Paged KV cache storage.

Layout (per layer, stacked over layers):
    kv_cache: [num_layers, 2, num_slots, kv_heads * head_dim]
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

Quantized KV (int8 / fp8) stores a per-slot-per-head scale alongside;
see ops/kv_quant.py.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from vllm_rs_tpu.config import CacheConfig, ModelConfig


def init_kv_cache(
    model: ModelConfig, cache: CacheConfig, tp_size: int = 1, dtype=None
) -> jax.Array:
    """Allocate the KV pool: [L, 2, num_slots, kv_heads * head_dim].

    The *global* array always keeps the model's logical kv heads; sharding
    splits the head axis when divisible and replicates otherwise (the
    analogue of the reference's kv_head_shard replication when
    kv_heads < world_size, distributed.rs:498-538).
    """
    dtype = dtype or jnp.bfloat16
    return jnp.zeros(
        (
            model.num_hidden_layers,
            2,
            cache.num_slots,
            model.num_key_value_heads * model.head_dim_,
        ),
        dtype=dtype,
    )


def write_kv(
    k_cache: jax.Array,  # [S, Hk*D]
    v_cache: jax.Array,  # [S, Hk*D]
    k_new: jax.Array,  # [B, T, Hk, D]
    v_new: jax.Array,  # [B, T, Hk, D]
    slot_mapping: jax.Array,  # [B, T] int32, pad == S (dropped)
) -> Tuple[jax.Array, jax.Array]:
    """Scatter this step's K/V rows into the pool (pad slots dropped)."""
    M = slot_mapping.size
    flat_slots = slot_mapping.reshape(-1)  # [M]
    k_flat = k_new.reshape(M, -1).astype(k_cache.dtype)
    v_flat = v_new.reshape(M, -1).astype(v_cache.dtype)
    k_cache = k_cache.at[flat_slots].set(k_flat, mode="drop")
    v_cache = v_cache.at[flat_slots].set(v_flat, mode="drop")
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
