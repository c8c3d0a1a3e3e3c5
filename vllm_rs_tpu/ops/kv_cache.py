"""Paged KV cache storage.

Layout (per layer, stacked over layers):
    kv_cache: [num_layers, 2, kv_heads, num_slots, head_dim]
with num_slots = num_blocks * block_size a flat "slot" axis. Head-major so
each kv head owns a contiguous [slots, head_dim] plane: Pallas kernels DMA
per-head pages as clean 2D tiles (head_dim = lanes, block_size = sublanes)
and TP shards the leading head axis. Writes go through `slot_mapping`
scatters (the equivalent of the reference's slot_mapping KV write inside
its paged-attention kernels); reads gather whole blocks through block
tables.

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
    """Allocate the KV pool: [L, 2, kv_heads, num_slots, head_dim].

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
            model.num_key_value_heads,
            cache.num_slots,
            model.head_dim_,
        ),
        dtype=dtype,
    )


def write_kv(
    k_cache: jax.Array,  # [Hk, S, D]
    v_cache: jax.Array,  # [Hk, S, D]
    k_new: jax.Array,  # [B, T, Hk, D]
    v_new: jax.Array,  # [B, T, Hk, D]
    slot_mapping: jax.Array,  # [B, T] int32, pad == S (dropped)
) -> Tuple[jax.Array, jax.Array]:
    """Scatter this step's K/V rows into the pool (pad slots dropped)."""
    flat_slots = slot_mapping.reshape(-1)  # [M]
    # [B, T, Hk, D] → [Hk, M, D]
    k_flat = k_new.reshape(-1, *k_new.shape[2:]).swapaxes(0, 1).astype(k_cache.dtype)
    v_flat = v_new.reshape(-1, *v_new.shape[2:]).swapaxes(0, 1).astype(v_cache.dtype)
    k_cache = k_cache.at[:, flat_slots].set(k_flat, mode="drop")
    v_cache = v_cache.at[:, flat_slots].set(v_flat, mode="drop")
    return k_cache, v_cache


def gather_pages(
    cache: jax.Array,  # [Hk, S, D]
    block_tables: jax.Array,  # [B, MB] int32
    block_size: int,
) -> jax.Array:
    """Gather each sequence's KV pages: → [B, MB * block_size, Hk, D].

    Row j of the result is the KV of absolute token position j (block tables
    are ordered), so causal masks can be built from plain iota. Reference
    counterpart: the block_tables walk inside paged-attention kernels.
    """
    Hk, S, D = cache.shape
    num_blocks = S // block_size
    paged = cache.reshape(Hk, num_blocks, block_size, D)
    out = paged[:, block_tables]  # [Hk, B, MB, bs, D]
    B, MB = block_tables.shape
    return out.transpose(1, 2, 3, 0, 4).reshape(B, MB * block_size, Hk, D)
