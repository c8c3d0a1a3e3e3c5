"""Paged KV cache storage.

Layout (per layer, stacked over layers):
    kv_cache: [num_layers, 2, num_slots, kv_heads, head_dim]
with num_slots = num_blocks * block_size a flat "slot" axis. Writes go
through `slot_mapping` scatters (the equivalent of the reference's
slot_mapping KV write inside its paged-attention kernels); reads gather
whole blocks through block tables.

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
    """Allocate the KV pool: [L, 2, num_slots, kv_heads_local, head_dim]."""
    kv_heads = max(1, model.num_key_value_heads // max(tp_size, 1)) * max(tp_size, 1)
    # note: the *global* array keeps all heads; sharding splits the head axis
    dtype = dtype or jnp.bfloat16
    return jnp.zeros(
        (
            model.num_hidden_layers,
            2,
            cache.num_slots,
            max(kv_heads, 1),
            model.head_dim_,
        ),
        dtype=dtype,
    )


def write_kv(
    k_cache: jax.Array,  # [S, Hk, D]
    v_cache: jax.Array,  # [S, Hk, D]
    k_new: jax.Array,  # [B, T, Hk, D]
    v_new: jax.Array,  # [B, T, Hk, D]
    slot_mapping: jax.Array,  # [B, T] int32, pad == S (dropped)
) -> Tuple[jax.Array, jax.Array]:
    """Scatter this step's K/V rows into the pool (pad slots dropped)."""
    S = k_cache.shape[0]
    flat_slots = slot_mapping.reshape(-1)
    k_flat = k_new.reshape(-1, *k_new.shape[2:]).astype(k_cache.dtype)
    v_flat = v_new.reshape(-1, *v_new.shape[2:]).astype(v_cache.dtype)
    k_cache = k_cache.at[flat_slots].set(k_flat, mode="drop")
    v_cache = v_cache.at[flat_slots].set(v_flat, mode="drop")
    return k_cache, v_cache


def gather_pages(
    cache: jax.Array,  # [S, Hk, D]
    block_tables: jax.Array,  # [B, MB] int32
    block_size: int,
) -> jax.Array:
    """Gather each sequence's KV pages: → [B, MB * block_size, Hk, D].

    Row j of the result is the KV of absolute token position j (block tables
    are ordered), so causal masks can be built from plain iota. Reference
    counterpart: the block_tables walk inside paged-attention kernels.
    """
    S, Hk, D = cache.shape
    num_blocks = S // block_size
    paged = cache.reshape(num_blocks, block_size, Hk, D)
    out = paged[block_tables]  # [B, MB, bs, Hk, D]
    B, MB = block_tables.shape
    return out.reshape(B, MB * block_size, Hk, D)
