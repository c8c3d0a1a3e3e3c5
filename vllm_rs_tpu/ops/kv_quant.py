"""Quantized KV cache (int8 per-slot-per-head scales).

Counterpart of the reference's FP8 KV cache (kvcache_allocator.rs:188-193,
dequant-in-kernel paged attention): K/V rows are quantized on write with a
per-(slot, head) absmax scale and dequantized after the page gather. Halves
KV HBM traffic and doubles the token capacity of the pool.

A quantized per-layer cache is the pair
    (data int8 [2, S, Hk*D], scales float32 [2, S, Hk])
vs the bf16 layout's single [2, S, Hk*D] array. ops/kv_cache.py accepts
either representation.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def quantize_kv_rows(x: jax.Array, num_heads: int) -> Tuple[jax.Array, jax.Array]:
    """[M, Hk*D] float → (int8 [M, Hk*D], scales f32 [M, Hk])."""
    M, HkD = x.shape
    D = HkD // num_heads
    xf = x.astype(jnp.float32).reshape(M, num_heads, D)
    amax = jnp.max(jnp.abs(xf), axis=-1)  # [M, Hk]
    scales = jnp.maximum(amax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(xf / scales[:, :, None]), -127, 127).astype(jnp.int8)
    return q.reshape(M, HkD), scales


def dequantize_kv_rows(
    q: jax.Array, scales: jax.Array, dtype=jnp.bfloat16
) -> jax.Array:
    """(int8 [..., Hk, D-grouped flat], scales [..., Hk]) → float [..., Hk*D]."""
    *lead, HkD = q.shape
    Hk = scales.shape[-1]
    D = HkD // Hk
    xf = q.astype(jnp.float32).reshape(*lead, Hk, D) * scales[..., None]
    return xf.reshape(*lead, HkD).astype(dtype)
