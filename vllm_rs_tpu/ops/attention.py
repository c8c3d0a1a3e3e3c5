"""Paged attention — jnp reference implementation + backend dispatch.

The semantics mirror the reference's unified PagedAttention forward
(attention-rs; call site src/models/layers/attention.rs:607-616): new K/V is
written to the paged cache via slot_mapping, then each query token attends
over its sequence's pages under a causal mask, with optional logit
softcapping (gemma) and sliding window.

This file holds the O(max_context) gather-based jnp reference used on CPU
and as ground truth; the Pallas TPU kernels live in ops/pallas/ and are
selected by `paged_attention(...)` when running on TPU.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from vllm_rs_tpu.ops.attn_meta import AttnMeta
from vllm_rs_tpu.ops.kv_cache import gather_pages, write_kv

_NEG_INF = -1e30


def paged_attention_reference(
    q: jax.Array,  # [B, T, Hq, D]
    k_cache: jax.Array,  # [S, Hk*D] (already contains this step's writes)
    v_cache: jax.Array,  # [S, Hk*D]
    meta: AttnMeta,
    *,
    block_size: int,
    scale: float,
    logit_softcap: float = 0.0,
    sliding_window: int = 0,
) -> jax.Array:
    """Gather-based paged attention. Returns [B, T, Hq, D] in q.dtype."""
    B, T, Hq, D = q.shape
    Hk = k_cache.shape[1] // D
    groups = Hq // Hk

    k = gather_pages(k_cache, meta.block_tables, block_size, Hk)  # [B, C, Hk, D]
    v = gather_pages(v_cache, meta.block_tables, block_size, Hk)
    C = k.shape[1]

    qf = q.astype(jnp.float32) * scale
    kf = k.astype(jnp.float32)
    # scores: [B, Hk, groups, T, C]
    qg = qf.reshape(B, T, Hk, groups, D)
    scores = jnp.einsum("bthgd,bchd->bhgtc", qg, kf)
    if logit_softcap > 0.0:
        scores = jnp.tanh(scores / logit_softcap) * logit_softcap

    kpos = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 1, C), 4)
    qpos = meta.positions[:, None, None, :, None]  # [B,1,1,T,1]
    ctx = meta.context_lens[:, None, None, None, None]
    mask = (kpos <= qpos) & (kpos < ctx)
    if sliding_window > 0:
        mask &= kpos > qpos - sliding_window
    scores = jnp.where(mask, scores, _NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    # rows with no valid keys (padding) produce uniform probs — harmless,
    # their outputs are never gathered.
    vf = v.astype(jnp.float32)
    out = jnp.einsum("bhgtc,bchd->bthgd", probs, vf)
    return out.reshape(B, T, Hq, D).astype(q.dtype)


def paged_attention(
    q: jax.Array,
    k_new: jax.Array,  # [B, T, Hk, D]
    v_new: jax.Array,
    k_cache: jax.Array,  # [S, Hk*D]
    v_cache: jax.Array,
    meta: AttnMeta,
    *,
    block_size: int,
    scale: float,
    logit_softcap: float = 0.0,
    sliding_window: int = 0,
    backend: str = "auto",
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Write new KV then attend. Returns (out, k_cache, v_cache)."""
    k_cache, v_cache = write_kv(k_cache, v_cache, k_new, v_new, meta.slot_mapping)
    if backend == "auto":
        platform = jax.default_backend()
        backend = "pallas" if platform == "tpu" else "reference"
    if backend == "pallas":
        from vllm_rs_tpu.ops.pallas.paged_attention import paged_attention_pallas

        out = paged_attention_pallas(
            q,
            k_cache,
            v_cache,
            meta,
            block_size=block_size,
            scale=scale,
            logit_softcap=logit_softcap,
            sliding_window=sliding_window,
        )
    else:
        out = paged_attention_reference(
            q,
            k_cache,
            v_cache,
            meta,
            block_size=block_size,
            scale=scale,
            logit_softcap=logit_softcap,
            sliding_window=sliding_window,
        )
    return out, k_cache, v_cache
