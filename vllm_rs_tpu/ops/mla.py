"""Multi-head Latent Attention (MLA) over a compressed paged KV cache.

Counterpart of the reference's MlaAttention forward + attention-rs MLA
kernels (src/models/layers/mla_attention.rs:270-460; kernels
concat_and_cache_mla / mla_paged_prefill / mla_paged_decode, SURVEY.md §2.5),
designed TPU-first:

- The cache stores the *compressed* per-token latent — ckv [kv_lora_rank]
  concatenated with the shared rope key k_pe [qk_rope_head_dim] — one row
  per slot: [num_slots, R + P]. That is the whole point of MLA: decode
  attention reads R+P (≈576) bytes·2 per token instead of 2·Hk·Dh.
- Attention runs in *absorbed* form for both prefill and decode
  (mla_attention.rs absorbed-weight decode, w_uk/w_uv_t at :70-71):
  q_nope is folded through w_uk into the latent space once per step, scores
  are taken against the cached latents directly, and the value product
  stays in latent space until a final per-head w_uv projection. By matmul
  associativity this equals the decompress-then-attend prefill path the
  reference uses; on TPU it keeps every contraction on the MXU with the
  cache read exactly once.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from vllm_rs_tpu.ops.attn_meta import AttnMeta

_NEG_INF = -1e30


def write_mla_cache(
    cache: jax.Array,  # [S, R+P]
    ckv: jax.Array,  # [B, T, R]
    k_pe: jax.Array,  # [B, T, P]
    slot_mapping: jax.Array,  # [B, T] int32, pad == S (dropped)
) -> jax.Array:
    """concat_and_cache_mla: scatter latent rows into the pool."""
    from vllm_rs_tpu.ops.kv_cache import unique_pad_slots

    B, T, R = ckv.shape
    row = jnp.concatenate([ckv, k_pe], axis=-1).reshape(B * T, -1)
    slots = unique_pad_slots(slot_mapping.reshape(-1), cache.shape[0])
    return cache.at[slots].set(
        row.astype(cache.dtype), mode="drop", unique_indices=True
    )


# Batch size at/above which "auto" decode uses the dedicated Pallas
# kernel on TPU. History of same-day A/Bs (mla_lab.py, 12-layer
# DeepSeek-geometry, int4, B=256 unless noted): round 3
# (bandwidth-degraded environment) — gather 824 (B=32) / 5,009 (B=128) /
# 4,804 vs kernel 4,944 (B=128) / 3,721, gather never worse; round 5 —
# two races three hours apart SPLIT (gather 6,525 vs kernel 7,139, then
# gather 7,633 vs kernel 7,231): the sides are equal within the
# environment's same-day spread (±4-9%). Auto keeps the simpler XLA
# gather until a day's race shows a consistent kernel win; bench.py's
# kernel_auto_ab line re-races both every bench day, and
# VLLM_RS_TPU_MLA_BACKEND=gather|pallas forces a side.
MLA_KERNEL_MIN_BATCH = 10**9


def mla_paged_attention_deferred(
    q_nope: jax.Array,  # [B, 1, H, dn]
    q_pe: jax.Array,  # [B, 1, H, dr] (rope applied)
    ckv_new: jax.Array,  # [B, 1, R] current token latent (normed)
    kpe_new: jax.Array,  # [B, 1, P] current token rope key
    pool: jax.Array,  # [L, S, R+P] FULL latent pool (read-only)
    layer_idx: jax.Array,  # traced int32
    w_uk: jax.Array,  # [H, dn, R]
    w_uv: jax.Array,  # [H, R, dv]
    meta: AttnMeta,
    *,
    block_size: int,
    scale: float,
    kv_lora_rank: int,
    backend: str = "auto",
) -> jax.Array:
    """Deferred-write absorbed MLA decode: pages cover [0, pos); the
    current token's latent folds in as one extra attention column, and the
    caller scatters all layers' latents once after the layer scan (the MLA
    analog of ops/attention.paged_attention_deferred — avoids both the
    per-layer pool slice copy and the scan-ys pool rewrite).

    backend: "auto" picks the dedicated Pallas kernel
    (ops/pallas/mla_decode.py — the reference's mla_paged_decode analog,
    mla_attention.rs:335-460) on TPU at B ≥ MLA_KERNEL_MIN_BATCH, where
    the XLA page gather below degrades; "gather"/"pallas" force a path."""
    B, T, H, dn = q_nope.shape
    if backend == "auto":
        import os

        env = os.environ.get("VLLM_RS_TPU_MLA_BACKEND", "")
        if env:
            backend = env  # measurement override (mla_lab.py)
    if backend == "auto":
        use_pallas = (
            jax.default_backend() == "tpu"
            and B >= MLA_KERNEL_MIN_BATCH
            and H % 8 == 0
        )
    else:
        use_pallas = backend == "pallas"
    if use_pallas:
        from vllm_rs_tpu.ops.pallas.mla_decode import mla_paged_decode_pallas

        return mla_paged_decode_pallas(
            q_nope, q_pe, ckv_new, kpe_new, pool, layer_idx, w_uk, w_uv, meta,
            block_size=block_size, scale=scale, kv_lora_rank=kv_lora_rank,
        )
    R = kv_lora_rank
    L, S, F = pool.shape
    num_blocks = S // block_size

    # layer-offset page gather from the flat pool — no [S, F] slice ever
    # materializes, only the gathered pages
    paged = pool.reshape(L * num_blocks, block_size, F)
    MB = meta.block_tables.shape[1]
    ctx = meta.context_lens - 1  # pages cover [0, pos)
    # clamp the walk so dead pages repeat (cheap gather, masked anyway)
    last = jnp.maximum(ctx - 1, 0) // block_size
    pages_idx = jnp.minimum(
        jax.lax.broadcasted_iota(jnp.int32, (B, MB), 1), last[:, None]
    )
    walk = jnp.take_along_axis(meta.block_tables, pages_idx, axis=1)
    pages = paged[walk + layer_idx * num_blocks]  # [B, MB, bs, F]
    C = MB * block_size
    pages = pages.reshape(B, C, F)
    # append the current token as one extra column
    self_col = jnp.concatenate([ckv_new, kpe_new], axis=-1)  # [B, 1, F]
    pages = jnp.concatenate([pages, self_col.astype(pages.dtype)], axis=1)
    ckv = pages[..., :R].astype(jnp.float32)  # [B, C+1, R]
    kpe = pages[..., R:].astype(jnp.float32)

    q_lat = jnp.einsum(
        "bthd,hdr->bthr",
        q_nope.astype(jnp.float32), w_uk.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    scores = (
        jnp.einsum("bthr,bcr->bhtc", q_lat, ckv, preferred_element_type=jnp.float32)
        + jnp.einsum(
            "bthp,bcp->bhtc", q_pe.astype(jnp.float32), kpe,
            preferred_element_type=jnp.float32,
        )
    ) * scale
    kpos = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, C + 1), 3)
    mask = (kpos < ctx[:, None, None, None]) | (kpos == C)  # pages + self
    scores = jnp.where(mask, scores, _NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out_lat = jnp.einsum("bhtc,bcr->bthr", probs, ckv, preferred_element_type=jnp.float32)
    out = jnp.einsum(
        "bthr,hrv->bthv", out_lat, w_uv.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    return out.astype(q_nope.dtype)


def scatter_deferred_mla(
    pool: jax.Array,  # [L, S, F]
    rows: jax.Array,  # [L, B, F] per-layer latent rows
    slot_mapping: jax.Array,  # [B, 1] int32, pad == S
) -> jax.Array:
    """One flat scatter installing every layer's deferred latent row.
    Unique indices (distinct OOB per padding row) — see
    kv_cache.unique_pad_slots for why this matters on TPU."""
    L, S, F = pool.shape
    slots = slot_mapping.reshape(-1)
    B = slots.shape[0]
    flat = pool.reshape(L * S, F)
    l_idx = jnp.arange(L, dtype=jnp.int32)[:, None]
    valid = slots[None, :] < S
    oob = L * S + l_idx * B + jnp.arange(B, dtype=jnp.int32)[None, :]
    idx = jnp.where(valid, l_idx * S + slots[None, :], oob)
    flat = flat.at[idx.reshape(-1)].set(
        rows.reshape(L * B, F).astype(flat.dtype),
        mode="drop", unique_indices=True,
    )
    return flat.reshape(L, S, F)


def mla_paged_attention(
    q_nope: jax.Array,  # [B, T, H, dn]
    q_pe: jax.Array,  # [B, T, H, dr] (rope already applied)
    cache: jax.Array,  # [S, R+P] (already contains this step's writes)
    w_uk: jax.Array,  # [H, dn, R]
    w_uv: jax.Array,  # [H, R, dv]
    meta: AttnMeta,
    *,
    block_size: int,
    scale: float,
    kv_lora_rank: int,
) -> jax.Array:
    """Absorbed MLA attention → [B, T, H, dv] in q dtype."""
    B, T, H, dn = q_nope.shape
    R = kv_lora_rank
    S = cache.shape[0]
    num_blocks = S // block_size

    # gather each sequence's latent pages: [B, C, R+P]
    paged = cache.reshape(num_blocks, block_size, cache.shape[-1])
    pages = paged[meta.block_tables]  # [B, MB, bs, R+P]
    MB = meta.block_tables.shape[1]
    C = MB * block_size
    pages = pages.reshape(B, C, cache.shape[-1])
    ckv = pages[..., :R].astype(jnp.float32)  # [B, C, R]
    kpe = pages[..., R:].astype(jnp.float32)  # [B, C, P]

    # absorb w_uk: q_latent [B, T, H, R]
    q_lat = jnp.einsum(
        "bthd,hdr->bthr",
        q_nope.astype(jnp.float32),
        w_uk.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    scores = (
        jnp.einsum("bthr,bcr->bhtc", q_lat, ckv, preferred_element_type=jnp.float32)
        + jnp.einsum(
            "bthp,bcp->bhtc",
            q_pe.astype(jnp.float32),
            kpe,
            preferred_element_type=jnp.float32,
        )
    ) * scale

    kpos = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, C), 3)
    qpos = meta.positions[:, None, :, None]  # [B,1,T,1]
    ctx = meta.context_lens[:, None, None, None]
    mask = (kpos <= qpos) & (kpos < ctx)
    scores = jnp.where(mask, scores, _NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)  # [B, H, T, C]

    out_lat = jnp.einsum("bhtc,bcr->bthr", probs, ckv, preferred_element_type=jnp.float32)
    out = jnp.einsum(
        "bthr,hrv->bthv", out_lat, w_uv.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    return out.astype(q_nope.dtype)
