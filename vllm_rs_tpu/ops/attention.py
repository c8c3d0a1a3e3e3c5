"""Paged attention — jnp reference implementation + backend dispatch.

The semantics mirror the reference's unified PagedAttention forward
(attention-rs; call site src/models/layers/attention.rs:607-616): new K/V is
written to the paged cache via slot_mapping, then each query token attends
over its sequence's pages under a causal mask, with optional logit
softcapping (gemma) and sliding window.

The per-layer cache `kv_l` is either a bf16 array [2, S, Hk*D] or the int8
pair (data, scales) — see ops/kv_cache.py. This file holds the
O(max_context) gather-based jnp reference used on CPU and as ground truth;
the Pallas TPU kernels live in ops/pallas/ and are selected when running
on TPU (bf16 cache; the quantized cache currently dequantizes at gather).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from vllm_rs_tpu.ops.attn_meta import AttnMeta
from vllm_rs_tpu.ops.kv_cache import (
    KVLayer,
    gather_kv_layer,
    is_quantized_kv,
    write_kv_layer,
)

_NEG_INF = -1e30


def attend_gathered(
    q: jax.Array,  # [B, T, Hq, D]
    k: jax.Array,  # [B, C, Hk, D]
    v: jax.Array,  # [B, C, Hk, D]
    meta: AttnMeta,
    *,
    scale: float,
    logit_softcap: float = 0.0,
    sliding_window: int = 0,
    chunked: bool = False,
) -> jax.Array:
    """Reference attention over gathered pages. Returns [B, T, Hq, D].

    chunked: llama4 chunked attention — sliding_window is the chunk size C
    and a query at position p attends keys in [floor(p/C)*C, p] (its own
    chunk), not the trailing window (p-C, p]."""
    B, T, Hq, D = q.shape
    Hk = k.shape[2]
    groups = Hq // Hk
    C = k.shape[1]

    qf = q.astype(jnp.float32) * scale
    kf = k.astype(jnp.float32)
    qg = qf.reshape(B, T, Hk, groups, D)
    scores = jnp.einsum("bthgd,bchd->bhgtc", qg, kf)
    if logit_softcap > 0.0:
        scores = jnp.tanh(scores / logit_softcap) * logit_softcap

    kpos = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 1, C), 4)
    qpos = meta.positions[:, None, None, :, None]  # [B,1,1,T,1]
    ctx = meta.context_lens[:, None, None, None, None]
    mask = (kpos <= qpos) & (kpos < ctx)
    if chunked:
        C = jnp.maximum(jnp.asarray(sliding_window, jnp.int32), 1)
        mask &= (jnp.asarray(sliding_window, jnp.int32) <= 0) | (
            kpos >= (qpos // C) * C
        )
    elif isinstance(sliding_window, jax.Array):  # per-layer traced window
        sw = sliding_window.astype(jnp.int32)
        mask &= (sw <= 0) | (kpos > qpos - sw)
    elif sliding_window > 0:
        mask &= kpos > qpos - sliding_window
    scores = jnp.where(mask, scores, _NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    # rows with no valid keys (padding) produce uniform probs — harmless,
    # their outputs are never gathered.
    vf = v.astype(jnp.float32)
    out = jnp.einsum("bhgtc,bchd->bthgd", probs, vf)
    return out.reshape(B, T, Hq, D).astype(q.dtype)


def paged_attention_reference(
    q: jax.Array,
    k_cache: jax.Array,  # [S, Hk*D] (already contains this step's writes)
    v_cache: jax.Array,
    meta: AttnMeta,
    *,
    block_size: int,
    scale: float,
    logit_softcap: float = 0.0,
    sliding_window: int = 0,
    chunked: bool = False,
) -> jax.Array:
    """Gather-based paged attention over the two-array bf16 cache form."""
    from vllm_rs_tpu.ops.kv_cache import gather_pages

    D = q.shape[-1]
    Hk = k_cache.shape[1] // D
    k = gather_pages(k_cache, meta.block_tables, block_size, Hk)
    v = gather_pages(v_cache, meta.block_tables, block_size, Hk)
    return attend_gathered(
        q, k, v, meta,
        scale=scale, logit_softcap=logit_softcap, sliding_window=sliding_window,
        chunked=chunked,
    )


def paged_attention_deferred(
    q: jax.Array,  # [B, 1, Hq, D]
    k_new: jax.Array,  # [B, 1, Hk, D]
    v_new: jax.Array,
    kv_l: KVLayer,  # per-layer [2, S, F]; or with layer_idx: full [L, 2, S, F]
    meta: AttnMeta,
    *,
    block_size: int,
    scale: float,
    logit_softcap: float = 0.0,
    sliding_window=0,
    backend: str = "auto",
    layer_idx=None,
    chunked: bool = False,
) -> jax.Array:
    """Decode attention WITHOUT writing the cache (deferred-write path):
    the kernel reads pages covering [0, pos) and folds the current token's
    K/V in as a self term; the caller scatters all layers' new KV into the
    pool once, after the layer scan — removing the per-layer cache rewrite
    that lax.scan ys forces (measured ~25% of the 8B decode step).

    With `layer_idx`, `kv_l` is the FULL pool [L, 2, S, F] and the kernel
    indexes its layer internally (pooled mode) — slicing kv[i] into a
    pallas operand forces a 32 MB copy per layer (attn_lab2.py: 113
    us/layer, ~3.6 ms/step on the 8B)."""
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "reference"
    if backend == "pallas" and q.shape[-1] % 128 == 0 and not is_quantized_kv(kv_l):
        from vllm_rs_tpu.ops.pallas.paged_attention import (
            paged_attention_decode_pallas,
        )

        # large-batch regime: the multi-row kernel amortizes the fixed
        # per-grid-iteration charge (attn_lab3 analysis;
        # ops/pallas/paged_attention_multirow.py). Same-day A/B at the
        # 0.6b B=256 bench (chunk-16384/k-128 config, where attention is
        # 35% of the step): single-row 8,290 tok/s vs RB=4 **8,509** /
        # RB=8 8,462 / RB=16 8,241 — auto uses RB=4 for global-attention
        # decode at B ≥ 128; VLLM_RS_TPU_ATTN_ROWS overrides (0 = off).
        import os

        rows_env = int(os.environ.get("VLLM_RS_TPU_ATTN_ROWS", "-1"))
        use_multirow = (
            (rows_env > 1 or (rows_env < 0 and q.shape[0] >= 128))
            and not chunked
            and isinstance(sliding_window, int)
            and sliding_window == 0
        )
        if use_multirow:
            from vllm_rs_tpu.ops.pallas.paged_attention_multirow import (
                paged_attention_decode_multirow,
            )

            return paged_attention_decode_multirow(
                q, kv_l if layer_idx is not None else kv_l[0],
                kv_l if layer_idx is not None else kv_l[1], meta,
                block_size=block_size, scale=scale,
                logit_softcap=logit_softcap,
                rows_per_step=rows_env if rows_env > 1 else 4,
                k_self=k_new, v_self=v_new, layer_idx=layer_idx,
            )
        if layer_idx is not None:
            return paged_attention_decode_pallas(
                q, kv_l, kv_l, meta,
                block_size=block_size, scale=scale,
                logit_softcap=logit_softcap, sliding_window=sliding_window,
                k_self=k_new, v_self=v_new, layer_idx=layer_idx,
                chunked=chunked,
            )
        return paged_attention_decode_pallas(
            q, kv_l[0], kv_l[1], meta,
            block_size=block_size, scale=scale,
            logit_softcap=logit_softcap, sliding_window=sliding_window,
            k_self=k_new, v_self=v_new, chunked=chunked,
        )
    if layer_idx is not None:  # reference path: take the layer slice
        kv_l = jax.lax.dynamic_index_in_dim(kv_l, layer_idx, 0, keepdims=False)
    # reference: write into a throwaway copy and attend normally
    kv_tmp = write_kv_layer(kv_l, k_new, v_new, meta.slot_mapping)
    Hk = k_new.shape[2]
    k, v = gather_kv_layer(kv_tmp, meta.block_tables, block_size, Hk)
    return attend_gathered(
        q, k, v, meta,
        scale=scale, logit_softcap=logit_softcap, sliding_window=sliding_window,
        chunked=chunked,
    )


def _verify_window_partial(
    q: jax.Array,  # [B, T, Hq, D] (UNSCALED)
    k_new: jax.Array,  # [B, T, Hk, D]
    v_new: jax.Array,
    *,
    scale: float,
    logit_softcap: float = 0.0,
):
    """Dense causal attention over the verify window's own (deferred) keys.

    Returns the UNNORMALIZED flash partial (o_w [B,Hk,G,T,D] f32,
    m_w, l_w [B,Hk,G,T] f32) for merging with the pool partial. The
    diagonal (each query's own key) is always admitted, so l_w >= 1."""
    B, T, Hq, D = q.shape
    Hk = k_new.shape[2]
    G = Hq // Hk
    qf = q.astype(jnp.float32) * scale
    qg = qf.reshape(B, T, Hk, G, D)
    s = jnp.einsum("bthgd,bchd->bhgtc", qg, k_new.astype(jnp.float32))
    if logit_softcap > 0.0:
        s = jnp.tanh(s / logit_softcap) * logit_softcap
    tq = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
    tc = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
    s = jnp.where((tc <= tq)[None, None, None], s, _NEG_INF)
    m_w = jnp.max(s, axis=-1)  # [B, Hk, G, T]
    p = jnp.exp(s - m_w[..., None])
    l_w = jnp.sum(p, axis=-1)
    o_w = jnp.einsum("bhgtc,bchd->bhgtd", p, v_new.astype(jnp.float32))
    return o_w, m_w, l_w


def paged_attention_verify_deferred(
    q: jax.Array,  # [B, T, Hq, D], T = k+1 (the verify window)
    k_new: jax.Array,  # [B, T, Hk, D]
    v_new: jax.Array,
    kv_l: KVLayer,  # per-layer [2, S, F]; or with layer_idx: full [L, 2, S, F]
    meta: AttnMeta,  # pool_lens REQUIRED: tokens already in the pool per row
    *,
    block_size: int,
    scale: float,
    logit_softcap: float = 0.0,
    backend: str = "auto",
    layer_idx=None,
) -> jax.Array:
    """Verify-window attention WITHOUT writing the cache (the T>1 analog of
    paged_attention_deferred, for the on-device speculative loop).

    The classic write-in-scan path rewrites the full pool every layer of
    every while_loop iteration — measured ~107 ms/verify-iter on the 0.6b
    (lab_spec.py) vs ~3 ms for a plain deferred decode step. Here the pool
    is read-only: query position pool_lens+t attends

      - the POOL partial: keys [0, pool_lens) — identical for every t, so
        T folds into the decode kernel's GQA group dim (one kernel call,
        [B, Hk, G*T, D]) which returns its online-softmax (m, l) for
        merging (with_lse);
      - the WINDOW partial: a dense T x T causal attention over the k+1
        deferred keys (tiny — XLA-fused VPU work);

    flash-merged exactly; the caller scatters all layers' window KV into
    the pool once after the layer scan. Global attention only (the pool
    window bound would differ per t under sliding windows); callers gate
    on config. Returns [B, T, Hq, D]."""
    B, T, Hq, D = q.shape
    Hk = k_new.shape[2]
    G = Hq // Hk
    assert meta.pool_lens is not None
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "reference"
    pool_meta = meta._replace(context_lens=meta.pool_lens)

    if backend == "pallas" and D % 128 == 0 and not is_quantized_kv(kv_l):
        from vllm_rs_tpu.ops.pallas.paged_attention import (
            paged_attention_decode_pallas,
        )

        # fold T into the group dim: [B, T, Hk, G, D] -> [B, Hk, G, T, D]
        # -> one "decode" row of Hk*(G*T) query heads per sequence
        q_fold = (
            q.reshape(B, T, Hk, G, D)
            .transpose(0, 2, 3, 1, 4)
            .reshape(B, 1, Hq * T, D)
        )
        if layer_idx is not None:
            o_p, m_p, l_p = paged_attention_decode_pallas(
                q_fold, kv_l, kv_l, pool_meta,
                block_size=block_size, scale=scale,
                logit_softcap=logit_softcap, layer_idx=layer_idx,
                with_lse=True,
            )
        else:
            o_p, m_p, l_p = paged_attention_decode_pallas(
                q_fold, kv_l[0], kv_l[1], pool_meta,
                block_size=block_size, scale=scale,
                logit_softcap=logit_softcap, with_lse=True,
            )
        o_p = (
            o_p.reshape(B, Hk, G, T, D).astype(jnp.float32)
        )
        m_p = m_p.reshape(B, Hk, G, T)
        l_p = l_p.reshape(B, Hk, G, T)
    else:
        # reference pool partial (gather-based) — same merge math, so CPU
        # tests exercise the exact flash-merge the TPU path uses
        if layer_idx is not None:
            kv_l = jax.lax.dynamic_index_in_dim(kv_l, layer_idx, 0, keepdims=False)
        k, v = gather_kv_layer(kv_l, meta.block_tables, block_size, Hk)
        C = k.shape[1]
        qf = q.astype(jnp.float32) * scale
        qg = qf.reshape(B, T, Hk, G, D)
        s = jnp.einsum("bthgd,bchd->bhgtc", qg, k.astype(jnp.float32))
        if logit_softcap > 0.0:
            s = jnp.tanh(s / logit_softcap) * logit_softcap
        kpos = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 1, C), 4)
        s = jnp.where(
            kpos < meta.pool_lens[:, None, None, None, None], s, _NEG_INF
        )
        m_p = jnp.max(s, axis=-1)  # [B, Hk, G, T]
        p = jnp.exp(s - m_p[..., None])
        l_p = jnp.sum(p, axis=-1)
        o_p = jnp.einsum("bhgtc,bchd->bhgtd", p, v.astype(jnp.float32))
        l_safe = jnp.maximum(l_p, 1e-9)
        o_p = o_p / l_safe[..., None]  # normalized, like the kernel output

    o_w, m_w, l_w = _verify_window_partial(
        q, k_new, v_new, scale=scale, logit_softcap=logit_softcap
    )
    # flash merge: the pool output is NORMALIZED (acc_p / l_p), the window
    # partial is raw (sum of exp(s - m_w) * v)
    m = jnp.maximum(m_p, m_w)
    a_p = jnp.exp(m_p - m) * l_p  # pool weight
    a_w = jnp.exp(m_w - m)  # window rescale
    num = o_p * a_p[..., None] + o_w * a_w[..., None]
    den = a_p + l_w * a_w  # >= exp(m_w - m) * 1 or a_p ~ l_p: never ~0
    out = num / jnp.maximum(den, 1e-9)[..., None]
    return (
        out.transpose(0, 3, 1, 2, 4).reshape(B, T, Hq, D).astype(q.dtype)
    )


def scatter_deferred_kv(
    kv: jax.Array,  # [L, 2, S, F]
    k_news: jax.Array,  # [L, B, F]
    v_news: jax.Array,
    slot_mapping: jax.Array,  # [B, 1] int32, pad == S
    backend: str = "auto",
) -> jax.Array:
    """One scatter installing every layer's deferred decode KV.

    Production path is the XLA scatter: indices are made globally unique
    (padding rows get DISTINCT out-of-bounds indices, all dropped) so the
    scatter can carry unique_indices=True — without it XLA emits a
    serializing scatter that costs ~55x its bytes on TPU.

    backend="pallas" selects the experimental row-DMA kernel
    (ops/pallas/kv_scatter.py) — parity-verified on hardware but
    measured SLOWER than the XLA scatter (64.9 vs 1.9 ms at the B=256
    bench shape: 2 KB row DMAs are issue-rate-bound on the scalar core),
    so "auto" never picks it."""
    L, _, S, F = kv.shape
    if backend == "pallas":
        from vllm_rs_tpu.ops.pallas import kv_scatter

        if kv_scatter.supported(kv.shape, kv.dtype):
            return kv_scatter.scatter_rows_pallas(
                kv, k_news, v_news, slot_mapping.reshape(-1)
            )
    slots = slot_mapping.reshape(-1)  # [B]
    B = slots.shape[0]
    flat = kv.reshape(L * 2 * S, F)
    l_idx = jnp.arange(L, dtype=jnp.int32)[:, None]  # [L, 1]
    valid = slots[None, :] < S
    # distinct OOB index per (layer, row): dropped, and uniqueness holds
    oob = L * 2 * S + l_idx * B + jnp.arange(B, dtype=jnp.int32)[None, :]
    k_idx = jnp.where(valid, (l_idx * 2) * S + slots[None, :], oob)
    v_idx = jnp.where(valid, (l_idx * 2 + 1) * S + slots[None, :], oob)
    flat = flat.at[k_idx.reshape(-1)].set(
        k_news.reshape(L * B, F).astype(flat.dtype),
        mode="drop", unique_indices=True,
    )
    flat = flat.at[v_idx.reshape(-1)].set(
        v_news.reshape(L * B, F).astype(flat.dtype),
        mode="drop", unique_indices=True,
    )
    return flat.reshape(L, 2, S, F)


def scatter_deferred_kv_blocks(
    kv: jax.Array,  # [L, 2, S, F]
    k_news: jax.Array,  # [L, B*T, F] token rows, T % block_size == 0
    v_news: jax.Array,
    block_write_idx: jax.Array,  # [B, T // block_size] int32, pad == nb
    block_size: int,
) -> jax.Array:
    """One BLOCK-granularity WINDOW scatter installing every layer's
    deferred prefill KV (the fresh-prefill analog of scatter_deferred_kv):
    one scatter index per covered block per layer/plane, block_size×
    fewer than the per-token path. Uses the [bs, F] window formulation —
    merging the block into the minor dim via reshape forces a full-pool
    relayout copy under TPU tiling (10.5 GB HLO temp → OOM at this scale;
    see ops/kv_cache.py scatter_block_windows)."""
    from vllm_rs_tpu.ops.kv_cache import scatter_block_windows

    L, _, S, F = kv.shape
    nb = S // block_size
    blk = block_write_idx.reshape(-1)  # [G], pad == nb
    G = blk.shape[0]
    flat = kv.reshape(L * 2 * S, F)  # major-dim merge: true bitcast
    l_idx = jnp.arange(L, dtype=jnp.int32)[:, None]  # [L, 1]
    valid = blk[None, :] < nb
    # distinct, non-overlapping OOB windows per (layer, block): dropped
    oob = L * 2 * S + (l_idx * G + jnp.arange(G, dtype=jnp.int32)[None, :]) * block_size
    k_starts = jnp.where(valid, (l_idx * 2) * S + blk[None, :] * block_size, oob)
    v_starts = jnp.where(valid, (l_idx * 2 + 1) * S + blk[None, :] * block_size, oob)
    flat = scatter_block_windows(
        flat, k_starts.reshape(-1), k_news.reshape(L * G, block_size, F)
    )
    flat = scatter_block_windows(
        flat, v_starts.reshape(-1), v_news.reshape(L * G, block_size, F)
    )
    return flat.reshape(L, 2, S, F)


def paged_attention(
    q: jax.Array,
    k_new: jax.Array,  # [B, T, Hk, D]
    v_new: jax.Array,
    kv_l: KVLayer,
    meta: AttnMeta,
    *,
    block_size: int,
    scale: float,
    logit_softcap: float = 0.0,
    sliding_window: int = 0,
    backend: str = "auto",
    chunked: bool = False,
) -> Tuple[jax.Array, KVLayer]:
    """Write new KV then attend. Returns (out, kv_l)."""
    kv_l = write_kv_layer(
        kv_l, k_new, v_new, meta.slot_mapping,
        block_write_idx=getattr(meta, "block_write_idx", None),
    )
    if backend == "auto":
        platform = jax.default_backend()
        backend = "pallas" if platform == "tpu" else "reference"
    if backend == "pallas" and q.shape[-1] % 128 != 0:
        backend = "reference"  # decode kernel wants lane-aligned head_dim
    if backend == "pallas" and is_quantized_kv(kv_l) and q.shape[1] == 1:
        # int8 KV decode: dequant folds into per-column score/prob scaling
        # inside the kernel (the reference's fp8 dequant-in-kernel analog)
        from vllm_rs_tpu.ops.pallas.paged_attention import (
            paged_attention_decode_pallas,
        )

        data, scales = kv_l
        out = paged_attention_decode_pallas(
            q, data[0], data[1], meta,
            block_size=block_size, scale=scale,
            logit_softcap=logit_softcap, sliding_window=sliding_window,
            k_scales=scales[0], v_scales=scales[1], chunked=chunked,
        )
    elif backend == "pallas" and not is_quantized_kv(kv_l):
        from vllm_rs_tpu.ops.pallas.paged_attention import paged_attention_pallas

        out = paged_attention_pallas(
            q, kv_l[0], kv_l[1], meta,
            block_size=block_size, scale=scale,
            logit_softcap=logit_softcap, sliding_window=sliding_window,
            chunked=chunked,
        )
    else:
        Hk = k_new.shape[2]
        k, v = gather_kv_layer(kv_l, meta.block_tables, block_size, Hk)
        out = attend_gathered(
            q, k, v, meta,
            scale=scale, logit_softcap=logit_softcap,
            sliding_window=sliding_window, chunked=chunked,
        )
    return out, kv_l
