"""Gated DeltaNet (linear attention) ops — Qwen3.5 / Qwen3-Next hybrids.

TPU counterpart of the reference's attention-rs `gdn::*` kernels
(deltanet.rs:692-837 call sites): fused gating, causal conv1d with
persistent per-sequence state, L2 norm, the gated delta-rule recurrence
(prefill scan + single-step decode), and the gated RMSNorm output path.

State model (the reference's MambaCache, mamba_cache.rs): each hybrid
sequence owns one *mamba slot*; per GDN layer the caches are
    conv_state [slots, conv_dim, K-1]      (last K-1 channel inputs)
    rec_state  [slots, H, dk, dv]          (delta-rule fast-weight state)
threaded functionally through the jitted step like the paged KV pool.

Recurrence (gated delta rule; HF Qwen3Next semantics):
    g_t    = -exp(a_log) * softplus(a_t + dt_bias)      (per head, ≤ 0)
    beta_t = sigmoid(b_t)
    S      = exp(g_t) * S
    delta  = beta_t * (v_t - Sᵀ k_t)
    S      = S + k_t deltaᵀ
    o_t    = Sᵀ q_t
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def fused_gdn_gating(
    a_log: jax.Array,  # [H]
    a: jax.Array,  # [T, H]
    b: jax.Array,  # [T, H]
    dt_bias: jax.Array,  # [H]
) -> Tuple[jax.Array, jax.Array]:
    """→ (g [T, H] decay log-scale ≤ 0, beta [T, H] write gate in (0,1))."""
    g = -jnp.exp(a_log.astype(jnp.float32))[None, :] * jax.nn.softplus(
        a.astype(jnp.float32) + dt_bias.astype(jnp.float32)[None, :]
    )
    beta = jax.nn.sigmoid(b.astype(jnp.float32))
    return g, beta


def l2_norm_last_dim(x: jax.Array, eps: float = 1e-6) -> jax.Array:
    xf = x.astype(jnp.float32)
    return (xf * jax.lax.rsqrt(jnp.sum(xf * xf, axis=-1, keepdims=True) + eps)).astype(
        x.dtype
    )


def causal_conv1d_prefill(
    x: jax.Array,  # [T, C] one sequence's chunk (time-major)
    conv_weight: jax.Array,  # [C, K] depthwise kernel
    conv_bias: Optional[jax.Array],  # [C]
    conv_state: jax.Array,  # [C, K-1] trailing inputs from previous chunks
) -> Tuple[jax.Array, jax.Array]:
    """Depthwise causal conv along time with carried state; SiLU activation.
    Returns (y [T, C], new_state [C, K-1])."""
    T, C = x.shape
    K = conv_weight.shape[1]
    xf = x.astype(jnp.float32)
    hist = jnp.concatenate([conv_state.astype(jnp.float32).T, xf], axis=0)  # [K-1+T, C]
    # y[t, c] = sum_j w[c, j] * hist[t + j, c]
    y = jnp.zeros((T, C), dtype=jnp.float32)
    for j in range(K):
        y = y + hist[j : j + T] * conv_weight[:, j].astype(jnp.float32)[None, :]
    if conv_bias is not None:
        y = y + conv_bias.astype(jnp.float32)[None, :]
    y = jax.nn.silu(y)
    new_state = hist[T:].T if K > 1 else conv_state  # last K-1 rows → [C, K-1]
    new_state = jax.lax.dynamic_slice_in_dim(hist, T, K - 1, axis=0).T
    return y.astype(x.dtype), new_state.astype(conv_state.dtype)


def causal_conv1d_update(
    x: jax.Array,  # [B, C] one token per row
    conv_weight: jax.Array,  # [C, K]
    conv_bias: Optional[jax.Array],
    conv_state: jax.Array,  # [B, C, K-1]
) -> Tuple[jax.Array, jax.Array]:
    """Single-token conv update (decode). Returns (y [B, C], new_state)."""
    K = conv_weight.shape[1]
    xf = x.astype(jnp.float32)
    st = conv_state.astype(jnp.float32)  # [B, C, K-1]
    window = jnp.concatenate([st, xf[:, :, None]], axis=2)  # [B, C, K]
    y = jnp.sum(window * conv_weight.astype(jnp.float32)[None, :, :], axis=2)
    if conv_bias is not None:
        y = y + conv_bias.astype(jnp.float32)[None, :]
    y = jax.nn.silu(y)
    return y.astype(x.dtype), window[:, :, 1:].astype(conv_state.dtype)


def gated_delta_step(
    S: jax.Array,  # [H, dk, dv] f32
    q: jax.Array,  # [H, dk]
    k: jax.Array,  # [H, dk]
    v: jax.Array,  # [H, dv]
    g: jax.Array,  # [H]
    beta: jax.Array,  # [H]
) -> Tuple[jax.Array, jax.Array]:
    """One delta-rule step → (new S, o [H, dv])."""
    S = S * jnp.exp(g.astype(jnp.float32))[:, None, None]
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    kv_mem = jnp.einsum("hkv,hk->hv", S, kf)
    delta = (vf - kv_mem) * beta.astype(jnp.float32)[:, None]
    S = S + jnp.einsum("hk,hv->hkv", kf, delta)
    o = jnp.einsum("hkv,hk->hv", S, q.astype(jnp.float32))
    return S, o


def gated_delta_prefill(
    S: jax.Array,  # [H, dk, dv]
    q: jax.Array,  # [T, H, dk] (already scaled)
    k: jax.Array,  # [T, H, dk]
    v: jax.Array,  # [T, H, dv]
    g: jax.Array,  # [T, H]
    beta: jax.Array,  # [T, H]
) -> Tuple[jax.Array, jax.Array]:
    """Sequential recurrence over a chunk → (final S, o [T, H, dv]).

    A chunked-parallel (WY representation) formulation is the follow-up
    optimization; prefill chunks are modest and the per-step math is tiny
    matvecs, so the lax.scan recurrence is compile-friendly and exact.
    """

    def step(S, xs):
        q_t, k_t, v_t, g_t, b_t = xs
        S, o = gated_delta_step(S, q_t, k_t, v_t, g_t, b_t)
        return S, o

    S, o = jax.lax.scan(step, S.astype(jnp.float32), (q, k, v, g, beta))
    return S, o


def _gdn_chunk_single_head(S0, q, k, v, g, beta):
    """One chunk, one head, closed form (no sequential scan).

    Derivation (all coefficients bounded ≤ 1 — decay ratios γ_{t,i} =
    exp(G_t − G_i) never invert the cumulative decay, so no underflow):
        S_t = a_t (I − b_t k_t k_tᵀ) S_{t−1} + b_t k_t v_tᵀ
    with update rows r'_t ≡ c_t · (write row of S~):
        (I + L') R' = diag(b) V − diag(b·c) K S₀,
        L'_{t,i} = b_t (k_t·k_i) γ_{t,i}  (strictly lower),
        o_t = c_t S₀ᵀ q_t + Σ_{i≤t} γ_{t,i} (q_t·k_i) r'_i,
        S_C = c_C S₀ + Σ_i γ_{C,i} k_i r'_iᵀ.
    One triangular solve + a few MXU matmuls per chunk replaces C
    sequential rank-1 updates.
    """
    C = q.shape[0]
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    qf = q.astype(jnp.float32)
    b = beta.astype(jnp.float32)
    G = jnp.cumsum(g.astype(jnp.float32))  # [C]
    c = jnp.exp(G)
    gamma = jnp.exp(G[:, None] - G[None, :])  # γ_{t,i}
    row = jax.lax.broadcasted_iota(jnp.int32, (C, C), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (C, C), 1)
    strict = row > col
    incl = row >= col

    A = kf @ kf.T  # [C, C]
    Lm = jnp.where(strict, b[:, None] * A * gamma, 0.0)
    rhs = b[:, None] * vf - (b * c)[:, None] * (kf @ S0)
    R = jax.scipy.linalg.solve_triangular(
        jnp.eye(C, dtype=jnp.float32) + Lm, rhs, lower=True
    )  # [C, dv]

    QK = qf @ kf.T
    O = c[:, None] * (qf @ S0) + jnp.where(incl, QK * gamma, 0.0) @ R
    gamma_last = jnp.exp(G[-1] - G)  # γ_{C,i}
    S_C = c[-1] * S0 + (kf * gamma_last[:, None]).T @ R
    return S_C, O


def gated_delta_prefill_chunked(
    S: jax.Array,  # [H, dk, dv]
    q: jax.Array,  # [T, H, dk] (scaled)
    k: jax.Array,
    v: jax.Array,  # [T, H, dv]
    g: jax.Array,  # [T, H]
    beta: jax.Array,
    chunk: int = 64,
):
    """Chunk-parallel recurrence: scan over ⌈T/chunk⌉ chunks, closed form
    within each (the WY/UT-transform formulation of the delta rule). Exact
    — tests pin equality with the sequential scan. T pads to a chunk
    multiple with g=0, beta=0 rows (state-preserving no-ops)."""
    T, H, dk = q.shape
    dv = v.shape[-1]
    Tp = -(-T // chunk) * chunk
    if Tp != T:
        pad = ((0, Tp - T), (0, 0), (0, 0))
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
        g = jnp.pad(g, ((0, Tp - T), (0, 0)))
        beta = jnp.pad(beta, ((0, Tp - T), (0, 0)))
    n = Tp // chunk

    def per_chunk(S, xs):
        qc, kc, vc, gc, bc = xs  # [chunk, H, *]
        S, O = jax.vmap(_gdn_chunk_single_head, in_axes=(0, 1, 1, 1, 1, 1), out_axes=(0, 1))(
            S, qc, kc, vc, gc, bc
        )
        return S, O

    xs = (
        q.reshape(n, chunk, H, dk),
        k.reshape(n, chunk, H, dk),
        v.reshape(n, chunk, H, dv),
        g.reshape(n, chunk, H),
        beta.reshape(n, chunk, H),
    )
    S, O = jax.lax.scan(per_chunk, S.astype(jnp.float32), xs)
    O = O.reshape(Tp, H, dv)
    return S, O[:T]


def gated_rmsnorm_silu(
    x: jax.Array,  # [T, H, dv]
    z: jax.Array,  # [T, H, dv] gate input
    weight: jax.Array,  # [dv]
    eps: float,
) -> jax.Array:
    """Per-head RMSNorm(x) * silu(z) (gdn::gated_rmsnorm_silu_mul)."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xn = xf * jax.lax.rsqrt(var + eps) * weight.astype(jnp.float32)
    return (xn * jax.nn.silu(z.astype(jnp.float32))).astype(x.dtype)
