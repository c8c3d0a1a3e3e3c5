"""Rotary position embeddings.

Counterpart of the reference's rotary_emb.rs (RotaryEmbedding /
ScalingRotaryEmbedding, rope types default / linear / llama3 / yarn /
dynamic, rotary_emb.rs:172-435) — but computed on the fly from positions
inside the jitted step (an outer product + sin/cos is cheap on the VPU and
avoids carrying a [max_pos, dim] table through the cache hierarchy).

Neox-style rotate-half convention (HF safetensors layout).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from vllm_rs_tpu.config import ModelConfig


def rope_inv_freq(config: ModelConfig) -> jnp.ndarray:
    """Per-dimension inverse frequencies with rope-type scaling applied.

    Returns float32 [rotary_dim // 2]. llama3 / linear / yarn scaling follow
    the HF semantics the reference transcribes (rotary_emb.rs:172-434).
    """
    rd = config.rotary_dim
    inv = 1.0 / (
        config.rope_theta ** (jnp.arange(0, rd, 2, dtype=jnp.float32) / rd)
    )
    scaling = dict(config.rope_scaling) if config.rope_scaling else None
    if not scaling:
        return inv
    rtype = scaling.get("rope_type", scaling.get("type", "default"))
    factor = float(scaling.get("factor", 1.0))
    if rtype == "linear":
        inv = inv / factor
    elif rtype == "llama3":
        low_factor = float(scaling.get("low_freq_factor", 1.0))
        high_factor = float(scaling.get("high_freq_factor", 4.0))
        orig_ctx = float(scaling.get("original_max_position_embeddings", 8192))
        wavelen = 2.0 * math.pi / inv
        low_wl = orig_ctx / low_factor
        high_wl = orig_ctx / high_factor
        # smooth interpolation between scaled and unscaled bands
        smooth = (orig_ctx / wavelen - low_factor) / (high_factor - low_factor)
        smooth = jnp.clip(smooth, 0.0, 1.0)
        scaled = jnp.where(
            wavelen > low_wl,
            inv / factor,
            jnp.where(
                wavelen < high_wl,
                inv,
                (1.0 - smooth) * inv / factor + smooth * inv,
            ),
        )
        inv = scaled
    elif rtype in ("yarn",):
        orig_ctx = float(scaling.get("original_max_position_embeddings", 4096))
        beta_fast = float(scaling.get("beta_fast", 32.0))
        beta_slow = float(scaling.get("beta_slow", 1.0))
        rdim = rd

        def find_dim(num_rot: float) -> float:
            return (
                rdim
                * math.log(orig_ctx / (num_rot * 2 * math.pi))
                / (2 * math.log(config.rope_theta))
            )

        low = max(math.floor(find_dim(beta_fast)), 0)
        high = min(math.ceil(find_dim(beta_slow)), rdim - 1)
        dims = jnp.arange(rd // 2, dtype=jnp.float32)
        ramp = jnp.clip((dims - low / 2) / max((high - low) / 2, 1e-3), 0.0, 1.0)
        inv_interp = inv / factor
        inv = inv_interp * ramp + inv * (1.0 - ramp)
    elif rtype == "dynamic":
        # dynamic NTK (rotary_emb.rs:284): the reference recomputes the
        # base as the context grows past original_max_position_embeddings.
        # The standard attention path implements the TRUE per-row dynamic
        # semantics in-graph (dynamic_ntk_inv_freq below); this frozen
        # table — the one the reference converges to at full context,
        # base' = theta * (factor * L / orig - (factor - 1))^(d/(d-2)) —
        # remains only as the fallback for paths that precompute a single
        # static table.
        orig_ctx = float(
            scaling.get(
                "original_max_position_embeddings",
                config.max_position_embeddings / max(factor, 1.0),
            )
        )
        target = max(float(config.max_position_embeddings), orig_ctx)
        if factor > 1.0 and target > orig_ctx:
            alpha = factor * target / orig_ctx - (factor - 1.0)
            base = config.rope_theta * alpha ** (rd / max(rd - 2, 1))
            inv = 1.0 / (base ** (jnp.arange(0, rd, 2, dtype=jnp.float32) / rd))
    return inv


def dynamic_ntk_params(config: ModelConfig):
    """(orig_ctx, factor) when rope_scaling is dynamic NTK, else None.

    HF convention: when original_max_position_embeddings is absent,
    max_position_embeddings IS the original context (the extended window
    is factor x that) — rotary_emb.rs:284."""
    scaling = dict(config.rope_scaling) if config.rope_scaling else None
    if not scaling:
        return None
    rtype = scaling.get("rope_type", scaling.get("type", "default"))
    if rtype != "dynamic":
        return None
    factor = float(scaling.get("factor", 1.0))
    if factor <= 1.0:
        return None
    orig = float(
        scaling.get(
            "original_max_position_embeddings", config.max_position_embeddings
        )
    )
    return orig, factor


def dynamic_ntk_inv_freq(config: ModelConfig, positions: jax.Array) -> jax.Array:
    """True dynamic-NTK table, per batch row, computed in-graph
    (rotary_emb.rs:284 recompute-as-context-grows, HF `dynamic` semantics):
    seq_len is the row's KV length so far (max position + 1); NO scaling at
    or below the original context; beyond it the base rescales as
    theta * (factor * L / orig - (factor - 1))^(d/(d-2)). Cached keys keep
    the rotation they were written with — the same incoherence HF and the
    reference accept.

    positions: [B, T] int32 → returns float32 [B, rd // 2]."""
    orig, factor = dynamic_ntk_params(config)
    rd = config.rotary_dim
    exps = jnp.arange(0, rd, 2, dtype=jnp.float32) / rd
    inv = 1.0 / (config.rope_theta ** exps)  # unscaled base table
    seq_len = jnp.max(positions, axis=-1).astype(jnp.float32) + 1.0  # [B]
    alpha = jnp.maximum(factor * seq_len / orig - (factor - 1.0), 1.0)
    scale = alpha ** (rd / max(rd - 2, 1))  # base multiplier, [B]
    return inv[None, :] * (scale[:, None] ** (-exps[None, :]))


def yarn_attn_scale(config: ModelConfig) -> float:
    """YaRN mscale applied to attention logits (rotary_emb.rs:336-434)."""
    scaling = dict(config.rope_scaling) if config.rope_scaling else None
    if not scaling:
        return 1.0
    rtype = scaling.get("rope_type", scaling.get("type", "default"))
    if rtype != "yarn":
        return 1.0
    factor = float(scaling.get("factor", 1.0))
    mscale = float(scaling.get("mscale", 1.0))
    if factor <= 1.0:
        return 1.0
    return 0.1 * mscale * math.log(factor) + 1.0


def apply_mrope(
    q: jax.Array,  # [B, T, Hq, D]
    k: jax.Array,  # [B, T, Hk, D]
    mrope_positions: jax.Array,  # [B, 3, T] int32 (t, h, w components)
    inv_freq: jax.Array,  # [rd // 2]
    sections,  # (n_t, n_h, n_w) frequency-dim split, sums to rd // 2
    rotary_dim: Optional[int] = None,
):
    """Qwen-VL multimodal 3D rope (qwen3_vl mrope positions): each block of
    frequency dims rotates by a different position component. Text tokens
    carry equal components, which makes this identical to apply_rope there.
    """
    D = q.shape[-1]
    rd = rotary_dim or D
    half = rd // 2
    assert sum(sections) == half, (sections, half)
    # per-freq-dim component selector
    sec_id = jnp.concatenate(
        [jnp.full((n,), i, dtype=jnp.int32) for i, n in enumerate(sections)]
    )  # [half]
    # pos_per_dim [B, T, half]
    pos = jnp.take_along_axis(
        mrope_positions.astype(jnp.float32),  # [B, 3, T]
        jnp.broadcast_to(
            sec_id[None, :, None], (q.shape[0], half, q.shape[1])
        ),
        axis=1,
    ).transpose(0, 2, 1)
    angles = pos * inv_freq[None, None, :]
    cos = jnp.cos(angles)[:, :, None, :]
    sin = jnp.sin(angles)[:, :, None, :]

    def rot(x):
        xr, xp = x[..., :rd], x[..., rd:]
        x1, x2 = xr[..., :half], xr[..., half:]
        o1 = x1.astype(jnp.float32) * cos - x2.astype(jnp.float32) * sin
        o2 = x2.astype(jnp.float32) * cos + x1.astype(jnp.float32) * sin
        out = jnp.concatenate([o1, o2], axis=-1).astype(x.dtype)
        if rd < D:
            out = jnp.concatenate([out, xp], axis=-1)
        return out

    return rot(q), rot(k)


def apply_rope(
    q: jax.Array,  # [B, T, Hq, D]
    k: jax.Array,  # [B, T, Hk, D]
    positions: jax.Array,  # [B, T] int32
    inv_freq: jax.Array,  # [rd // 2] float32
    rotary_dim: Optional[int] = None,
):
    """Apply neox-style RoPE to the first rotary_dim dims of q and k.

    inv_freq is [rd // 2] (one table) or [B, rd // 2] (per-row table, the
    dynamic-NTK path)."""
    D = q.shape[-1]
    rd = rotary_dim or D
    posf = positions.astype(jnp.float32)[..., None]  # [B, T, 1]
    if inv_freq.ndim == 2:
        angles = posf * inv_freq[:, None, :]  # [B,T,rd/2]
    else:
        angles = posf * inv_freq  # [B,T,rd/2]
    cos = jnp.cos(angles)[:, :, None, :]  # [B,T,1,rd/2]
    sin = jnp.sin(angles)[:, :, None, :]

    def rot(x):
        xr, xp = x[..., :rd], x[..., rd:]
        x1, x2 = xr[..., : rd // 2], xr[..., rd // 2 :]
        xf1 = x1.astype(jnp.float32)
        xf2 = x2.astype(jnp.float32)
        o1 = xf1 * cos - xf2 * sin
        o2 = xf2 * cos + xf1 * sin
        out = jnp.concatenate([o1, o2], axis=-1).astype(x.dtype)
        if rd < D:
            out = jnp.concatenate([out, xp], axis=-1)
        return out

    return rot(q), rot(k)
