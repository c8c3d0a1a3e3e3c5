"""Shared functional layer library.

Counterpart of the reference's src/models/layers/ (attention.rs, mlp.rs,
linear.rs, rotary_emb.rs, others.rs — SURVEY.md §2.4), as pure functions
over parameter pytrees. Per-layer parameters are *stacked* along a leading
layer axis and the trunk runs under `jax.lax.scan`, which keeps compile
time flat in depth — the TPU-idiomatic replacement for the reference's
per-layer Rust loop.

Linear parameters are either a plain array [K, N] (y = x @ W), a
`Linear(w, b)` NamedTuple, or a `QuantizedTensor` — dispatch happens at
trace time on the pytree node type (the analogue of LinearX's quant
dispatch, linear.rs:519-619).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Union

import jax
import jax.numpy as jnp

from vllm_rs_tpu.config import ModelConfig
from vllm_rs_tpu.ops.attention import paged_attention
from vllm_rs_tpu.ops.attn_meta import AttnMeta
from vllm_rs_tpu.ops.quant_matmul import quant_matmul
from vllm_rs_tpu.ops.rope import apply_rope, dynamic_ntk_inv_freq, dynamic_ntk_params
from vllm_rs_tpu.quant.fp8 import Fp8BlockTensor
from vllm_rs_tpu.quant.pack import PackedInt4Tensor, QuantizedTensor


class Linear(NamedTuple):
    w: Union[jax.Array, QuantizedTensor]
    b: Optional[jax.Array] = None


def linear(p, x: jax.Array) -> jax.Array:
    """Apply a (possibly quantized, possibly biased) linear layer."""
    b = None
    if isinstance(p, Linear):
        p, b = p.w, p.b
    if isinstance(p, (QuantizedTensor, PackedInt4Tensor, Fp8BlockTensor)):
        y = quant_matmul(x, p)
    else:
        y = jnp.dot(x, p.astype(x.dtype), preferred_element_type=jnp.float32).astype(
            x.dtype
        )
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def rms_norm(x: jax.Array, w: jax.Array, eps: float, plus_one: bool = False) -> jax.Array:
    """RMSNorm with f32 accumulation; plus_one → gemma (1 + w) semantics
    (reference others.rs NormX / attention.rs:440-443)."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xn = xf * jax.lax.rsqrt(var + eps)
    wf = w.astype(jnp.float32)
    if plus_one:
        wf = wf + 1.0
    return (xn * wf).astype(x.dtype)


def silu_and_mul(gate: jax.Array, up: jax.Array) -> jax.Array:
    return jax.nn.silu(gate.astype(jnp.float32)).astype(gate.dtype) * up


_ACT = {
    "silu": silu_and_mul,
    "gelu": lambda g, u: jax.nn.gelu(g.astype(jnp.float32), approximate=False).astype(g.dtype) * u,
    "gelu_pytorch_tanh": lambda g, u: jax.nn.gelu(g.astype(jnp.float32), approximate=True).astype(g.dtype) * u,
}


def _fused_mlp_enabled() -> bool:
    import os

    return os.environ.get("VLLM_RS_TPU_FUSED_MLP", "0") == "1"


def mlp(lp: dict, h: jax.Array, act: str = "silu") -> jax.Array:
    """Gated MLP: down(act(gate(h)) * up(h)) (reference mlp.rs). A fused
    "gate_up" weight [D, 2I] halves launches + activation quants.

    VLLM_RS_TPU_FUSED_MLP=1 (experiment; accepted only via same-day
    bench.py A/B — repo rule): int4 decode batches additionally fuse the
    gate_up and down matmuls into ONE pallas launch with the [M, I]
    intermediate resident in VMEM (ops/pallas/fused_mlp.py)."""
    if (
        _fused_mlp_enabled()
        and "gate_up" in lp
        and isinstance(lp["gate_up"], PackedInt4Tensor)
        and isinstance(lp.get("down"), PackedInt4Tensor)
    ):
        from vllm_rs_tpu.ops.pallas.fused_mlp import (
            fused_mlp_int4_a8,
            fused_mlp_supported,
        )

        lead = h.shape[:-1]
        x2 = h.reshape(-1, h.shape[-1])
        gup, down = lp["gate_up"], lp["down"]
        interpret = jax.default_backend() != "tpu"
        if fused_mlp_supported(gup, down, x2.shape[0], act, interpret):
            y = fused_mlp_int4_a8(
                x2, gup.qweight, gup.scales, down.qweight, down.scales,
                act=act, interpret=interpret,
            )
            return y.reshape(*lead, y.shape[-1]).astype(h.dtype)
    if "gate_up" in lp:
        gu = linear(lp["gate_up"], h)
        gate, up = jnp.split(gu, 2, axis=-1)
    else:
        gate = linear(lp["gate"], h)
        up = linear(lp["up"], h)
    return linear(lp["down"], _ACT[act](gate, up))


def qkv_rope(lp: dict, h: jax.Array, meta: AttnMeta, config: ModelConfig):
    """Shared projection head: qkv proj → q/k norms → RoPE.

    A fused "qkv" weight [D, (Hq+2Hk)*Dh] (reference
    MergedParallelColumnLinear, distributed.rs:116) runs ONE kernel launch
    and one activation quantization instead of three."""
    B, T, _ = h.shape
    Hq = config.num_attention_heads
    Hk = config.num_key_value_heads
    Dh = config.head_dim_

    if "qkv" in lp:
        qkv = linear(lp["qkv"], h)
        q, k, v = jnp.split(qkv, [Hq * Dh, (Hq + Hk) * Dh], axis=-1)
        q = q.reshape(B, T, Hq, Dh)
        k = k.reshape(B, T, Hk, Dh)
        v = v.reshape(B, T, Hk, Dh)
    else:
        q = linear(lp["q"], h).reshape(B, T, Hq, Dh)
        k = linear(lp["k"], h).reshape(B, T, Hk, Dh)
        v = linear(lp["v"], h).reshape(B, T, Hk, Dh)

    if config.qk_norm:
        q = rms_norm(q, lp["q_norm"], config.rms_norm_eps, config.norm_plus_one)
        k = rms_norm(k, lp["k_norm"], config.rms_norm_eps, config.norm_plus_one)

    if config.qk_l2_norm:  # minimax (attention.rs:749-757)
        q = q * jax.lax.rsqrt(
            jnp.sum(q.astype(jnp.float32) ** 2, axis=-1, keepdims=True) + 1e-6
        ).astype(q.dtype)
        k = k * jax.lax.rsqrt(
            jnp.sum(k.astype(jnp.float32) ** 2, axis=-1, keepdims=True) + 1e-6
        ).astype(k.dtype)

    sections = config.extra_get("mrope_section")
    if meta.mrope_positions is not None and sections:
        from vllm_rs_tpu.ops.rope import apply_mrope

        q, k = apply_mrope(
            q, k, meta.mrope_positions, lp["inv_freq"], tuple(sections),
            config.rotary_dim,
        )
    else:
        if dynamic_ntk_params(config) is not None:
            # true dynamic NTK: per-row table from the row's context length
            # (rotary_emb.rs:284) — supersedes the frozen lp["inv_freq"]
            inv = dynamic_ntk_inv_freq(config, meta.positions)
        else:
            inv = lp["inv_freq"]
        q, k = apply_rope(q, k, meta.positions, inv, config.rotary_dim)

    if config.attn_temperature_tuning:  # llama4 (attention.rs:783-798)
        pos = meta.positions.astype(jnp.float32)  # [B, T]
        scale = (
            jnp.log(jnp.floor(pos / config.attn_floor_scale) + 1.0)
            * config.attn_scale_coef
            + 1.0
        )
        q = (q.astype(jnp.float32) * scale[:, :, None, None]).astype(q.dtype)
    return q, k, v


def attention_block(
    lp: dict,
    h: jax.Array,  # [B, T, D]
    meta: AttnMeta,
    kv_l,  # per-layer cache: bf16 [2, S, Hk*Dh] or int8 (data, scales)
    config: ModelConfig,
    *,
    block_size: int,
    scale: float,
    sliding_window: int = 0,
    attn_backend: str = "auto",
):
    """Unified GQA attention (reference attention.rs Attention::forward_ext):
    qkv proj → optional per-head q/k RMSNorm (qwen3) → RoPE → paged attention
    (KV write + attend) → o proj. Returns (attn_out [B,T,D], kv_l).
    """
    B, T, _ = h.shape
    q, k, v = qkv_rope(lp, h, meta, config)
    out, kv_l = paged_attention(
        q,
        k,
        v,
        kv_l,
        meta,
        block_size=block_size,
        scale=scale,
        logit_softcap=config.attn_logit_softcap,
        sliding_window=sliding_window,
        backend=attn_backend,
    )
    o = linear(lp["o"], out.reshape(B, T, -1))
    return o, kv_l


def attention_block_deferred(
    lp: dict,
    h: jax.Array,  # [B, 1, D]
    meta: AttnMeta,
    kv_l: jax.Array,  # read-only [2, S, Hk*Dh]; or full pool w/ layer_idx
    config: ModelConfig,
    *,
    block_size: int,
    scale: float,
    sliding_window: int = 0,
    attn_backend: str = "auto",
    layer_idx=None,
):
    """Decode attention with deferred KV write: the per-layer cache is only
    READ here; the new token's K/V returns to the caller for one post-scan
    scatter. Returns (attn_out, k_new [B,1,Hk,Dh], v_new). With
    `layer_idx`, `kv_l` is the full pool (pooled mode — no slice copies)."""
    from vllm_rs_tpu.ops.attention import paged_attention_deferred

    B, T, _ = h.shape
    q, k, v = qkv_rope(lp, h, meta, config)
    out = paged_attention_deferred(
        q, k, v, kv_l, meta,
        block_size=block_size, scale=scale,
        logit_softcap=config.attn_logit_softcap,
        sliding_window=sliding_window, backend=attn_backend,
        layer_idx=layer_idx,
    )
    o = linear(lp["o"], out.reshape(B, T, -1))
    return o, k, v


def attention_block_verify_deferred(
    lp: dict,
    h: jax.Array,  # [B, T, D] — the k+1-token verify window
    meta: AttnMeta,  # pool_lens set (ops/attn_meta.py)
    kv_l: jax.Array,  # read-only; full pool with layer_idx
    config: ModelConfig,
    *,
    block_size: int,
    scale: float,
    attn_backend: str = "auto",
    layer_idx=None,
):
    """Verify-window attention with deferred KV write (the T>1 analog of
    attention_block_deferred, for the on-device speculative loop): the
    cache is only READ; the window's K/V return to the caller for one
    post-scan scatter. Global attention only — callers gate on config.
    Returns (attn_out, k_new [B,T,Hk,Dh], v_new)."""
    from vllm_rs_tpu.ops.attention import paged_attention_verify_deferred

    B, T, _ = h.shape
    q, k, v = qkv_rope(lp, h, meta, config)
    out = paged_attention_verify_deferred(
        q, k, v, kv_l, meta,
        block_size=block_size, scale=scale,
        logit_softcap=config.attn_logit_softcap,
        backend=attn_backend, layer_idx=layer_idx,
    )
    o = linear(lp["o"], out.reshape(B, T, -1))
    return o, k, v


def attention_block_prefill_deferred(
    lp: dict,
    h: jax.Array,  # [B, T, D] — a FRESH chunk (context starts at 0)
    meta: AttnMeta,  # fresh_prefill set (ops/attn_meta.py)
    config: ModelConfig,
    *,
    scale: float,
    sliding_window: int = 0,
):
    """Fresh-prefill attention with deferred KV write: every key the chunk
    can attend IS the chunk (context starts at position 0 for every row),
    so attention runs in-window over the fresh K/V — the pool is never
    read OR written inside the layer scan; the window's K/V return to the
    caller for one post-scan block-granularity scatter. The classic
    write-in-scan path's per-layer pool-slice copy + write-back measured
    55% of the prefill step at the batch-256 shape (lab06b
    no_prefill_write, PERF_NOTES r5). Returns (attn_out, k_new, v_new)."""
    from vllm_rs_tpu.ops.attention import attend_gathered

    B, T, _ = h.shape
    q, k, v = qkv_rope(lp, h, meta, config)
    # attend_gathered over C == T rows: key row index IS the absolute
    # position for a fresh chunk, so its causal/context/window masks apply
    # unchanged (and padded rows/tokens mask exactly as the classic
    # reference path does)
    out = attend_gathered(
        q, k, v, meta,
        scale=scale, logit_softcap=config.attn_logit_softcap,
        sliding_window=sliding_window,
    )
    o = linear(lp["o"], out.reshape(B, T, -1))
    return o, k, v


def gather_last_hidden(hidden: jax.Array, meta: AttnMeta) -> jax.Array:
    """Gather each row's last real token's hidden state: [B, T, D] → [B, D]
    (reference llama.rs:306-310 last-token gather before lm_head)."""
    B = hidden.shape[0]
    idx = jnp.clip(meta.last_token_idx, 0, hidden.shape[1] - 1)
    return hidden[jnp.arange(B), idx]
