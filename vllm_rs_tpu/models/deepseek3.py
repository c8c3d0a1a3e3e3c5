"""DeepSeek V2/V3/R1 family: MLA attention + sigmoid-routed MoE.

Counterpart of the reference's deepseek3.rs + mla_attention.rs
(SURVEY.md §2.3/2.4): multi-head latent attention with a compressed
[R + P]-wide paged cache, optional q LoRA, yarn-scaled rope on the
decoupled rope dims, group-limited sigmoid routing with e-score correction
bias, shared experts, and a dense decoder-layer prefix
(first_k_dense_replace). GLM4.x-Flash ("glm4_moe_lite") shares this
implementation — it is DeepSeek-MLA-shaped with different dims.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp

from vllm_rs_tpu.config import ModelConfig
from vllm_rs_tpu.models.layers import linear, rms_norm
from vllm_rs_tpu.models.qwen3_moe import MoECausalLM
from vllm_rs_tpu.ops.attn_meta import AttnMeta
from vllm_rs_tpu.ops.mla import mla_paged_attention, write_mla_cache
from vllm_rs_tpu.ops.rope import apply_rope, rope_inv_freq


class DeepseekV3(MoECausalLM):
    def __init__(self, config: ModelConfig, **kw):
        assert config.kv_lora_rank > 0, "MLA model requires kv_lora_rank"
        super().__init__(config, **kw)
        dn, dr = config.qk_nope_head_dim, config.qk_rope_head_dim
        # sm_scale = 1/sqrt(q_head_dim), yarn-corrected with mscale_all_dim
        # (mla_attention.rs:197-220)
        scale = (dn + dr) ** -0.5
        scaling = dict(config.rope_scaling) if config.rope_scaling else {}
        factor = float(scaling.get("factor", 1.0))
        mscale_all_dim = float(scaling.get("mscale_all_dim", 0.0))
        if mscale_all_dim > 0.0 and factor > 1.0:
            m = 0.1 * mscale_all_dim * math.log(factor) + 1.0
            scale *= m * m
        self.scale = scale
        # rope inv_freq over the decoupled rope dims
        self._rope_cfg = dataclasses.replace(
            config, head_dim=dr, partial_rotary_factor=1.0
        )

    # ------------------------------------------------------------------
    # cache + parameters
    # ------------------------------------------------------------------

    def init_kv_cache(self, cache, dtype=None):
        """Compressed latent cache: [L, num_slots, R + P]. fp8-e4m3 is
        supported (reads convert on the fly, ops/mla.py); int8's paired
        layout is not (resolve_kv_dtype rejects it with a clear error)."""
        from vllm_rs_tpu.ops.kv_cache import resolve_kv_dtype

        cfg = self.config
        return jnp.zeros(
            (
                cfg.num_hidden_layers,
                cache.num_slots,
                cfg.kv_lora_rank + cfg.qk_rope_head_dim,
            ),
            dtype=resolve_kv_dtype(dtype),
        )

    def _attn_params(self, keys, L, dtype, quant, group):
        cfg = self.config
        D = cfg.hidden_size
        H = cfg.num_attention_heads
        dn, dr, dv = cfg.qk_nope_head_dim, cfg.qk_rope_head_dim, cfg.v_head_dim
        R, QR = cfg.kv_lora_rank, cfg.q_lora_rank

        def w(shape, q=quant):
            x = (jax.random.normal(next(keys), shape, dtype=jnp.float32) * 0.02).astype(dtype)
            return self._quantize(x, q, group)

        p = {
            "input_ln": jnp.ones((L, D), dtype=dtype),
            "post_ln": jnp.ones((L, D), dtype=dtype),
            # kv_a_proj_with_mqa: D → R + dr (kept high precision; it feeds
            # the cache and is tiny relative to the experts)
            "kv_a": w((L, D, R + dr), q=None),
            "kv_a_norm": jnp.ones((L, R), dtype=dtype),
            # kv_b split into absorbed factors (mla_attention.rs w_uk/w_uv_t)
            "w_uk": w((L, H, dn, R), q=None),
            "w_uv": w((L, H, R, dv), q=None),
            "o": w((L, H * dv, D)),
            "inv_freq": jnp.broadcast_to(
                rope_inv_freq(self._rope_cfg)[None, :], (L, dr // 2)
            ),
        }
        if QR:
            p["q_a"] = w((L, D, QR), q=None)
            p["q_a_norm"] = jnp.ones((L, QR), dtype=dtype)
            p["q_b"] = w((L, QR, H * (dn + dr)))
        else:
            p["q"] = w((L, D, H * (dn + dr)))
        return p

    # ------------------------------------------------------------------
    # attention
    # ------------------------------------------------------------------

    def _mla_qkv(self, lp: dict, attn_in: jax.Array, meta: AttnMeta):
        """Shared projection head: q (LoRA or direct) split nope/pe, kv_a
        → (ckv normed, k_pe roped)."""
        cfg = self.config
        B, T, _ = attn_in.shape
        H = cfg.num_attention_heads
        dn, dr = cfg.qk_nope_head_dim, cfg.qk_rope_head_dim
        R = cfg.kv_lora_rank
        if "q_a" in lp:
            q = linear(lp["q_a"], attn_in)
            q = rms_norm(q, lp["q_a_norm"], cfg.rms_norm_eps)
            q = linear(lp["q_b"], q)
        else:
            q = linear(lp["q"], attn_in)
        q = q.reshape(B, T, H, dn + dr)
        q_nope, q_pe = q[..., :dn], q[..., dn:]
        kv_a = linear(lp["kv_a"], attn_in)  # [B, T, R+dr]
        ckv = rms_norm(kv_a[..., :R], lp["kv_a_norm"], cfg.rms_norm_eps)
        k_pe = kv_a[..., R:][:, :, None, :]  # [B, T, 1, dr]
        q_pe, k_pe = apply_rope(q_pe, k_pe, meta.positions, lp["inv_freq"], dr)
        return q_nope, q_pe, ckv, k_pe[:, :, 0, :]

    def attention(self, lp: dict, attn_in: jax.Array, meta: AttnMeta, kv_l: jax.Array):
        """MLA forward (mla_attention.rs:270-460): projections → cache
        write → absorbed paged attention → o proj."""
        cfg = self.config
        B, T, _ = attn_in.shape
        H, dv = cfg.num_attention_heads, cfg.v_head_dim
        q_nope, q_pe, ckv, k_pe = self._mla_qkv(lp, attn_in, meta)
        kv_l = write_mla_cache(kv_l, ckv, k_pe, meta.slot_mapping)
        out = mla_paged_attention(
            q_nope,
            q_pe,
            kv_l,
            lp["w_uk"],
            lp["w_uv"],
            meta,
            block_size=self.block_size,
            scale=self.scale,
            kv_lora_rank=cfg.kv_lora_rank,
        )
        o = linear(lp["o"], out.reshape(B, T, H * dv))
        return o, kv_l

    # ------------------------------------------------------------------
    # deferred-write decode (pooled): the MLA analog of MoECausalLM's
    # deferred branch — the latent pool is read-only inside the scans (no
    # per-layer slice copy, no scan-ys pool rewrite), one scatter at the
    # end installs every layer's latent row
    # ------------------------------------------------------------------

    def forward(self, params: dict, token_ids: jax.Array, meta: AttnMeta, kv: jax.Array):
        cfg = self.config
        if token_ids.shape[1] != 1:
            return super().forward(params, token_ids, meta, kv)
        from vllm_rs_tpu.models.layers import mlp
        from vllm_rs_tpu.ops.mla import (
            mla_paged_attention_deferred,
            scatter_deferred_mla,
        )

        Ld = cfg.first_k_dense_replace
        L = cfg.num_hidden_layers
        H, dv = cfg.num_attention_heads, cfg.v_head_dim
        h = params["embed"][token_ids].astype(jnp.bfloat16)
        B = h.shape[0]

        def dblock(h, lp, li, mlp_out_fn):
            attn_in = rms_norm(h, lp["input_ln"], cfg.rms_norm_eps)
            q_nope, q_pe, ckv, k_pe = self._mla_qkv(lp, attn_in, meta)
            out = mla_paged_attention_deferred(
                q_nope, q_pe, ckv, k_pe, kv, li,
                lp["w_uk"], lp["w_uv"], meta,
                block_size=self.block_size, scale=self.scale,
                kv_lora_rank=cfg.kv_lora_rank,
            )
            h = h + linear(lp["o"], out.reshape(B, 1, H * dv))
            mlp_in = rms_norm(h, lp["post_ln"], cfg.rms_norm_eps)
            h = h + mlp_out_fn(lp, mlp_in)
            row = jnp.concatenate([ckv[:, 0, :], k_pe[:, 0, :]], axis=-1)
            return h, row  # [B, R+dr]

        rows = []
        if Ld:
            h, r_dense = jax.lax.scan(
                lambda h, xs: dblock(
                    h, xs[0], xs[1],
                    lambda lp, x: mlp(
                        {"gate": lp["gate"], "up": lp["up"], "down": lp["down"]},
                        x, cfg.hidden_act,
                    ),
                ),
                h,
                (params["dense_layers"], jnp.arange(Ld, dtype=jnp.int32)),
            )
            rows.append(r_dense)
        h, r_moe = jax.lax.scan(
            lambda h, xs: dblock(
                h, xs[0], xs[1], lambda lp, x: self._moe_block(lp, x)
            ),
            h,
            (params["moe_layers"], jnp.arange(Ld, L, dtype=jnp.int32)),
        )
        rows.append(r_moe)
        kv = scatter_deferred_mla(
            kv, jnp.concatenate(rows, axis=0), meta.slot_mapping
        )
        return kv, h
