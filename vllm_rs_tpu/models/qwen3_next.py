"""Qwen3.5 / Qwen3-Next hybrid: GatedDeltaNet linear attention + full attention.

Counterpart of the reference's qwen3_5.rs / deltanet.rs (SURVEY.md §2.3):
most layers use the gated delta-rule linear attention (O(1) state per
sequence — a mamba slot holding conv + recurrent state), with periodic full
attention layers over the paged KV cache. Full-attention layers optionally
gate their output (qwen3_5.rs:683-701 gated attention).

Layer types interleave, so the trunk is a Python loop over per-layer
parameter dicts (not a lax.scan): compile time grows with depth but the
hybrid cache pytree {kv, conv, rec} stays functional and donated like the
dense models' pool.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp

from vllm_rs_tpu.config import ModelConfig
from vllm_rs_tpu.models.layers import Linear, attention_block, linear, mlp, rms_norm
from vllm_rs_tpu.models.llama import CausalLM
from vllm_rs_tpu.ops.attn_meta import AttnMeta
from vllm_rs_tpu.ops.gdn import (
    causal_conv1d_prefill,
    causal_conv1d_update,
    fused_gdn_gating,
    gated_delta_prefill,
    gated_delta_prefill_chunked,
    gated_delta_step,
    gated_rmsnorm_silu,
    l2_norm_last_dim,
)
from vllm_rs_tpu.ops.rope import rope_inv_freq


class Qwen3NextForCausalLM(CausalLM):
    """Hybrid GDN + full-attention decoder."""

    def __init__(self, config: ModelConfig, **kw):
        super().__init__(config, **kw)
        lt = config.extra_get("layer_types_hybrid")
        if not lt:
            interval = int(config.extra_get("full_attention_interval", 4))
            lt = tuple(
                "full" if (i + 1) % interval == 0 else "linear"
                for i in range(config.num_hidden_layers)
            )
        self.layer_types: tuple = tuple(lt)
        self.num_full = sum(1 for t in self.layer_types if t == "full")
        self.num_gdn = len(self.layer_types) - self.num_full
        # GDN dims
        self.Hk_lin = int(config.extra_get("linear_num_key_heads", 16))
        self.Hv_lin = int(config.extra_get("linear_num_value_heads", 32))
        self.dk_lin = int(config.extra_get("linear_key_head_dim", 128))
        self.dv_lin = int(config.extra_get("linear_value_head_dim", 128))
        self.conv_k = int(config.extra_get("linear_conv_kernel_dim", 4))
        self.is_moe = config.num_experts > 0
        if self.is_moe:
            from vllm_rs_tpu.ops.moe import MoERouterConfig

            self.router_cfg = MoERouterConfig(
                num_experts=config.num_experts,
                num_experts_per_tok=config.num_experts_per_tok,
                scoring=config.router_scoring,
                n_group=config.n_group,
                topk_group=config.topk_group,
                norm_topk_prob=config.norm_topk_prob,
                routed_scaling_factor=config.routed_scaling_factor,
            )
        self.key_dim = self.Hk_lin * self.dk_lin
        self.value_dim = self.Hv_lin * self.dv_lin
        self.conv_dim = 2 * self.key_dim + self.value_dim
        self.gdn_scale = self.dk_lin ** -0.5

    # ------------------------------------------------------------------
    # caches: {"kv": [Lf, 2, S, Hk*Dh], "conv": [Lg, slots, C, K-1],
    #          "rec": [Lg, slots, Hv, dk, dv]}
    # ------------------------------------------------------------------

    def init_kv_cache(self, cache, dtype=None):
        from vllm_rs_tpu.ops.kv_cache import resolve_kv_dtype

        cfg = self.config
        slots = getattr(cache, "mamba_slots", 64)
        return {
            "kv": jnp.zeros(
                (
                    self.num_full,
                    2,
                    cache.num_slots,
                    cfg.num_key_value_heads * cfg.head_dim_,
                ),
                dtype=resolve_kv_dtype(dtype),
            ),
            "conv": jnp.zeros(
                (self.num_gdn, slots, self.conv_dim, self.conv_k - 1),
                dtype=jnp.float32,
            ),
            "rec": jnp.zeros(
                (self.num_gdn, slots, self.Hv_lin, self.dk_lin, self.dv_lin),
                dtype=jnp.float32,
            ),
        }

    # ------------------------------------------------------------------
    # parameters
    # ------------------------------------------------------------------

    def init_params(self, key, quant=None, quant_group: int = 128, dtype=jnp.bfloat16):
        cfg = self.config
        D, I, V = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
        Hq, Hk, Dh = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim_
        keys = iter(jax.random.split(key, 8 * cfg.num_hidden_layers + 8))

        def w(shape, q=quant):
            x = (jax.random.normal(next(keys), shape, dtype=jnp.float32) * 0.02).astype(dtype)
            return self._quantize(x, q, quant_group)

        layers: List[dict] = []
        for t in self.layer_types:
            lp = {
                "input_ln": jnp.ones((D,), dtype=dtype),
                "post_ln": jnp.ones((D,), dtype=dtype),
            }
            if self.is_moe:  # qwen3_5_moe hybrid (qwen3_5_moe.rs)
                E, Im = cfg.num_experts, cfg.moe_intermediate_size
                lp["router"] = w((D, E), q=None)
                lp["w_gate"] = w((E, D, Im))
                lp["w_up"] = w((E, D, Im))
                lp["w_down"] = w((E, Im, D))
                if cfg.shared_expert_intermediate_size:
                    S = cfg.shared_expert_intermediate_size
                    lp["shared_gate_proj"] = w((D, S))
                    lp["shared_up_proj"] = w((D, S))
                    lp["shared_down_proj"] = w((S, D))
                    if cfg.shared_expert_gate:
                        lp["shared_gate"] = w((D, 1), q=None)
            else:
                lp["gate"] = w((D, I))
                lp["up"] = w((D, I))
                lp["down"] = w((I, D))
            if t == "full":
                lp.update(
                    {
                        "q": w((D, Hq * Dh)),
                        "k": w((D, Hk * Dh)),
                        "v": w((D, Hk * Dh)),
                        "o": w((Hq * Dh, D)),
                        "attn_gate": w((D, Hq * Dh), q=None),
                        "inv_freq": rope_inv_freq(cfg),
                    }
                )
                if cfg.qk_norm:
                    lp["q_norm"] = jnp.ones((Dh,), dtype=dtype)
                    lp["k_norm"] = jnp.ones((Dh,), dtype=dtype)
            else:
                lp.update(
                    {
                        "in_qkvz": w((D, 2 * self.key_dim + 2 * self.value_dim)),
                        "in_ba": w((D, 2 * self.Hv_lin), q=None),
                        "conv_weight": (
                            jax.random.normal(next(keys), (self.conv_dim, self.conv_k), jnp.float32)
                            * 0.2
                        ),
                        "conv_bias": jnp.zeros((self.conv_dim,), jnp.float32),
                        "a_log": jnp.zeros((self.Hv_lin,), jnp.float32),
                        "dt_bias": jnp.zeros((self.Hv_lin,), jnp.float32),
                        "gdn_norm": jnp.ones((self.dv_lin,), dtype=dtype),
                        "out": w((self.value_dim, D)),
                    }
                )
            layers.append(lp)
        params = {
            "embed": (jax.random.normal(next(keys), (V, D), jnp.float32) * 0.02).astype(dtype),
            "layers": layers,  # list: per-layer dicts (heterogeneous)
            "final_norm": jnp.ones((D,), dtype=dtype),
        }
        if not cfg.tie_word_embeddings:
            params["lm_head"] = w((D, V), q="int8" if quant else None)
        return params

    # ------------------------------------------------------------------
    # GDN layer forward
    # ------------------------------------------------------------------

    def _gdn_layer(self, lp, h, meta: AttnMeta, conv_st, rec_st):
        """h [B, T, D] → (out [B, T, D], conv_st, rec_st).

        Decode (T == 1) takes the single-step update; prefill runs the conv
        + recurrence per row under vmap with per-row true lengths masking
        padded tail tokens out of both the conv history and the state.
        """
        cfg = self.config
        B, T, D = h.shape
        Hk, Hv = self.Hk_lin, self.Hv_lin
        dk, dv = self.dk_lin, self.dv_lin
        groups = Hv // Hk

        qkvz = linear(lp["in_qkvz"], h)
        ba = linear(lp["in_ba"], h).astype(jnp.float32)
        q, k, v, z = jnp.split(
            qkvz, [self.key_dim, 2 * self.key_dim, 2 * self.key_dim + self.value_dim],
            axis=-1,
        )
        b, a = jnp.split(ba, 2, axis=-1)  # [B, T, Hv] each
        mixed = jnp.concatenate([q, k, v], axis=-1)  # [B, T, C]

        # per-row mamba slot state
        slots = meta.seq_slots  # [B]
        conv_rows = conv_st[slots]  # [B, C, K-1]
        rec_rows = rec_st[slots]  # [B, Hv, dk, dv]

        if T == 1:
            y, conv_rows = causal_conv1d_update(
                mixed[:, 0, :], lp["conv_weight"], lp["conv_bias"], conv_rows
            )
            qc, kc, vc = jnp.split(y, [self.key_dim, 2 * self.key_dim], axis=-1)
            qh = l2_norm_last_dim(qc.reshape(B, Hk, dk))
            kh = l2_norm_last_dim(kc.reshape(B, Hk, dk))
            qh = jnp.repeat(qh, groups, axis=1)
            kh = jnp.repeat(kh, groups, axis=1)
            vh = vc.reshape(B, Hv, dv)
            g, beta = fused_gdn_gating(
                lp["a_log"], a.reshape(B, Hv), b.reshape(B, Hv), lp["dt_bias"]
            )
            rec_rows, o = jax.vmap(gated_delta_step)(
                rec_rows, qh * self.gdn_scale, kh, vh, g, beta
            )
            o = o[:, None, :, :]  # [B, 1, Hv, dv]
            z_h = z.reshape(B, 1, Hv, dv)
        else:
            # true chunk length per row = last_token_idx + 1
            tl = meta.last_token_idx + 1  # [B]
            tpos = jax.lax.broadcasted_iota(jnp.int32, (B, T), 1)
            tok_valid = tpos < tl[:, None]
            mixed = jnp.where(tok_valid[:, :, None], mixed, 0.0)

            def one_row(mx, conv0, rec0, a_r, b_r, valid_r, tl_r):
                y, _ = causal_conv1d_prefill(
                    mx, lp["conv_weight"], lp["conv_bias"], conv0
                )
                # conv state at the row's true end: window into [K-1 hist|x]
                histx = jnp.concatenate(
                    [conv0.astype(jnp.float32).T, mx.astype(jnp.float32)], axis=0
                )
                new_conv = jax.lax.dynamic_slice_in_dim(
                    histx, tl_r, self.conv_k - 1, axis=0
                ).T
                qc, kc, vc = jnp.split(y, [self.key_dim, 2 * self.key_dim], axis=-1)
                qh = l2_norm_last_dim(qc.reshape(T, Hk, dk))
                kh = l2_norm_last_dim(kc.reshape(T, Hk, dk))
                qh = jnp.repeat(qh, groups, axis=1)
                kh = jnp.repeat(kh, groups, axis=1)
                vh = vc.reshape(T, Hv, dv)
                g, beta = fused_gdn_gating(lp["a_log"], a_r, b_r, lp["dt_bias"])
                # freeze state on padded tail: g→0 (decay 1), beta→0 (no write)
                g = jnp.where(valid_r[:, None], g, 0.0)
                beta = jnp.where(valid_r[:, None], beta, 0.0)
                if T >= 32:  # chunk-parallel closed form (ops/gdn.py)
                    S, o = gated_delta_prefill_chunked(
                        rec0, qh * self.gdn_scale, kh, vh, g, beta, chunk=32
                    )
                else:
                    S, o = gated_delta_prefill(
                        rec0, qh * self.gdn_scale, kh, vh, g, beta
                    )
                return new_conv.astype(conv0.dtype), S, o

            conv_rows, rec_rows, o = jax.vmap(one_row)(
                mixed, conv_rows, rec_rows, a, b, tok_valid, tl
            )
            z_h = z.reshape(B, T, Hv, dv)

        # padding rows carry the out-of-bounds sentinel slot (runner
        # prepare_*): mode="drop" discards their garbage state updates —
        # without it a padded decode batch clobbered slot 0's live state
        # every step (the pre-round-2 hybrid slot-0 corruption bug)
        conv_st = conv_st.at[slots].set(conv_rows, mode="drop")
        rec_st = rec_st.at[slots].set(rec_rows, mode="drop")

        o = gated_rmsnorm_silu(
            o.reshape(B, -1, Hv, dv), z_h, lp["gdn_norm"], cfg.rms_norm_eps
        )
        out = linear(lp["out"], o.reshape(B, -1, self.value_dim))
        return out, conv_st, rec_st

    # ------------------------------------------------------------------
    # trunk
    # ------------------------------------------------------------------

    def forward(self, params, token_ids, meta: AttnMeta, caches):
        cfg = self.config
        h = params["embed"][token_ids].astype(jnp.bfloat16)
        kv = caches["kv"]
        conv_st = caches["conv"]
        rec_st = caches["rec"]
        # deferred-write decode for the full-attention layers: pooled-mode
        # kernel reads the [Lf, 2, S, F] pool in place, new K/V scatter
        # once after the loop (no per-layer pool slice/rewrite — see
        # PERF_NOTES.md finding #3)
        deferred = token_ids.shape[1] == 1 and isinstance(kv, jax.Array)
        kv_news = [] if deferred else None
        kv_layers = []
        fi = gi = 0
        for lp, t in zip(params["layers"], self.layer_types):
            attn_in = rms_norm(h, lp["input_ln"], cfg.rms_norm_eps, cfg.norm_plus_one)
            if t == "full":
                if deferred:
                    from vllm_rs_tpu.models.layers import attention_block_deferred

                    B = h.shape[0]
                    attn_out, k_new, v_new = attention_block_deferred(
                        lp, attn_in, meta, kv, cfg,
                        block_size=self.block_size, scale=self.scale,
                        sliding_window=cfg.sliding_window,
                        attn_backend=self.attn_backend,
                        layer_idx=jnp.asarray(fi, jnp.int32),
                    )
                    kv_news.append(
                        (k_new.reshape(B, -1), v_new.reshape(B, -1))
                    )
                else:
                    attn_out, kv_l = attention_block(
                        lp, attn_in, meta, kv[fi], cfg,
                        block_size=self.block_size, scale=self.scale,
                        sliding_window=cfg.sliding_window,
                        attn_backend=self.attn_backend,
                    )
                    kv_layers.append(kv_l)
                if "attn_gate" in lp:  # gated attention (qwen3_5.rs:683-701)
                    gate = jax.nn.sigmoid(
                        linear(lp["attn_gate"], attn_in).astype(jnp.float32)
                    )
                    attn_out = (attn_out.astype(jnp.float32) * gate).astype(attn_out.dtype)
                fi += 1
            else:
                attn_out, conv_l, rec_l = self._gdn_layer(
                    lp, attn_in, meta, conv_st[gi], rec_st[gi]
                )
                conv_st = conv_st.at[gi].set(conv_l)
                rec_st = rec_st.at[gi].set(rec_l)
                gi += 1
            h = h + attn_out
            mlp_in = rms_norm(h, lp["post_ln"], cfg.rms_norm_eps, cfg.norm_plus_one)
            if self.is_moe:
                from vllm_rs_tpu.models.qwen3_moe import moe_block

                h = h + moe_block(lp, mlp_in, cfg, self.router_cfg)
            else:
                h = h + mlp(lp, mlp_in, cfg.hidden_act)
        if deferred and kv_news:
            from vllm_rs_tpu.ops.attention import scatter_deferred_kv

            k_news = jnp.stack([k for k, _ in kv_news])  # [Lf, B, F]
            v_news = jnp.stack([v for _, v in kv_news])
            kv = scatter_deferred_kv(kv, k_news, v_news, meta.slot_mapping)
            new_kv = kv
        else:
            new_kv = jnp.stack(kv_layers) if kv_layers else kv
        new_caches = {
            "kv": new_kv,
            "conv": conv_st,
            "rec": rec_st,
        }
        return new_caches, h
