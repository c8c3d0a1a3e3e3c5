"""MoE causal LMs: Qwen2/Qwen3-MoE, GLM4-MoE, DeepSeek-style trunks.

Counterpart of the reference's qwen3_moe.rs / glm4_moe.rs (SURVEY.md §2.3):
the dense CausalLM trunk with the MLP replaced by routed experts, an
optional shared expert (+ optional sigmoid shared-expert gate,
qwen3_moe.rs:272-280), and an optional prefix of dense decoder layers
(DeepSeek/GLM4-MoE `first_k_dense_replace`).

The MoE trunk is a second `lax.scan` over stacked per-layer expert weights;
the dense prefix (typically 0-3 layers) scans separately. Routing + expert
execution live in ops/moe.py.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from vllm_rs_tpu.config import ModelConfig
from vllm_rs_tpu.models.layers import linear, mlp, rms_norm
from vllm_rs_tpu.models.llama import CausalLM
from vllm_rs_tpu.ops.attn_meta import AttnMeta
from vllm_rs_tpu.ops.moe import MoERouterConfig, moe_mlp, moe_route
from vllm_rs_tpu.ops.rope import rope_inv_freq


class MoECausalLM(CausalLM):
    """Decoder LM with routed-expert MLPs (+ optional dense prefix layers)."""

    def __init__(self, config: ModelConfig, **kw):
        super().__init__(config, **kw)
        assert config.num_experts > 0 and config.num_experts_per_tok > 0, config
        assert config.decoder_sparse_step == 1, (
            "interleaved dense/MoE layers beyond a dense prefix are not supported"
        )
        self.router_cfg = MoERouterConfig(
            num_experts=config.num_experts,
            num_experts_per_tok=config.num_experts_per_tok,
            scoring=config.router_scoring,
            n_group=config.n_group,
            topk_group=config.topk_group,
            norm_topk_prob=config.norm_topk_prob,
            routed_scaling_factor=config.routed_scaling_factor,
        )

    # ------------------------------------------------------------------
    # parameters
    # ------------------------------------------------------------------

    def _attn_params(self, keys, L, dtype, quant, group):
        cfg = self.config
        D = cfg.hidden_size
        Hq, Hk, Dh = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim_

        def w(shape):
            x = (jax.random.normal(next(keys), shape, dtype=jnp.float32) * 0.02).astype(dtype)
            return self._quantize(x, quant, group)

        p = {
            "input_ln": jnp.ones((L, D), dtype=dtype),
            "post_ln": jnp.ones((L, D), dtype=dtype),
            "q": w((L, D, Hq * Dh)),
            "k": w((L, D, Hk * Dh)),
            "v": w((L, D, Hk * Dh)),
            "o": w((L, Hq * Dh, D)),
            "inv_freq": jnp.broadcast_to(
                rope_inv_freq(cfg)[None, :], (L, cfg.rotary_dim // 2)
            ),
        }
        if cfg.qk_norm:
            p["q_norm"] = jnp.ones((L, Dh), dtype=dtype)
            p["k_norm"] = jnp.ones((L, Dh), dtype=dtype)
        return p

    def init_params(
        self,
        key: jax.Array,
        quant: Optional[str] = None,
        quant_group: int = 128,
        dtype=jnp.bfloat16,
    ) -> dict:
        cfg = self.config
        D, V = cfg.hidden_size, cfg.vocab_size
        E, I = cfg.num_experts, cfg.moe_intermediate_size
        Ld = cfg.first_k_dense_replace
        Lm = cfg.num_hidden_layers - Ld
        keys = iter(jax.random.split(key, 64))

        def w(shape, q=quant):
            x = (jax.random.normal(next(keys), shape, dtype=jnp.float32) * 0.02).astype(dtype)
            return self._quantize(x, q, quant_group)

        moe_layers = self._attn_params(keys, Lm, dtype, quant, quant_group)
        moe_layers.update(
            {
                "router": w((Lm, D, E), q=None),  # router stays high precision
                "w_gate": w((Lm, E, D, I)),
                "w_up": w((Lm, E, D, I)),
                "w_down": w((Lm, E, I, D)),
            }
        )
        if cfg.router_bias:
            moe_layers["router_bias"] = jnp.zeros((Lm, E), dtype=jnp.float32)
        if cfg.shared_expert_intermediate_size:
            S = cfg.shared_expert_intermediate_size
            moe_layers["shared_gate_proj"] = w((Lm, D, S))
            moe_layers["shared_up_proj"] = w((Lm, D, S))
            moe_layers["shared_down_proj"] = w((Lm, S, D))
            if cfg.shared_expert_gate:
                moe_layers["shared_gate"] = w((Lm, D, 1), q=None)

        params = {
            "embed": (jax.random.normal(next(keys), (V, D), dtype=jnp.float32) * 0.02).astype(dtype),
            "moe_layers": moe_layers,
            "final_norm": jnp.ones((D,), dtype=dtype),
        }
        if Ld:
            dense = self._attn_params(keys, Ld, dtype, quant, quant_group)
            FI = cfg.intermediate_size
            dense.update(
                {"gate": w((Ld, D, FI)), "up": w((Ld, D, FI)), "down": w((Ld, FI, D))}
            )
            params["dense_layers"] = dense
        if not cfg.tie_word_embeddings:
            head_q = "int8" if quant is not None else None
            params["lm_head"] = self._quantize(
                (jax.random.normal(next(keys), (D, V), dtype=jnp.float32) * 0.02).astype(dtype),
                head_q,
                quant_group,
            )
        return params

    # ------------------------------------------------------------------
    # forward
    # ------------------------------------------------------------------

    def _moe_block(self, lp: dict, h: jax.Array) -> jax.Array:
        return moe_block(lp, h, self.config, self.router_cfg)

    def forward(self, params: dict, token_ids: jax.Array, meta: AttnMeta, kv: jax.Array):
        cfg = self.config
        Ld = cfg.first_k_dense_replace
        L = cfg.num_hidden_layers
        h = params["embed"][token_ids].astype(jnp.bfloat16)
        if cfg.embed_scale != 1.0:
            h = h * jnp.asarray(cfg.embed_scale, dtype=h.dtype)

        # deferred-write decode (see CausalLM.forward): cache read-only in
        # the scans via pooled-mode attention (no per-layer slice copies),
        # one KV scatter at the end
        deferred = (
            token_ids.shape[1] == 1
            and isinstance(kv, jax.Array)
            and type(self).attention is CausalLM.attention
        )
        if deferred:
            from vllm_rs_tpu.models.layers import attention_block_deferred
            from vllm_rs_tpu.ops.attention import scatter_deferred_kv

            B = h.shape[0]

            def dblock(h, lp, li, mlp_out_fn):
                attn_in = rms_norm(h, lp["input_ln"], cfg.rms_norm_eps, cfg.norm_plus_one)
                attn_out, k_new, v_new = attention_block_deferred(
                    lp, attn_in, meta, kv, cfg,
                    block_size=self.block_size, scale=self.scale,
                    sliding_window=lp.get("window", cfg.sliding_window),
                    attn_backend=self.attn_backend, layer_idx=li,
                )
                h = h + attn_out
                mlp_in = rms_norm(h, lp["post_ln"], cfg.rms_norm_eps, cfg.norm_plus_one)
                h = h + mlp_out_fn(lp, mlp_in)
                return h, (k_new.reshape(B, -1), v_new.reshape(B, -1))

            news = []
            if Ld:
                h, n_dense = jax.lax.scan(
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
                news.append(n_dense)
            h, n_moe = jax.lax.scan(
                lambda h, xs: dblock(
                    h, xs[0], xs[1],
                    lambda lp, x: self._moe_block(lp, x),
                ),
                h,
                (params["moe_layers"], jnp.arange(Ld, L, dtype=jnp.int32)),
            )
            news.append(n_moe)
            k_news = jnp.concatenate([n[0] for n in news], axis=0)
            v_news = jnp.concatenate([n[1] for n in news], axis=0)
            kv = scatter_deferred_kv(kv, k_news, v_news, meta.slot_mapping)
            return kv, h

        # classic path (prefill): the pool rides the scan carry with
        # per-layer dynamic updates (see CausalLM.forward)
        def attn(lp, h, kv, li):
            kv_l = jax.tree_util.tree_map(
                lambda x: jax.lax.dynamic_index_in_dim(x, li, 0, keepdims=False),
                kv,
            )
            attn_in = rms_norm(h, lp["input_ln"], cfg.rms_norm_eps, cfg.norm_plus_one)
            attn_out, kv_out = self.attention(lp, attn_in, meta, kv_l)
            kv = jax.tree_util.tree_map(
                lambda x, xl: jax.lax.dynamic_update_index_in_dim(
                    x, xl.astype(x.dtype), li, 0
                ),
                kv,
                kv_out,
            )
            return h + attn_out, kv

        if Ld:
            def dense_fn(carry, xs):
                h, kv = carry
                lp, li = xs
                h, kv = attn(lp, h, kv, li)
                mlp_in = rms_norm(h, lp["post_ln"], cfg.rms_norm_eps, cfg.norm_plus_one)
                h = h + mlp(
                    {"gate": lp["gate"], "up": lp["up"], "down": lp["down"]},
                    mlp_in, cfg.hidden_act,
                )
                return (h, kv), None

            (h, kv), _ = jax.lax.scan(
                dense_fn, (h, kv),
                (params["dense_layers"], jnp.arange(Ld, dtype=jnp.int32)),
            )

        def moe_fn(carry, xs):
            h, kv = carry
            lp, li = xs
            h, kv = attn(lp, h, kv, li)
            mlp_in = rms_norm(h, lp["post_ln"], cfg.rms_norm_eps, cfg.norm_plus_one)
            h = h + self._moe_block(lp, mlp_in)
            return (h, kv), None

        (h, kv), _ = jax.lax.scan(
            moe_fn, (h, kv),
            (params["moe_layers"], jnp.arange(Ld, L, dtype=jnp.int32)),
        )
        return kv, h


def moe_block(lp: dict, h, cfg, router_cfg):
    """Routed experts (+ shared expert) on [B, T, D] hidden states.

    Free function so the hybrid GDN model (qwen3_5_moe) reuses it with
    per-layer (unstacked) parameters."""
    B, T, D = h.shape
    x = h.reshape(B * T, D)
    router_logits = jnp.dot(
        x.astype(jnp.float32),
        lp["router"].astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    weights, ids = moe_route(router_logits, router_cfg, lp.get("router_bias"))
    y = moe_mlp(
        x, weights, ids, lp["w_gate"], lp["w_up"], lp["w_down"], cfg.hidden_act
    )
    if cfg.shared_expert_intermediate_size:
        shared = mlp(
            {
                "gate": lp["shared_gate_proj"],
                "up": lp["shared_up_proj"],
                "down": lp["shared_down_proj"],
            },
            x,
            cfg.hidden_act,
        )
        if cfg.shared_expert_gate:
            gate = jax.nn.sigmoid(
                jnp.dot(x.astype(jnp.float32), lp["shared_gate"].astype(jnp.float32))
            )
            shared = (shared.astype(jnp.float32) * gate).astype(shared.dtype)
        y = y + shared
    return y.reshape(B, T, D)
