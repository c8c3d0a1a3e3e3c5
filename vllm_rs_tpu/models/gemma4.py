"""Gemma4: heterogeneous sliding/global attention with per-layer KV dims.

Counterpart of the reference's gemma4.rs (SURVEY.md §2.3): most layers use
sliding-window attention with the config head_dim; every Nth layer (HF
`layer_types`, default every 6th — gemma4.rs:623-631) is full attention
with its own `global_head_dim` / `num_global_key_value_heads` geometry
(utils/mod.rs:1032 gemma4_per_layer_cache_config). Also implements:

- v-norm: plain per-head RMS on V before caching (attention.rs:591-596,773-781)
- k_eq_v: global layers load v_proj from k_proj (attention.rs:205-214)
- sandwich norms + per-layer `layer_scalar` output multiplier (gemma4.rs:485-555)
- per-layer-input embeddings (embed_tokens_per_layer + gated injection,
  gemma4.rs:751-799, 982-1011)
- optional MoE branch combined with the dense MLP through its own norm
  pair and a Gemma4Router (rms-normed logits × per_expert_scale,
  gemma4.rs:22-113, 494-536)
- double-wide MLP on the trailing `num_kv_shared_layers` layers
  (gemma4.rs:900-907)
- separate rope tables: local theta for sliding layers, global theta with
  partial rotary for full layers (gemma4.rs:838-877)

TPU design: layer geometries differ, so the trunk is a Python loop over
per-layer parameter dicts (the qwen3_next hybrid pattern) and the KV pool
is a dict of two homogeneous stacks {"swa": [Ls,2,S,Hks*Ds],
"full": [Lf,2,S,Hkg*Dg]} sharing one slot space — each stack keeps the
slot-major layout the paged-attention kernels want, with zero padding
waste across the two geometries.
"""

from __future__ import annotations

import dataclasses
import math
from typing import List

import jax
import jax.numpy as jnp

from vllm_rs_tpu.config import ModelConfig
from vllm_rs_tpu.models.layers import gather_last_hidden, linear, mlp, rms_norm
from vllm_rs_tpu.models.llama import CausalLM
from vllm_rs_tpu.ops.attention import paged_attention
from vllm_rs_tpu.ops.attn_meta import AttnMeta
from vllm_rs_tpu.ops.rope import apply_rope, rope_inv_freq


class Gemma4ForCausalLM(CausalLM):
    """Hybrid sliding/global attention decoder with heterogeneous KV dims."""

    def __init__(self, config: ModelConfig, **kw):
        super().__init__(config, **kw)
        lt = config.extra_get("gemma4_layer_types")
        if not lt:
            lt = tuple(
                "full" if (i + 1) % 6 == 0 else "sliding"
                for i in range(config.num_hidden_layers)
            )
        self.layer_types: tuple = tuple(lt)
        self.num_swa = sum(1 for t in self.layer_types if t == "sliding")
        self.num_full = len(self.layer_types) - self.num_swa
        self.Hq = config.num_attention_heads
        # sliding geometry = the config geometry; global overrides
        self.Hk_s = config.num_key_value_heads
        self.D_s = config.head_dim_
        self.Hk_g = int(config.extra_get("num_global_key_value_heads", self.Hk_s))
        self.D_g = int(config.extra_get("global_head_dim", self.D_s))
        self.k_eq_v = bool(config.extra_get("attention_k_eq_v", False))
        self.pli_dim = int(config.extra_get("hidden_size_per_layer_input", 0))
        self.n_kv_shared = int(config.extra_get("num_kv_shared_layers", 0))
        self.double_wide = bool(config.extra_get("use_double_wide_mlp", False))
        self.local_theta = float(config.extra_get("rope_local_base_freq", 10000.0))
        self.is_moe = config.num_experts > 0 and bool(
            config.extra_get("enable_moe_block", True)
        )
        # reference passes attention_scale = Some(1.0) (gemma4.rs:258-265)
        self.scale = 1.0
        # global layers apply partial rotary over global_head_dim
        # (gemma4.rs:838-844); sliding layers rotate the full swa head dim
        # with the local theta (gemma4.rs:865-877)
        self.rot_g = 2 * int(config.partial_rotary_factor * self.D_g / 2)
        self.rot_s = self.D_s

    @property
    def kv_head_counts(self) -> dict:
        """Per-pool kv-head counts for TP cache sharding (each pool has its
        own geometry; parallel/sharding.shard_kv_cache)."""
        return {"swa": self.Hk_s, "full": self.Hk_g}

    def _layer_intermediate(self, i: int) -> int:
        cfg = self.config
        first_shared = cfg.num_hidden_layers - self.n_kv_shared
        if self.double_wide and self.n_kv_shared > 0 and i >= first_shared:
            return cfg.intermediate_size * 2
        return cfg.intermediate_size

    # ------------------------------------------------------------------
    # caches: {"swa": [Ls, 2, S, Hk_s*D_s], "full": [Lf, 2, S, Hk_g*D_g]}
    # ------------------------------------------------------------------

    def init_kv_cache(self, cache, dtype=None):
        from vllm_rs_tpu.ops.kv_cache import resolve_kv_dtype

        dt = resolve_kv_dtype(dtype)
        out = {}
        if self.num_swa:
            out["swa"] = jnp.zeros(
                (self.num_swa, 2, cache.num_slots, self.Hk_s * self.D_s),
                dtype=dt,
            )
        if self.num_full:
            out["full"] = jnp.zeros(
                (self.num_full, 2, cache.num_slots, self.Hk_g * self.D_g),
                dtype=dt,
            )
        return out

    # ------------------------------------------------------------------
    # parameters
    # ------------------------------------------------------------------

    def init_params(self, key, quant=None, quant_group: int = 128, dtype=jnp.bfloat16):
        cfg = self.config
        D, V, L = cfg.hidden_size, cfg.vocab_size, cfg.num_hidden_layers
        keys = iter(jax.random.split(key, 16 * L + 8))

        def w(shape, q=quant):
            x = (jax.random.normal(next(keys), shape, jnp.float32) * 0.02).astype(dtype)
            return self._quantize(x, q, quant_group)

        inv_g = rope_inv_freq(
            dataclasses.replace(cfg, head_dim=self.D_g, partial_rotary_factor=1.0)
        )[: self.rot_g // 2]
        inv_s = rope_inv_freq(
            dataclasses.replace(
                cfg,
                head_dim=self.D_s,
                rope_theta=self.local_theta,
                rope_scaling=None,
                partial_rotary_factor=1.0,
            )
        )

        layers: List[dict] = []
        for i, t in enumerate(self.layer_types):
            full = t == "full"
            Hk = self.Hk_g if full else self.Hk_s
            Dh = self.D_g if full else self.D_s
            I = self._layer_intermediate(i)
            lp = {
                "input_ln": jnp.zeros((D,), dtype=dtype),
                "post_ln": jnp.zeros((D,), dtype=dtype),
                "pre_ffw_ln": jnp.zeros((D,), dtype=dtype),
                "post_ffw_ln": jnp.zeros((D,), dtype=dtype),
                "q": w((D, self.Hq * Dh)),
                "k": w((D, Hk * Dh)),
                "o": w((self.Hq * Dh, D)),
                "gate_up": w((D, 2 * I)),
                "down": w((I, D)),
                "layer_scalar": jnp.ones((1,), dtype=jnp.float32),
                "inv_freq": inv_g if full else inv_s,
            }
            # global layers may share k/v projections (attention_k_eq_v)
            lp["v"] = lp["k"] if (full and self.k_eq_v) else w((D, Hk * Dh))
            if cfg.qk_norm:
                lp["q_norm"] = jnp.zeros((Dh,), dtype=dtype)
                lp["k_norm"] = jnp.zeros((Dh,), dtype=dtype)
            if self.is_moe:
                E, Im = cfg.num_experts, cfg.moe_intermediate_size or I
                lp["router_scale"] = jnp.ones((D,), dtype=jnp.float32)
                lp["router_proj"] = w((D, E), q=None)
                lp["per_expert_scale"] = jnp.ones((E,), dtype=jnp.float32)
                lp["w_gate"] = w((E, D, Im))
                lp["w_up"] = w((E, D, Im))
                lp["w_down"] = w((E, Im, D))
                lp["post_ffw_ln_1"] = jnp.zeros((D,), dtype=dtype)
                lp["post_ffw_ln_2"] = jnp.zeros((D,), dtype=dtype)
                lp["pre_ffw_ln_2"] = jnp.zeros((D,), dtype=dtype)
            if self.pli_dim:
                lp["pli_gate"] = w((D, self.pli_dim), q=None)
                lp["pli_proj"] = w((self.pli_dim, D), q=None)
                lp["post_pli_norm"] = jnp.zeros((D,), dtype=dtype)
            layers.append(lp)

        params = {
            "embed": (jax.random.normal(next(keys), (V, D), jnp.float32) * 0.02).astype(dtype),
            "layers": layers,
            "final_norm": jnp.zeros((D,), dtype=dtype),
        }
        if self.pli_dim:
            params["embed_per_layer"] = (
                jax.random.normal(next(keys), (V, L * self.pli_dim), jnp.float32) * 0.02
            ).astype(dtype)
            params["pli_model_proj"] = w((D, L * self.pli_dim), q=None)
            params["pli_proj_norm"] = jnp.zeros((self.pli_dim,), dtype=dtype)
        if not cfg.tie_word_embeddings:
            params["lm_head"] = self._quantize(
                (jax.random.normal(next(keys), (D, V), jnp.float32) * 0.02).astype(dtype),
                "int8" if quant is not None else None,
                D,
            )
        return params

    # ------------------------------------------------------------------
    # attention (per-layer geometry + v-norm)
    # ------------------------------------------------------------------

    def _attn(self, lp, h, meta: AttnMeta, kv_l, *, full: bool, layer_idx=None):
        """With layer_idx: deferred pooled decode — kv_l is the FULL pool
        of this layer kind ([L, 2, S, F]), the kernel indexes its layer in
        place and the new K/V returns to the caller for one post-loop
        scatter per pool (PERF_NOTES.md finding #3: slicing kv[i] into a
        pallas operand copies the pool slice every layer)."""
        cfg = self.config
        B, T, _ = h.shape
        Hk = self.Hk_g if full else self.Hk_s
        Dh = self.D_g if full else self.D_s
        q = linear(lp["q"], h).reshape(B, T, self.Hq, Dh)
        k = linear(lp["k"], h).reshape(B, T, Hk, Dh)
        v = linear(lp["v"], h).reshape(B, T, Hk, Dh)
        if cfg.qk_norm:
            q = rms_norm(q, lp["q_norm"], cfg.rms_norm_eps, cfg.norm_plus_one)
            k = rms_norm(k, lp["k_norm"], cfg.rms_norm_eps, cfg.norm_plus_one)
        # v-norm: plain per-head RMS, no learned weight (attention.rs:773-781)
        vf = v.astype(jnp.float32)
        v = (
            vf
            * jax.lax.rsqrt(
                jnp.mean(vf * vf, axis=-1, keepdims=True) + cfg.rms_norm_eps
            )
        ).astype(v.dtype)
        q, k = apply_rope(
            q, k, meta.positions, lp["inv_freq"], self.rot_g if full else self.rot_s
        )
        window = 0 if full else cfg.sliding_window
        if layer_idx is not None:
            from vllm_rs_tpu.ops.attention import paged_attention_deferred

            out = paged_attention_deferred(
                q, k, v, kv_l, meta,
                block_size=self.block_size,
                scale=self.scale,
                logit_softcap=cfg.attn_logit_softcap,
                sliding_window=window,
                backend=self.attn_backend,
                layer_idx=layer_idx,
            )
            o = linear(lp["o"], out.reshape(B, T, -1))
            return o, (k.reshape(B, -1), v.reshape(B, -1))
        out, kv_l = paged_attention(
            q, k, v, kv_l, meta,
            block_size=self.block_size,
            scale=self.scale,
            logit_softcap=cfg.attn_logit_softcap,
            sliding_window=window,
            backend=self.attn_backend,
        )
        o = linear(lp["o"], out.reshape(B, T, -1))
        return o, kv_l

    # ------------------------------------------------------------------
    # MoE branch (Gemma4Router, gemma4.rs:81-113)
    # ------------------------------------------------------------------

    def _moe(self, lp, residual):
        cfg = self.config
        Bt, D = residual.shape
        xf = residual.astype(jnp.float32)
        normed = xf * jax.lax.rsqrt(
            jnp.mean(xf * xf, axis=-1, keepdims=True) + cfg.rms_norm_eps
        )
        scaled = normed * (D ** -0.5) * lp["router_scale"][None, :]
        logits = jnp.dot(
            scaled.astype(jnp.bfloat16),
            lp["router_proj"].astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        probs = jax.nn.softmax(logits, axis=-1)
        weights, ids = jax.lax.top_k(probs, cfg.num_experts_per_tok)
        weights = weights / jnp.sum(weights, axis=-1, keepdims=True)
        weights = weights * lp["per_expert_scale"][ids]

        from vllm_rs_tpu.ops.moe import moe_mlp

        moe_in = rms_norm(
            residual, lp["pre_ffw_ln_2"], cfg.rms_norm_eps, cfg.norm_plus_one
        )
        return moe_mlp(
            moe_in, weights, ids, lp["w_gate"], lp["w_up"], lp["w_down"],
            cfg.hidden_act,
        )

    # ------------------------------------------------------------------
    # per-layer-input embeddings (gemma4.rs:982-1011)
    # ------------------------------------------------------------------

    def _per_layer_inputs(self, params, token_ids, h0):
        if self.pli_dim == 0 or "embed_per_layer" not in params:
            return None
        cfg = self.config
        B, T, D = h0.shape
        L, P = cfg.num_hidden_layers, self.pli_dim
        emb = params["embed_per_layer"][token_ids].astype(jnp.float32)  # [B,T,L*P]
        emb = emb * math.sqrt(P)
        proj = linear(params["pli_model_proj"], h0).astype(jnp.float32)
        proj = proj * (D ** -0.5)
        proj = proj.reshape(B, T, L, P)
        proj = rms_norm(
            proj, params["pli_proj_norm"], cfg.rms_norm_eps, cfg.norm_plus_one
        ).astype(jnp.float32)
        combined = (proj + emb.reshape(B, T, L, P)) * (2.0 ** -0.5)
        return combined.astype(h0.dtype)  # [B, T, L, P]

    # ------------------------------------------------------------------
    # trunk
    # ------------------------------------------------------------------

    def forward(self, params, token_ids, meta: AttnMeta, caches):
        cfg = self.config
        h = params["embed"][token_ids].astype(jnp.bfloat16)
        if cfg.embed_scale != 1.0:
            h = h * jnp.asarray(cfg.embed_scale, dtype=h.dtype)
        pli = self._per_layer_inputs(params, token_ids, h)

        # deferred-write pooled decode: each pool ([L, 2, S, F]) feeds the
        # kernel whole, new K/V scatters once per pool after the loop
        deferred = token_ids.shape[1] == 1
        swa_layers, full_layers = [], []
        si = fi = 0
        for i, (lp, t) in enumerate(zip(params["layers"], self.layer_types)):
            full = t == "full"
            attn_in = rms_norm(h, lp["input_ln"], cfg.rms_norm_eps, cfg.norm_plus_one)
            if full:
                attn_out, kv_l = self._attn(
                    lp, attn_in, meta,
                    caches["full"] if deferred else caches["full"][fi],
                    full=True,
                    layer_idx=jnp.asarray(fi, jnp.int32) if deferred else None,
                )
                full_layers.append(kv_l)
                fi += 1
            else:
                attn_out, kv_l = self._attn(
                    lp, attn_in, meta,
                    caches["swa"] if deferred else caches["swa"][si],
                    full=False,
                    layer_idx=jnp.asarray(si, jnp.int32) if deferred else None,
                )
                swa_layers.append(kv_l)
                si += 1
            attn_out = rms_norm(
                attn_out, lp["post_ln"], cfg.rms_norm_eps, cfg.norm_plus_one
            )
            h = h + attn_out

            residual = h
            mlp_in = rms_norm(h, lp["pre_ffw_ln"], cfg.rms_norm_eps, cfg.norm_plus_one)
            mlp_out = mlp(lp, mlp_in, cfg.hidden_act)
            if self.is_moe:
                B, T, D = h.shape
                mlp_normed = rms_norm(
                    mlp_out, lp["post_ffw_ln_1"], cfg.rms_norm_eps, cfg.norm_plus_one
                )
                moe_out = self._moe(lp, residual.reshape(B * T, D)).reshape(B, T, D)
                moe_normed = rms_norm(
                    moe_out, lp["post_ffw_ln_2"], cfg.rms_norm_eps, cfg.norm_plus_one
                )
                combined = mlp_normed + moe_normed
            else:
                combined = mlp_out
            combined = rms_norm(
                combined, lp["post_ffw_ln"], cfg.rms_norm_eps, cfg.norm_plus_one
            )
            h = residual + combined

            if pli is not None:
                gated = jax.nn.gelu(
                    linear(lp["pli_gate"], h).astype(jnp.float32), approximate=True
                ).astype(h.dtype)
                gated = gated * pli[:, :, i, :]
                projected = linear(lp["pli_proj"], gated)
                h = h + rms_norm(
                    projected, lp["post_pli_norm"], cfg.rms_norm_eps, cfg.norm_plus_one
                )

            h = h * lp["layer_scalar"].astype(h.dtype)

        new_caches = {}
        if deferred:
            from vllm_rs_tpu.ops.attention import scatter_deferred_kv

            if swa_layers:
                new_caches["swa"] = scatter_deferred_kv(
                    caches["swa"],
                    jnp.stack([k for k, _ in swa_layers]),
                    jnp.stack([v for _, v in swa_layers]),
                    meta.slot_mapping,
                )
            if full_layers:
                new_caches["full"] = scatter_deferred_kv(
                    caches["full"],
                    jnp.stack([k for k, _ in full_layers]),
                    jnp.stack([v for _, v in full_layers]),
                    meta.slot_mapping,
                )
        else:
            if swa_layers:
                new_caches["swa"] = jnp.stack(swa_layers)
            if full_layers:
                new_caches["full"] = jnp.stack(full_layers)
        return new_caches, h
