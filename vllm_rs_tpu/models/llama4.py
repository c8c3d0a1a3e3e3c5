"""Llama4: iRoPE hybrid attention + interleaved MoE (+ vision).

Counterpart of the reference's llama4/ (SURVEY.md §2.3, mod.rs:189-353):
- iRoPE: layer i uses rope iff (i+1) % 4 != 0 (or HF `no_rope_layers`);
  rope layers use *chunked* attention (a query at position p attends keys
  in [floor(p/C)*C, p], its own chunk — exact HF/mod.rs semantics, NOT a
  sliding window) and optional per-head q/k L2 norm; nope layers
  attend over the full context and scale q by the position-dependent
  temperature 1 + attn_scale·ln(floor((pos+1)/floor_scale) + 1)
  (mod.rs:317-325).
- MoE on layers from `moe_layers`/`interleave_moe_layer_step` ((i+1) %
  step == 0, config.rs:111-120); dense layers use `intermediate_size_mlp`.
  Routing is top-k sigmoid with the router weight applied to the expert
  INPUT (HF Llama4TextMoe; reference set_apply_router_weight_on_input),
  plus an always-on shared expert.
- Vision (vision.rs): Llama4Tower — unfold-conv patch embed, class token,
  learned pos embeds, interleaved 2D rope, biased projections, pixel
  shuffle adapter → linear projector.

Trunk is a Python loop over per-layer parameter dicts (heterogeneous
layers — the gemma4/qwen3_next pattern).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from vllm_rs_tpu.config import ModelConfig
from vllm_rs_tpu.models.llama import CausalLM
from vllm_rs_tpu.models.layers import gather_last_hidden, linear, mlp, rms_norm
from vllm_rs_tpu.ops.attention import paged_attention
from vllm_rs_tpu.ops.attn_meta import AttnMeta
from vllm_rs_tpu.ops.moe import moe_mlp
from vllm_rs_tpu.ops.rope import apply_rope, rope_inv_freq


class Llama4ForCausalLM(CausalLM):
    def __init__(self, config: ModelConfig, **kw):
        super().__init__(config, **kw)
        cfg = config
        L = cfg.num_hidden_layers
        nrl = cfg.extra_get("no_rope_layers")
        if nrl:
            self.use_rope = tuple(bool(x) for x in nrl)
        else:
            self.use_rope = tuple((i + 1) % 4 != 0 for i in range(L))
        step = int(cfg.extra_get("interleave_moe_layer_step", 1))
        ml = cfg.extra_get("moe_layers")
        if ml is not None:
            moe_set = set(ml)
        elif cfg.num_experts > 0 and step > 0:
            moe_set = set(range(step - 1, L, step))
        else:
            moe_set = set()
        self.is_moe_layer = tuple(i in moe_set for i in range(L))
        self.chunk_size = int(cfg.extra_get("attention_chunk_size", 0))
        self.dense_mlp_size = int(
            cfg.extra_get("intermediate_size_mlp", cfg.intermediate_size)
        )
        self.image_token_id = int(cfg.extra_get("image_token_id", 200092))
        self.has_vision = cfg.extra_get("vision_width") is not None
        if self.has_vision:
            from vllm_rs_tpu.models.vision import Llama4Tower

            self.vision = Llama4Tower(
                patch_size=int(cfg.extra_get("vision_patch_size", 14)),
                image_size=int(cfg.extra_get("vision_image_size", 336)),
                width=int(cfg.extra_get("vision_width", 1408)),
                layers=int(cfg.extra_get("vision_layers", 34)),
                heads=int(cfg.extra_get("vision_heads", 16)),
                mlp_dim=int(cfg.extra_get("vision_intermediate", 5632)),
                out_dim=int(cfg.extra_get("vision_out_hidden", 4096)),
                rope_theta=float(cfg.extra_get("vision_rope_theta", 10000.0)),
            )

    # ------------------------------------------------------------------

    def init_params(self, key, quant=None, quant_group: int = 128, dtype=jnp.bfloat16):
        cfg = self.config
        D, V, L = cfg.hidden_size, cfg.vocab_size, cfg.num_hidden_layers
        Hq, Hk, Dh = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim_
        keys = iter(jax.random.split(key, 16 * L + 8))

        def w(shape, q=quant):
            x = (jax.random.normal(next(keys), shape, jnp.float32) * 0.02).astype(dtype)
            return self._quantize(x, q, quant_group)

        inv = rope_inv_freq(cfg)
        layers = []
        for i in range(L):
            lp = {
                "input_ln": jnp.ones((D,), dtype=dtype),
                "post_ln": jnp.ones((D,), dtype=dtype),
                "qkv": w((D, (Hq + 2 * Hk) * Dh)),
                "o": w((Hq * Dh, D)),
                "inv_freq": inv,
            }
            if self.is_moe_layer[i]:
                E, I = cfg.num_experts, cfg.moe_intermediate_size or cfg.intermediate_size
                lp["router"] = w((D, E), q=None)
                lp["w_gate"] = w((E, D, I))
                lp["w_up"] = w((E, D, I))
                lp["w_down"] = w((E, I, D))
                lp["shared_gate_up"] = w((D, 2 * I))
                lp["shared_down"] = w((I, D))
            else:
                lp["gate_up"] = w((D, 2 * self.dense_mlp_size))
                lp["down"] = w((self.dense_mlp_size, D))
            layers.append(lp)
        params = {
            "embed": (jax.random.normal(next(keys), (V, D), jnp.float32) * 0.02).astype(dtype),
            "layers": layers,
            "final_norm": jnp.ones((D,), dtype=dtype),
        }
        if not cfg.tie_word_embeddings:
            params["lm_head"] = self._quantize(
                (jax.random.normal(next(keys), (D, V), jnp.float32) * 0.02).astype(dtype),
                "int8" if quant is not None else None,
                D,
            )
        if self.has_vision:
            k2, k3 = jax.random.split(next(keys))
            params["vision"] = self.vision.init_params(k2, dtype=dtype)
            params["mm_proj"] = (
                jax.random.normal(k3, (self.vision.out_dim, D), jnp.float32) * 0.02
            ).astype(dtype)
        return params

    # ------------------------------------------------------------------

    def _attn(self, lp, h, meta: AttnMeta, kv_l, *, i: int, layer_idx=None):
        """With layer_idx: deferred pooled decode over the full [L,2,S,F]
        pool (PERF_NOTES.md finding #3 — slicing kv[i] into a pallas
        operand copies the pool slice every layer)."""
        cfg = self.config
        B, T, _ = h.shape
        Hq, Hk, Dh = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim_
        qkv = linear(lp["qkv"], h)
        q, k, v = jnp.split(qkv, [Hq * Dh, (Hq + Hk) * Dh], axis=-1)
        q = q.reshape(B, T, Hq, Dh)
        k = k.reshape(B, T, Hk, Dh)
        v = v.reshape(B, T, Hk, Dh)
        if self.use_rope[i]:
            q, k = apply_rope(q, k, meta.positions, lp["inv_freq"], cfg.rotary_dim)
            if cfg.qk_l2_norm:  # use_qk_norm applies on rope layers only
                q = q * jax.lax.rsqrt(
                    jnp.sum(q.astype(jnp.float32) ** 2, -1, keepdims=True) + 1e-6
                ).astype(q.dtype)
                k = k * jax.lax.rsqrt(
                    jnp.sum(k.astype(jnp.float32) ** 2, -1, keepdims=True) + 1e-6
                ).astype(k.dtype)
            window = self.chunk_size
        else:
            if cfg.attn_temperature_tuning:  # mod.rs:317-325
                pos = meta.positions.astype(jnp.float32)
                scale = (
                    jnp.log(
                        jnp.floor((pos + 1.0) / cfg.attn_floor_scale) + 1.0
                    )
                    * cfg.attn_scale_coef
                    + 1.0
                )
                q = (q.astype(jnp.float32) * scale[:, :, None, None]).astype(q.dtype)
            window = 0
        if layer_idx is not None:
            from vllm_rs_tpu.ops.attention import paged_attention_deferred

            out = paged_attention_deferred(
                q, k, v, kv_l, meta,
                block_size=self.block_size, scale=self.scale,
                sliding_window=window, backend=self.attn_backend,
                layer_idx=layer_idx, chunked=window > 0,
            )
            return (
                linear(lp["o"], out.reshape(B, T, -1)),
                (k.reshape(B, -1), v.reshape(B, -1)),
            )
        out, kv_l = paged_attention(
            q, k, v, kv_l, meta,
            block_size=self.block_size, scale=self.scale,
            sliding_window=window, backend=self.attn_backend,
            chunked=window > 0,
        )
        return linear(lp["o"], out.reshape(B, T, -1)), kv_l

    def _moe(self, lp, h):
        """Top-k sigmoid routing with router weight on the expert input
        (HF Llama4TextMoe) + shared expert."""
        cfg = self.config
        B, T, D = h.shape
        x = h.reshape(B * T, D)
        logits = jnp.dot(
            x.astype(jnp.bfloat16), _w(lp["router"]).astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        top_logits, ids = jax.lax.top_k(logits, cfg.num_experts_per_tok)
        weights = jax.nn.sigmoid(top_logits)
        if cfg.num_experts_per_tok == 1:
            # router weight applies to the expert INPUT (HF Llama4TextMoe /
            # reference set_apply_router_weight_on_input) — exact for top-1
            x_in = (x.astype(jnp.float32) * weights).astype(x.dtype)
            routed = moe_mlp(
                x_in, jnp.ones_like(weights), ids,
                lp["w_gate"], lp["w_up"], lp["w_down"], cfg.hidden_act,
            )
        else:
            routed = moe_mlp(
                x, weights, ids,
                lp["w_gate"], lp["w_up"], lp["w_down"], cfg.hidden_act,
            )
        shared = mlp(
            {"gate_up": lp["shared_gate_up"], "down": lp["shared_down"]},
            x[None], cfg.hidden_act,
        )[0]
        return (routed + shared).reshape(B, T, D)

    def forward(self, params, token_ids, meta: AttnMeta, kv):
        cfg = self.config
        h = params["embed"][token_ids].astype(jnp.bfloat16)
        if meta.mm_embeds is not None:
            B, T, D = h.shape
            flat = h.reshape(B * T, D)
            flat = flat.at[meta.mm_targets].set(
                meta.mm_embeds.astype(flat.dtype), mode="drop"
            )
            h = flat.reshape(B, T, D)
        # deferred-write pooled decode: the kernel reads the [L,2,S,F] pool
        # in place, new K/V scatters once after the loop
        deferred = token_ids.shape[1] == 1
        new_kv = []
        for i, lp in enumerate(params["layers"]):
            attn_in = rms_norm(h, lp["input_ln"], cfg.rms_norm_eps)
            attn_out, kv_l = self._attn(
                lp, attn_in, meta,
                kv if deferred else kv[i], i=i,
                layer_idx=jnp.asarray(i, jnp.int32) if deferred else None,
            )
            h = h + attn_out
            mlp_in = rms_norm(h, lp["post_ln"], cfg.rms_norm_eps)
            if self.is_moe_layer[i]:
                h = h + self._moe(lp, mlp_in)
            else:
                h = h + mlp(lp, mlp_in, cfg.hidden_act)
            new_kv.append(kv_l)
        if deferred:
            from vllm_rs_tpu.ops.attention import scatter_deferred_kv

            return scatter_deferred_kv(
                kv,
                jnp.stack([k for k, _ in new_kv]),
                jnp.stack([v for _, v in new_kv]),
                meta.slot_mapping,
            ), h
        return jnp.stack(new_kv), h

    def encode_image(self, params: dict, image) -> np.ndarray:
        out = jax.jit(
            lambda p, patches: jnp.dot(
                self.vision.forward(p["vision"], patches).astype(jnp.bfloat16),
                p["mm_proj"].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
        )(params, jnp.asarray(image.patches))
        return np.asarray(out, dtype=np.float32)


def _w(x):
    """Unwrap a Linear namedtuple to its weight (router stays unquantized)."""
    return x.w if hasattr(x, "w") else x
