"""Llama-family causal LM.

One implementation covers the reference's llama.rs (Llama2/3, Mistral, Yi,
StableLM), qwen3.rs (Qwen2/Qwen3 dense — qkv bias / per-head q-k RMSNorm),
phi4.rs (partial rotary), and glm4.rs — the differences are pure
configuration (SURVEY.md §2.3). Canonical template: embed → N × (attn + MLP)
→ final norm → last-token gather → lm_head (reference llama.rs:306-310).

The trunk is a `lax.scan` over stacked per-layer parameters; the KV cache
[L, 2, S, Hk, Dh] is threaded through the scan as xs/ys so each step
returns the fully updated pool (donated by the runner's jit).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from vllm_rs_tpu.config import ModelConfig
from vllm_rs_tpu.models.layers import (
    Linear,
    attention_block,
    gather_last_hidden,
    linear,
    mlp,
    rms_norm,
)
from vllm_rs_tpu.ops.attn_meta import AttnMeta
from vllm_rs_tpu.ops.rope import rope_inv_freq, yarn_attn_scale
from vllm_rs_tpu.quant.pack import quantize_param


class CausalLM:
    """Dense decoder-only LM over the shared layer library."""

    def __init__(
        self,
        config: ModelConfig,
        block_size: int = 16,
        attn_backend: str = "auto",
        matmul_backend: str = "auto",
    ):
        self.config = config
        self.block_size = block_size
        self.attn_backend = attn_backend
        self.matmul_backend = matmul_backend
        self.scale = config.head_dim_ ** -0.5 * yarn_attn_scale(config)
        qpa = config.extra_get("query_pre_attn_scalar")
        if qpa:  # gemma family
            self.scale = float(qpa) ** -0.5

    # ------------------------------------------------------------------
    # parameters
    # ------------------------------------------------------------------

    def _quantize(self, w, quant, group):
        if quant is None:
            return w
        # vmap over stacked layer (and expert) axes when present
        fn = lambda x: quantize_param(x, quant, group)  # noqa: E731
        for _ in range(w.ndim - 2):
            fn = jax.vmap(fn)
        return fn(w)

    @staticmethod
    def _init_quant_stacked(key, L, shape2d, quant, group, dtype, scale=0.02):
        """Random-init a stacked [L, *shape2d] quantized weight one layer at
        a time so peak memory is the quantized stack + ONE bf16 layer (a full
        bf16 8B model would not fit HBM before quantization)."""
        import jax

        from vllm_rs_tpu.quant.pack import quantize_param

        @jax.jit
        def one(k):
            x = (jax.random.normal(k, shape2d, dtype=jnp.float32) * scale).astype(dtype)
            return quantize_param(x, quant, group)

        layers = [one(k) for k in jax.random.split(key, L)]
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)

    def init_params(
        self,
        key: jax.Array,
        quant: Optional[str] = None,
        quant_group: int = 128,
        dtype=jnp.bfloat16,
    ) -> dict:
        """Random initialization (tests and synthetic benchmarks).

        Real checkpoints are loaded via utils/loader.py into the identical
        pytree structure.
        """
        cfg = self.config
        D, I, V = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
        L = cfg.num_hidden_layers
        Hq, Hk, Dh = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim_
        keys = iter(jax.random.split(key, 16))

        def w(k, shape, q=True):
            if quant is not None and q and len(shape) == 3:
                return self._init_quant_stacked(
                    k, shape[0], shape[1:], quant, quant_group, dtype
                )
            x = (jax.random.normal(k, shape, dtype=jnp.float32) * 0.02).astype(dtype)
            return self._quantize(x, quant if q else None, quant_group)

        # identity init for norms: under gemma's (weight + 1) semantics the
        # stored identity weight is 0, not 1 — ones would scale every norm
        # output ×2, compounding per layer into softmax sharpening that makes
        # tiny-model tests chaotically sensitive to fusion rounding order
        norm1 = jnp.zeros if cfg.norm_plus_one else jnp.ones

        fuse = not cfg.attention_bias  # biased projections stay separate
        layers = {
            "input_ln": norm1((L, D), dtype=dtype),
            "post_ln": norm1((L, D), dtype=dtype),
            "o": w(next(keys), (L, Hq * Dh, D)),
            "down": w(next(keys), (L, I, D)),
            "inv_freq": jnp.broadcast_to(
                rope_inv_freq(cfg)[None, :], (L, cfg.rotary_dim // 2)
            ),
        }
        layers["gate_up"] = w(next(keys), (L, D, 2 * I))
        if cfg.sandwich_norms:  # gemma2/3 pre/post feedforward norms
            layers["pre_ffw_ln"] = norm1((L, D), dtype=dtype)
            layers["post_ffw_ln"] = norm1((L, D), dtype=dtype)
        if fuse:
            layers["qkv"] = w(next(keys), (L, D, (Hq + 2 * Hk) * Dh))
        else:
            layers["q"] = w(next(keys), (L, D, Hq * Dh))
            layers["k"] = w(next(keys), (L, D, Hk * Dh))
            layers["v"] = w(next(keys), (L, D, Hk * Dh))
        if cfg.attention_bias:
            for name, n in (("q", Hq * Dh), ("k", Hk * Dh), ("v", Hk * Dh)):
                layers[name] = Linear(layers[name], jnp.zeros((L, n), dtype=dtype))
        if cfg.qk_norm:
            layers["q_norm"] = norm1((L, Dh), dtype=dtype)
            layers["k_norm"] = norm1((L, Dh), dtype=dtype)
        if cfg.layer_windows:
            layers["window"] = jnp.asarray(cfg.layer_windows, dtype=jnp.int32)
        params = {
            "embed": (jax.random.normal(next(keys), (V, D), dtype=jnp.float32) * 0.02).astype(dtype),
            "layers": layers,
            "final_norm": norm1((D,), dtype=dtype),
        }
        if not cfg.tie_word_embeddings:
            # lm_head is read every decode step: int8 with PER-CHANNEL
            # scales — the per-channel w8a8 kernel accumulates int32
            # end-to-end (fastest head path; numerics stay within int8 rtol)
            head_q = "int8" if quant is not None else None
            params["lm_head"] = self._quantize(
                (jax.random.normal(next(keys), (D, V), dtype=jnp.float32) * 0.02).astype(dtype),
                head_q,
                D,
            )
        return params

    # ------------------------------------------------------------------
    # forward
    # ------------------------------------------------------------------

    def init_kv_cache(self, cache, dtype=None):
        """Allocate this model's paged KV pool (default GQA layout
        [L, 2, num_slots, Hk*Dh]); MLA models override with the compressed
        layout."""
        from vllm_rs_tpu.ops.kv_cache import init_kv_cache

        return init_kv_cache(self.config, cache, dtype=dtype)

    def attention(self, lp: dict, attn_in: jax.Array, meta: AttnMeta, kv_l):
        """Per-layer attention hook: normed input → (attn_out, updated kv_l).

        The default is the unified GQA path (attention_block); MLA models
        override this (and init_kv_cache/_attn_params) only.
        """
        # per-layer window (gemma3 pattern): traced scalar from the scanned
        # layer params; uniform static window otherwise
        window = lp.get("window", self.config.sliding_window)
        return attention_block(
            lp,
            attn_in,
            meta,
            kv_l,
            self.config,
            block_size=self.block_size,
            scale=self.scale,
            sliding_window=window,
            attn_backend=self.attn_backend,
        )

    def forward(self, params: dict, token_ids: jax.Array, meta: AttnMeta, kv: jax.Array):
        """token_ids [B, T] → (updated kv [L,2,S,Hk,Dh], hidden [B,T,D])."""
        cfg = self.config
        h = params["embed"][token_ids].astype(jnp.bfloat16)
        if cfg.embed_scale != 1.0:
            h = h * jnp.asarray(cfg.embed_scale, dtype=h.dtype)
        if meta.mm_embeds is not None:  # VL: splice vision embeddings in
            B, T, D = h.shape
            flat = h.reshape(B * T, D)
            flat = flat.at[meta.mm_targets].set(
                meta.mm_embeds.astype(flat.dtype), mode="drop"
            )
            h = flat.reshape(B, T, D)

        # deferred-write decode: the cache is read-only inside the scan
        # (scan ys would otherwise rewrite the full pool every step); the
        # new KV rows scatter once afterwards. Only the base GQA attention
        # participates — subclasses with custom attention use the classic
        # write-in-scan path.
        deferred = (
            token_ids.shape[1] == 1
            and isinstance(kv, jax.Array)
            and type(self).attention is CausalLM.attention
        )
        # verify-deferred (on-device speculative loop, T = k+1): same
        # read-only-pool principle — the classic path below rewrites the
        # full pool per layer per while_loop iteration (~107 ms/verify on
        # the 0.6b, lab_spec.py). Global attention only: the pool partial
        # folds T into the GQA group dim, which needs one shared key range.
        verify_deferred = (
            token_ids.shape[1] > 1
            and meta.pool_lens is not None
            and isinstance(kv, jax.Array)
            and type(self).attention is CausalLM.attention
            and not cfg.layer_windows
            and not cfg.sliding_window
        )
        # fresh-prefill deferred (T > 1, every row's context starts at 0):
        # attention runs in-window over the chunk's own K/V, the pool is
        # neither read nor written inside the scan, and all layers' KV
        # scatters once afterwards at block granularity — the classic
        # path's per-layer pool-slice copy + write-back measured 55% of
        # the prefill step at the batch-256 marquee shape (lab06b
        # no_prefill_write: 9,565 → 12,185 tok/s with writes stubbed;
        # PERF_NOTES r5). Sliding windows are fine (the window is inside
        # the chunk); custom-attention subclasses use their own paths.
        fresh_prefill = (
            token_ids.shape[1] > 1
            and meta.fresh_prefill is not None
            and meta.pool_lens is None
            and isinstance(kv, jax.Array)
            and type(self).attention is CausalLM.attention
        )
        if deferred or verify_deferred or fresh_prefill:
            from vllm_rs_tpu.models.layers import (
                attention_block_deferred,
                attention_block_prefill_deferred,
                attention_block_verify_deferred,
            )
            from vllm_rs_tpu.ops.attention import (
                scatter_deferred_kv,
                scatter_deferred_kv_blocks,
            )

            def layer_fn(h, xs):
                lp, li = xs
                attn_in = rms_norm(h, lp["input_ln"], cfg.rms_norm_eps, cfg.norm_plus_one)
                window = lp.get("window", cfg.sliding_window)
                # pooled mode: the kernel indexes layer li inside the full
                # pool — scanning kv as xs forced a 32 MB slice copy per
                # layer into the pallas operand (attn_lab2.py)
                if verify_deferred:
                    attn_out, k_new, v_new = attention_block_verify_deferred(
                        lp, attn_in, meta, kv, cfg,
                        block_size=self.block_size, scale=self.scale,
                        attn_backend=self.attn_backend, layer_idx=li,
                    )
                elif fresh_prefill:
                    attn_out, k_new, v_new = attention_block_prefill_deferred(
                        lp, attn_in, meta, cfg,
                        scale=self.scale, sliding_window=window,
                    )
                else:
                    attn_out, k_new, v_new = attention_block_deferred(
                        lp, attn_in, meta, kv, cfg,
                        block_size=self.block_size, scale=self.scale,
                        sliding_window=window, attn_backend=self.attn_backend,
                        layer_idx=li,
                    )
                # gemma sandwich: post-attn norm applies BEFORE the residual
                # add; mlp input comes from its own pre-norm (gemma3)
                if cfg.sandwich_norms:
                    attn_out = rms_norm(
                        attn_out, lp["post_ln"], cfg.rms_norm_eps, cfg.norm_plus_one
                    )
                h = h + attn_out
                mlp_in = rms_norm(
                    h,
                    lp["pre_ffw_ln"] if cfg.sandwich_norms else lp["post_ln"],
                    cfg.rms_norm_eps,
                    cfg.norm_plus_one,
                )
                mlp_out = mlp(lp, mlp_in, cfg.hidden_act)
                if cfg.sandwich_norms:
                    mlp_out = rms_norm(
                        mlp_out, lp["post_ffw_ln"], cfg.rms_norm_eps, cfg.norm_plus_one
                    )
                h = h + mlp_out
                # one scatter row per TOKEN: [B*T, Hk*Dh] (T == 1 on the
                # plain deferred path)
                F = k_new.shape[-2] * k_new.shape[-1]
                return h, (k_new.reshape(-1, F), v_new.reshape(-1, F))

            L = cfg.num_hidden_layers
            h, (k_news, v_news) = jax.lax.scan(
                layer_fn, h, (params["layers"], jnp.arange(L, dtype=jnp.int32))
            )
            if fresh_prefill and meta.block_write_idx is not None:
                kv = scatter_deferred_kv_blocks(
                    kv, k_news, v_news, meta.block_write_idx, self.block_size
                )
            else:
                kv = scatter_deferred_kv(kv, k_news, v_news, meta.slot_mapping)
            return kv, h

        # classic write-in-scan path (prefill; quantized-KV decode): the
        # pool rides the scan CARRY with a per-layer dynamic update — as
        # scan xs/ys it forced a second full-pool allocation (7.9 GB on
        # the 0.6B serving config: jit(_step_impl) AllocateBuffer OOM)
        def layer_fn(carry, xs):
            h, kv = carry
            lp, li = xs
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
            if cfg.sandwich_norms:
                attn_out = rms_norm(
                    attn_out, lp["post_ln"], cfg.rms_norm_eps, cfg.norm_plus_one
                )
            h = h + attn_out
            mlp_in = rms_norm(
                h,
                lp["pre_ffw_ln"] if cfg.sandwich_norms else lp["post_ln"],
                cfg.rms_norm_eps,
                cfg.norm_plus_one,
            )
            mlp_out = mlp(lp, mlp_in, cfg.hidden_act)
            if cfg.sandwich_norms:
                mlp_out = rms_norm(
                    mlp_out, lp["post_ffw_ln"], cfg.rms_norm_eps, cfg.norm_plus_one
                )
            h = h + mlp_out
            return (h, kv), None

        L = cfg.num_hidden_layers
        (h, kv), _ = jax.lax.scan(
            layer_fn, (h, kv), (params["layers"], jnp.arange(L, dtype=jnp.int32))
        )
        return kv, h

    def compute_logits(self, params: dict, hidden: jax.Array, meta: AttnMeta) -> jax.Array:
        """[B, T, D] hidden → [B, vocab] float32 logits at last real tokens."""
        cfg = self.config
        last = gather_last_hidden(hidden, meta)
        last = rms_norm(last, params["final_norm"], cfg.rms_norm_eps, cfg.norm_plus_one)
        if cfg.tie_word_embeddings:
            logits = jnp.dot(
                last, params["embed"].T.astype(last.dtype),
                preferred_element_type=jnp.float32,
            )
        else:
            logits = linear(params["lm_head"], last)
        logits = logits.astype(jnp.float32)
        if cfg.final_logit_softcap > 0.0:
            c = cfg.final_logit_softcap
            logits = jnp.tanh(logits / c) * c
        return logits

    def step(self, params: dict, token_ids: jax.Array, meta: AttnMeta, kv: jax.Array):
        """Full forward + logits — the jittable unit the runner compiles."""
        kv, hidden = self.forward(params, token_ids, meta, kv)
        logits = self.compute_logits(params, hidden, meta)
        return kv, logits
