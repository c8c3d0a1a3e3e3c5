"""Vision-language models (Qwen2/2.5/3-VL style).

Counterpart of the reference's qwen3_vl/ + mistral3_vl/ (SURVEY.md §2.3):
a VisionTower encodes images at request admission; during prefill the
vision embeddings are spliced over the prompt's image-placeholder tokens
(the splice itself lives in the base CausalLM.forward so any family can be
multimodal). Deepstack feature injection and mrope positions are follow-up
refinements — positions currently use the standard 1D rope.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from vllm_rs_tpu.config import ModelConfig
from vllm_rs_tpu.models.llama import CausalLM
from vllm_rs_tpu.models.vision import VisionTower


class QwenVLForCausalLM(CausalLM):
    """Dense text trunk + ViT vision tower."""

    def __init__(self, config: ModelConfig, **kw):
        super().__init__(config, **kw)
        self.image_token_id = int(config.extra_get("image_token_id", 151655))
        vc = {
            "patch_size": int(config.extra_get("vision_patch_size", 14)),
            "width": int(config.extra_get("vision_width", 128)),
            "layers": int(config.extra_get("vision_layers", 2)),
            "heads": int(config.extra_get("vision_heads", 4)),
            "mlp_dim": int(config.extra_get("vision_intermediate", 0)),
            "out_hidden": int(
                config.extra_get("vision_out_hidden", config.hidden_size)
            ),
            "spatial_merge": int(config.extra_get("vision_spatial_merge", 2)),
            "deepstack_levels": tuple(
                config.extra_get("deepstack_visual_indexes", ()) or ()
            ),
            "num_position_embeddings": int(config.extra_get("vision_num_pos", 0)),
        }
        self.vision = VisionTower(**vc)
        self.n_deepstack = len(vc["deepstack_levels"])

    def init_params(self, key, quant=None, quant_group: int = 128, dtype=jnp.bfloat16):
        k1, k2 = jax.random.split(key)
        params = super().init_params(k1, quant=quant, quant_group=quant_group, dtype=dtype)
        params["vision"] = self.vision.init_params(k2, dtype=dtype)
        return params

    def build_mrope_table(self, token_ids, images) -> tuple:
        """Prompt mrope position table [3, len] + decode delta (qwen3_vl
        mrope: text advances all components; an image spans one temporal
        position with h/w from its merged grid)."""
        m = self.vision.merge
        table = np.zeros((3, len(token_ids)), dtype=np.int32)
        pos = 0  # running max position
        i = 0
        img_iter = iter(images)
        n = len(token_ids)
        while i < n:
            if token_ids[i] == self.image_token_id:
                img = next(img_iter)
                gh, gw = img.grid[0] // m, img.grid[1] // m
                span = gh * gw
                hh = np.repeat(np.arange(gh, dtype=np.int32), gw)
                ww = np.tile(np.arange(gw, dtype=np.int32), gh)
                table[0, i : i + span] = pos
                table[1, i : i + span] = pos + hh
                table[2, i : i + span] = pos + ww
                pos = pos + max(gh, gw)
                i += span
            else:
                table[:, i] = pos
                pos += 1
                i += 1
        delta = pos - n  # decode position = physical + delta (all components)
        return table, delta

    def encode_image(self, params: dict, image):
        """ImageData → [num_tokens, hidden] embeddings (one jit per grid);
        with deepstack levels also returns [n_levels, num_tokens, hidden]."""
        out = jax.jit(self.vision.forward, static_argnames=("grid",))(
            params["vision"], jnp.asarray(image.patches), grid=image.grid
        )
        if self.n_deepstack:
            emb, ds = out
            return np.asarray(emb, np.float32), np.asarray(ds, np.float32)
        return np.asarray(out, dtype=np.float32)

    def forward(self, params, token_ids, meta, kv):
        """Deepstack injection: the first n_levels layers each add their
        visual feature level at the image positions (layers/deepstack.rs);
        remaining layers run the standard scan."""
        if meta.mm_deepstack is None or self.n_deepstack == 0:
            return super().forward(params, token_ids, meta, kv)
        from vllm_rs_tpu.models.layers import mlp, rms_norm

        cfg = self.config
        n = self.n_deepstack
        h = params["embed"][token_ids].astype(jnp.bfloat16)
        B, T, D = h.shape
        if meta.mm_embeds is not None:
            flat = h.reshape(B * T, D)
            flat = flat.at[meta.mm_targets].set(
                meta.mm_embeds.astype(flat.dtype), mode="drop"
            )
            h = flat.reshape(B, T, D)

        def one_layer(lp, h, kv_l):
            attn_in = rms_norm(h, lp["input_ln"], cfg.rms_norm_eps, cfg.norm_plus_one)
            attn_out, kv_out = self.attention(lp, attn_in, meta, kv_l)
            h = h + attn_out
            mlp_in = rms_norm(h, lp["post_ln"], cfg.rms_norm_eps, cfg.norm_plus_one)
            return h + mlp(lp, mlp_in, cfg.hidden_act), kv_out

        take = lambda tree, sl: jax.tree_util.tree_map(lambda x: x[sl], tree)  # noqa: E731
        kv_prefix = []
        for i in range(n):
            lp = take(params["layers"], i)
            h, kv_l = one_layer(lp, h, kv[i])
            kv_prefix.append(kv_l)
            flat = h.reshape(B * T, D)
            flat = flat.at[meta.mm_targets].add(
                meta.mm_deepstack[i].astype(flat.dtype), mode="drop"
            )
            h = flat.reshape(B, T, D)

        def layer_fn(h, xs):
            lp, kv_l = xs
            h, kv_out = one_layer(lp, h, kv_l)
            return h, kv_out

        h, kv_rest = jax.lax.scan(
            layer_fn, h, (take(params["layers"], slice(n, None)), kv[n:])
        )
        kv = jnp.concatenate([jnp.stack(kv_prefix), kv_rest], axis=0)
        return kv, h
