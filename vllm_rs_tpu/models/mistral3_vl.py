"""Mistral3 / Ministral-3 VL: Pixtral vision tower + spatial-merge projector.

Counterpart of the reference's mistral3_vl/ (SURVEY.md §2.3): the text
trunk is a plain Mistral (CausalLM config); images encode through
PixtralTower and project via MultiModalProjector (mod.rs:19-150):
RMS norm → PatchMerger (m×m unfold with channel-major features →
merging_layer, no bias) → linear_1 → gelu → linear_2.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from vllm_rs_tpu.config import ModelConfig
from vllm_rs_tpu.models.llama import CausalLM
from vllm_rs_tpu.models.vision import PixtralTower


class Mistral3VLForCausalLM(CausalLM):
    def __init__(self, config: ModelConfig, **kw):
        super().__init__(config, **kw)
        self.image_token_id = int(config.extra_get("image_token_id", 10))
        self.merge = int(config.extra_get("vision_spatial_merge", 2))
        self.has_vision = config.extra_get("vision_width") is not None
        if self.has_vision:
            self.vision = PixtralTower(
                patch_size=int(config.extra_get("vision_patch_size", 14)),
                width=int(config.extra_get("vision_width", 1024)),
                layers=int(config.extra_get("vision_layers", 24)),
                heads=int(config.extra_get("vision_heads", 16)),
                head_dim=int(config.extra_get("vision_head_dim", 0))
                or int(config.extra_get("vision_width", 1024))
                // int(config.extra_get("vision_heads", 16)),
                mlp_dim=int(config.extra_get("vision_intermediate", 4096)),
                rope_theta=float(config.extra_get("vision_rope_theta", 10000.0)),
            )

    def init_params(self, key, quant=None, quant_group: int = 128, dtype=jnp.bfloat16):
        k1, k2, k3 = jax.random.split(key, 3)
        params = super().init_params(k1, quant=quant, quant_group=quant_group, dtype=dtype)
        if self.has_vision:
            W, D, m = self.vision.width, self.config.hidden_size, self.merge
            params["vision"] = self.vision.init_params(k2, dtype=dtype)
            ks = iter(jax.random.split(k3, 4))

            def w(shape):
                return (
                    jax.random.normal(next(ks), shape, jnp.float32) * 0.02
                ).astype(dtype)

            params["mm_norm"] = jnp.ones((W,), dtype=dtype)
            params["mm_merge"] = w((W * m * m, W))
            params["mm_fc1"] = w((W, D))
            params["mm_fc2"] = w((D, D))
        return params

    def encode_image(self, params: dict, image) -> np.ndarray:
        """ImageData (grid gh×gw) → [(gh/m)·(gw/m), D] float32."""
        cfg = self.config
        m = self.merge
        gh, gw = image.grid

        def run(p, patches):
            h = self.vision.forward(p["vision"], patches, (gh, gw))  # [P, W]
            W = self.vision.width
            hf = h.astype(jnp.float32)
            hn = hf * jax.lax.rsqrt(
                jnp.mean(hf * hf, -1, keepdims=True) + cfg.rms_norm_eps
            )
            hn = hn * p["mm_norm"].astype(jnp.float32)
            # PatchMerger: m×m unfold with channel-major feature order
            # [W][mi][mj] (mod.rs:40-83 unfold/permute)
            grid = hn.reshape(gh // m, m, gw // m, m, W)
            merged = grid.transpose(0, 2, 4, 1, 3).reshape(
                (gh // m) * (gw // m), W * m * m
            )
            def lin(x, wkey):
                y = jnp.dot(
                    x.astype(jnp.bfloat16), p[wkey].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                )
                b = p.get(wkey + "_b")
                return y + b.astype(jnp.float32) if b is not None else y

            y = lin(merged, "mm_merge")
            y = jax.nn.gelu(lin(y, "mm_fc1"), approximate=False)
            return lin(y, "mm_fc2")

        out = jax.jit(run)(params, jnp.asarray(image.patches))
        return np.asarray(out, dtype=np.float32)
