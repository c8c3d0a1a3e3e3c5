"""Gemma3 multimodal: SigLIP vision tower + avg-pool projector.

Counterpart of the reference's gemma3/mod.rs vision components
(Gemma3VisionEmbeddings/EncoderLayer/Transformer :30-125 and
Gemma3MultiModalProjector :127-195): images are encoded at admission into
`mm_tokens_per_image` soft tokens that splice over the prompt's
`<image_soft_token>` placeholders (the splice lives in CausalLM.forward).

Projector (mod.rs:168-195): tower output [P, W] → spatial [g, g, W] →
avg-pool g/√mm_tokens → flatten → (+1)-RMS norm → @ mm_input_projection
[W, D_text].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from vllm_rs_tpu.config import ModelConfig
from vllm_rs_tpu.models.llama import CausalLM
from vllm_rs_tpu.models.vision import SiglipTower


class Gemma3VLForCausalLM(CausalLM):
    """Gemma3 text trunk (sandwich norms, per-layer windows — shared
    CausalLM config) + SigLIP tower for checkpoints with a vision_config."""

    def __init__(self, config: ModelConfig, **kw):
        super().__init__(config, **kw)
        self.image_token_id = int(
            config.extra_get("image_token_id", 262144)  # <image_soft_token>
        )
        self.mm_tokens_per_image = int(config.extra_get("mm_tokens_per_image", 256))
        self.has_vision = config.extra_get("vision_width") is not None
        if self.has_vision:
            self.vision = SiglipTower(
                patch_size=int(config.extra_get("vision_patch_size", 14)),
                image_size=int(config.extra_get("vision_image_size", 896)),
                width=int(config.extra_get("vision_width", 1152)),
                layers=int(config.extra_get("vision_layers", 27)),
                heads=int(config.extra_get("vision_heads", 16)),
                mlp_dim=int(config.extra_get("vision_intermediate", 4304)),
            )
            g = self.vision.grid
            self.pool_k = max(1, g // int(round(self.mm_tokens_per_image ** 0.5)))

    def init_params(self, key, quant=None, quant_group: int = 128, dtype=jnp.bfloat16):
        k1, k2, k3 = jax.random.split(key, 3)
        params = super().init_params(k1, quant=quant, quant_group=quant_group, dtype=dtype)
        if self.has_vision:
            params["vision"] = self.vision.init_params(k2, dtype=dtype)
            W, D = self.vision.width, self.config.hidden_size
            params["mm_proj"] = (
                jax.random.normal(k3, (W, D), jnp.float32) * 0.02
            ).astype(dtype)
            params["mm_norm"] = jnp.zeros((W,), dtype=dtype)  # (w+1) identity
        return params

    def encode_image(self, params: dict, image) -> np.ndarray:
        """ImageData (fixed grid g×g) → [mm_tokens_per_image, D] float32."""
        cfg = self.config

        def run(vision, mm_proj, mm_norm, patches):
            h = self.vision.forward(vision, patches)  # [P, W]
            g = self.vision.grid
            k = self.pool_k
            W = self.vision.width
            hs = h.astype(jnp.float32).reshape(g // k, k, g // k, k, W)
            pooled = hs.mean(axis=(1, 3)).reshape(-1, W)  # [tokens, W]
            nf = pooled * jax.lax.rsqrt(
                jnp.mean(pooled * pooled, axis=-1, keepdims=True) + cfg.rms_norm_eps
            )
            nf = nf * (mm_norm.astype(jnp.float32) + 1.0)
            return jnp.dot(
                nf.astype(jnp.bfloat16), mm_proj.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )

        out = jax.jit(run)(
            params["vision"], params["mm_proj"], params["mm_norm"],
            jnp.asarray(image.patches),
        )
        return np.asarray(out, dtype=np.float32)
