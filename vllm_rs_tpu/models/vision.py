"""Vision tower (ViT) for VL models.

Counterpart of the reference's qwen3_vl/vision.rs + gemma3 vision
(SURVEY.md §2.3): patch embedding, pre-norm transformer blocks with full
attention over the patch sequence, and a spatial-merge MLP projecting
2×2 patch groups into LLM hidden states.

Pure functional jax like the text models; one forward per image at request
admission (vision towers are small relative to the LLM, and eager encoding
keeps the serving step functions fixed-shape).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from vllm_rs_tpu.models.layers import rms_norm


def _layer_norm(x, w, b, eps=1e-6):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    xn = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (xn * w.astype(jnp.float32) + b.astype(jnp.float32)).astype(x.dtype)


class VisionTower:
    """Minimal ViT: patch linear → N pre-norm blocks → 2x2 merge MLP."""

    def __init__(
        self,
        *,
        patch_size: int = 14,
        width: int = 1152,
        layers: int = 24,
        heads: int = 16,
        mlp_ratio: float = 4.0,
        out_hidden: int = 4096,
        spatial_merge: int = 2,
        deepstack_levels: tuple = (),
    ):
        self.patch_size = patch_size
        self.width = width
        self.layers = layers
        self.heads = heads
        self.mlp_dim = int(width * mlp_ratio)
        self.out_hidden = out_hidden
        self.merge = spatial_merge
        # block indices whose states feed deepstack injection
        # (reference layers/deepstack.rs multi-level visual features)
        self.deepstack_levels = tuple(deepstack_levels)

    def init_params(self, key, dtype=jnp.bfloat16) -> dict:
        W, L, M = self.width, self.layers, self.mlp_dim
        in_dim = 3 * self.patch_size * self.patch_size
        ks = iter(jax.random.split(key, 8))

        def w(k, shape, scale=0.02):
            return (jax.random.normal(k, shape, jnp.float32) * scale).astype(dtype)

        blocks = {
            "ln1_w": jnp.ones((L, W), dtype=dtype),
            "ln1_b": jnp.zeros((L, W), dtype=dtype),
            "ln2_w": jnp.ones((L, W), dtype=dtype),
            "ln2_b": jnp.zeros((L, W), dtype=dtype),
            "qkv": w(next(ks), (L, W, 3 * W)),
            "proj": w(next(ks), (L, W, W)),
            "fc1": w(next(ks), (L, W, M)),
            "fc2": w(next(ks), (L, M, W)),
        }
        merged_in = W * self.merge * self.merge
        params = {
            "patch_embed": w(next(ks), (in_dim, W)),
            "blocks": blocks,
            "merger_ln_w": jnp.ones((W,), dtype=dtype),
            "merger_ln_b": jnp.zeros((W,), dtype=dtype),
            "merger_fc1": w(next(ks), (merged_in, merged_in)),
            "merger_fc2": w(next(ks), (merged_in, self.out_hidden)),
        }
        if self.deepstack_levels:
            params["ds_merger"] = w(
                next(ks), (len(self.deepstack_levels), merged_in, self.out_hidden)
            )
        return params

    def forward(self, params: dict, patches: jax.Array, grid: Tuple[int, int]) -> jax.Array:
        """patches [P, 3*ps*ps] (P = gh*gw) → [P/merge², out_hidden]."""
        gh, gw = grid
        H = self.heads
        W = self.width
        Dh = W // H
        h = jnp.dot(
            patches.astype(jnp.bfloat16),
            params["patch_embed"].astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
        P = h.shape[0]

        def block(h, bp):
            x = _layer_norm(h, bp["ln1_w"], bp["ln1_b"])
            qkv = jnp.dot(x, bp["qkv"].astype(x.dtype), preferred_element_type=jnp.float32)
            q, k, v = jnp.split(qkv.astype(jnp.float32), 3, axis=-1)
            q = q.reshape(P, H, Dh).transpose(1, 0, 2)
            k = k.reshape(P, H, Dh).transpose(1, 0, 2)
            v = v.reshape(P, H, Dh).transpose(1, 0, 2)
            scores = jnp.einsum("hpd,hqd->hpq", q, k) * (Dh ** -0.5)
            probs = jax.nn.softmax(scores, axis=-1)
            o = jnp.einsum("hpq,hqd->hpd", probs, v).transpose(1, 0, 2).reshape(P, W)
            h = h + jnp.dot(
                o.astype(jnp.bfloat16), bp["proj"].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            ).astype(h.dtype)
            x = _layer_norm(h, bp["ln2_w"], bp["ln2_b"])
            y = jnp.dot(x, bp["fc1"].astype(x.dtype), preferred_element_type=jnp.float32)
            y = jax.nn.gelu(y.astype(jnp.float32)).astype(jnp.bfloat16)
            h = h + jnp.dot(
                y, bp["fc2"].astype(jnp.bfloat16), preferred_element_type=jnp.float32
            ).astype(h.dtype)
            return h, h

        h, states = jax.lax.scan(block, h, params["blocks"])
        m = self.merge

        def spatial_merge(x):
            x = x.reshape(gh // m, m, gw // m, m, W).transpose(0, 2, 1, 3, 4)
            return x.reshape(-1, m * m * W)

        h = _layer_norm(h, params["merger_ln_w"], params["merger_ln_b"])
        hm = spatial_merge(h)
        y = jnp.dot(
            hm.astype(jnp.bfloat16), params["merger_fc1"].astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        y = jax.nn.gelu(y.astype(jnp.float32)).astype(jnp.bfloat16)
        out = jnp.dot(
            y, params["merger_fc2"].astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
        if not self.deepstack_levels:
            return out
        # deepstack: intermediate block states → per-level merged features
        # NOTE: `states` from scan is per-block ys... recompute via indexing
        ds = []
        for li, lvl in enumerate(self.deepstack_levels):
            sm = spatial_merge(states[lvl])
            ds.append(
                jnp.dot(
                    sm.astype(jnp.bfloat16),
                    params["ds_merger"][li].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                ).astype(jnp.bfloat16)
            )
        return out, jnp.stack(ds)  # [n_levels, K, out_hidden]
