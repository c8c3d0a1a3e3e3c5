"""Vision tower (ViT) for VL models.

Counterpart of the reference's qwen3_vl/vision.rs (SURVEY.md §2.3):
patch embedding (conv3d folded to a per-patch linear — for static images
the temporal axis is a repeat, so summing conv weights over it is exact),
learned position embeddings bilinearly interpolated to the image grid
(vision.rs:565-674 fast_pos_embed_interpolate), 2D rotary embeddings over
patch (row, col) coordinates (vision.rs:676-724 rot_pos_emb), pre-norm
transformer blocks with biased qkv/proj/fc projections
(vision.rs:182-340), and PatchMergers (norm → 2x2 shuffle → fc1 → gelu →
fc2, vision.rs:342-419) for both the main output and the deepstack
feature levels.

Patch order: the reference feeds patches merge-block-major; we keep the
preprocessor's row-major order instead. The two are equivalent — attention
is permutation-invariant and both rope and the interpolated pos-embed are
computed from each patch's (row, col) coordinates, while the merger's
shuffle regroups the same 2x2 blocks from either order.

Pure functional jax like the text models; one forward per image at request
admission (vision towers are small relative to the LLM, and eager encoding
keeps the serving step functions fixed-shape).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _layer_norm(x, w, b, eps=1e-6):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    xn = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (xn * w.astype(jnp.float32) + b.astype(jnp.float32)).astype(x.dtype)


def _linb(x, w, b):
    y = jnp.dot(
        x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y


def bilinear_pos_embed(table: jax.Array, side: int, gh: int, gw: int) -> jax.Array:
    """Interpolate a [side*side, W] learned grid to [gh*gw, W] (row-major),
    mirroring vision.rs fast_pos_embed_interpolate's linspace sampling."""
    def pts(steps):
        if steps == 1:
            return np.zeros((1,), np.float32)
        return np.linspace(0.0, side - 1.0, steps, dtype=np.float32)

    hv, wv = pts(gh), pts(gw)
    hf = np.floor(hv).astype(np.int32)
    wf = np.floor(wv).astype(np.int32)
    hc = np.minimum(np.ceil(hv).astype(np.int32), side - 1)
    wc = np.minimum(np.ceil(wv).astype(np.int32), side - 1)
    dh, dw = hv - hf, wv - wf
    idx = []
    wts = []
    for hsel, hw in ((hf, 1.0 - dh), (hc, dh)):
        for wsel, wwt in ((wf, 1.0 - dw), (wc, dw)):
            idx.append((hsel[:, None] * side + wsel[None, :]).reshape(-1))
            wts.append((hw[:, None] * wwt[None, :]).reshape(-1))
    out = sum(
        table[jnp.asarray(i)] * jnp.asarray(w, dtype=jnp.float32)[:, None]
        for i, w in zip(idx, wts)
    )
    return out


def rot2d_cos_sin(gh: int, gw: int, head_dim: int, theta: float = 10000.0):
    """Per-patch 2D rope tables [P, head_dim] (row-major patch order):
    freqs = [row_freqs | col_freqs] each head_dim/4 wide, duplicated
    (vision.rs rot_pos_emb + forward's cat[rope, rope])."""
    dim = head_dim // 2  # rotary dim per axis pair
    inv = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float32) / dim))
    rows = np.repeat(np.arange(gh, dtype=np.float32), gw)
    cols = np.tile(np.arange(gw, dtype=np.float32), gh)
    rf = rows[:, None] * inv[None, :]  # [P, head_dim/4]
    cf = cols[:, None] * inv[None, :]
    freqs = np.concatenate([rf, cf], axis=-1)  # [P, head_dim/2]
    emb = np.concatenate([freqs, freqs], axis=-1)  # [P, head_dim]
    return jnp.asarray(np.cos(emb)), jnp.asarray(np.sin(emb))


def _rotate_half(x):
    h = x.shape[-1] // 2
    return jnp.concatenate([-x[..., h:], x[..., :h]], axis=-1)


class SiglipTower:
    """SigLIP-style encoder (gemma3 vision, reference gemma3/mod.rs:30-125):
    conv2d patch embed (+bias, as a per-patch linear), absolute learned
    position embeddings over the fixed (image_size/ps)² grid, pre-norm
    blocks with separate biased q/k/v/out projections (no rope), gelu-tanh
    fc1/fc2 MLP, final post_layernorm."""

    def __init__(
        self,
        *,
        patch_size: int = 14,
        image_size: int = 896,
        width: int = 1152,
        layers: int = 27,
        heads: int = 16,
        mlp_dim: int = 4304,
        eps: float = 1e-6,
    ):
        self.patch_size = patch_size
        self.image_size = image_size
        self.grid = image_size // patch_size
        self.width = width
        self.layers = layers
        self.heads = heads
        self.mlp_dim = mlp_dim
        self.eps = eps

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
            "q": w(next(ks), (L, W, W)),
            "q_b": jnp.zeros((L, W), dtype=dtype),
            "k": w(next(ks), (L, W, W)),
            "k_b": jnp.zeros((L, W), dtype=dtype),
            "v": w(next(ks), (L, W, W)),
            "v_b": jnp.zeros((L, W), dtype=dtype),
            "out": w(next(ks), (L, W, W)),
            "out_b": jnp.zeros((L, W), dtype=dtype),
            "fc1": w(next(ks), (L, W, M)),
            "fc1_b": jnp.zeros((L, M), dtype=dtype),
            "fc2": w(next(ks), (L, M, W)),
            "fc2_b": jnp.zeros((L, W), dtype=dtype),
        }
        return {
            "patch_embed": w(next(ks), (in_dim, W)),
            "patch_embed_b": jnp.zeros((W,), dtype=dtype),
            "pos_embed": w(next(ks), (self.grid * self.grid, W)),
            "blocks": blocks,
            "post_ln_w": jnp.ones((W,), dtype=dtype),
            "post_ln_b": jnp.zeros((W,), dtype=dtype),
        }

    def forward(self, params: dict, patches: jax.Array) -> jax.Array:
        """patches [P, 3*ps*ps] (row-major, P = grid²) → [P, W]."""
        H, W = self.heads, self.width
        Dh = W // H
        h = _linb(patches, params["patch_embed"], params["patch_embed_b"])
        h = (h + params["pos_embed"].astype(jnp.float32)).astype(jnp.bfloat16)
        P = h.shape[0]

        def block(h, bp):
            x = _layer_norm(h, bp["ln1_w"], bp["ln1_b"], self.eps)
            q = _linb(x, bp["q"], bp["q_b"]).reshape(P, H, Dh)
            k = _linb(x, bp["k"], bp["k_b"]).reshape(P, H, Dh)
            v = _linb(x, bp["v"], bp["v_b"]).reshape(P, H, Dh)
            scores = jnp.einsum("phd,qhd->hpq", q, k) * (Dh ** -0.5)
            probs = jax.nn.softmax(scores, axis=-1)
            o = jnp.einsum("hpq,qhd->phd", probs, v).reshape(P, W)
            h = h + _linb(o, bp["out"], bp["out_b"]).astype(h.dtype)
            x = _layer_norm(h, bp["ln2_w"], bp["ln2_b"], self.eps)
            y = _linb(x, bp["fc1"], bp["fc1_b"])
            y = jax.nn.gelu(y.astype(jnp.float32), approximate=True).astype(
                jnp.bfloat16
            )
            h = h + _linb(y, bp["fc2"], bp["fc2_b"]).astype(h.dtype)
            return h, None

        h, _ = jax.lax.scan(block, h, params["blocks"])
        return _layer_norm(h, params["post_ln_w"], params["post_ln_b"], self.eps)


def pixtral_cos_sin(gh: int, gw: int, head_dim: int, theta: float = 10000.0):
    """Pixtral 2D rope tables [P, head_dim] (row-major patches): the base
    frequency ladder is split interleaved — even indices rotate with the
    row coordinate, odd with the column (mistral3_vl/vision.rs:133-169) —
    then duplicated for the rotate-half convention."""
    dim = head_dim
    base = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float32) / dim))
    fh, fw = base[0::2], base[1::2]  # [dim/4] each
    rows = np.repeat(np.arange(gh, dtype=np.float32), gw)
    cols = np.tile(np.arange(gw, dtype=np.float32), gh)
    freqs = np.concatenate(
        [rows[:, None] * fh[None, :], cols[:, None] * fw[None, :]], axis=-1
    )  # [P, dim/2]
    emb = np.concatenate([freqs, freqs], axis=-1)
    return jnp.asarray(np.cos(emb)), jnp.asarray(np.sin(emb))


class PixtralTower:
    """Pixtral/Mistral3 vision encoder (reference mistral3_vl/vision.rs):
    unbiased conv patch embed, RMS pre-norm, blocks of
    {attention_norm → unbiased q/k/v/o with 2D rope → ffn_norm →
    silu-gated feed_forward}. Variable-resolution grids."""

    def __init__(
        self,
        *,
        patch_size: int = 14,
        width: int = 1024,
        layers: int = 24,
        heads: int = 16,
        head_dim: int = 64,
        mlp_dim: int = 4096,
        rope_theta: float = 10000.0,
        eps: float = 1e-5,
    ):
        self.patch_size = patch_size
        self.width = width
        self.layers = layers
        self.heads = heads
        self.head_dim = head_dim or width // heads
        self.mlp_dim = mlp_dim
        self.rope_theta = rope_theta
        self.eps = eps

    def init_params(self, key, dtype=jnp.bfloat16) -> dict:
        W, L, M = self.width, self.layers, self.mlp_dim
        A = self.heads * self.head_dim
        ks = iter(jax.random.split(key, 8))

        def w(k, shape, scale=0.02):
            return (jax.random.normal(k, shape, jnp.float32) * scale).astype(dtype)

        blocks = {
            "attn_ln": jnp.ones((L, W), dtype=dtype),
            "ffn_ln": jnp.ones((L, W), dtype=dtype),
            "q": w(next(ks), (L, W, A)),
            "k": w(next(ks), (L, W, A)),
            "v": w(next(ks), (L, W, A)),
            "o": w(next(ks), (L, A, W)),
            "gate": w(next(ks), (L, W, M)),
            "up": w(next(ks), (L, W, M)),
            "down": w(next(ks), (L, M, W)),
        }
        return {
            "patch_embed": w(next(ks), (3 * self.patch_size ** 2, W)),
            "ln_pre": jnp.ones((W,), dtype=dtype),
            "blocks": blocks,
        }

    def forward(self, params: dict, patches: jax.Array, grid: Tuple[int, int]) -> jax.Array:
        """patches [P, 3*ps*ps] (row-major, P = gh*gw) → [P, W]."""
        gh, gw = grid
        H, Dh, W = self.heads, self.head_dim, self.width

        def rms(x, w):
            xf = x.astype(jnp.float32)
            xn = xf * jax.lax.rsqrt(jnp.mean(xf * xf, -1, keepdims=True) + self.eps)
            return (xn * w.astype(jnp.float32)).astype(jnp.bfloat16)

        h = _linb(patches, params["patch_embed"], None).astype(jnp.bfloat16)
        h = rms(h, params["ln_pre"])
        P = h.shape[0]
        cos, sin = pixtral_cos_sin(gh, gw, Dh, self.rope_theta)

        def block(h, bp):
            x = rms(h, bp["attn_ln"])
            q = _linb(x, bp["q"], None).reshape(P, H, Dh)
            k = _linb(x, bp["k"], None).reshape(P, H, Dh)
            v = _linb(x, bp["v"], None).reshape(P, H, Dh)
            q = q * cos[:, None, :] + _rotate_half(q) * sin[:, None, :]
            k = k * cos[:, None, :] + _rotate_half(k) * sin[:, None, :]
            scores = jnp.einsum("phd,qhd->hpq", q, k) * (Dh ** -0.5)
            probs = jax.nn.softmax(scores, axis=-1)
            o = jnp.einsum("hpq,qhd->phd", probs, v).reshape(P, H * Dh)
            h = h + _linb(o, bp["o"], None).astype(h.dtype)
            x = rms(h, bp["ffn_ln"])
            g = _linb(x, bp["gate"], None)
            u = _linb(x, bp["up"], None)
            y = (jax.nn.silu(g) * u).astype(jnp.bfloat16)
            h = h + _linb(y, bp["down"], None).astype(h.dtype)
            return h, None

        h, _ = jax.lax.scan(block, h, params["blocks"])
        return h


def llama4_cos_sin(g: int, head_dim: int, theta: float = 10000.0):
    """Llama4 vision 2D rope tables [P+1, head_dim/2] (interleaved rotation
    over pairs; reference llama4/vision.rs:78-158): coordinates are 1-based
    (x = col+1, y = row+1), the CLS row rotates by zero."""
    fd = head_dim // 2
    base = 1.0 / (theta ** (np.arange(0, fd, 2, dtype=np.float32)[: fd // 2] / fd))
    ids = np.arange(g * g, dtype=np.float32)
    fx = (ids % g) + 1.0
    fy = np.floor(ids / g) + 1.0
    freqs = np.concatenate(
        [fx[:, None] * base[None, :], fy[:, None] * base[None, :]], axis=-1
    )  # [P, head_dim/2] after the reference's interleave/stride dance
    freqs = np.concatenate([freqs, np.zeros((1, freqs.shape[1]), np.float32)])
    return jnp.asarray(np.cos(freqs)), jnp.asarray(np.sin(freqs))


def _rope_interleaved(x, cos, sin):
    """Rotate interleaved pairs (x[2i], x[2i+1]) by (cos[i], sin[i])."""
    x1, x2 = x[..., 0::2], x[..., 1::2]
    c = cos[:, None, :]
    s = sin[:, None, :]
    r1 = x1 * c - x2 * s
    r2 = x2 * c + x1 * s
    out = jnp.stack([r1, r2], axis=-1)
    return out.reshape(x.shape)


class Llama4Tower:
    """Llama4 vision encoder (reference llama4/vision.rs): unfold-conv
    patch embed (unbiased linear on channel-major patches), class token
    appended LAST, learned pos embeds, biased q/k/v/o + fc1/fc2 (gelu)
    blocks with interleaved 2D rope, pre/post layernorm, then the pixel
    shuffle adapter (ratio 0.5 → 4x fewer tokens, gelu-MLP) producing
    `out_dim` features per merged patch."""

    def __init__(
        self,
        *,
        patch_size: int = 14,
        image_size: int = 336,
        width: int = 1408,
        layers: int = 34,
        heads: int = 16,
        mlp_dim: int = 5632,
        out_dim: int = 4096,
        pixel_shuffle_ratio: float = 0.5,
        rope_theta: float = 10000.0,
    ):
        self.patch_size = patch_size
        self.image_size = image_size
        self.grid = image_size // patch_size
        self.width = width
        self.layers = layers
        self.heads = heads
        self.mlp_dim = mlp_dim
        self.out_dim = out_dim
        self.ratio = pixel_shuffle_ratio
        self.rope_theta = rope_theta

    def init_params(self, key, dtype=jnp.bfloat16) -> dict:
        W, L, M = self.width, self.layers, self.mlp_dim
        P = self.grid * self.grid
        shuffled = int(W / (self.ratio ** 2))
        ks = iter(jax.random.split(key, 10))

        def w(k, shape, scale=0.02):
            return (jax.random.normal(k, shape, jnp.float32) * scale).astype(dtype)

        blocks = {
            "ln1_w": jnp.ones((L, W), dtype=dtype),
            "ln1_b": jnp.zeros((L, W), dtype=dtype),
            "ln2_w": jnp.ones((L, W), dtype=dtype),
            "ln2_b": jnp.zeros((L, W), dtype=dtype),
            "q": w(next(ks), (L, W, W)),
            "q_b": jnp.zeros((L, W), dtype=dtype),
            "k": w(next(ks), (L, W, W)),
            "k_b": jnp.zeros((L, W), dtype=dtype),
            "v": w(next(ks), (L, W, W)),
            "v_b": jnp.zeros((L, W), dtype=dtype),
            "o": w(next(ks), (L, W, W)),
            "o_b": jnp.zeros((L, W), dtype=dtype),
            "fc1": w(next(ks), (L, W, M)),
            "fc1_b": jnp.zeros((L, M), dtype=dtype),
            "fc2": w(next(ks), (L, M, W)),
            "fc2_b": jnp.zeros((L, W), dtype=dtype),
        }
        return {
            "patch_embed": w(next(ks), (3 * self.patch_size ** 2, W)),
            "class_embedding": w(next(ks), (W,)),
            "pos_embed": w(next(ks), (P + 1, W)),
            "ln_pre_w": jnp.ones((W,), dtype=dtype),
            "ln_pre_b": jnp.zeros((W,), dtype=dtype),
            "ln_post_w": jnp.ones((W,), dtype=dtype),
            "ln_post_b": jnp.zeros((W,), dtype=dtype),
            "blocks": blocks,
            "adapter_fc1": w(next(ks), (shuffled, self.out_dim)),
            "adapter_fc2": w(next(ks), (self.out_dim, self.out_dim)),
        }

    def _pixel_shuffle(self, x):
        """[P, C] (P = g²) → [P·r², C/r²] (vision.rs:470-494)."""
        g = self.grid
        r = self.ratio
        C = x.shape[-1]
        gr, Cr = int(g * r), int(C / r)
        x = x.reshape(g, g, C)
        x = x.reshape(g, gr, Cr)
        x = x.transpose(1, 0, 2)
        x = x.reshape(gr, gr, int(C / r ** 2))
        x = x.transpose(1, 0, 2)
        return x.reshape(-1, int(C / r ** 2))

    def forward(self, params: dict, patches: jax.Array) -> jax.Array:
        """patches [P, 3*ps*ps] (row-major, P = grid²) → [P·r², out_dim]."""
        H, W = self.heads, self.width
        Dh = W // H
        h = _linb(patches, params["patch_embed"], None).astype(jnp.bfloat16)
        cls = params["class_embedding"][None, :].astype(h.dtype)
        h = jnp.concatenate([h, cls], axis=0)  # CLS appended last
        h = (h.astype(jnp.float32) + params["pos_embed"].astype(jnp.float32)).astype(
            jnp.bfloat16
        )
        h = _layer_norm(h, params["ln_pre_w"], params["ln_pre_b"])
        P = h.shape[0]
        cos, sin = llama4_cos_sin(self.grid, Dh, self.rope_theta)

        def block(h, bp):
            x = _layer_norm(h, bp["ln1_w"], bp["ln1_b"])
            q = _linb(x, bp["q"], bp["q_b"]).reshape(P, H, Dh)
            k = _linb(x, bp["k"], bp["k_b"]).reshape(P, H, Dh)
            v = _linb(x, bp["v"], bp["v_b"]).reshape(P, H, Dh)
            q = _rope_interleaved(q, cos, sin)
            k = _rope_interleaved(k, cos, sin)
            scores = jnp.einsum("phd,qhd->hpq", q, k) * (Dh ** -0.5)
            probs = jax.nn.softmax(scores, axis=-1)
            o = jnp.einsum("hpq,qhd->phd", probs, v).reshape(P, W)
            h = h + _linb(o, bp["o"], bp["o_b"]).astype(h.dtype)
            x = _layer_norm(h, bp["ln2_w"], bp["ln2_b"])
            y = _linb(x, bp["fc1"], bp["fc1_b"])
            y = jax.nn.gelu(y.astype(jnp.float32), approximate=False).astype(
                jnp.bfloat16
            )
            h = h + _linb(y, bp["fc2"], bp["fc2_b"]).astype(h.dtype)
            return h, None

        h, _ = jax.lax.scan(block, h, params["blocks"])
        h = _layer_norm(h, params["ln_post_w"], params["ln_post_b"])
        h = h[:-1]  # drop CLS
        h = self._pixel_shuffle(h)
        y = _linb(h, params["adapter_fc1"], None)
        y = jax.nn.gelu(y.astype(jnp.float32), approximate=False).astype(jnp.bfloat16)
        y = _linb(y, params["adapter_fc2"], None)
        return jax.nn.gelu(y.astype(jnp.float32), approximate=False).astype(
            jnp.bfloat16
        )


class VisionTower:
    """ViT: patch linear(+bias) + pos-embed → N pre-norm blocks with 2D
    rope → PatchMerger; optional deepstack-level mergers."""

    def __init__(
        self,
        *,
        patch_size: int = 14,
        width: int = 1152,
        layers: int = 24,
        heads: int = 16,
        mlp_ratio: float = 4.0,
        mlp_dim: int = 0,
        out_hidden: int = 4096,
        spatial_merge: int = 2,
        deepstack_levels: tuple = (),
        num_position_embeddings: int = 0,
    ):
        self.patch_size = patch_size
        self.width = width
        self.layers = layers
        self.heads = heads
        self.mlp_dim = mlp_dim or int(width * mlp_ratio)
        self.out_hidden = out_hidden
        self.merge = spatial_merge
        # block indices whose states feed deepstack injection
        # (reference layers/deepstack.rs multi-level visual features)
        self.deepstack_levels = tuple(deepstack_levels)
        self.num_pos = num_position_embeddings
        self.pos_side = int(round(num_position_embeddings ** 0.5)) if num_position_embeddings else 0

    def init_params(self, key, dtype=jnp.bfloat16) -> dict:
        W, L, M = self.width, self.layers, self.mlp_dim
        in_dim = 3 * self.patch_size * self.patch_size
        ks = iter(jax.random.split(key, 12))

        def w(k, shape, scale=0.02):
            return (jax.random.normal(k, shape, jnp.float32) * scale).astype(dtype)

        blocks = {
            "ln1_w": jnp.ones((L, W), dtype=dtype),
            "ln1_b": jnp.zeros((L, W), dtype=dtype),
            "ln2_w": jnp.ones((L, W), dtype=dtype),
            "ln2_b": jnp.zeros((L, W), dtype=dtype),
            "qkv": w(next(ks), (L, W, 3 * W)),
            "qkv_b": jnp.zeros((L, 3 * W), dtype=dtype),
            "proj": w(next(ks), (L, W, W)),
            "proj_b": jnp.zeros((L, W), dtype=dtype),
            "fc1": w(next(ks), (L, W, M)),
            "fc1_b": jnp.zeros((L, M), dtype=dtype),
            "fc2": w(next(ks), (L, M, W)),
            "fc2_b": jnp.zeros((L, W), dtype=dtype),
        }
        merged_in = W * self.merge * self.merge
        params = {
            "patch_embed": w(next(ks), (in_dim, W)),
            "patch_embed_b": jnp.zeros((W,), dtype=dtype),
            "blocks": blocks,
            "merger_ln_w": jnp.ones((W,), dtype=dtype),
            "merger_ln_b": jnp.zeros((W,), dtype=dtype),
            "merger_fc1": w(next(ks), (merged_in, merged_in)),
            "merger_fc1_b": jnp.zeros((merged_in,), dtype=dtype),
            "merger_fc2": w(next(ks), (merged_in, self.out_hidden)),
            "merger_fc2_b": jnp.zeros((self.out_hidden,), dtype=dtype),
        }
        if self.num_pos:
            params["pos_embed"] = w(next(ks), (self.num_pos, W))
        if self.deepstack_levels:
            n = len(self.deepstack_levels)
            # full PatchMergers with post-shuffle norm (vision.rs:342-419)
            params["ds_ln_w"] = jnp.ones((n, merged_in), dtype=dtype)
            params["ds_ln_b"] = jnp.zeros((n, merged_in), dtype=dtype)
            params["ds_fc1"] = w(next(ks), (n, merged_in, merged_in))
            params["ds_fc1_b"] = jnp.zeros((n, merged_in), dtype=dtype)
            params["ds_fc2"] = w(next(ks), (n, merged_in, self.out_hidden))
            params["ds_fc2_b"] = jnp.zeros((n, self.out_hidden), dtype=dtype)
        return params

    def forward(self, params: dict, patches: jax.Array, grid: Tuple[int, int]) -> jax.Array:
        """patches [P, 3*ps*ps] (P = gh*gw, row-major) → [P/merge², out]."""
        gh, gw = grid
        H = self.heads
        W = self.width
        Dh = W // H
        h = _linb(patches, params["patch_embed"], params.get("patch_embed_b")).astype(
            jnp.bfloat16
        )
        P = h.shape[0]
        if "pos_embed" in params:
            pe = bilinear_pos_embed(
                params["pos_embed"].astype(jnp.float32), self.pos_side, gh, gw
            )
            h = (h.astype(jnp.float32) + pe).astype(jnp.bfloat16)
        cos, sin = rot2d_cos_sin(gh, gw, Dh)

        def block(h, bp):
            x = _layer_norm(h, bp["ln1_w"], bp["ln1_b"])
            qkv = _linb(x, bp["qkv"], bp["qkv_b"])
            q, k, v = jnp.split(qkv.astype(jnp.float32), 3, axis=-1)
            q = q.reshape(P, H, Dh)
            k = k.reshape(P, H, Dh)
            v = v.reshape(P, H, Dh)
            q = q * cos[:, None, :] + _rotate_half(q) * sin[:, None, :]
            k = k * cos[:, None, :] + _rotate_half(k) * sin[:, None, :]
            q, k, v = (t.transpose(1, 0, 2) for t in (q, k, v))
            scores = jnp.einsum("hpd,hqd->hpq", q, k) * (Dh ** -0.5)
            probs = jax.nn.softmax(scores, axis=-1)
            o = jnp.einsum("hpq,hqd->hpd", probs, v).transpose(1, 0, 2).reshape(P, W)
            h = h + _linb(o, bp["proj"], bp["proj_b"]).astype(h.dtype)
            x = _layer_norm(h, bp["ln2_w"], bp["ln2_b"])
            y = _linb(x, bp["fc1"], bp["fc1_b"])
            if "gate" in bp:  # qwen2.5-VL gated vision MLP (silu)
                g = _linb(x, bp["gate"], bp.get("gate_b"))
                y = (jax.nn.silu(g.astype(jnp.float32)) * y).astype(jnp.bfloat16)
            else:
                y = jax.nn.gelu(y.astype(jnp.float32), approximate=True).astype(
                    jnp.bfloat16
                )
            h = h + _linb(y, bp["fc2"], bp["fc2_b"]).astype(h.dtype)
            return h, h

        h, states = jax.lax.scan(block, h, params["blocks"])
        m = self.merge

        def spatial_merge(x):
            x = x.reshape(gh // m, m, gw // m, m, W).transpose(0, 2, 1, 3, 4)
            return x.reshape(-1, m * m * W)

        # main merger: pre-shuffle norm at hidden width (vision.rs:403-418)
        hn = _layer_norm(h, params["merger_ln_w"], params["merger_ln_b"])
        hm = spatial_merge(hn)
        y = _linb(hm, params["merger_fc1"], params.get("merger_fc1_b"))
        y = jax.nn.gelu(y.astype(jnp.float32)).astype(jnp.bfloat16)
        out = _linb(y, params["merger_fc2"], params.get("merger_fc2_b")).astype(
            jnp.bfloat16
        )
        if not self.deepstack_levels:
            return out
        # deepstack mergers use post-shuffle norm at merged width
        ds = []
        for li, lvl in enumerate(self.deepstack_levels):
            sm = spatial_merge(states[lvl])
            sn = _layer_norm(sm, params["ds_ln_w"][li], params["ds_ln_b"][li])
            y = _linb(sn, params["ds_fc1"][li], params["ds_fc1_b"][li])
            y = jax.nn.gelu(y.astype(jnp.float32)).astype(jnp.bfloat16)
            ds.append(
                _linb(y, params["ds_fc2"][li], params["ds_fc2_b"][li]).astype(
                    jnp.bfloat16
                )
            )
        return out, jnp.stack(ds)  # [n_levels, K, out_hidden]
