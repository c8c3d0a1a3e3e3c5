"""Image fetching + preprocessing for vision-language models.

Counterpart of the reference's utils/image.rs (fetch/decode/resize/
normalize per family, ImageData, tokens-per-image — image.rs:10-66).
Qwen-VL-style dynamic resolution: images resize to multiples of
patch_size * spatial_merge, bounded by a pixel budget; each image becomes
grid_h × grid_w patches → (grid_h/merge)·(grid_w/merge) LLM tokens.
"""

from __future__ import annotations

import base64
import io
import math
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

# CLIP normalization (OpenAI defaults, used by the Qwen-VL towers)
_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], dtype=np.float32)
_STD = np.array([0.26862954, 0.26130258, 0.27577711], dtype=np.float32)


@dataclass
class ImageData:
    """Preprocessed image (reference ImageData, image.rs:10-29)."""

    patches: np.ndarray  # [num_patches, 3 * ps * ps] float32
    grid: Tuple[int, int]  # (grid_h, grid_w) in patches
    num_tokens: int  # LLM tokens after spatial merge
    seed: int  # content hash for prefix-cache seeding


def load_image_bytes(src: str) -> bytes:
    """data: URI / base64 / local path → raw bytes (network fetch is done
    by the server layer when enabled)."""
    if src.startswith("data:"):
        _, _, b64 = src.partition(",")
        return base64.b64decode(b64)
    if src.startswith("base64:"):
        return base64.b64decode(src[len("base64:"):])
    with open(src, "rb") as f:
        return f.read()


def smart_resize(
    h: int, w: int, factor: int, min_pixels: int, max_pixels: int
) -> Tuple[int, int]:
    """Qwen-VL dynamic-resolution resize: round dims to `factor` multiples
    keeping the pixel count within [min_pixels, max_pixels]."""
    hh = max(factor, round(h / factor) * factor)
    ww = max(factor, round(w / factor) * factor)
    if hh * ww > max_pixels:
        beta = math.sqrt((h * w) / max_pixels)
        hh = max(factor, math.floor(h / beta / factor) * factor)
        ww = max(factor, math.floor(w / beta / factor) * factor)
    elif hh * ww < min_pixels:
        beta = math.sqrt(min_pixels / (h * w))
        hh = math.ceil(h * beta / factor) * factor
        ww = math.ceil(w * beta / factor) * factor
    return int(hh), int(ww)


def preprocess_image(
    data: bytes,
    *,
    patch_size: int = 14,
    spatial_merge: int = 2,
    min_pixels: int = 56 * 56,
    max_pixels: int = 1280 * 28 * 28,
) -> ImageData:
    """Decode + resize + normalize + patchify one image."""
    from PIL import Image

    img = Image.open(io.BytesIO(data)).convert("RGB")
    factor = patch_size * spatial_merge
    H, W = smart_resize(img.height, img.width, factor, min_pixels, max_pixels)
    img = img.resize((W, H))
    arr = np.asarray(img, dtype=np.float32) / 255.0  # [H, W, 3]
    arr = (arr - _MEAN) / _STD
    gh, gw = H // patch_size, W // patch_size
    # [gh, ps, gw, ps, 3] → [gh, gw, 3, ps, ps] → flat patches
    patches = (
        arr.reshape(gh, patch_size, gw, patch_size, 3)
        .transpose(0, 2, 4, 1, 3)
        .reshape(gh * gw, 3 * patch_size * patch_size)
    )
    num_tokens = (gh // spatial_merge) * (gw // spatial_merge)
    seed = int.from_bytes(
        __import__("hashlib").sha256(data).digest()[:8], "little"
    )
    return ImageData(patches=patches, grid=(gh, gw), num_tokens=num_tokens, seed=seed)


def tokens_per_image(img: ImageData) -> int:
    return img.num_tokens


def preprocess_image_fixed(
    data: bytes,
    *,
    image_size: int = 896,
    patch_size: int = 14,
    num_tokens: int = 256,
    mean: float = 0.5,
    std: float = 0.5,
) -> ImageData:
    """Gemma3-style fixed-resolution preprocessing (SigLIP): resize to a
    square image_size, normalize with 0.5/0.5, row-major patchify. The
    projector pools the g×g patch grid down to `num_tokens` soft tokens
    (reference gemma3/mod.rs Gemma3MultiModalProjector)."""
    from PIL import Image

    img = Image.open(io.BytesIO(data)).convert("RGB")
    img = img.resize((image_size, image_size))
    arr = (np.asarray(img, dtype=np.float32) / 255.0 - mean) / std
    g = image_size // patch_size
    patches = (
        arr.reshape(g, patch_size, g, patch_size, 3)
        .transpose(0, 2, 4, 1, 3)
        .reshape(g * g, 3 * patch_size * patch_size)
    )
    seed = int.from_bytes(
        __import__("hashlib").sha256(data).digest()[:8], "little"
    )
    return ImageData(patches=patches, grid=(g, g), num_tokens=num_tokens, seed=seed)


def preprocess_for_model(config, data: bytes) -> ImageData:
    """Family dispatch (reference utils/image.rs per-model preprocessing):
    gemma3/4 → fixed square resize + pooled soft tokens; qwen-VL family →
    dynamic smart-resize patchify."""
    mt = config.model_type
    if mt.startswith("gemma"):
        return preprocess_image_fixed(
            data,
            image_size=int(config.extra_get("vision_image_size", 896)),
            patch_size=int(config.extra_get("vision_patch_size", 14)),
            num_tokens=int(config.extra_get("mm_tokens_per_image", 256)),
        )
    return preprocess_image(
        data,
        patch_size=int(config.extra_get("vision_patch_size", 14)),
        spatial_merge=int(config.extra_get("vision_spatial_merge", 2)),
    )
