"""Image content handling for the HTTP APIs.

Counterpart of the reference's build_messages_and_images
(server/mod.rs:1128-1351): OpenAI `image_url` parts and Anthropic `image`
source blocks are decoded, preprocessed through the model family's image
pipeline (utils/image.py), and replaced in the rendered prompt by the
family's placeholder-token run so the engine can splice vision embeddings
over them at prefill.

Zero-egress environment: only `data:` URLs / raw base64 payloads are
accepted — no HTTP fetch.
"""

from __future__ import annotations

import base64
from typing import Optional, Tuple

# model family → (start marker, per-token pad, end marker)
_MARKERS = {
    "qwen": ("<|vision_start|>", "<|image_pad|>", "<|vision_end|>"),
    "gemma": ("<start_of_image>", "<image_soft_token>", "<end_of_image>"),
    "llama4": ("<|image_start|>", "<|image|>", "<|image_end|>"),
    "mistral": ("", "[IMG]", "[IMG_END]"),
    "ministral": ("", "[IMG]", "[IMG_END]"),
}


def markers_for(model_type: str) -> Tuple[str, str, str]:
    for fam, m in _MARKERS.items():
        if model_type.startswith(fam):
            return m
    return _MARKERS["qwen"]


def decode_image_source(url: str) -> Optional[bytes]:
    """`data:image/...;base64,<payload>` or a bare base64 string → bytes.
    Returns None for http(s) URLs (no egress)."""
    if url.startswith("data:"):
        _, _, payload = url.partition(",")
        return base64.b64decode(payload)
    if url.startswith(("http://", "https://")):
        return None
    try:
        return base64.b64decode(url, validate=True)
    except Exception:
        return None


def attach_image(st, data: bytes) -> Tuple[str, object]:
    """bytes → (placeholder text, ImageData) using the server's model
    config and marker set."""
    from vllm_rs_tpu.utils.image import preprocess_for_model

    cfg = st.engine.econfig.model
    img = preprocess_for_model(cfg, data)
    start, pad, end = st.image_markers
    return start + pad * img.num_tokens + end, img
