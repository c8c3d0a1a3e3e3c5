"""Model acquisition: HF Hub ids → local checkpoint directories.

Counterpart of the reference's downloader.rs (SURVEY.md §2.6: model id →
safetensors/gguf + tokenizer/config/generation_config/chat-template,
auxiliary mmproj GGUF discovery, ModelPaths :8-47).

Local paths always resolve without network. Hub downloads go through
`huggingface_hub` when the environment has egress; in air-gapped
deployments (like the dev environment) a clear error tells the user to
pre-stage the checkpoint.
"""

from __future__ import annotations

import glob
import os
from dataclasses import dataclass, field
from typing import List, Optional


@dataclass
class ModelPaths:
    """Resolved artifact locations (reference downloader.rs ModelPaths)."""

    model_dir: str
    # .safetensors shards, or a single .gguf file
    weight_files: List[str] = field(default_factory=list)
    config: Optional[str] = None
    tokenizer: Optional[str] = None
    tokenizer_config: Optional[str] = None
    generation_config: Optional[str] = None
    chat_template: Optional[str] = None
    # auxiliary multimodal projector GGUF (reference mmproj discovery)
    mmproj: Optional[str] = None

    @property
    def is_gguf(self) -> bool:
        return len(self.weight_files) == 1 and self.weight_files[0].endswith(".gguf")


_AUX = {
    "config": "config.json",
    "tokenizer": "tokenizer.json",
    "tokenizer_config": "tokenizer_config.json",
    "generation_config": "generation_config.json",
    "chat_template": "chat_template.jinja",
}


def _resolve_dir(d: str) -> ModelPaths:
    weights = sorted(glob.glob(os.path.join(d, "*.safetensors")))
    if not weights:
        weights = sorted(glob.glob(os.path.join(d, "*.gguf")))
        # mmproj GGUFs are aux files, not the model
        weights = [w for w in weights if "mmproj" not in os.path.basename(w).lower()]
    mp = ModelPaths(model_dir=d, weight_files=weights)
    for attr, name in _AUX.items():
        p = os.path.join(d, name)
        if os.path.exists(p):
            setattr(mp, attr, p)
    aux = glob.glob(os.path.join(d, "*mmproj*.gguf"))
    if aux:
        mp.mmproj = aux[0]
    return mp


def resolve_model(
    model: str,
    *,
    revision: str = "main",
    cache_dir: Optional[str] = None,
    allow_patterns: Optional[List[str]] = None,
) -> ModelPaths:
    """Local file/dir → resolved as-is; otherwise treat as an HF Hub id and
    download (requires network). Mirrors the reference's CLI `--m <id>` /
    `--w <path>` duality (downloader.rs)."""
    if os.path.isdir(model):
        return _resolve_dir(model)
    if os.path.isfile(model) and model.endswith(".gguf"):
        mp = _resolve_dir(os.path.dirname(model) or ".")
        mp.weight_files = [model]
        return mp
    try:
        from huggingface_hub import snapshot_download
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            f"{model!r} is not a local path and huggingface_hub is not "
            "installed; pre-stage the checkpoint directory"
        ) from e
    try:
        d = snapshot_download(
            model,
            revision=revision,
            cache_dir=cache_dir,
            allow_patterns=allow_patterns
            or ["*.safetensors", "*.json", "*.jinja", "*.gguf", "tokenizer.model"],
        )
    except Exception as e:
        raise RuntimeError(
            f"cannot download {model!r} (no network egress?); pre-stage the "
            f"checkpoint and pass its local path: {e}"
        ) from e
    return _resolve_dir(d)
