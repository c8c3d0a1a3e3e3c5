"""Model implementations.

Each architecture is a thin configuration of the shared functional layer
library (models/layers.py), mirroring how the reference's 16 architectures
share src/models/layers/ (SURVEY.md §2.3/2.4). Registry maps HF
`model_type` strings to model classes.
"""

from typing import Dict, Type

_REGISTRY: Dict[str, str] = {}


def register(model_type: str, cls_path: str) -> None:
    _REGISTRY[model_type] = cls_path


def get_model_class(model_type: str):
    import importlib

    # llama-family architectures share one implementation
    path = _REGISTRY.get(model_type)
    if path is None:
        raise ValueError(f"unsupported model_type {model_type!r}; known: {sorted(_REGISTRY)}")
    mod_name, cls_name = path.rsplit(":", 1)
    return getattr(importlib.import_module(mod_name), cls_name)


for _mt in ("llama", "mistral", "yi", "stablelm", "qwen2", "qwen3", "gemma", "gemma2", "gemma3_text", "phi3", "glm4"):
    register(_mt, "vllm_rs_tpu.models.llama:CausalLM")
# gemma3 multimodal checkpoints carry a vision_config; the VL class
# degrades to the plain text trunk when it is absent (gemma3/mod.rs)
register("gemma3", "vllm_rs_tpu.models.gemma3_vl:Gemma3VLForCausalLM")
for _mt in ("qwen2_moe", "qwen3_moe", "mixtral", "glm4_moe", "minimax"):
    register(_mt, "vllm_rs_tpu.models.qwen3_moe:MoECausalLM")
# vision-language family (qwen3_vl/)
for _mt in ("qwen2_vl", "qwen2_5_vl", "qwen3_vl", "qwen3_vl_moe"):
    register(_mt, "vllm_rs_tpu.models.qwen_vl:QwenVLForCausalLM")
# pixtral tower family (mistral3_vl/)
for _mt in ("mistral3", "ministral3", "pixtral"):
    register(_mt, "vllm_rs_tpu.models.mistral3_vl:Mistral3VLForCausalLM")
# hybrid GDN family (qwen3_5.rs / deltanet.rs)
for _mt in ("qwen3_next", "qwen3_5", "qwen3_5_moe"):
    register(_mt, "vllm_rs_tpu.models.qwen3_next:Qwen3NextForCausalLM")
# gemma4: heterogeneous per-layer KV dims (gemma4.rs)
for _mt in ("gemma4", "gemma4_text"):
    register(_mt, "vllm_rs_tpu.models.gemma4:Gemma4ForCausalLM")
# llama4: iRoPE + interleaved MoE (+ vision) (llama4/)
for _mt in ("llama4", "llama4_text"):
    register(_mt, "vllm_rs_tpu.models.llama4:Llama4ForCausalLM")
# MLA family (deepseek3.rs / glm4_moe_lite.rs)
for _mt in ("deepseek_v2", "deepseek_v3", "glm4_moe_lite", "kimi_k2"):
    register(_mt, "vllm_rs_tpu.models.deepseek3:DeepseekV3")
