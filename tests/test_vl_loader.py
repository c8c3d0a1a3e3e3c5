"""VL checkpoint loading: real HF tensor layouts → vision tower pytree.

Synthetic checkpoints written in the exact shard names the reference loads
(qwen3_vl/vision.rs:660-735: model.visual.patch_embed.proj conv3d,
pos_embed, blocks.N.{norm,attn,mlp.linear_fc*}, merger, deepstack_merger_list;
plus the qwen2.5-VL variant: visual. prefix, gated mlp, merger.ln_q/mlp.N),
then driven end-to-end through encode_image and the engine.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_loader import _save
from vllm_rs_tpu.config import (
    CacheConfig,
    EngineConfig,
    ModelConfig,
    SamplingParams,
    SchedulerConfig,
)
from vllm_rs_tpu.core.engine import LLMEngine
from vllm_rs_tpu.core.runner import ModelRunner
from vllm_rs_tpu.models.qwen_vl import QwenVLForCausalLM
from vllm_rs_tpu.models.vision import bilinear_pos_embed
from vllm_rs_tpu.utils.loader import load_params

W_VIS = 32  # vision width
PS = 8  # patch size
HF_CFG = {
    "model_type": "qwen3_vl",
    "image_token_id": 100,
    "text_config": {
        "hidden_size": 64,
        "intermediate_size": 96,
        "num_hidden_layers": 2,
        "num_attention_heads": 4,
        "num_key_value_heads": 2,
        "vocab_size": 256,
        "rms_norm_eps": 1e-6,
        "rope_theta": 10000.0,
        "eos_token_id": 0,
    },
    "vision_config": {
        "depth": 2,
        "hidden_size": W_VIS,
        "num_heads": 4,
        "intermediate_size": 64,
        "patch_size": PS,
        "spatial_merge_size": 2,
        "temporal_patch_size": 2,
        "out_hidden_size": 64,
        "num_position_embeddings": 16,  # 4x4 learned grid
        "deepstack_visual_indexes": [0, 1],
    },
}


def _rng_tensors(rng, spec):
    return {k: rng.randn(*shape).astype(np.float32) * 0.05 for k, shape in spec.items()}


def _text_sd(rng, pre, cfg):
    D, I = cfg["hidden_size"], cfg["intermediate_size"]
    Hq, Hk = cfg["num_attention_heads"], cfg["num_key_value_heads"]
    Dh = D // Hq
    V, L = cfg["vocab_size"], cfg["num_hidden_layers"]
    sd = _rng_tensors(rng, {f"{pre}.embed_tokens.weight": (V, D)})
    sd[f"{pre}.norm.weight"] = np.ones((D,), np.float32)
    for i in range(L):
        p = f"{pre}.layers.{i}"
        sd.update(_rng_tensors(rng, {
            f"{p}.self_attn.q_proj.weight": (Hq * Dh, D),
            f"{p}.self_attn.k_proj.weight": (Hk * Dh, D),
            f"{p}.self_attn.v_proj.weight": (Hk * Dh, D),
            f"{p}.self_attn.o_proj.weight": (D, Hq * Dh),
            f"{p}.mlp.gate_proj.weight": (I, D),
            f"{p}.mlp.up_proj.weight": (I, D),
            f"{p}.mlp.down_proj.weight": (D, I),
        }))
        sd[f"{p}.input_layernorm.weight"] = np.ones((D,), np.float32)
        sd[f"{p}.post_attention_layernorm.weight"] = np.ones((D,), np.float32)
    sd["lm_head.weight"] = rng.randn(V, D).astype(np.float32) * 0.05
    return sd


def _vision_sd_qwen3(rng, vp="model.visual"):
    vc = HF_CFG["vision_config"]
    W, M, out = vc["hidden_size"], vc["intermediate_size"], vc["out_hidden_size"]
    merged = W * 4
    sd = _rng_tensors(rng, {
        f"{vp}.patch_embed.proj.weight": (W, 3, 2, PS, PS),  # conv3d
        f"{vp}.patch_embed.proj.bias": (W,),
        f"{vp}.pos_embed.weight": (vc["num_position_embeddings"], W),
        f"{vp}.merger.linear_fc1.weight": (merged, merged),
        f"{vp}.merger.linear_fc1.bias": (merged,),
        f"{vp}.merger.linear_fc2.weight": (out, merged),
        f"{vp}.merger.linear_fc2.bias": (out,),
    })
    sd[f"{vp}.merger.norm.weight"] = np.ones((W,), np.float32)
    sd[f"{vp}.merger.norm.bias"] = np.zeros((W,), np.float32)
    for i in range(vc["depth"]):
        p = f"{vp}.blocks.{i}"
        sd.update(_rng_tensors(rng, {
            f"{p}.attn.qkv.weight": (3 * W, W),
            f"{p}.attn.qkv.bias": (3 * W,),
            f"{p}.attn.proj.weight": (W, W),
            f"{p}.attn.proj.bias": (W,),
            f"{p}.mlp.linear_fc1.weight": (M, W),
            f"{p}.mlp.linear_fc1.bias": (M,),
            f"{p}.mlp.linear_fc2.weight": (W, M),
            f"{p}.mlp.linear_fc2.bias": (W,),
        }))
        for n in ("norm1", "norm2"):
            sd[f"{p}.{n}.weight"] = np.ones((W,), np.float32)
            sd[f"{p}.{n}.bias"] = np.zeros((W,), np.float32)
    for i in range(len(vc["deepstack_visual_indexes"])):
        p = f"{vp}.deepstack_merger_list.{i}"
        sd.update(_rng_tensors(rng, {
            f"{p}.linear_fc1.weight": (merged, merged),
            f"{p}.linear_fc1.bias": (merged,),
            f"{p}.linear_fc2.weight": (out, merged),
            f"{p}.linear_fc2.bias": (out,),
        }))
        sd[f"{p}.norm.weight"] = np.ones((merged,), np.float32)
        sd[f"{p}.norm.bias"] = np.zeros((merged,), np.float32)
    return sd


def _write_ckpt(tmp_path, sd, cfg_dict):
    _save(sd, tmp_path / "model.safetensors")
    (tmp_path / "config.json").write_text(json.dumps(cfg_dict))


def test_bilinear_pos_embed_identity():
    """grid == stored side → exact table rows."""
    table = jnp.asarray(np.random.RandomState(0).randn(16, 8).astype(np.float32))
    out = bilinear_pos_embed(table, 4, 4, 4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(table), rtol=1e-6)


def test_temporal_conv_sum_equivalence():
    """Summing conv3d weights over the temporal axis equals running the
    conv on an image repeated temporal_patch_size times."""
    rng = np.random.RandomState(1)
    w = rng.randn(5, 3, 2, 4, 4).astype(np.float32)  # [W, C, T, ps, ps]
    patch = rng.randn(3, 4, 4).astype(np.float32)
    frames = np.stack([patch, patch], axis=1)  # repeated temporal frames
    direct = np.einsum("cthw,octhw->o", frames, w)
    summed = np.einsum("chw,ochw->o", patch, w.sum(axis=2))
    np.testing.assert_allclose(direct, summed, rtol=1e-5)


def test_qwen3_vl_checkpoint_roundtrip(tmp_path):
    rng = np.random.RandomState(2)
    sd = {**_text_sd(rng, "model.language_model", HF_CFG["text_config"]),
          **_vision_sd_qwen3(rng)}
    _write_ckpt(tmp_path, sd, HF_CFG)
    cfg = ModelConfig.from_hf_dict(json.loads((tmp_path / "config.json").read_text()))
    assert cfg.extra_get("vision_width") == W_VIS
    assert cfg.extra_get("deepstack_visual_indexes") == (0, 1)
    model = QwenVLForCausalLM(cfg, block_size=4)
    params = load_params(str(tmp_path), cfg)
    assert "vision" in params
    vp = params["vision"]
    assert vp["patch_embed"].shape == (3 * PS * PS, W_VIS)
    assert vp["pos_embed"].shape == (16, W_VIS)
    assert vp["blocks"]["qkv"].shape == (2, W_VIS, 3 * W_VIS)
    assert "ds_fc2" in vp and vp["ds_fc2"].shape[0] == 2

    # encode a 2x2-merge 4x4-patch image end to end
    class Img:
        patches = rng.randn(16, 3 * PS * PS).astype(np.float32)
        grid = (4, 4)

    emb, ds = model.encode_image(params, Img())
    assert emb.shape == (4, 64) and ds.shape == (2, 4, 64)
    assert np.all(np.isfinite(emb)) and np.all(np.isfinite(ds))


def test_qwen25_vl_checkpoint_gated_mlp(tmp_path):
    """qwen2.5-VL layout: bare `visual.` prefix, gated silu MLP, ln_q/mlp.N
    merger names, no pos_embed / deepstack."""
    rng = np.random.RandomState(3)
    cfg_dict = {
        "model_type": "qwen2_5_vl",
        "image_token_id": 100,
        **HF_CFG["text_config"],
        "vision_config": {
            "depth": 2, "hidden_size": W_VIS, "num_heads": 4,
            "intermediate_size": 64, "patch_size": PS,
            "spatial_merge_size": 2, "out_hidden_size": 64,
        },
    }
    vp = "visual"
    W, M, merged = W_VIS, 64, W_VIS * 4
    sd = _text_sd(rng, "model", HF_CFG["text_config"])
    sd.update(_rng_tensors(rng, {
        f"{vp}.patch_embed.proj.weight": (W, 3, 2, PS, PS),
        f"{vp}.merger.mlp.0.weight": (merged, merged),
        f"{vp}.merger.mlp.0.bias": (merged,),
        f"{vp}.merger.mlp.2.weight": (64, merged),
        f"{vp}.merger.mlp.2.bias": (64,),
    }))
    sd[f"{vp}.merger.ln_q.weight"] = np.ones((W,), np.float32)
    sd[f"{vp}.merger.ln_q.bias"] = np.zeros((W,), np.float32)
    for i in range(2):
        p = f"{vp}.blocks.{i}"
        sd.update(_rng_tensors(rng, {
            f"{p}.attn.qkv.weight": (3 * W, W),
            f"{p}.attn.qkv.bias": (3 * W,),
            f"{p}.attn.proj.weight": (W, W),
            f"{p}.attn.proj.bias": (W,),
            f"{p}.mlp.gate_proj.weight": (M, W),
            f"{p}.mlp.gate_proj.bias": (M,),
            f"{p}.mlp.up_proj.weight": (M, W),
            f"{p}.mlp.up_proj.bias": (M,),
            f"{p}.mlp.down_proj.weight": (W, M),
            f"{p}.mlp.down_proj.bias": (W,),
        }))
        for n in ("norm1", "norm2"):
            sd[f"{p}.{n}.weight"] = np.ones((W,), np.float32)
            sd[f"{p}.{n}.bias"] = np.zeros((W,), np.float32)
    _write_ckpt(tmp_path, sd, cfg_dict)
    cfg = ModelConfig.from_hf_dict(cfg_dict)
    model = QwenVLForCausalLM(cfg, block_size=4)
    params = load_params(str(tmp_path), cfg)
    assert "gate" in params["vision"]["blocks"]

    class Img:
        patches = rng.randn(16, 3 * PS * PS).astype(np.float32)
        grid = (4, 4)

    emb = model.encode_image(params, Img())
    assert emb.shape == (4, 64) and np.all(np.isfinite(emb))


GEMMA3_CFG = {
    "model_type": "gemma3",
    "image_token_index": 100,
    "mm_tokens_per_image": 4,
    "text_config": {
        "hidden_size": 64,
        "intermediate_size": 96,
        "num_hidden_layers": 2,
        "num_attention_heads": 4,
        "num_key_value_heads": 2,
        "head_dim": 16,
        "vocab_size": 256,
        "rms_norm_eps": 1e-6,
        "rope_theta": 10000.0,
        "eos_token_id": 0,
        "tie_word_embeddings": True,
        "hidden_activation": "gelu_pytorch_tanh",
    },
    "vision_config": {
        "hidden_size": 24,
        "intermediate_size": 48,
        "num_hidden_layers": 2,
        "num_attention_heads": 4,
        "patch_size": 8,
        "image_size": 32,  # 4x4 patch grid → pool 2 → 4 soft tokens
    },
}


def _gemma3_sd(rng):
    tc, vc = GEMMA3_CFG["text_config"], GEMMA3_CFG["vision_config"]
    D, I, Dh = tc["hidden_size"], tc["intermediate_size"], tc["head_dim"]
    Hq, Hk = tc["num_attention_heads"], tc["num_key_value_heads"]
    pre = "language_model.model"
    sd = _rng_tensors(rng, {f"{pre}.embed_tokens.weight": (tc["vocab_size"], D)})
    sd[f"{pre}.norm.weight"] = np.zeros((D,), np.float32)  # (w+1) identity
    for i in range(tc["num_hidden_layers"]):
        p = f"{pre}.layers.{i}"
        sd.update(_rng_tensors(rng, {
            f"{p}.self_attn.q_proj.weight": (Hq * Dh, D),
            f"{p}.self_attn.k_proj.weight": (Hk * Dh, D),
            f"{p}.self_attn.v_proj.weight": (Hk * Dh, D),
            f"{p}.self_attn.o_proj.weight": (D, Hq * Dh),
            f"{p}.mlp.gate_proj.weight": (I, D),
            f"{p}.mlp.up_proj.weight": (I, D),
            f"{p}.mlp.down_proj.weight": (D, I),
        }))
        for n in (
            "input_layernorm", "post_attention_layernorm",
            "pre_feedforward_layernorm", "post_feedforward_layernorm",
        ):
            sd[f"{p}.{n}.weight"] = np.zeros((D,), np.float32)
        sd[f"{p}.self_attn.q_norm.weight"] = np.zeros((Dh,), np.float32)
        sd[f"{p}.self_attn.k_norm.weight"] = np.zeros((Dh,), np.float32)
    # vision tower (siglip names)
    W, M = vc["hidden_size"], vc["intermediate_size"]
    ps = vc["patch_size"]
    g = vc["image_size"] // ps
    vp = "vision_tower.vision_model"
    sd.update(_rng_tensors(rng, {
        f"{vp}.embeddings.patch_embedding.weight": (W, 3, ps, ps),
        f"{vp}.embeddings.patch_embedding.bias": (W,),
        f"{vp}.embeddings.position_embedding.weight": (g * g, W),
    }))
    sd[f"{vp}.post_layernorm.weight"] = np.ones((W,), np.float32)
    sd[f"{vp}.post_layernorm.bias"] = np.zeros((W,), np.float32)
    for i in range(vc["num_hidden_layers"]):
        p = f"{vp}.encoder.layers.{i}"
        sd.update(_rng_tensors(rng, {
            f"{p}.self_attn.q_proj.weight": (W, W),
            f"{p}.self_attn.q_proj.bias": (W,),
            f"{p}.self_attn.k_proj.weight": (W, W),
            f"{p}.self_attn.k_proj.bias": (W,),
            f"{p}.self_attn.v_proj.weight": (W, W),
            f"{p}.self_attn.v_proj.bias": (W,),
            f"{p}.self_attn.out_proj.weight": (W, W),
            f"{p}.self_attn.out_proj.bias": (W,),
            f"{p}.mlp.fc1.weight": (M, W),
            f"{p}.mlp.fc1.bias": (M,),
            f"{p}.mlp.fc2.weight": (W, M),
            f"{p}.mlp.fc2.bias": (W,),
        }))
        for n in ("layer_norm1", "layer_norm2"):
            sd[f"{p}.{n}.weight"] = np.ones((W,), np.float32)
            sd[f"{p}.{n}.bias"] = np.zeros((W,), np.float32)
    sd["multi_modal_projector.mm_input_projection_weight"] = (
        rng.randn(W, D).astype(np.float32) * 0.05
    )
    sd["multi_modal_projector.mm_soft_emb_norm.weight"] = np.zeros((W,), np.float32)
    return sd


def test_gemma3_vl_checkpoint_roundtrip(tmp_path):
    from vllm_rs_tpu.models.gemma3_vl import Gemma3VLForCausalLM
    from vllm_rs_tpu.utils.image import preprocess_image_fixed

    rng = np.random.RandomState(5)
    _write_ckpt(tmp_path, _gemma3_sd(rng), GEMMA3_CFG)
    cfg = ModelConfig.from_hf_dict(json.loads((tmp_path / "config.json").read_text()))
    assert cfg.extra_get("image_token_id") == 100
    assert cfg.extra_get("vision_image_size") == 32
    model = Gemma3VLForCausalLM(cfg, block_size=4)
    assert model.has_vision and model.pool_k == 2
    params = load_params(str(tmp_path), cfg)
    assert "mm_proj" in params and params["vision"]["blocks"]["q"].shape == (2, 24, 24)

    # real PNG through the fixed-size preprocessing path
    import io
    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (50, 40), (0, 120, 255)).save(buf, format="PNG")
    img = preprocess_image_fixed(
        buf.getvalue(), image_size=32, patch_size=8, num_tokens=4
    )
    assert img.patches.shape == (16, 3 * 64) and img.num_tokens == 4
    emb = model.encode_image(params, img)
    assert emb.shape == (4, 64) and np.all(np.isfinite(emb))

    # end-to-end generation with spliced soft tokens
    ecfg = EngineConfig(
        model=cfg, cache=CacheConfig(block_size=4, num_blocks=64),
        scheduler=SchedulerConfig(max_num_seqs=4, chunk_size=32, max_model_len=128,
                                  prefill_buckets=(8, 16)),
        prefill_buckets=(8, 16), decode_buckets=(2, 4),
    )
    engine = LLMEngine(ecfg, ModelRunner(model, params, ecfg))
    prompt = [1, 2, 100, 100, 100, 100, 3]
    sid = engine.add_request(
        prompt, SamplingParams(temperature=0.0, max_tokens=3, ignore_eos=True),
        images=[img],
    )
    while not engine.requests[sid].seq.is_finished:
        engine.step()
    assert len(engine.requests[sid].seq.output_token_ids) == 3


MISTRAL3_CFG = {
    "model_type": "mistral3",
    "image_token_index": 10,
    "spatial_merge_size": 2,
    "multimodal_projector_bias": False,
    "text_config": {
        "model_type": "mistral",
        "hidden_size": 64,
        "intermediate_size": 96,
        "num_hidden_layers": 2,
        "num_attention_heads": 4,
        "num_key_value_heads": 2,
        "vocab_size": 256,
        "rms_norm_eps": 1e-5,
        "rope_theta": 10000.0,
        "eos_token_id": 0,
    },
    "vision_config": {
        "hidden_size": 32,
        "num_attention_heads": 2,
        "head_dim": 16,
        "intermediate_size": 64,
        "patch_size": 8,
        "rope_theta": 10000.0,
        "num_hidden_layers": 2,
        "image_size": 64,
    },
}


def test_mistral3_pixtral_checkpoint_roundtrip(tmp_path):
    from vllm_rs_tpu.models.mistral3_vl import Mistral3VLForCausalLM

    rng = np.random.RandomState(6)
    tc, vc = MISTRAL3_CFG["text_config"], MISTRAL3_CFG["vision_config"]
    sd = _text_sd(rng, "language_model.model", tc)
    W, M, A = vc["hidden_size"], vc["intermediate_size"], 2 * 16
    vp = "vision_tower"
    sd.update(_rng_tensors(rng, {
        f"{vp}.patch_conv.weight": (W, 3, 8, 8),
    }))
    sd[f"{vp}.ln_pre.weight"] = np.ones((W,), np.float32)
    for i in range(2):
        p = f"{vp}.transformer.layers.{i}"
        sd.update(_rng_tensors(rng, {
            f"{p}.attention.q_proj.weight": (A, W),
            f"{p}.attention.k_proj.weight": (A, W),
            f"{p}.attention.v_proj.weight": (A, W),
            f"{p}.attention.o_proj.weight": (W, A),
            f"{p}.feed_forward.gate_proj.weight": (M, W),
            f"{p}.feed_forward.up_proj.weight": (M, W),
            f"{p}.feed_forward.down_proj.weight": (W, M),
        }))
        sd[f"{p}.attention_norm.weight"] = np.ones((W,), np.float32)
        sd[f"{p}.ffn_norm.weight"] = np.ones((W,), np.float32)
    D = tc["hidden_size"]
    sd.update(_rng_tensors(rng, {
        "multi_modal_projector.patch_merger.merging_layer.weight": (W, W * 4),
        "multi_modal_projector.linear_1.weight": (D, W),
        "multi_modal_projector.linear_2.weight": (D, D),
    }))
    sd["multi_modal_projector.norm.weight"] = np.ones((W,), np.float32)
    _write_ckpt(tmp_path, sd, MISTRAL3_CFG)
    cfg = ModelConfig.from_hf_dict(json.loads((tmp_path / "config.json").read_text()))
    assert cfg.extra_get("image_token_id") == 10
    assert cfg.extra_get("vision_head_dim") == 16
    model = Mistral3VLForCausalLM(cfg, block_size=4)
    assert model.has_vision and model.merge == 2
    params = load_params(str(tmp_path), cfg)
    assert params["vision"]["blocks"]["q"].shape == (2, W, A)
    assert params["mm_merge"].shape == (W * 4, W)

    class Img:
        patches = np.random.RandomState(8).randn(4 * 6, 3 * 64).astype(np.float32)
        grid = (4, 6)
        num_tokens = 6  # (4/2)*(6/2)
        seed = 9

    emb = model.encode_image(params, Img())
    assert emb.shape == (6, D) and np.all(np.isfinite(emb))

    ecfg = EngineConfig(
        model=cfg, cache=CacheConfig(block_size=4, num_blocks=64),
        scheduler=SchedulerConfig(max_num_seqs=4, chunk_size=32, max_model_len=128,
                                  prefill_buckets=(16,)),
        prefill_buckets=(16,), decode_buckets=(2,),
    )
    engine = LLMEngine(ecfg, ModelRunner(model, params, ecfg))
    prompt = [1, 2] + [10] * 6 + [3]
    sid = engine.add_request(
        prompt, SamplingParams(temperature=0.0, max_tokens=3, ignore_eos=True),
        images=[Img()],
    )
    while not engine.requests[sid].seq.is_finished:
        engine.step()
    assert len(engine.requests[sid].seq.output_token_ids) == 3


LLAMA4_CFG = {
    "model_type": "llama4",
    "image_token_index": 20,
    "text_config": {
        "model_type": "llama4_text",
        "hidden_size": 64,
        "intermediate_size": 48,
        "intermediate_size_mlp": 96,
        "num_hidden_layers": 2,
        "num_attention_heads": 4,
        "num_key_value_heads": 2,
        "head_dim": 16,
        "vocab_size": 256,
        "rms_norm_eps": 1e-5,
        "rope_theta": 10000.0,
        "num_local_experts": 2,
        "num_experts_per_tok": 1,
        "interleave_moe_layer_step": 2,
        "attention_chunk_size": 8,
        "eos_token_id": 0,
    },
    "vision_config": {
        "hidden_size": 32,
        "num_attention_heads": 2,
        "intermediate_size": 128,  # equals shuffled dim 32/0.25
        "patch_size": 8,
        "image_size": 32,  # 4x4 grid → 2x2 after shuffle
        "num_hidden_layers": 2,
        "vision_output_dim": 48,
        "rope_theta": 10000.0,
    },
}


def test_llama4_checkpoint_roundtrip(tmp_path):
    from vllm_rs_tpu.models.llama4 import Llama4ForCausalLM

    rng = np.random.RandomState(9)
    tc = LLAMA4_CFG["text_config"]
    D, Dh = tc["hidden_size"], tc["head_dim"]
    Hq, Hk = tc["num_attention_heads"], tc["num_key_value_heads"]
    pre = "language_model.model"
    sd = _rng_tensors(rng, {f"{pre}.embed_tokens.weight": (tc["vocab_size"], D)})
    sd[f"{pre}.norm.weight"] = np.ones((D,), np.float32)
    sd["language_model.lm_head.weight"] = rng.randn(tc["vocab_size"], D).astype(np.float32) * 0.05
    for i in range(2):
        p = f"{pre}.layers.{i}"
        sd.update(_rng_tensors(rng, {
            f"{p}.self_attn.q_proj.weight": (Hq * Dh, D),
            f"{p}.self_attn.k_proj.weight": (Hk * Dh, D),
            f"{p}.self_attn.v_proj.weight": (Hk * Dh, D),
            f"{p}.self_attn.o_proj.weight": (D, Hq * Dh),
        }))
        sd[f"{p}.input_layernorm.weight"] = np.ones((D,), np.float32)
        sd[f"{p}.post_attention_layernorm.weight"] = np.ones((D,), np.float32)
        if i == 1:  # MoE layer ((i+1) % 2 == 0)
            I = tc["intermediate_size"]
            sd.update(_rng_tensors(rng, {
                f"{p}.feed_forward.router.weight": (2, D),
                f"{p}.feed_forward.experts.gate_up_proj": (2, D, 2 * I),
                f"{p}.feed_forward.experts.down_proj": (2, I, D),
                f"{p}.feed_forward.shared_expert.gate_proj.weight": (I, D),
                f"{p}.feed_forward.shared_expert.up_proj.weight": (I, D),
                f"{p}.feed_forward.shared_expert.down_proj.weight": (D, I),
            }))
        else:
            M = tc["intermediate_size_mlp"]
            sd.update(_rng_tensors(rng, {
                f"{p}.feed_forward.gate_proj.weight": (M, D),
                f"{p}.feed_forward.up_proj.weight": (M, D),
                f"{p}.feed_forward.down_proj.weight": (D, M),
            }))
    # vision (llama4/vision.rs names)
    vc = LLAMA4_CFG["vision_config"]
    W, M = vc["hidden_size"], vc["intermediate_size"]
    g = vc["image_size"] // vc["patch_size"]
    vp = "vision_model"
    sd.update(_rng_tensors(rng, {
        f"{vp}.patch_embedding.linear.weight": (W, 3 * 64),
        f"{vp}.class_embedding": (W,),
        f"{vp}.positional_embedding_vlm": (g * g + 1, W),
        f"{vp}.vision_adapter.mlp.fc1.weight": (vc["vision_output_dim"], W * 4),
        f"{vp}.vision_adapter.mlp.fc2.weight": (vc["vision_output_dim"], vc["vision_output_dim"]),
    }))
    for n in ("layernorm_pre", "layernorm_post"):
        sd[f"{vp}.{n}.weight"] = np.ones((W,), np.float32)
        sd[f"{vp}.{n}.bias"] = np.zeros((W,), np.float32)
    for i in range(2):
        p = f"{vp}.model.layers.{i}"
        sd.update(_rng_tensors(rng, {
            f"{p}.self_attn.q_proj.weight": (W, W),
            f"{p}.self_attn.q_proj.bias": (W,),
            f"{p}.self_attn.k_proj.weight": (W, W),
            f"{p}.self_attn.k_proj.bias": (W,),
            f"{p}.self_attn.v_proj.weight": (W, W),
            f"{p}.self_attn.v_proj.bias": (W,),
            f"{p}.self_attn.o_proj.weight": (W, W),
            f"{p}.self_attn.o_proj.bias": (W,),
            f"{p}.mlp.fc1.weight": (M, W),
            f"{p}.mlp.fc1.bias": (M,),
            f"{p}.mlp.fc2.weight": (W, M),
            f"{p}.mlp.fc2.bias": (W,),
        }))
        for n in ("input_layernorm", "post_attention_layernorm"):
            sd[f"{p}.{n}.weight"] = np.ones((W,), np.float32)
            sd[f"{p}.{n}.bias"] = np.zeros((W,), np.float32)
    sd.update(_rng_tensors(rng, {
        "multi_modal_projector.linear_1.weight": (D, vc["vision_output_dim"]),
    }))
    _write_ckpt(tmp_path, sd, LLAMA4_CFG)
    cfg = ModelConfig.from_hf_dict(json.loads((tmp_path / "config.json").read_text()))
    assert cfg.extra_get("image_token_id") == 20
    model = Llama4ForCausalLM(cfg, block_size=4)
    assert model.is_moe_layer == (False, True) and model.has_vision
    params = load_params(str(tmp_path), cfg)
    assert params["layers"][1]["w_gate"].shape == (2, 64, 48)
    assert "lm_head" in params

    class Img:
        patches = rng.randn(g * g, 3 * 64).astype(np.float32)
        grid = (g, g)
        num_tokens = (g // 2) ** 2  # pixel shuffle r=0.5 → 4x fewer
        seed = 3

    emb = model.encode_image(params, Img())
    assert emb.shape == (4, D) and np.all(np.isfinite(emb))

    ecfg = EngineConfig(
        model=cfg, cache=CacheConfig(block_size=4, num_blocks=64),
        scheduler=SchedulerConfig(max_num_seqs=4, chunk_size=32, max_model_len=128,
                                  prefill_buckets=(16,)),
        prefill_buckets=(16,), decode_buckets=(2,),
    )
    engine = LLMEngine(ecfg, ModelRunner(model, params, ecfg))
    prompt = [1, 2] + [20] * 4 + [3]
    sid = engine.add_request(
        prompt, SamplingParams(temperature=0.0, max_tokens=3, ignore_eos=True),
        images=[Img()],
    )
    while not engine.requests[sid].seq.is_finished:
        engine.step()
    assert len(engine.requests[sid].seq.output_token_ids) == 3


def test_vl_checkpoint_generates_with_image(tmp_path):
    rng = np.random.RandomState(4)
    sd = {**_text_sd(rng, "model.language_model", HF_CFG["text_config"]),
          **_vision_sd_qwen3(rng)}
    _write_ckpt(tmp_path, sd, HF_CFG)
    cfg = ModelConfig.from_hf_dict(json.loads((tmp_path / "config.json").read_text()))
    model = QwenVLForCausalLM(cfg, block_size=4)
    params = load_params(str(tmp_path), cfg)
    ecfg = EngineConfig(
        model=cfg, cache=CacheConfig(block_size=4, num_blocks=64),
        scheduler=SchedulerConfig(max_num_seqs=4, chunk_size=32, max_model_len=128,
                                  prefill_buckets=(8, 16)),
        prefill_buckets=(8, 16), decode_buckets=(2, 4),
    )
    engine = LLMEngine(ecfg, ModelRunner(model, params, ecfg))

    class Img:
        patches = rng.randn(16, 3 * PS * PS).astype(np.float32)
        grid = (4, 4)
        num_tokens = 4
        seed = 7

    prompt = [1, 2, 100, 100, 100, 100, 3]  # 4 image placeholders
    sid = engine.add_request(
        prompt, SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True),
        images=[Img()],
    )
    while not engine.requests[sid].seq.is_finished:
        engine.step()
    assert len(engine.requests[sid].seq.output_token_ids) == 4
