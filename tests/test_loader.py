"""Checkpoint-loader round trip: pytree → HF safetensors layout → pytree."""

import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from safetensors.numpy import save_file

from vllm_rs_tpu.config import ModelConfig
from vllm_rs_tpu.models.layers import Linear
from vllm_rs_tpu.utils.loader import load_model, load_params


def _np(x):
    return np.asarray(jnp.asarray(x, dtype=jnp.float32))


def _save(sd, path):
    # safetensors serializes the raw buffer: materialize .T views first
    save_file({k: np.ascontiguousarray(v) for k, v in sd.items()}, str(path))


def _llama_to_hf(params, cfg) -> dict:
    """Inverse of the loader mapping for the dense llama family."""
    sd = {"model.embed_tokens.weight": _np(params["embed"]),
          "model.norm.weight": _np(params["final_norm"])}
    L = cfg.num_hidden_layers
    lp = params["layers"]
    names = {"q": "self_attn.q_proj", "k": "self_attn.k_proj",
             "v": "self_attn.v_proj", "o": "self_attn.o_proj",
             "gate": "mlp.gate_proj", "up": "mlp.up_proj", "down": "mlp.down_proj"}
    for i in range(L):
        p = f"model.layers.{i}"
        sd[f"{p}.input_layernorm.weight"] = _np(lp["input_ln"][i])
        sd[f"{p}.post_attention_layernorm.weight"] = _np(lp["post_ln"][i])
        if "gate_up" in lp:
            gu = _np(lp["gate_up"][i])
            I = gu.shape[1] // 2
            sd[f"{p}.mlp.gate_proj.weight"] = gu[:, :I].T
            sd[f"{p}.mlp.up_proj.weight"] = gu[:, I:].T
        for ours, hf in names.items():
            if ours not in lp:
                continue
            w = lp[ours]
            if isinstance(w, Linear):
                sd[f"{p}.{hf}.weight"] = _np(w.w[i]).T
                sd[f"{p}.{hf}.bias"] = _np(w.b[i])
            else:
                sd[f"{p}.{hf}.weight"] = _np(w[i]).T
        if cfg.qk_norm:
            sd[f"{p}.self_attn.q_norm.weight"] = _np(lp["q_norm"][i])
            sd[f"{p}.self_attn.k_norm.weight"] = _np(lp["k_norm"][i])
    if not cfg.tie_word_embeddings:
        sd["lm_head.weight"] = _np(params["lm_head"]).T
    return sd


@pytest.fixture
def tiny_cfg():
    return ModelConfig(
        model_type="qwen3",
        hidden_size=64,
        intermediate_size=96,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        vocab_size=128,
        qk_norm=True,
        attention_bias=True,
        eos_token_ids=(0,),
    )


class TestSafetensorsRoundTrip:
    def test_dense_exact(self, tiny_cfg, tmp_path):
        from vllm_rs_tpu.models.llama import CausalLM

        model = CausalLM(tiny_cfg)
        params = model.init_params(jax.random.PRNGKey(0))
        _save(_llama_to_hf(params, tiny_cfg), tmp_path / "model.safetensors")
        loaded = load_params(str(tmp_path), tiny_cfg)

        flat_a = jax.tree_util.tree_leaves_with_path(params)
        flat_b = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_leaves_with_path(loaded)}
        for k, v in flat_a:
            ks = jax.tree_util.keystr(k)
            assert ks in flat_b, ks
            np.testing.assert_allclose(
                _np(v), _np(flat_b[ks]), atol=1e-2, rtol=1e-2, err_msg=ks
            )

    def test_forward_equivalence(self, tiny_cfg, tmp_path):
        """Loaded params generate the same greedy tokens as the originals."""
        from vllm_rs_tpu.config import (
            CacheConfig,
            EngineConfig,
            SamplingParams,
            SchedulerConfig,
        )
        from vllm_rs_tpu.core.engine import LLMEngine
        from vllm_rs_tpu.core.runner import ModelRunner
        from vllm_rs_tpu.models.llama import CausalLM

        model = CausalLM(tiny_cfg, block_size=4)
        params = model.init_params(jax.random.PRNGKey(1))
        _save(_llama_to_hf(params, tiny_cfg), tmp_path / "model.safetensors")
        with open(tmp_path / "config.json", "w") as f:
            json.dump(
                {
                    "model_type": "qwen3",
                    "hidden_size": 64,
                    "intermediate_size": 96,
                    "num_hidden_layers": 2,
                    "num_attention_heads": 4,
                    "num_key_value_heads": 2,
                    "vocab_size": 128,
                    "attention_bias": True,
                    "rms_norm_eps": 1e-5,
                    "rope_theta": 10000.0,
                    "eos_token_id": 0,
                },
                f,
            )
        model2, params2 = load_model(str(tmp_path), block_size=4)

        def engine(m, p):
            ec = EngineConfig(
                model=m.config,
                cache=CacheConfig(block_size=4, num_blocks=32),
                scheduler=SchedulerConfig(
                    max_num_seqs=4, chunk_size=16, max_model_len=64, prefill_buckets=(8, 16)
                ),
                prefill_buckets=(8, 16),
                decode_buckets=(4,),
            )
            return LLMEngine(ec, ModelRunner(m, p, ec))

        sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
        out1 = engine(model, params).generate([[5, 6, 7, 8]], sp)
        out2 = engine(model2, params2).generate([[5, 6, 7, 8]], sp)
        assert out1[0].output_token_ids == out2[0].output_token_ids

    def test_quantize_on_load(self, tiny_cfg, tmp_path):
        from vllm_rs_tpu.models.llama import CausalLM
        from vllm_rs_tpu.quant.pack import PackedInt4Tensor

        model = CausalLM(tiny_cfg)
        params = model.init_params(jax.random.PRNGKey(0))
        _save(_llama_to_hf(params, tiny_cfg), tmp_path / "model.safetensors")
        loaded = load_params(str(tmp_path), tiny_cfg, quant="int4", quant_group=32)
        q = loaded["layers"]["q"]
        assert isinstance(q, Linear) and isinstance(q.w, PackedInt4Tensor)
        # K=64 divisible by group 32 → packed shape [L, K//2, N]
        assert q.w.qweight.shape == (2, 32, 4 * 16)


class TestMoEDeepseekLoad:
    def test_deepseek_moe_shapes(self, tmp_path):
        cfg = ModelConfig(
            model_type="deepseek_v3",
            hidden_size=32,
            intermediate_size=64,
            num_hidden_layers=2,
            num_attention_heads=2,
            num_key_value_heads=2,
            vocab_size=64,
            num_experts=4,
            num_experts_per_tok=2,
            moe_intermediate_size=16,
            shared_expert_intermediate_size=16,
            first_k_dense_replace=1,
            router_scoring="sigmoid",
            router_bias=True,
            kv_lora_rank=16,
            qk_nope_head_dim=8,
            qk_rope_head_dim=4,
            v_head_dim=8,
            eos_token_ids=(0,),
        )
        rs = np.random.RandomState(0)
        sd = {
            "model.embed_tokens.weight": rs.randn(64, 32).astype(np.float32),
            "model.norm.weight": np.ones(32, np.float32),
            "lm_head.weight": rs.randn(64, 32).astype(np.float32),
        }
        H, dn, dr, dv, R = 2, 8, 4, 8, 16
        for i in range(2):
            p = f"model.layers.{i}"
            sd[f"{p}.input_layernorm.weight"] = np.ones(32, np.float32)
            sd[f"{p}.post_attention_layernorm.weight"] = np.ones(32, np.float32)
            sd[f"{p}.self_attn.q_proj.weight"] = rs.randn(H * (dn + dr), 32).astype(np.float32)
            sd[f"{p}.self_attn.kv_a_proj_with_mqa.weight"] = rs.randn(R + dr, 32).astype(np.float32)
            sd[f"{p}.self_attn.kv_a_layernorm.weight"] = np.ones(R, np.float32)
            sd[f"{p}.self_attn.kv_b_proj.weight"] = rs.randn(H * (dn + dv), R).astype(np.float32)
            sd[f"{p}.self_attn.o_proj.weight"] = rs.randn(32, H * dv).astype(np.float32)
            if i == 0:  # dense prefix layer
                for n in ("gate", "up"):
                    sd[f"{p}.mlp.{n}_proj.weight"] = rs.randn(64, 32).astype(np.float32)
                sd[f"{p}.mlp.down_proj.weight"] = rs.randn(32, 64).astype(np.float32)
            else:
                sd[f"{p}.mlp.gate.weight"] = rs.randn(4, 32).astype(np.float32)
                sd[f"{p}.mlp.gate.e_score_correction_bias"] = rs.randn(4).astype(np.float32)
                for e in range(4):
                    for n in ("gate", "up"):
                        sd[f"{p}.mlp.experts.{e}.{n}_proj.weight"] = rs.randn(16, 32).astype(np.float32)
                    sd[f"{p}.mlp.experts.{e}.down_proj.weight"] = rs.randn(32, 16).astype(np.float32)
                for n in ("gate", "up"):
                    sd[f"{p}.mlp.shared_experts.{n}_proj.weight"] = rs.randn(16, 32).astype(np.float32)
                sd[f"{p}.mlp.shared_experts.down_proj.weight"] = rs.randn(32, 16).astype(np.float32)
        _save(sd, tmp_path / "model.safetensors")
        params = load_params(str(tmp_path), cfg)
        assert params["moe_layers"]["w_uk"].shape == (1, H, dn, R)
        assert params["moe_layers"]["w_uv"].shape == (1, H, R, dv)
        assert params["moe_layers"]["w_gate"].shape == (1, 4, 32, 16)
        assert params["moe_layers"]["router_bias"].shape == (1, 4)
        assert params["dense_layers"]["gate"].shape == (1, 32, 64)

        # and it runs
        from vllm_rs_tpu.models.deepseek3 import DeepseekV3
        from vllm_rs_tpu.ops.attn_meta import AttnMeta

        model = DeepseekV3(cfg, block_size=4)
        kv = model.init_kv_cache(type("C", (), {"num_slots": 32})())
        meta = AttnMeta(
            positions=jnp.zeros((1, 4), jnp.int32),
            slot_mapping=jnp.arange(4, dtype=jnp.int32)[None],
            block_tables=jnp.zeros((1, 8), jnp.int32),
            context_lens=jnp.full((1,), 4, jnp.int32),
            last_token_idx=jnp.full((1,), 3, jnp.int32),
        )
        kv, logits = model.step(params, jnp.asarray([[1, 2, 3, 4]], jnp.int32), meta, kv)
        assert logits.shape == (1, 64)
