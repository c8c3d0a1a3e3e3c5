"""Rope scaling: dynamic NTK tables and the CLI YaRN override
(reference rotary_emb.rs:172-435, utils/mod.rs:640-706)."""

import math

import numpy as np

from vllm_rs_tpu.config import ModelConfig
from vllm_rs_tpu.ops.rope import rope_inv_freq


def _cfg(rope_scaling=None, max_pos=128, theta=10000.0):
    return ModelConfig(
        model_type="llama", hidden_size=64, intermediate_size=128,
        num_hidden_layers=1, num_attention_heads=4, num_key_value_heads=2,
        vocab_size=64, max_position_embeddings=max_pos, rope_theta=theta,
        rope_scaling=rope_scaling, eos_token_ids=(0,),
    )


class TestDynamicNtk:
    def test_scales_base(self):
        """factor=2 over orig=64 at max_pos=128 → base' per the NTK-alpha
        closed form, frozen at the extended serving length."""
        rs = (("rope_type", "dynamic"), ("factor", 2.0),
              ("original_max_position_embeddings", 64))
        inv = np.asarray(rope_inv_freq(_cfg(rope_scaling=rs)))
        rd = 16  # head_dim = 64/4
        alpha = 2.0 * 128 / 64 - 1.0  # factor * target/orig - (factor-1)
        base = 10000.0 * alpha ** (rd / (rd - 2))
        expect = 1.0 / base ** (np.arange(0, rd, 2, dtype=np.float32) / rd)
        np.testing.assert_allclose(inv, expect, rtol=1e-6)

    def test_noop_within_original(self):
        """No scaling when the serving length fits the original context."""
        rs = (("rope_type", "dynamic"), ("factor", 2.0),
              ("original_max_position_embeddings", 128))
        inv = np.asarray(rope_inv_freq(_cfg(rope_scaling=rs, max_pos=128)))
        plain = np.asarray(rope_inv_freq(_cfg()))
        np.testing.assert_allclose(inv, plain)


class TestDynamicNtkPerRow:
    """True HF `dynamic` semantics in-graph (rotary_emb.rs:284): per-row
    table from the row's KV length; unscaled at/below the original
    context — the attention path uses this, not the frozen table."""

    def test_short_context_unscaled(self):
        from vllm_rs_tpu.ops.rope import dynamic_ntk_inv_freq

        # HF convention: no original_max_position_embeddings → max_pos IS
        # the original context; positions inside it get NO scaling
        rs = (("rope_type", "dynamic"), ("factor", 2.0))
        cfg = _cfg(rope_scaling=rs, max_pos=128)
        pos = np.array([[0, 1, 2, 3]], dtype=np.int32)
        inv = np.asarray(dynamic_ntk_inv_freq(cfg, pos))
        plain = np.asarray(rope_inv_freq(_cfg()))
        assert inv.shape == (1, 8)
        np.testing.assert_allclose(inv[0], plain, rtol=1e-6)

    def test_long_context_hf_alpha(self):
        from vllm_rs_tpu.ops.rope import dynamic_ntk_inv_freq

        rs = (("rope_type", "dynamic"), ("factor", 2.0))
        cfg = _cfg(rope_scaling=rs, max_pos=128)
        # row 0 short (unscaled), row 1 at seq_len=256 (scaled)
        pos = np.array([[7], [255]], dtype=np.int32)
        inv = np.asarray(dynamic_ntk_inv_freq(cfg, pos))
        rd = 16
        alpha = 2.0 * 256 / 128 - 1.0
        base = 10000.0 * alpha ** (rd / (rd - 2))
        expect = 1.0 / base ** (np.arange(0, rd, 2, dtype=np.float32) / rd)
        plain = np.asarray(rope_inv_freq(_cfg()))
        np.testing.assert_allclose(inv[0], plain, rtol=1e-6)
        np.testing.assert_allclose(inv[1], expect, rtol=1e-5)

    def test_apply_rope_accepts_per_row_table(self):
        import jax.numpy as jnp

        from vllm_rs_tpu.ops.rope import apply_rope

        rng = np.random.RandomState(0)
        q = jnp.asarray(rng.randn(2, 3, 4, 16), dtype=jnp.float32)
        k = jnp.asarray(rng.randn(2, 3, 2, 16), dtype=jnp.float32)
        pos = jnp.asarray([[0, 1, 2], [5, 6, 7]], dtype=jnp.int32)
        inv1 = np.asarray(rope_inv_freq(_cfg()))
        # [B, half] table with identical rows == the [half] table
        inv2 = jnp.asarray(np.stack([inv1, inv1]))
        q1, k1 = apply_rope(q, k, pos, jnp.asarray(inv1))
        q2, k2 = apply_rope(q, k, pos, inv2)
        np.testing.assert_allclose(np.asarray(q1), np.asarray(q2), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(k1), np.asarray(k2), rtol=1e-6)


class TestYarnOverride:
    def test_installs_yarn(self):
        from vllm_rs_tpu.utils.loader import apply_yarn_override

        cfg = {"max_position_embeddings": 4096}
        out = apply_yarn_override(cfg, 4.0)
        assert out["rope_scaling"]["rope_type"] == "yarn"
        assert out["rope_scaling"]["factor"] == 4.0
        assert out["rope_scaling"]["original_max_position_embeddings"] == 4096
        assert out["max_position_embeddings"] == 16384
        assert "max_position_embeddings" not in cfg or cfg["max_position_embeddings"] == 4096

    def test_preserves_existing_original(self):
        from vllm_rs_tpu.utils.loader import apply_yarn_override

        cfg = {
            "max_position_embeddings": 32768,
            "rope_scaling": {
                "type": "yarn", "factor": 8.0,
                "original_max_position_embeddings": 4096,
                "beta_fast": 32.0,
            },
        }
        out = apply_yarn_override(cfg, 16.0)
        rs = out["rope_scaling"]
        assert rs["factor"] == 16.0
        assert rs["original_max_position_embeddings"] == 4096
        assert rs["beta_fast"] == 32.0  # other knobs preserved
        assert out["max_position_embeddings"] == 65536

    def test_yarn_inv_freq_changes(self):
        rs = (("rope_type", "yarn"), ("factor", 4.0),
              ("original_max_position_embeddings", 64))
        inv = np.asarray(rope_inv_freq(_cfg(rope_scaling=rs, max_pos=256)))
        plain = np.asarray(rope_inv_freq(_cfg()))
        assert not np.allclose(inv, plain)
        # low-frequency (long-wavelength) dims are interpolated by ~1/factor
        assert inv[-1] < plain[-1]
