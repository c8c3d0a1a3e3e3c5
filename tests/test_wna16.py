"""GPTQ/AWQ conversion tests: pack known values → convert → dequantize."""

import jax.numpy as jnp
import numpy as np

from vllm_rs_tpu.quant.pack import dequantize
from vllm_rs_tpu.quant.wna16 import (
    AWQ_ORDER,
    awq_to_canonical,
    gptq_to_canonical,
    unpack_awq,
    unpack_gptq_weight,
    unpack_gptq_zeros,
)


def _pack_gptq_k(q: np.ndarray) -> np.ndarray:
    """uint4 [K, N] → int32 [K/8, N] packed along K (bit 4i = row 8r+i)."""
    K, N = q.shape
    out = np.zeros((K // 8, N), dtype=np.uint32)
    for i in range(8):
        out |= q[i::8].astype(np.uint32) << (4 * i)
    return out.view(np.int32)


def _pack_awq_n(q: np.ndarray) -> np.ndarray:
    """uint4 [*, N] → int32 [*, N/8] with AWQ interleave order."""
    pre = q.shape[:-1]
    N = q.shape[-1]
    g = q.reshape(*pre, N // 8, 8).astype(np.uint32)
    out = np.zeros((*pre, N // 8), dtype=np.uint32)
    for slot, idx in enumerate(AWQ_ORDER):
        out |= g[..., slot] << (4 * int(idx))
    return out.view(np.int32)


def _dequant_gptq_reference(q, zeros, scales, G):
    """w[k,n] = (q[k,n] - zeros[k//G,n]) * scales[k//G,n] (zeros incl. +1)."""
    K, N = q.shape
    gi = np.arange(K) // G
    return (q.astype(np.float32) - zeros[gi].astype(np.float32)) * scales[gi]


class TestGPTQ:
    def test_unpack_weight(self):
        rs = np.random.RandomState(0)
        q = rs.randint(0, 16, size=(16, 8)).astype(np.uint8)
        np.testing.assert_array_equal(unpack_gptq_weight(_pack_gptq_k(q)), q)

    def test_unpack_zeros_offset(self):
        rs = np.random.RandomState(1)
        z_true = rs.randint(1, 15, size=(2, 16)).astype(np.uint8)
        packed = _pack_awq_n((z_true - 1).astype(np.uint8))  # wrong order!
        # pack along N *without* AWQ order for GPTQ:
        g = (z_true - 1).reshape(2, 2, 8).astype(np.uint32)
        out = np.zeros((2, 2), dtype=np.uint32)
        for i in range(8):
            out |= g[..., i] << (4 * i)
        np.testing.assert_array_equal(unpack_gptq_zeros(out.view(np.int32)), z_true)

    def test_exact_conversion(self):
        rs = np.random.RandomState(2)
        K, N, G = 64, 16, 32
        q = rs.randint(0, 16, size=(K, N)).astype(np.uint8)
        zeros_true = rs.randint(1, 15, size=(K // G, N)).astype(np.uint8)
        scales = rs.uniform(0.01, 0.1, size=(K // G, N)).astype(np.float32)
        # pack: qweight along K; qzeros stored-1 along N (plain order)
        g = (zeros_true - 1).reshape(K // G, N // 8, 8).astype(np.uint32)
        qzeros = np.zeros((K // G, N // 8), dtype=np.uint32)
        for i in range(8):
            qzeros |= g[..., i] << (4 * i)
        qt = gptq_to_canonical(_pack_gptq_k(q), qzeros.view(np.int32), scales)
        got = np.asarray(dequantize(qt, jnp.float32))
        expect = _dequant_gptq_reference(q, zeros_true, scales, G)
        np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)

    def test_act_order_requant(self):
        rs = np.random.RandomState(3)
        K, N, G = 64, 16, 32
        q = rs.randint(0, 16, size=(K, N)).astype(np.uint8)
        zeros_true = np.full((K // G, N), 8, dtype=np.uint8)
        scales = rs.uniform(0.01, 0.05, size=(K // G, N)).astype(np.float32)
        g_idx = rs.permutation(np.arange(K) // G).astype(np.int32)  # shuffled
        gz = (zeros_true - 1).reshape(K // G, N // 8, 8).astype(np.uint32)
        qzeros = np.zeros((K // G, N // 8), dtype=np.uint32)
        for i in range(8):
            qzeros |= gz[..., i] << (4 * i)
        qt = gptq_to_canonical(_pack_gptq_k(q), qzeros.view(np.int32), scales, g_idx)
        got = np.asarray(dequantize(qt, jnp.float32))
        expect = (q.astype(np.float32) - zeros_true[g_idx]) * scales[g_idx]
        # requantized: tolerance is one int4 step of the largest scale
        assert np.abs(got - expect).max() < scales.max() * 1.01


class TestAWQ:
    def test_unpack_roundtrip(self):
        rs = np.random.RandomState(4)
        q = rs.randint(0, 16, size=(8, 16)).astype(np.uint8)
        np.testing.assert_array_equal(unpack_awq(_pack_awq_n(q)), q)

    def test_exact_conversion(self):
        rs = np.random.RandomState(5)
        K, N, G = 64, 16, 32
        q = rs.randint(0, 16, size=(K, N)).astype(np.uint8)
        zeros_true = rs.randint(0, 16, size=(K // G, N)).astype(np.uint8)
        scales = rs.uniform(0.01, 0.1, size=(K // G, N)).astype(np.float32)
        qt = awq_to_canonical(_pack_awq_n(q), _pack_awq_n(zeros_true), scales)
        got = np.asarray(dequantize(qt, jnp.float32))
        gi = np.arange(K) // G
        expect = (q.astype(np.float32) - zeros_true[gi]) * scales[gi]
        np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)


class TestLoaderIntegration:
    def test_gptq_checkpoint_loads(self, tmp_path):
        """A dense layer stored as qweight/qzeros/scales loads as int4."""
        from safetensors.numpy import save_file

        from vllm_rs_tpu.config import ModelConfig
        from vllm_rs_tpu.models.layers import Linear
        from vllm_rs_tpu.quant.pack import PackedInt4Tensor
        from vllm_rs_tpu.utils.loader import load_params

        cfg = ModelConfig(
            model_type="llama",
            hidden_size=64,
            intermediate_size=96,
            num_hidden_layers=1,
            num_attention_heads=4,
            num_key_value_heads=2,
            vocab_size=128,
            tie_word_embeddings=True,
            eos_token_ids=(0,),
        )
        rs = np.random.RandomState(0)
        sd = {
            "model.embed_tokens.weight": rs.randn(128, 64).astype(np.float32),
            "model.norm.weight": np.ones(64, np.float32),
        }
        G = 32

        def gptq_tensors(prefix, K, N):
            q = rs.randint(0, 16, size=(K, N)).astype(np.uint8)
            z = np.full((K // G, N // 8), 0x77777777, dtype=np.uint32).view(np.int32)
            sc = rs.uniform(0.01, 0.1, size=(K // G, N)).astype(np.float32)
            sd[f"{prefix}.qweight"] = _pack_gptq_k(q)
            sd[f"{prefix}.qzeros"] = z
            sd[f"{prefix}.scales"] = sc

        p = "model.layers.0"
        sd[f"{p}.input_layernorm.weight"] = np.ones(64, np.float32)
        sd[f"{p}.post_attention_layernorm.weight"] = np.ones(64, np.float32)
        gptq_tensors(f"{p}.self_attn.q_proj", 64, 64)
        gptq_tensors(f"{p}.self_attn.k_proj", 64, 32)
        gptq_tensors(f"{p}.self_attn.v_proj", 64, 32)
        gptq_tensors(f"{p}.self_attn.o_proj", 64, 64)
        gptq_tensors(f"{p}.mlp.gate_proj", 64, 96)
        gptq_tensors(f"{p}.mlp.up_proj", 64, 96)
        gptq_tensors(f"{p}.mlp.down_proj", 96, 64)
        save_file(sd, str(tmp_path / "model.safetensors"))
        params = load_params(str(tmp_path), cfg)
        # q/k/v fuse into one merged projection (all PackedInt4, no bias)
        qkv = params["layers"]["qkv"]
        assert isinstance(qkv, PackedInt4Tensor)
        assert qkv.qweight.shape == (1, 32, 64 + 32 + 32)
