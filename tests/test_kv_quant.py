"""int8 KV cache tests: quant round trip + end-to-end engine."""

import jax
import jax.numpy as jnp
import numpy as np

from vllm_rs_tpu.config import (
    CacheConfig,
    EngineConfig,
    ModelConfig,
    SamplingParams,
    SchedulerConfig,
)
from vllm_rs_tpu.ops.kv_quant import dequantize_kv_rows, quantize_kv_rows


class TestKvQuantOps:
    def test_roundtrip(self):
        rs = np.random.RandomState(0)
        x = jnp.asarray(rs.randn(16, 4 * 32) * 3, dtype=jnp.float32)
        q, s = quantize_kv_rows(x, num_heads=4)
        back = dequantize_kv_rows(q, s, jnp.float32)
        rel = np.abs(np.asarray(back) - np.asarray(x)).max() / np.abs(np.asarray(x)).max()
        assert rel < 0.02  # int8 per-head scaling keeps ~7 bits

    def test_per_head_scales(self):
        # one loud head must not destroy the quiet head's resolution
        x = np.zeros((1, 2 * 8), np.float32)
        x[0, :8] = 1000.0  # head 0
        x[0, 8:] = 0.001  # head 1
        q, s = quantize_kv_rows(jnp.asarray(x), num_heads=2)
        back = np.asarray(dequantize_kv_rows(q, s, jnp.float32))
        np.testing.assert_allclose(back[0, 8:], 0.001, rtol=0.02)


def _engine(kv_dtype):
    from vllm_rs_tpu.core.engine import LLMEngine
    from vllm_rs_tpu.core.runner import ModelRunner
    from vllm_rs_tpu.models.llama import CausalLM

    cfg = ModelConfig(
        model_type="llama",
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        vocab_size=128,
        eos_token_ids=(0,),
    )
    ec = EngineConfig(
        model=cfg,
        cache=CacheConfig(block_size=4, num_blocks=64, kv_dtype=kv_dtype),
        scheduler=SchedulerConfig(
            max_num_seqs=4, chunk_size=16, max_model_len=64, prefill_buckets=(8, 16)
        ),
        prefill_buckets=(8, 16),
        decode_buckets=(4,),
    )
    m = CausalLM(cfg, block_size=4)
    params = m.init_params(jax.random.PRNGKey(0))
    return LLMEngine(ec, ModelRunner(m, params, ec))


class TestInt8KvEngine:
    def test_generates(self):
        engine = _engine("int8")
        outs = engine.generate(
            [[3, 4, 5, 6, 7]], SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
        )
        assert len(outs[0].output_token_ids) == 6

    def test_close_to_bf16(self):
        sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
        o_bf16 = _engine("bfloat16").generate([[3, 4, 5, 6, 7]], sp)
        o_int8 = _engine("int8").generate([[3, 4, 5, 6, 7]], sp)
        a, b = o_bf16[0].output_token_ids, o_int8[0].output_token_ids
        # random tiny models have near-uniform logits; require the first
        # token to agree (argmax robust to <2% kv error at step 1)
        assert a[0] == b[0]
