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


class TestInt8KvKernel:
    def test_decode_kernel_matches_reference(self):
        """int8-KV decode kernel (column-scaled dequant) vs gather path."""
        import jax
        import jax.numpy as jnp

        from vllm_rs_tpu.ops.attention import attend_gathered, gather_kv_layer
        from vllm_rs_tpu.ops.attn_meta import AttnMeta
        from vllm_rs_tpu.ops.kv_cache import write_kv_layer
        from vllm_rs_tpu.ops.pallas.paged_attention import (
            paged_attention_decode_pallas,
        )

        rs = np.random.RandomState(0)
        B, Hq, Hk, D, bs, MB = 2, 4, 2, 128, 8, 4
        S = B * MB * bs
        kv_l = (
            jnp.zeros((2, S, Hk * D), jnp.int8),
            jnp.zeros((2, S, Hk), jnp.float32),
        )
        # write some context
        ctx = 20
        slot_map = np.full((B, ctx), S, np.int32)
        bt = np.zeros((B, MB), np.int32)
        for b in range(B):
            bt[b] = np.arange(b * MB, (b + 1) * MB)
            for t in range(ctx):
                slot_map[b, t] = bt[b][t // bs] * bs + t % bs
        k_ctx = jnp.asarray(rs.randn(B, ctx, Hk, D), jnp.float32)
        v_ctx = jnp.asarray(rs.randn(B, ctx, Hk, D), jnp.float32)
        kv_l = write_kv_layer(kv_l, k_ctx, v_ctx, jnp.asarray(slot_map))

        q = jnp.asarray(rs.randn(B, 1, Hq, D), jnp.bfloat16)
        meta = AttnMeta(
            positions=jnp.full((B, 1), ctx - 1, jnp.int32),
            slot_mapping=jnp.asarray(slot_map[:, ctx - 1 : ctx]),
            block_tables=jnp.asarray(bt),
            context_lens=jnp.full((B,), ctx, jnp.int32),
            last_token_idx=jnp.zeros((B,), jnp.int32),
        )
        data, scales = kv_l
        got = paged_attention_decode_pallas(
            q, data[0], data[1], meta, block_size=bs, scale=D ** -0.5,
            k_scales=scales[0], v_scales=scales[1], interpret=True,
        )
        k, v = gather_kv_layer(kv_l, meta.block_tables, bs, Hk)
        expect = attend_gathered(q, k, v, meta, scale=D ** -0.5)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(expect, np.float32),
            atol=0.03, rtol=0.03,
        )
