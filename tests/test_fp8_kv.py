"""fp8-e4m3 KV cache tests: scale-free storage (the reference's KV quant
format, kvcache_allocator.rs:188-193) rides every plain-array path —
write/gather, deferred pallas decode, engine end-to-end, dict pools."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_rs_tpu.config import (
    CacheConfig,
    EngineConfig,
    ModelConfig,
    SamplingParams,
    SchedulerConfig,
)
from vllm_rs_tpu.ops.kv_cache import init_kv_cache, resolve_kv_dtype


class TestResolveKvDtype:
    def test_names(self):
        assert resolve_kv_dtype(None) == jnp.bfloat16
        assert resolve_kv_dtype("bfloat16") == jnp.bfloat16
        assert resolve_kv_dtype("float8_e4m3fn") == jnp.float8_e4m3fn
        assert resolve_kv_dtype(jnp.float16) == jnp.float16

    def test_int8_rejected(self):
        with pytest.raises(ValueError, match="paired"):
            resolve_kv_dtype("int8")

    def test_unknown_rejected(self):
        with pytest.raises(ValueError, match="unsupported"):
            resolve_kv_dtype("int4")


class TestFp8Storage:
    def test_init_shapes(self):
        cfg = ModelConfig(
            model_type="llama", hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            vocab_size=128, eos_token_ids=(0,),
        )
        kv = init_kv_cache(cfg, CacheConfig(block_size=4, num_blocks=8,
                                            kv_dtype="float8_e4m3fn"))
        assert not isinstance(kv, tuple)
        assert kv.dtype == jnp.float8_e4m3fn
        assert kv.shape == (2, 2, 32, 2 * cfg.head_dim_)

    def test_write_gather_roundtrip(self):
        from vllm_rs_tpu.ops.kv_cache import gather_kv_layer, write_kv_layer

        rs = np.random.RandomState(0)
        Hk, D, bs = 2, 16, 4
        S = 8 * bs
        kv_l = jnp.zeros((2, S, Hk * D), jnp.float8_e4m3fn)
        k = jnp.asarray(rs.randn(1, 8, Hk, D), jnp.float32)
        v = jnp.asarray(rs.randn(1, 8, Hk, D), jnp.float32)
        slots = jnp.arange(8, dtype=jnp.int32).reshape(1, 8)
        kv_l = write_kv_layer(kv_l, k, v, slots)
        bt = jnp.arange(8, dtype=jnp.int32).reshape(1, 8)
        kg, vg = gather_kv_layer(kv_l, bt, bs, Hk)
        # e4m3 has 3 mantissa bits: relative error <= 2^-4 per element
        got = np.asarray(kg, np.float32)[0, :8]
        np.testing.assert_allclose(got, np.asarray(k)[0], rtol=0.07, atol=0.02)
        gotv = np.asarray(vg, np.float32)[0, :8]
        np.testing.assert_allclose(gotv, np.asarray(v)[0], rtol=0.07, atol=0.02)

    def test_model_dict_pools(self):
        """gemma4/hybrid dict pools allocate fp8 and reject int8."""
        from vllm_rs_tpu.models.gemma4 import Gemma4ForCausalLM

        cfg = ModelConfig(
            model_type="gemma4", hidden_size=64, intermediate_size=128,
            num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
            head_dim=16, vocab_size=128, eos_token_ids=(0,),
            sliding_window=8, sliding_window_pattern=2,
        )
        m = Gemma4ForCausalLM(cfg, block_size=4)
        kv = m.init_kv_cache(CacheConfig(block_size=4, num_blocks=8),
                             dtype="float8_e4m3fn")
        for pool in kv.values():
            assert pool.dtype == jnp.float8_e4m3fn
        with pytest.raises(ValueError, match="paired"):
            m.init_kv_cache(CacheConfig(block_size=4, num_blocks=8), dtype="int8")


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


class TestFp8KvEngine:
    def test_generates(self):
        engine = _engine("float8_e4m3fn")
        assert not isinstance(engine.runner.kv, tuple)
        assert engine.runner.kv.dtype == jnp.float8_e4m3fn
        outs = engine.generate(
            [[3, 4, 5, 6, 7]],
            SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True),
        )
        assert len(outs[0].output_token_ids) == 6

    def test_close_to_bf16(self):
        sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
        o_bf16 = _engine("bfloat16").generate([[3, 4, 5, 6, 7]], sp)
        o_fp8 = _engine("float8_e4m3fn").generate([[3, 4, 5, 6, 7]], sp)
        # random tiny models have near-uniform logits; require the first
        # token to agree (argmax robust to ~6% kv error at step 1)
        assert o_bf16[0].output_token_ids[0] == o_fp8[0].output_token_ids[0]


class TestFp8DecodeKernel:
    def test_deferred_decode_matches_reference(self):
        """fp8 pool through the deferred pallas decode kernel (interpret) vs
        the gathered float reference over the SAME fp8-stored context."""
        from vllm_rs_tpu.ops.attention import attend_gathered, gather_kv_layer
        from vllm_rs_tpu.ops.attn_meta import AttnMeta
        from vllm_rs_tpu.ops.kv_cache import write_kv_layer
        from vllm_rs_tpu.ops.pallas.paged_attention import (
            paged_attention_decode_pallas,
        )

        rs = np.random.RandomState(0)
        B, Hq, Hk, D, bs, MB = 2, 4, 2, 128, 8, 4
        S = B * MB * bs
        kv_l = jnp.zeros((2, S, Hk * D), jnp.float8_e4m3fn)
        ctx = 20
        slot_map = np.full((B, ctx), S, np.int32)
        bt = np.zeros((B, MB), np.int32)
        for b in range(B):
            bt[b] = np.arange(b * MB, (b + 1) * MB)
            for t in range(ctx):
                slot_map[b, t] = bt[b][t // bs] * bs + t % bs
        k_ctx = jnp.asarray(rs.randn(B, ctx, Hk, D), jnp.float32)
        v_ctx = jnp.asarray(rs.randn(B, ctx, Hk, D), jnp.float32)
        # context (positions [0, ctx-1)) lives in the pool; the last token's
        # K/V arrives via the deferred self column
        kv_l = write_kv_layer(
            kv_l, k_ctx[:, :-1], v_ctx[:, :-1], jnp.asarray(slot_map[:, :-1])
        )

        q = jnp.asarray(rs.randn(B, 1, Hq, D), jnp.bfloat16)
        meta = AttnMeta(
            positions=jnp.full((B, 1), ctx - 1, jnp.int32),
            slot_mapping=jnp.asarray(slot_map[:, ctx - 1 : ctx]),
            block_tables=jnp.asarray(bt),
            context_lens=jnp.full((B,), ctx, jnp.int32),
            last_token_idx=jnp.zeros((B,), jnp.int32),
        )
        k_self = k_ctx[:, -1:].astype(jnp.bfloat16)
        v_self = v_ctx[:, -1:].astype(jnp.bfloat16)
        got = paged_attention_decode_pallas(
            q, kv_l[0], kv_l[1], meta, block_size=bs, scale=D ** -0.5,
            k_self=k_self, v_self=v_self, interpret=True,
        )
        # reference: write the self token into a copy, gather, attend
        kv_full = write_kv_layer(
            kv_l, k_ctx[:, -1:], v_ctx[:, -1:],
            jnp.asarray(slot_map[:, ctx - 1 : ctx]),
        )
        k, v = gather_kv_layer(kv_full, meta.block_tables, bs, Hk)
        expect = attend_gathered(q, k, v, meta, scale=D ** -0.5)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(expect, np.float32),
            atol=0.06, rtol=0.06,
        )


class TestFp8Planner:
    def test_fp8_doubles_capacity(self):
        from vllm_rs_tpu.config import plan_kv_cache

        cfg = ModelConfig(
            model_type="llama", hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            vocab_size=128, eos_token_ids=(0,),
        )
        free = 64 * 1024 * 1024
        bf16 = plan_kv_cache(cfg, hbm_bytes_free=free, kv_dtype="bfloat16")
        fp8 = plan_kv_cache(cfg, hbm_bytes_free=free, kv_dtype="float8_e4m3fn")
        # integer division of the usable budget: within 1 of exactly 2x
        assert abs(fp8.num_blocks - 2 * bf16.num_blocks) <= 1
        assert fp8.kv_dtype == "float8_e4m3fn"


def test_to_bf16_bit_twiddle_matches_ieee_for_normals():
    """The fp8-e4m3 -> bf16 integer bit-twiddle (to_bf16) must agree with
    the IEEE convert on every normal bit pattern and +-0; only the 14
    subnormal patterns (|x| < 2^-6, far below KV magnitudes) and NaN may
    differ (documented tradeoff for the cheap VPU lowering)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from vllm_rs_tpu.ops.pallas.paged_attention import to_bf16

    bits = np.arange(256, dtype=np.uint8)
    x = jax.lax.bitcast_convert_type(jnp.asarray(bits), jnp.float8_e4m3fn)
    ref = np.asarray(x.astype(jnp.bfloat16), dtype=np.float32)
    got = np.asarray(to_bf16(x), dtype=np.float32)
    subnormal = (bits & 0x78 == 0) & (bits & 0x07 != 0)
    nan = (bits & 0x7F) == 0x7F
    exact = ~(subnormal | nan)
    assert np.array_equal(ref[exact], got[exact])
    # subnormal decode error is bounded (< 2^-6)
    assert np.all(np.abs(got[subnormal]) < 2.0**-6)
