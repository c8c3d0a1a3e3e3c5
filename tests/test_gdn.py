"""Gated DeltaNet ops + hybrid Qwen3-Next model tests."""

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
from vllm_rs_tpu.ops.gdn import (
    causal_conv1d_prefill,
    causal_conv1d_update,
    fused_gdn_gating,
    gated_delta_prefill,
    gated_delta_step,
)


class TestConv1d:
    def test_prefill_matches_numpy(self):
        rs = np.random.RandomState(0)
        T, C, K = 10, 6, 4
        x = jnp.asarray(rs.randn(T, C), jnp.float32)
        w = jnp.asarray(rs.randn(C, K) * 0.3, jnp.float32)
        b = jnp.asarray(rs.randn(C) * 0.1, jnp.float32)
        st = jnp.asarray(rs.randn(C, K - 1), jnp.float32)
        y, new_st = causal_conv1d_prefill(x, w, b, st)
        hist = np.concatenate([np.asarray(st).T, np.asarray(x)], axis=0)
        for t in range(T):
            expect = (hist[t : t + K] * np.asarray(w).T).sum(0) + np.asarray(b)
            expect = expect / (1 + np.exp(-expect))  # silu = x*sigmoid(x)
            expect = hist[t : t + K].T @ np.zeros(K) if False else expect
            got = np.asarray(y)[t]
            np.testing.assert_allclose(got, expect * 1.0, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(new_st), hist[T:].T, rtol=1e-6)

    def test_update_equals_prefill_laststep(self):
        """One decode update == the last step of a prefill over the same data."""
        rs = np.random.RandomState(1)
        T, C, K = 5, 4, 4
        x = jnp.asarray(rs.randn(T, C), jnp.float32)
        w = jnp.asarray(rs.randn(C, K) * 0.3, jnp.float32)
        st0 = jnp.zeros((C, K - 1), jnp.float32)
        y_all, _ = causal_conv1d_prefill(x, w, None, st0)
        # run prefill on first T-1, then update with the last token
        y_pre, st = causal_conv1d_prefill(x[: T - 1], w, None, st0)
        y_last, _ = causal_conv1d_update(x[T - 1 :][None, :, :].reshape(1, C), w, None, st[None])
        np.testing.assert_allclose(
            np.asarray(y_last)[0], np.asarray(y_all)[T - 1], rtol=1e-5, atol=1e-6
        )


class TestDeltaRule:
    def test_prefill_equals_stepwise(self):
        rs = np.random.RandomState(2)
        T, H, dk, dv = 7, 2, 8, 8
        S0 = jnp.zeros((H, dk, dv), jnp.float32)
        q = jnp.asarray(rs.randn(T, H, dk), jnp.float32)
        k = jnp.asarray(rs.randn(T, H, dk), jnp.float32)
        v = jnp.asarray(rs.randn(T, H, dv), jnp.float32)
        g = jnp.asarray(-np.abs(rs.randn(T, H)) * 0.1, jnp.float32)
        beta = jnp.asarray(1 / (1 + np.exp(-rs.randn(T, H))), jnp.float32)
        S_scan, o_scan = gated_delta_prefill(S0, q, k, v, g, beta)
        S = S0
        for t in range(T):
            S, o_t = gated_delta_step(S, q[t], k[t], v[t], g[t], beta[t])
            np.testing.assert_allclose(
                np.asarray(o_scan)[t], np.asarray(o_t), rtol=1e-5, atol=1e-5
            )
        np.testing.assert_allclose(np.asarray(S_scan), np.asarray(S), rtol=1e-5, atol=1e-5)

    def test_gating_semantics(self):
        g, beta = fused_gdn_gating(
            jnp.zeros((2,)), jnp.zeros((3, 2)), jnp.zeros((3, 2)), jnp.zeros((2,))
        )
        # a_log=0, a=0, dt_bias=0 → g = -softplus(0) = -ln2; beta = 0.5
        np.testing.assert_allclose(np.asarray(g), -np.log(2), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(beta), 0.5, rtol=1e-6)


def _hybrid_engine(chunk=32):
    from vllm_rs_tpu.core.engine import LLMEngine
    from vllm_rs_tpu.core.runner import ModelRunner
    from vllm_rs_tpu.models.qwen3_next import Qwen3NextForCausalLM

    cfg = ModelConfig(
        model_type="qwen3_next",
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=4,
        num_attention_heads=4,
        num_key_value_heads=2,
        vocab_size=128,
        qk_norm=True,
        eos_token_ids=(0,),
        extra=(
            ("linear_num_key_heads", 2),
            ("linear_num_value_heads", 4),
            ("linear_key_head_dim", 8),
            ("linear_value_head_dim", 8),
            ("linear_conv_kernel_dim", 4),
            ("full_attention_interval", 4),
        ),
    )
    ec = EngineConfig(
        model=cfg,
        cache=CacheConfig(block_size=4, num_blocks=64, mamba_slots=8),
        scheduler=SchedulerConfig(
            max_num_seqs=4, chunk_size=chunk, max_model_len=128,
            prefill_buckets=(8, 16, 32),
        ),
        prefill_buckets=(8, 16, 32),
        decode_buckets=(4,),
    )
    m = Qwen3NextForCausalLM(cfg, block_size=4)
    assert m.layer_types == ("linear", "linear", "linear", "full")
    params = m.init_params(jax.random.PRNGKey(0))
    return LLMEngine(ec, ModelRunner(m, params, ec))


class TestHybridModel:
    def test_generate(self):
        engine = _hybrid_engine()
        outs = engine.generate(
            [[5, 6, 7, 8, 9]],
            SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True),
        )
        assert len(outs[0].output_token_ids) == 6

    def test_chunked_prefill_state_continuity(self):
        """GDN conv/recurrent state must carry across prefill chunks: tiny
        chunks give the same greedy output as one big chunk."""
        prompt = list(range(2, 26))  # 24 tokens
        sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
        o_big = _hybrid_engine(chunk=32).generate([prompt], sp)
        o_small = _hybrid_engine(chunk=8).generate([prompt], sp)
        assert o_big[0].output_token_ids == o_small[0].output_token_ids

    def test_slot_isolation(self):
        """Two concurrent sequences must not leak recurrent state."""
        engine = _hybrid_engine()
        sp = SamplingParams(temperature=0.0, max_tokens=5, ignore_eos=True)
        both = engine.generate([[5, 6, 7], [20, 21, 22]], [sp, sp])
        solo = _hybrid_engine().generate([[5, 6, 7]], sp)
        assert both[0].output_token_ids == solo[0].output_token_ids

    def test_slot_reuse_after_finish(self):
        engine = _hybrid_engine()
        sp = SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True)
        for _ in range(10):  # > mamba_slots if not recycled
            outs = engine.generate([[5, 6, 7]], sp)
            assert len(outs[0].output_token_ids) == 4


class TestHybridMoE:
    def test_qwen3_5_moe_generates(self):
        from vllm_rs_tpu.core.engine import LLMEngine
        from vllm_rs_tpu.core.runner import ModelRunner
        from vllm_rs_tpu.models.qwen3_next import Qwen3NextForCausalLM

        cfg = ModelConfig(
            model_type="qwen3_5_moe",
            hidden_size=64,
            intermediate_size=128,
            num_hidden_layers=4,
            num_attention_heads=4,
            num_key_value_heads=2,
            vocab_size=128,
            num_experts=4,
            num_experts_per_tok=2,
            moe_intermediate_size=32,
            eos_token_ids=(0,),
            extra=(
                ("linear_num_key_heads", 2),
                ("linear_num_value_heads", 4),
                ("linear_key_head_dim", 8),
                ("linear_value_head_dim", 8),
                ("linear_conv_kernel_dim", 4),
                ("full_attention_interval", 4),
            ),
        )
        ec = EngineConfig(
            model=cfg,
            cache=CacheConfig(block_size=4, num_blocks=64, mamba_slots=8),
            scheduler=SchedulerConfig(
                max_num_seqs=4, chunk_size=32, max_model_len=128,
                prefill_buckets=(8, 32),
            ),
            prefill_buckets=(8, 32),
            decode_buckets=(4,),
        )
        m = Qwen3NextForCausalLM(cfg, block_size=4)
        params = m.init_params(jax.random.PRNGKey(0))
        engine = LLMEngine(ec, ModelRunner(m, params, ec))
        outs = engine.generate(
            [[5, 6, 7, 8, 9]],
            SamplingParams(temperature=0.0, max_tokens=5, ignore_eos=True),
        )
        assert len(outs[0].output_token_ids) == 5


class TestChunkedDeltaRule:
    def _data(self, T, H=2, dk=8, dv=8, seed=5):
        rs = np.random.RandomState(seed)
        S0 = jnp.asarray(rs.randn(H, dk, dv) * 0.3, jnp.float32)
        q = jnp.asarray(rs.randn(T, H, dk), jnp.float32)
        k = jnp.asarray(rs.randn(T, H, dk), jnp.float32)
        v = jnp.asarray(rs.randn(T, H, dv), jnp.float32)
        g = jnp.asarray(-np.abs(rs.randn(T, H)) * 0.3, jnp.float32)
        beta = jnp.asarray(1 / (1 + np.exp(-rs.randn(T, H))), jnp.float32)
        return S0, q, k, v, g, beta

    @pytest.mark.parametrize("T,chunk", [(16, 16), (48, 16), (50, 16), (7, 16)])
    def test_matches_sequential(self, T, chunk):
        from vllm_rs_tpu.ops.gdn import (
            gated_delta_prefill,
            gated_delta_prefill_chunked,
        )

        S0, q, k, v, g, beta = self._data(T)
        S_seq, O_seq = gated_delta_prefill(S0, q, k, v, g, beta)
        S_chk, O_chk = gated_delta_prefill_chunked(S0, q, k, v, g, beta, chunk=chunk)
        np.testing.assert_allclose(
            np.asarray(O_chk), np.asarray(O_seq), rtol=2e-4, atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(S_chk), np.asarray(S_seq), rtol=2e-4, atol=2e-4
        )

    def test_strong_decay_stability(self):
        """Heavy decay must not underflow/overflow the chunked form."""
        from vllm_rs_tpu.ops.gdn import (
            gated_delta_prefill,
            gated_delta_prefill_chunked,
        )

        S0, q, k, v, g, beta = self._data(64)
        g = g * 20.0  # cumulative decay underflows any 1/c formulation
        S_seq, O_seq = gated_delta_prefill(S0, q, k, v, g, beta)
        S_chk, O_chk = gated_delta_prefill_chunked(S0, q, k, v, g, beta, chunk=32)
        assert np.isfinite(np.asarray(O_chk)).all()
        np.testing.assert_allclose(
            np.asarray(O_chk), np.asarray(O_seq), rtol=1e-3, atol=1e-3
        )
