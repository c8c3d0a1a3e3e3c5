"""MoE routing + expert-execution tests (reference moe.rs semantics)."""

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
from vllm_rs_tpu.ops.moe import (
    MoERouterConfig,
    moe_mlp_gather,
    moe_mlp_ragged,
    moe_mlp_reference,
    moe_mlp_scan,
    moe_route,
)


def _np_softmax(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


class TestRouting:
    def test_softmax_topk(self):
        rs = np.random.RandomState(0)
        logits = rs.randn(5, 8).astype(np.float32)
        cfg = MoERouterConfig(num_experts=8, num_experts_per_tok=2, norm_topk_prob=False)
        w, ids = jax.jit(lambda l: moe_route(l, cfg))(jnp.asarray(logits))
        probs = _np_softmax(logits)
        for t in range(5):
            expect_ids = np.argsort(-probs[t])[:2]
            assert set(np.asarray(ids)[t].tolist()) == set(expect_ids.tolist())
            np.testing.assert_allclose(
                np.sort(np.asarray(w)[t]), np.sort(probs[t][expect_ids]), rtol=1e-5
            )

    def test_norm_topk_prob(self):
        logits = jnp.asarray(np.random.RandomState(1).randn(3, 8), dtype=jnp.float32)
        cfg = MoERouterConfig(num_experts=8, num_experts_per_tok=4, norm_topk_prob=True)
        w, _ = moe_route(logits, cfg)
        np.testing.assert_allclose(np.asarray(jnp.sum(w, axis=-1)), 1.0, rtol=1e-5)

    def test_sigmoid_bias_selects_but_does_not_weight(self):
        # bias strongly favors expert 0 for selection; returned weight must be
        # the *raw* sigmoid score (moe.rs:129-131)
        logits = jnp.zeros((1, 4), dtype=jnp.float32)
        bias = jnp.asarray([10.0, 0.0, 0.0, 0.0])
        cfg = MoERouterConfig(
            num_experts=4, num_experts_per_tok=1, scoring="sigmoid",
            norm_topk_prob=False,
        )
        w, ids = moe_route(logits, cfg, bias)
        assert int(ids[0, 0]) == 0
        np.testing.assert_allclose(float(w[0, 0]), 0.5, rtol=1e-6)  # sigmoid(0)

    def test_group_limited_topk(self):
        # 8 experts, 4 groups of 2; top-1 group; k=2 → both picks must come
        # from the winning group
        rs = np.random.RandomState(2)
        logits = rs.randn(6, 8).astype(np.float32) * 3
        cfg = MoERouterConfig(
            num_experts=8, num_experts_per_tok=2, scoring="sigmoid",
            n_group=4, topk_group=1, norm_topk_prob=False,
        )
        _, ids = moe_route(jnp.asarray(logits), cfg)
        ids = np.asarray(ids)
        assert (ids[:, 0] // 2 == ids[:, 1] // 2).all()
        # winning group = argmax of per-group top-2 sum of sigmoid scores
        scores = 1 / (1 + np.exp(-logits))
        g = scores.reshape(6, 4, 2).sum(-1)
        np.testing.assert_array_equal(ids[:, 0] // 2, np.argmax(g, axis=1))

    def test_routed_scaling(self):
        logits = jnp.asarray(np.random.RandomState(3).randn(2, 4), dtype=jnp.float32)
        base = MoERouterConfig(num_experts=4, num_experts_per_tok=2, norm_topk_prob=True)
        scaled = base._replace(routed_scaling_factor=2.5)
        w0, _ = moe_route(logits, base)
        w1, _ = moe_route(logits, scaled)
        np.testing.assert_allclose(np.asarray(w1), np.asarray(w0) * 2.5, rtol=1e-6)


class TestExpertExecution:
    E, D, I, k = 8, 64, 32, 2

    def _setup(self, T, quant=None):
        rs = np.random.RandomState(0)
        h = jnp.asarray(rs.randn(T, self.D), dtype=jnp.bfloat16)
        wg = jnp.asarray(rs.randn(self.E, self.D, self.I) * 0.05, dtype=jnp.bfloat16)
        wu = jnp.asarray(rs.randn(self.E, self.D, self.I) * 0.05, dtype=jnp.bfloat16)
        wd = jnp.asarray(rs.randn(self.E, self.I, self.D) * 0.05, dtype=jnp.bfloat16)
        if quant:
            from vllm_rs_tpu.quant.pack import quantize_param

            qf = lambda w: jax.vmap(lambda x: quantize_param(x, quant, 32))(w)  # noqa: E731
            wg, wu, wd = qf(wg), qf(wu), qf(wd)
        ids = jnp.asarray(rs.randint(0, self.E, size=(T, self.k)), dtype=jnp.int32)
        wts = jnp.asarray(_np_softmax(rs.randn(T, self.k)), dtype=jnp.float32)
        return h, wts, ids, wg, wu, wd

    def test_gather_matches_reference(self):
        h, wts, ids, wg, wu, wd = self._setup(4)
        ref = moe_mlp_reference(h, wts, ids, wg, wu, wd)
        got = jax.jit(moe_mlp_gather)(h, wts, ids, wg, wu, wd)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32), atol=0.15, rtol=0.1
        )

    def test_ragged_matches_reference(self):
        h, wts, ids, wg, wu, wd = self._setup(37)
        ref = moe_mlp_reference(h, wts, ids, wg, wu, wd)
        got = jax.jit(moe_mlp_ragged)(h, wts, ids, wg, wu, wd)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32), atol=0.15, rtol=0.1
        )

    def test_scan_quantized_matches_reference(self):
        h, wts, ids, wg, wu, wd = self._setup(16, quant="int8")
        ref = moe_mlp_reference(h, wts, ids, wg, wu, wd)
        got = jax.jit(moe_mlp_scan)(h, wts, ids, wg, wu, wd)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32), atol=0.15, rtol=0.1
        )

    def test_gather_quantized_matches_reference(self):
        h, wts, ids, wg, wu, wd = self._setup(3, quant="int4")
        ref = moe_mlp_reference(h, wts, ids, wg, wu, wd)
        got = jax.jit(moe_mlp_gather)(h, wts, ids, wg, wu, wd)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32), atol=0.2, rtol=0.1
        )


def _moe_engine(first_k_dense=0, quant=None):
    from vllm_rs_tpu.core.engine import LLMEngine
    from vllm_rs_tpu.core.runner import ModelRunner
    from vllm_rs_tpu.models.qwen3_moe import MoECausalLM

    model = ModelConfig(
        model_type="qwen3_moe",
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=3,
        num_attention_heads=4,
        num_key_value_heads=2,
        vocab_size=256,
        qk_norm=True,
        num_experts=8,
        num_experts_per_tok=2,
        moe_intermediate_size=32,
        first_k_dense_replace=first_k_dense,
        eos_token_ids=(0,),
    )
    econfig = EngineConfig(
        model=model,
        cache=CacheConfig(block_size=4, num_blocks=64),
        scheduler=SchedulerConfig(
            max_num_seqs=4, chunk_size=32, max_model_len=128, prefill_buckets=(8, 32)
        ),
        prefill_buckets=(8, 32),
        decode_buckets=(4,),
        quant=quant,
    )
    m = MoECausalLM(model, block_size=4)
    params = m.init_params(jax.random.PRNGKey(0), quant=quant, quant_group=32)
    runner = ModelRunner(m, params, econfig)
    return LLMEngine(econfig, runner)


class TestMoEModel:
    def test_generate_end_to_end(self):
        engine = _moe_engine()
        outs = engine.generate(
            [[5, 6, 7, 8, 9]],
            SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True),
        )
        assert len(outs[0].output_token_ids) == 6

    def test_dense_prefix_layers(self):
        engine = _moe_engine(first_k_dense=1)
        outs = engine.generate(
            [[5, 6, 7, 8, 9]],
            SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True),
        )
        assert len(outs[0].output_token_ids) == 4

    def test_prefill_decode_consistency(self):
        """Greedy decode must be reproducible across engine instances."""
        outs1 = _moe_engine().generate(
            [[5, 6, 7, 8, 9]], SamplingParams(temperature=0.0, max_tokens=5, ignore_eos=True)
        )
        outs2 = _moe_engine().generate(
            [[5, 6, 7, 8, 9]], SamplingParams(temperature=0.0, max_tokens=5, ignore_eos=True)
        )
        assert outs1[0].output_token_ids == outs2[0].output_token_ids
