"""MLA attention tests: absorbed == decompressed, end-to-end DeepSeek tiny."""

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
from vllm_rs_tpu.ops.attn_meta import AttnMeta
from vllm_rs_tpu.ops.mla import mla_paged_attention, write_mla_cache


def _meta_prefill(B, T, block_size, MB, num_slots):
    positions = np.broadcast_to(np.arange(T, dtype=np.int32), (B, T)).copy()
    slots = np.zeros((B, T), dtype=np.int32)
    block_tables = np.zeros((B, MB), dtype=np.int32)
    for b in range(B):
        for t in range(T):
            blk = b * MB + t // block_size
            slots[b, t] = blk * block_size + t % block_size
        block_tables[b] = np.arange(b * MB, (b + 1) * MB)
    return AttnMeta(
        positions=jnp.asarray(positions),
        slot_mapping=jnp.asarray(slots),
        block_tables=jnp.asarray(block_tables),
        context_lens=jnp.full((B,), T, dtype=jnp.int32),
        last_token_idx=jnp.full((B,), T - 1, dtype=jnp.int32),
    )


class TestMlaOp:
    def test_absorbed_matches_decompressed(self):
        B, T, H, dn, dr, dv, R = 2, 6, 4, 16, 8, 16, 32
        block_size, MB = 4, 2
        S = B * MB * block_size
        rs = np.random.RandomState(0)
        q_nope = jnp.asarray(rs.randn(B, T, H, dn), dtype=jnp.float32)
        q_pe = jnp.asarray(rs.randn(B, T, H, dr), dtype=jnp.float32)
        ckv = jnp.asarray(rs.randn(B, T, R), dtype=jnp.float32)
        k_pe = jnp.asarray(rs.randn(B, T, dr), dtype=jnp.float32)
        w_uk = jnp.asarray(rs.randn(H, dn, R) * 0.1, dtype=jnp.float32)
        w_uv = jnp.asarray(rs.randn(H, R, dv) * 0.1, dtype=jnp.float32)
        meta = _meta_prefill(B, T, block_size, MB, S)
        cache = jnp.zeros((S, R + dr), dtype=jnp.float32)
        cache = write_mla_cache(cache, ckv, k_pe, meta.slot_mapping)
        scale = (dn + dr) ** -0.5

        got = mla_paged_attention(
            q_nope, q_pe, cache, w_uk, w_uv, meta,
            block_size=block_size, scale=scale, kv_lora_rank=R,
        )

        # decompressed reference: materialize per-head K/V then plain attention
        k_nope = np.einsum("btr,hdr->bthd", np.asarray(ckv), np.asarray(w_uk))
        v = np.einsum("btr,hrv->bthv", np.asarray(ckv), np.asarray(w_uv))
        qf = np.concatenate([np.asarray(q_nope), np.asarray(q_pe)], axis=-1)
        kf = np.concatenate(
            [k_nope, np.broadcast_to(np.asarray(k_pe)[:, :, None, :], (B, T, H, dr))],
            axis=-1,
        )
        scores = np.einsum("bthd,bshd->bhts", qf, kf) * scale
        mask = np.tril(np.ones((T, T), dtype=bool))
        scores = np.where(mask[None, None], scores, -1e30)
        probs = np.exp(scores - scores.max(-1, keepdims=True))
        probs /= probs.sum(-1, keepdims=True)
        expect = np.einsum("bhts,bshv->bthv", probs, v)
        np.testing.assert_allclose(np.asarray(got), expect, atol=2e-4, rtol=1e-3)


class TestMlaDecodeKernel:
    def test_pallas_kernel_matches_gather_path(self):
        """Dedicated MLA paged-decode kernel (ops/pallas/mla_decode.py,
        reference mla_paged_decode, mla_attention.rs:335-460) vs the XLA
        gather path, interpret mode: varied context lens, multi-layer
        pooled offsets, non-lane-aligned F = R + dr."""
        from vllm_rs_tpu.ops.mla import mla_paged_attention_deferred
        from vllm_rs_tpu.ops.pallas.mla_decode import mla_paged_decode_pallas

        B, H, dn, dr, dv, R = 4, 16, 32, 16, 32, 64
        L, block_size, MB = 3, 4, 4
        S = B * MB * block_size
        F = R + dr  # 80: exercises the padded 0.625-tile contraction
        rs = np.random.RandomState(1)
        pool = jnp.asarray(rs.randn(L, S, F) * 0.3, dtype=jnp.bfloat16)
        q_nope = jnp.asarray(rs.randn(B, 1, H, dn) * 0.3, dtype=jnp.bfloat16)
        q_pe = jnp.asarray(rs.randn(B, 1, H, dr) * 0.3, dtype=jnp.bfloat16)
        ckv_new = jnp.asarray(rs.randn(B, 1, R) * 0.3, dtype=jnp.bfloat16)
        kpe_new = jnp.asarray(rs.randn(B, 1, dr) * 0.3, dtype=jnp.bfloat16)
        w_uk = jnp.asarray(rs.randn(H, dn, R) * 0.1, dtype=jnp.bfloat16)
        w_uv = jnp.asarray(rs.randn(H, R, dv) * 0.1, dtype=jnp.bfloat16)
        ctx = np.array([1, 5, 9, 16], dtype=np.int32)  # INCLUDING current
        bt = np.stack([np.arange(b * MB, (b + 1) * MB) for b in range(B)]).astype(
            np.int32
        )
        meta = AttnMeta(
            positions=jnp.asarray(ctx - 1, dtype=jnp.int32)[:, None],
            slot_mapping=jnp.zeros((B, 1), jnp.int32),
            block_tables=jnp.asarray(bt),
            context_lens=jnp.asarray(ctx),
            last_token_idx=jnp.zeros((B,), jnp.int32),
        )
        scale = (dn + dr) ** -0.5
        for layer in range(L):
            li = jnp.asarray(layer, jnp.int32)
            want = mla_paged_attention_deferred(
                q_nope, q_pe, ckv_new, kpe_new, pool, li, w_uk, w_uv, meta,
                block_size=block_size, scale=scale, kv_lora_rank=R,
                backend="gather",
            )
            got = mla_paged_decode_pallas(
                q_nope, q_pe, ckv_new, kpe_new, pool, li, w_uk, w_uv, meta,
                block_size=block_size, scale=scale, kv_lora_rank=R,
                interpret=True,
            )
            np.testing.assert_allclose(
                np.asarray(got, dtype=np.float32),
                np.asarray(want, dtype=np.float32),
                atol=3e-2, rtol=3e-2,
            )

    def test_pallas_kernel_single_page_and_full_table(self):
        """Edge shapes: MB == 1 (single page, P clamps) and every context
        exactly filling its table."""
        from vllm_rs_tpu.ops.mla import mla_paged_attention_deferred
        from vllm_rs_tpu.ops.pallas.mla_decode import mla_paged_decode_pallas

        B, H, dn, dr, dv, R = 2, 8, 16, 8, 16, 32
        L, block_size, MB = 2, 8, 1
        S = B * MB * block_size
        rs = np.random.RandomState(2)
        pool = jnp.asarray(rs.randn(L, S, R + dr) * 0.3, dtype=jnp.bfloat16)
        q_nope = jnp.asarray(rs.randn(B, 1, H, dn) * 0.3, dtype=jnp.bfloat16)
        q_pe = jnp.asarray(rs.randn(B, 1, H, dr) * 0.3, dtype=jnp.bfloat16)
        ckv_new = jnp.asarray(rs.randn(B, 1, R) * 0.3, dtype=jnp.bfloat16)
        kpe_new = jnp.asarray(rs.randn(B, 1, dr) * 0.3, dtype=jnp.bfloat16)
        w_uk = jnp.asarray(rs.randn(H, dn, R) * 0.1, dtype=jnp.bfloat16)
        w_uv = jnp.asarray(rs.randn(H, R, dv) * 0.1, dtype=jnp.bfloat16)
        ctx = np.array([8, 3], dtype=np.int32)
        bt = np.array([[0], [1]], dtype=np.int32)
        meta = AttnMeta(
            positions=jnp.asarray(ctx - 1, dtype=jnp.int32)[:, None],
            slot_mapping=jnp.zeros((B, 1), jnp.int32),
            block_tables=jnp.asarray(bt),
            context_lens=jnp.asarray(ctx),
            last_token_idx=jnp.zeros((B,), jnp.int32),
        )
        scale = (dn + dr) ** -0.5
        li = jnp.asarray(1, jnp.int32)
        want = mla_paged_attention_deferred(
            q_nope, q_pe, ckv_new, kpe_new, pool, li, w_uk, w_uv, meta,
            block_size=block_size, scale=scale, kv_lora_rank=R,
            backend="gather",
        )
        got = mla_paged_decode_pallas(
            q_nope, q_pe, ckv_new, kpe_new, pool, li, w_uk, w_uv, meta,
            block_size=block_size, scale=scale, kv_lora_rank=R, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(got, dtype=np.float32),
            np.asarray(want, dtype=np.float32),
            atol=3e-2, rtol=3e-2,
        )


def _mla_engine(q_lora=0):
    from vllm_rs_tpu.core.engine import LLMEngine
    from vllm_rs_tpu.core.runner import ModelRunner
    from vllm_rs_tpu.models.deepseek3 import DeepseekV3

    model = ModelConfig(
        model_type="deepseek_v3",
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=3,
        num_attention_heads=4,
        num_key_value_heads=4,
        vocab_size=256,
        num_experts=8,
        num_experts_per_tok=2,
        moe_intermediate_size=32,
        shared_expert_intermediate_size=32,
        first_k_dense_replace=1,
        router_scoring="sigmoid",
        router_bias=True,
        n_group=4,
        topk_group=2,
        routed_scaling_factor=2.0,
        q_lora_rank=q_lora,
        kv_lora_rank=32,
        qk_nope_head_dim=16,
        qk_rope_head_dim=8,
        v_head_dim=16,
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
    )
    m = DeepseekV3(model, block_size=4)
    params = m.init_params(jax.random.PRNGKey(0))
    runner = ModelRunner(m, params, econfig)
    return LLMEngine(econfig, runner)


class TestDeepseekModel:
    def test_generate_matches_across_decode_backends(self, monkeypatch):
        """End-to-end: forcing the Pallas MLA decode kernel (interpret on
        CPU) must produce the same greedy tokens as the gather path."""
        prompts = [[5, 6, 7, 8, 9, 10, 11], [3, 4, 5]]
        sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
        monkeypatch.setenv("VLLM_RS_TPU_MLA_BACKEND", "gather")
        ref = [o.output_token_ids for o in _mla_engine().generate(prompts, sp)]
        monkeypatch.setenv("VLLM_RS_TPU_MLA_BACKEND", "pallas")
        got = [o.output_token_ids for o in _mla_engine().generate(prompts, sp)]
        assert got == ref

    def test_generate_end_to_end(self):
        engine = _mla_engine()
        outs = engine.generate(
            [[5, 6, 7, 8, 9]],
            SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True),
        )
        assert len(outs[0].output_token_ids) == 6

    def test_q_lora_variant(self):
        engine = _mla_engine(q_lora=24)
        outs = engine.generate(
            [[3, 4, 5]],
            SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True),
        )
        assert len(outs[0].output_token_ids) == 4

    def test_greedy_reproducible(self):
        o1 = _mla_engine().generate(
            [[5, 6, 7]], SamplingParams(temperature=0.0, max_tokens=5, ignore_eos=True)
        )
        o2 = _mla_engine().generate(
            [[5, 6, 7]], SamplingParams(temperature=0.0, max_tokens=5, ignore_eos=True)
        )
        assert o1[0].output_token_ids == o2[0].output_token_ids
