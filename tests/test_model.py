"""Model forward correctness: the paged, chunked, jitted path must match an
independent dense full-attention reference implementation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_rs_tpu.config import CacheConfig, EngineConfig, SamplingParams, SchedulerConfig
from vllm_rs_tpu.core.engine import LLMEngine
from vllm_rs_tpu.core.runner import ModelRunner
from vllm_rs_tpu.models.llama import CausalLM


# ---------------------------------------------------------------------------
# independent reference: dense causal forward, no paging, no chunking
# ---------------------------------------------------------------------------


def dense_reference_logits(params, cfg, token_ids):
    """Full-context causal forward in plain jnp; returns [T, V] f32 logits."""
    D, Hq, Hk, Dh = (
        cfg.hidden_size,
        cfg.num_attention_heads,
        cfg.num_key_value_heads,
        cfg.head_dim_,
    )
    T = len(token_ids)
    h = params["embed"][jnp.asarray(token_ids)].astype(jnp.bfloat16)

    def norm(x, w):
        xf = x.astype(jnp.float32)
        xn = xf * jax.lax.rsqrt(jnp.mean(xf * xf, -1, keepdims=True) + cfg.rms_norm_eps)
        return (xn * w.astype(jnp.float32)).astype(x.dtype)

    lp = params["layers"]
    L = lp["input_ln"].shape[0]
    pos = jnp.arange(T, dtype=jnp.float32)
    for l in range(L):
        x = norm(h, lp["input_ln"][l])
        if "qkv" in lp:
            qkv = x @ lp["qkv"][l].astype(x.dtype)
            q = qkv[:, : Hq * Dh].reshape(T, Hq, Dh)
            k = qkv[:, Hq * Dh : (Hq + Hk) * Dh].reshape(T, Hk, Dh)
            v = qkv[:, (Hq + Hk) * Dh :].reshape(T, Hk, Dh)
        else:
            q = (x @ lp["q"][l].astype(x.dtype)).reshape(T, Hq, Dh)
            k = (x @ lp["k"][l].astype(x.dtype)).reshape(T, Hk, Dh)
            v = (x @ lp["v"][l].astype(x.dtype)).reshape(T, Hk, Dh)
        # neox rope
        inv = lp["inv_freq"][l]
        ang = pos[:, None] * inv[None, :]
        cos, sin = jnp.cos(ang)[:, None, :], jnp.sin(ang)[:, None, :]

        def rot(t):
            t1, t2 = t[..., : Dh // 2].astype(jnp.float32), t[..., Dh // 2 :].astype(jnp.float32)
            return jnp.concatenate([t1 * cos - t2 * sin, t2 * cos + t1 * sin], -1).astype(t.dtype)

        q, k = rot(q), rot(k)
        kr = jnp.repeat(k, Hq // Hk, axis=1)
        vr = jnp.repeat(v, Hq // Hk, axis=1)
        scores = jnp.einsum("thd,shd->hts", q.astype(jnp.float32), kr.astype(jnp.float32))
        scores = scores * (Dh**-0.5)
        mask = jnp.tril(jnp.ones((T, T), bool))
        scores = jnp.where(mask[None], scores, -1e30)
        probs = jax.nn.softmax(scores, -1)
        attn = jnp.einsum("hts,shd->thd", probs, vr.astype(jnp.float32)).astype(h.dtype)
        h = h + attn.reshape(T, Hq * Dh) @ lp["o"][l].astype(h.dtype)
        x = norm(h, lp["post_ln"][l])
        if "gate_up" in lp:
            gu = x @ lp["gate_up"][l].astype(x.dtype)
            gate, up = gu[:, : gu.shape[1] // 2], gu[:, gu.shape[1] // 2 :]
        else:
            gate = x @ lp["gate"][l].astype(x.dtype)
            up = x @ lp["up"][l].astype(x.dtype)
        act = jax.nn.silu(gate.astype(jnp.float32)).astype(x.dtype) * up
        h = h + act @ lp["down"][l].astype(h.dtype)
    h = norm(h, params["final_norm"])
    return (h @ params["lm_head"].astype(h.dtype)).astype(jnp.float32)


@pytest.fixture(scope="module")
def built(tiny_engine_config):
    cfg = tiny_engine_config.model
    model = CausalLM(cfg, block_size=tiny_engine_config.cache.block_size)
    params = model.init_params(jax.random.PRNGKey(0))
    runner = ModelRunner(model, params, tiny_engine_config)
    engine = LLMEngine(tiny_engine_config, runner)
    return model, params, engine


def test_paged_prefill_matches_dense_reference(built, tiny_engine_config):
    model, params, engine = built
    prompt = list(np.random.RandomState(0).randint(1, 255, size=13))
    out = engine.generate([prompt], SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True))[0]
    # step-by-step dense reference greedy decode
    ref_tokens = []
    toks = list(prompt)
    for _ in range(4):
        logits = dense_reference_logits(params, tiny_engine_config.model, toks)
        nxt = int(jnp.argmax(logits[-1]))
        ref_tokens.append(nxt)
        toks.append(nxt)
    assert out.output_token_ids == ref_tokens


def test_chunked_prefill_equivalence(tiny_engine_config):
    """Greedy output is invariant to the prefill chunking."""
    import dataclasses

    cfg = tiny_engine_config
    prompt = list(np.random.RandomState(1).randint(1, 255, size=29))
    results = []
    for chunk in (8, 32):
        sched = dataclasses.replace(cfg.scheduler, chunk_size=chunk)
        ecfg = dataclasses.replace(cfg, scheduler=sched)
        model = CausalLM(ecfg.model, block_size=ecfg.cache.block_size)
        params = model.init_params(jax.random.PRNGKey(0))
        engine = LLMEngine(ecfg, ModelRunner(model, params, ecfg))
        out = engine.generate(
            [prompt], SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
        )[0]
        results.append(out.output_token_ids)
    assert results[0] == results[1]


def test_prefix_cache_hit_preserves_output(built):
    _, _, engine = built
    prompt = list(np.random.RandomState(2).randint(1, 255, size=17))
    sp = SamplingParams(temperature=0.0, max_tokens=5, ignore_eos=True)
    out1 = engine.generate([prompt], sp)[0]
    # second run must hit the prefix cache and still produce identical tokens
    out2 = engine.generate([prompt], sp)[0]
    assert out2.cached_tokens > 0
    assert out1.output_token_ids == out2.output_token_ids


def test_batched_decode_matches_single(tiny_engine_config):
    model = CausalLM(tiny_engine_config.model, block_size=tiny_engine_config.cache.block_size)
    params = model.init_params(jax.random.PRNGKey(0))
    engine = LLMEngine(tiny_engine_config, ModelRunner(model, params, tiny_engine_config))
    rs = np.random.RandomState(3)
    prompts = [list(rs.randint(1, 255, size=n)) for n in (5, 11, 19)]
    sp = SamplingParams(temperature=0.0, max_tokens=5, ignore_eos=True)
    batched = engine.generate(prompts, [sp] * 3)
    for i, p in enumerate(prompts):
        model2 = CausalLM(tiny_engine_config.model, block_size=tiny_engine_config.cache.block_size)
        engine2 = LLMEngine(tiny_engine_config, ModelRunner(model2, params, tiny_engine_config))
        solo = engine2.generate([p], sp)[0]
        assert solo.output_token_ids == batched[i].output_token_ids, f"prompt {i}"


def test_quantized_model_runs(tiny_engine_config):
    """int8/int4 models produce sane outputs through the full stack."""
    for method in ("int8", "int4"):
        model = CausalLM(tiny_engine_config.model, block_size=tiny_engine_config.cache.block_size)
        params = model.init_params(jax.random.PRNGKey(0), quant=method, quant_group=32)
        engine = LLMEngine(tiny_engine_config, ModelRunner(model, params, tiny_engine_config))
        out = engine.generate(
            [[1, 2, 3, 4, 5]], SamplingParams(temperature=0.0, max_tokens=3, ignore_eos=True)
        )[0]
        assert len(out.output_token_ids) == 3
        assert all(0 <= t < 256 for t in out.output_token_ids)
