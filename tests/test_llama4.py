"""Llama4 correctness: iRoPE layer pattern, chunked attention, temperature
tuning, top-1 sigmoid MoE with input-applied router weight + shared expert.

Pins the paged/jitted engine path against an independent dense reference
of the reference semantics (llama4/mod.rs:189-353).
"""

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
from vllm_rs_tpu.core.engine import LLMEngine
from vllm_rs_tpu.core.runner import ModelRunner
from vllm_rs_tpu.models.llama4 import Llama4ForCausalLM

HF = {
    "model_type": "llama4",
    "hidden_size": 64,
    "intermediate_size": 48,  # expert width
    "intermediate_size_mlp": 96,  # dense width
    "num_hidden_layers": 4,
    "num_attention_heads": 4,
    "num_key_value_heads": 2,
    "head_dim": 16,
    "vocab_size": 256,
    "rms_norm_eps": 1e-5,
    "rope_theta": 10000.0,
    "num_local_experts": 4,
    "num_experts_per_tok": 1,
    "interleave_moe_layer_step": 2,
    "attention_chunk_size": 8,
    "use_qk_norm": True,
    "attn_temperature_tuning": True,
    "floor_scale": 8.0,
    "attn_scale": 0.1,
    "eos_token_id": 0,
}


def make_engine(cfg, seed=0):
    ecfg = EngineConfig(
        model=cfg,
        cache=CacheConfig(block_size=4, num_blocks=64),
        scheduler=SchedulerConfig(
            max_num_seqs=4, chunk_size=32, max_model_len=128, prefill_buckets=(8, 16, 32)
        ),
        prefill_buckets=(8, 16, 32),
        decode_buckets=(2, 4),
    )
    model = Llama4ForCausalLM(cfg, block_size=4)
    params = model.init_params(jax.random.PRNGKey(seed))
    return model, params, LLMEngine(ecfg, ModelRunner(model, params, ecfg))


def _rms(x, w, eps=1e-5):
    xf = x.astype(jnp.float32)
    xn = xf * jax.lax.rsqrt(jnp.mean(xf * xf, -1, keepdims=True) + eps)
    return (xn * w.astype(jnp.float32)).astype(jnp.bfloat16)


def _rope(t, pos, inv, rot):
    ang = pos[:, None].astype(jnp.float32) * inv[None, :]
    cos, sin = jnp.cos(ang)[:, None, :], jnp.sin(ang)[:, None, :]
    r = t.astype(jnp.float32)
    t1, t2 = r[..., : rot // 2], r[..., rot // 2 :]
    return jnp.concatenate([t1 * cos - t2 * sin, t2 * cos + t1 * sin], -1)


def dense_llama4_logits(model, params, cfg, token_ids):
    T = len(token_ids)
    ids = jnp.asarray(token_ids)
    h = params["embed"][ids].astype(jnp.bfloat16)
    pos = jnp.arange(T)
    Hq, Hk, Dh = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim_

    for i, lp in enumerate(params["layers"]):
        x = _rms(h, lp["input_ln"], cfg.rms_norm_eps)
        qkv = x @ lp["qkv"].astype(x.dtype)
        q, k, v = jnp.split(qkv, [Hq * Dh, (Hq + Hk) * Dh], -1)
        q = q.reshape(T, Hq, Dh)
        k = k.reshape(T, Hk, Dh)
        v = v.reshape(T, Hk, Dh)
        if model.use_rope[i]:
            q = _rope(q, pos, lp["inv_freq"], Dh).astype(jnp.bfloat16)
            k = _rope(k, pos, lp["inv_freq"], Dh).astype(jnp.bfloat16)
            qf = q.astype(jnp.float32)
            q = (qf * jax.lax.rsqrt(jnp.sum(qf * qf, -1, keepdims=True) + 1e-6)).astype(q.dtype)
            kf = k.astype(jnp.float32)
            k = (kf * jax.lax.rsqrt(jnp.sum(kf * kf, -1, keepdims=True) + 1e-6)).astype(k.dtype)
            window = HF["attention_chunk_size"]
        else:
            scale_t = (
                jnp.log(jnp.floor((pos.astype(jnp.float32) + 1.0) / HF["floor_scale"]) + 1.0)
                * HF["attn_scale"]
                + 1.0
            )
            q = (q.astype(jnp.float32) * scale_t[:, None, None]).astype(q.dtype)
            window = 0
        kr = jnp.repeat(k, Hq // Hk, axis=1)
        vr = jnp.repeat(v, Hq // Hk, axis=1)
        scores = jnp.einsum(
            "thd,shd->hts", q.astype(jnp.float32), kr.astype(jnp.float32)
        ) * (Dh ** -0.5)
        qp, kp = jnp.arange(T)[:, None], jnp.arange(T)[None, :]
        mask = kp <= qp
        if window:
            # exact chunked attention (HF Llama4): keys from the query's
            # own chunk, [floor(qp/C)*C, qp]
            mask &= kp >= (qp // window) * window
        scores = jnp.where(mask[None], scores, -1e30)
        attn = jnp.einsum(
            "hts,shd->thd", jax.nn.softmax(scores, -1), vr.astype(jnp.float32)
        ).astype(jnp.bfloat16)
        h = h + (attn.reshape(T, -1) @ lp["o"].astype(jnp.bfloat16))

        x = _rms(h, lp["post_ln"], cfg.rms_norm_eps)
        if model.is_moe_layer[i]:
            logits_r = jnp.dot(
                x.astype(jnp.bfloat16), lp["router"].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            top, eids = jax.lax.top_k(logits_r, 1)
            wts = jax.nn.sigmoid(top)
            out = jnp.zeros((T, cfg.hidden_size), jnp.float32)
            for t in range(T):
                e = int(eids[t, 0])
                xe = (x[t].astype(jnp.float32) * wts[t, 0]).astype(jnp.bfloat16)[None]
                g = xe @ lp["w_gate"][e].astype(xe.dtype)
                u = xe @ lp["w_up"][e].astype(xe.dtype)
                a = jax.nn.silu(g.astype(jnp.float32)).astype(xe.dtype) * u
                out = out.at[t].add((a @ lp["w_down"][e].astype(xe.dtype))[0].astype(jnp.float32))
            gu = x @ lp["shared_gate_up"].astype(x.dtype)
            sg, su = jnp.split(gu, 2, -1)
            sa = jax.nn.silu(sg.astype(jnp.float32)).astype(x.dtype) * su
            shared = sa @ lp["shared_down"].astype(x.dtype)
            h = h + (out + shared.astype(jnp.float32)).astype(jnp.bfloat16)
        else:
            gu = x @ lp["gate_up"].astype(x.dtype)
            g, u = jnp.split(gu, 2, -1)
            a = jax.nn.silu(g.astype(jnp.float32)).astype(x.dtype) * u
            h = h + a @ lp["down"].astype(x.dtype)

    h = _rms(h, params["final_norm"], cfg.rms_norm_eps)
    return jnp.dot(
        h, params["lm_head"].astype(h.dtype), preferred_element_type=jnp.float32
    )


def greedy_reference(model, params, cfg, prompt, n):
    toks = list(prompt)
    out = []
    for _ in range(n):
        logits = dense_llama4_logits(model, params, cfg, toks)
        out.append(int(jnp.argmax(logits[-1])))
        toks.append(out[-1])
    return out


def test_layer_patterns():
    cfg = ModelConfig.from_hf_dict(HF)
    model = Llama4ForCausalLM(cfg, block_size=4)
    assert model.use_rope == (True, True, True, False)
    assert model.is_moe_layer == (False, True, False, True)
    assert model.chunk_size == 8 and model.dense_mlp_size == 96
    assert cfg.qk_l2_norm and not cfg.qk_norm
    assert cfg.num_experts == 4 and cfg.num_experts_per_tok == 1


def test_llama4_matches_dense_reference():
    cfg = ModelConfig.from_hf_dict(HF)
    model, params, engine = make_engine(cfg)
    prompt = list(np.random.RandomState(1).randint(1, 255, size=13))
    out = engine.generate(
        [prompt], SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True)
    )[0]
    assert out.output_token_ids == greedy_reference(model, params, cfg, prompt, 4)


def test_llama4_chunked_window_binds():
    """Long prompt exercises the chunked-attention window; deterministic."""
    cfg = ModelConfig.from_hf_dict(HF)
    _, _, engine = make_engine(cfg)
    prompt = list(np.random.RandomState(2).randint(1, 255, size=24))
    sp = SamplingParams(temperature=0.0, max_tokens=5, ignore_eos=True)
    a = engine.generate([prompt], sp)[0].output_token_ids
    b = engine.generate([prompt], sp)[0].output_token_ids
    assert a == b and len(a) == 5


def test_llama4_no_rope_layers_override():
    hf = dict(HF, no_rope_layers=[1, 0, 1, 0])
    cfg = ModelConfig.from_hf_dict(hf)
    model = Llama4ForCausalLM(cfg, block_size=4)
    assert model.use_rope == (True, False, True, False)
