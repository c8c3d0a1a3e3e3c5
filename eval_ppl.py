"""Perplexity / quantization-parity harness.

BASELINE.md requires a perplexity-delta check between quantized and bf16
weights (the reference publishes none; SURVEY.md §4 calls for doing
better). Scores a token stream teacher-forced through the engine's model
at any quantization setting and reports NLL/token + perplexity.

    python eval_ppl.py --model <dir|gguf> [--quant int4] [--text file.txt]
    python eval_ppl.py --selftest       # random tiny model, both precisions
"""

from __future__ import annotations

import argparse
import json
import math
import sys

import numpy as np


def score_tokens(model, params, token_ids, block_size=16, chunk=512):
    """Mean NLL per predicted token (teacher forcing, chunked prefill)."""
    import jax
    import jax.numpy as jnp

    from vllm_rs_tpu.config import CacheConfig
    from vllm_rs_tpu.ops.attn_meta import AttnMeta

    n = len(token_ids)
    n_blocks = -(-n // block_size) + 1
    cache = CacheConfig(block_size=block_size, num_blocks=n_blocks)
    kv = model.init_kv_cache(cache)

    @jax.jit
    def chunk_nll(params, kv, toks, meta, targets, valid):
        kv, hidden = model.forward(params, toks, meta, kv)
        cfg = model.config
        from vllm_rs_tpu.models.layers import rms_norm

        h = rms_norm(hidden[0], params["final_norm"], cfg.rms_norm_eps, cfg.norm_plus_one)
        if cfg.tie_word_embeddings:
            logits = jnp.dot(h, params["embed"].T.astype(h.dtype),
                             preferred_element_type=jnp.float32)
        else:
            from vllm_rs_tpu.models.layers import linear

            logits = linear(params["lm_head"], h).astype(jnp.float32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        tok_lp = jnp.take_along_axis(logp, targets[:, None], axis=1)[:, 0]
        return kv, jnp.sum(jnp.where(valid, -tok_lp, 0.0)), jnp.sum(valid)

    total_nll, total_cnt = 0.0, 0
    for start in range(0, n - 1, chunk):
        c = min(chunk, n - 1 - start)
        toks = np.zeros((1, chunk), np.int32)
        toks[0, :c] = token_ids[start : start + c]
        positions = np.zeros((1, chunk), np.int32)
        positions[0, :c] = np.arange(start, start + c)
        slots = np.full((1, chunk), cache.num_slots, np.int32)
        slots[0, :c] = np.arange(start, start + c)
        targets = np.zeros((chunk,), np.int32)
        targets[:c] = token_ids[start + 1 : start + 1 + c]
        valid = np.zeros((chunk,), bool)
        valid[:c] = True
        meta = AttnMeta(
            positions=jnp.asarray(positions),
            slot_mapping=jnp.asarray(slots),
            block_tables=jnp.arange(n_blocks, dtype=jnp.int32)[None, :],
            context_lens=jnp.asarray([start + c], jnp.int32),
            last_token_idx=jnp.asarray([c - 1], jnp.int32),
            seq_slots=jnp.zeros((1,), jnp.int32),
        )
        kv, nll, cnt = chunk_nll(
            params, kv, jnp.asarray(toks), meta, jnp.asarray(targets), jnp.asarray(valid)
        )
        total_nll += float(nll)
        total_cnt += int(cnt)
    return total_nll / max(total_cnt, 1), total_cnt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None)
    ap.add_argument("--quant", choices=["int8", "int4"], default=None)
    ap.add_argument("--text", default=None, help="text file to score")
    ap.add_argument("--max-tokens", type=int, default=4096)
    ap.add_argument("--selftest", action="store_true")
    args = ap.parse_args()

    if args.selftest:
        import jax

        from vllm_rs_tpu.config import ModelConfig
        from vllm_rs_tpu.models.llama import CausalLM

        cfg = ModelConfig(
            model_type="llama", hidden_size=128, intermediate_size=256,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            vocab_size=512, eos_token_ids=(0,),
        )
        model = CausalLM(cfg, block_size=16)
        toks = list(np.random.RandomState(0).randint(1, 511, size=512))
        results = {}
        for q in (None, "int8", "int4"):
            params = model.init_params(jax.random.PRNGKey(0), quant=q, quant_group=64)
            nll, cnt = score_tokens(model, params, toks)
            results[q or "bf16"] = nll
        out = {
            "metric": "ppl_selftest",
            "nll_bf16": round(results["bf16"], 4),
            "nll_int8": round(results["int8"], 4),
            "nll_int4": round(results["int4"], 4),
            "delta_int8": round(results["int8"] - results["bf16"], 4),
            "delta_int4": round(results["int4"] - results["bf16"], 4),
        }
        print(json.dumps(out))
        return

    from vllm_rs_tpu.api import EngineBuilder

    engine = EngineBuilder(args.model, quant=args.quant).build()
    model = engine.runner.model
    if args.text:
        with open(args.text) as f:
            text = f.read()
        ids = engine.tokenizer.encode(text)
        token_ids = (ids.ids if hasattr(ids, "ids") else ids)[: args.max_tokens]
    else:
        token_ids = list(np.random.RandomState(0).randint(1, model.config.vocab_size - 1, size=1024))
    nll, cnt = score_tokens(model, engine.runner.params, token_ids,
                            block_size=engine.econfig.cache.block_size)
    print(json.dumps({
        "metric": "perplexity",
        "value": round(math.exp(min(nll, 20)), 4),
        "nll_per_token": round(nll, 4),
        "tokens": cnt,
        "quant": args.quant or "bf16",
    }))


if __name__ == "__main__":
    main()
