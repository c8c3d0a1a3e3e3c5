"""0.6b batch-256 component bisect using ONLY bench-proven shapes.

The round-2 tools (step_bisect.py, attn_lab3.py) die on the round-3
environment's shape-dependent runtime faults (PERF_NOTES r3 finding #4),
so this bisect drives the REAL engine exactly like `bench.py --size 0.6b
--batch 256` (which runs), with one component monkeypatched out per
variant, each in its own engine (fresh jit trace):

  full        — production
  no_scatter  — deferred-KV scatter replaced by identity
  no_attn     — decode attention block returns the o-projection of q
                (projections + rope kept; WRONG numerics, timing only)

The deltas are the components' true in-situ shares today.
"""

import json
import time

import numpy as np


def run_bench(tag, patch=None):
    import bench
    from vllm_rs_tpu.config import SamplingParams

    undo = patch() if patch else None
    try:
        engine = bench.build("0.6b")
        import dataclasses as _dc

        engine.econfig = _dc.replace(
            engine.econfig,
            scheduler=_dc.replace(
                engine.econfig.scheduler, max_consecutive_prefills=10_000
            ),
        )
        engine.scheduler.config = engine.econfig.scheduler
        vocab = engine.econfig.model.vocab_size
        rs = np.random.RandomState(0)
        sp = SamplingParams(temperature=0.0, max_tokens=128, ignore_eos=True)

        def once():
            prompts = [
                list(rs.randint(1, vocab - 1, size=128)) for _ in range(256)
            ]
            t0 = time.time()
            outs = engine.generate(prompts, sp)
            wall = time.time() - t0
            return sum(len(o.output_token_ids) for o in outs), wall

        once()  # warmup
        engine.step_timings.clear()
        toks, wall = once()
        print(json.dumps({"variant": tag, "tok_s": round(toks / wall, 1),
                          "wall_s": round(wall, 2),
                          "steps": engine.step_timing_stats()}), flush=True)
        del engine
        import gc

        gc.collect()
    finally:
        if undo:
            undo()


def patch_no_scatter():
    import vllm_rs_tpu.ops.attention as am

    orig = am.scatter_deferred_kv
    am.scatter_deferred_kv = lambda kv, k, v, s, backend="auto": kv
    return lambda: setattr(am, "scatter_deferred_kv", orig)


def patch_no_head():
    from vllm_rs_tpu.models.llama import CausalLM
    import jax.numpy as jnp

    orig = CausalLM.compute_logits

    def no_head(self, params, hidden, meta):
        from vllm_rs_tpu.models.layers import gather_last_hidden

        last = gather_last_hidden(hidden, meta)  # [B, D]
        V = self.config.vocab_size
        reps = -(-V // last.shape[-1])
        return jnp.tile(last.astype(jnp.float32), (1, reps))[:, :V]

    CausalLM.compute_logits = no_head
    return lambda: setattr(CausalLM, "compute_logits", orig)


def patch_no_sampling():
    # runner binds `sample` at import time: patch the runner module's name
    import vllm_rs_tpu.core.runner as rm
    import jax.numpy as jnp

    orig = rm.sample

    def fake_sample(logits, st, key, **kw):
        return jnp.argmax(logits[:, :8], axis=-1).astype(jnp.int32)

    rm.sample = fake_sample
    return lambda: setattr(rm, "sample", orig)


def patch_no_attn():
    import vllm_rs_tpu.models.layers as layers_mod

    orig = layers_mod.attention_block_deferred

    def no_attn(lp, h, meta, kv_l, config, **kw):
        from vllm_rs_tpu.models.layers import linear, qkv_rope

        B, T, _ = h.shape
        q, k, v = qkv_rope(lp, h, meta, config)
        o = linear(lp["o"], q.reshape(B, T, -1))
        return o, k, v

    layers_mod.attention_block_deferred = no_attn
    return lambda: setattr(layers_mod, "attention_block_deferred", orig)


def patch_no_prefill_attend():
    """Prefill keeps the KV write but skips the attend — isolates the
    prefill flash-attention kernel's share (decode uses the deferred
    path, unaffected). WRONG numerics; timing only."""
    import vllm_rs_tpu.models.layers as layers_mod
    import vllm_rs_tpu.ops.attention as am

    orig = layers_mod.paged_attention

    def fake(q, k_new, v_new, kv_l, meta, **kw):
        kv_l = am.write_kv_layer(kv_l, k_new, v_new, meta.slot_mapping)
        return q, kv_l

    layers_mod.paged_attention = fake
    return lambda: setattr(layers_mod, "paged_attention", orig)


def patch_no_prefill_write():
    """Prefill attends over the stale cache (no KV write scatter) —
    isolates the prefill KV write cost. Stubs BOTH write paths: the
    classic per-layer write_kv_layer and the deferred fresh-prefill
    post-scan block scatter."""
    import vllm_rs_tpu.ops.attention as am

    orig_w = am.write_kv_layer
    orig_s = am.scatter_deferred_kv_blocks
    am.write_kv_layer = lambda kv_l, k, v, slots, **kw: kv_l
    am.scatter_deferred_kv_blocks = lambda kv, kn, vn, bw, bs: kv

    def undo():
        am.write_kv_layer = orig_w
        am.scatter_deferred_kv_blocks = orig_s

    return undo


def patch_no_fresh_attend():
    """Deferred fresh-prefill path keeps qkv/o projections + the KV
    return but skips the in-window attention — isolates the dense
    attend_gathered share of the new prefill step."""
    import jax.numpy as jnp

    import vllm_rs_tpu.models.layers as layers_mod
    from vllm_rs_tpu.models.layers import linear, qkv_rope

    orig = layers_mod.attention_block_prefill_deferred

    def fake(lp, h, meta, config, *, scale, sliding_window=0):
        B, T, _ = h.shape
        q, k, v = qkv_rope(lp, h, meta, config)
        o = linear(lp["o"], q.reshape(B, T, -1).astype(h.dtype))
        return o, k, v

    layers_mod.attention_block_prefill_deferred = fake
    return lambda: setattr(layers_mod, "attention_block_prefill_deferred", orig)


def patch_all_aux():
    undos = [patch_no_scatter(), patch_no_attn(), patch_no_head(), patch_no_sampling()]

    def undo():
        for u in undos:
            u()

    return undo


if __name__ == "__main__":
    import sys

    which = sys.argv[1:] or ["full", "no_scatter", "no_attn"]
    variants = {
        "full": None,
        "no_scatter": patch_no_scatter,
        "no_attn": patch_no_attn,
        "no_head": patch_no_head,
        "no_sampling": patch_no_sampling,
        "no_prefill_attend": patch_no_prefill_attend,
        "no_prefill_write": patch_no_prefill_write,
        "no_fresh_attend": patch_no_fresh_attend,
        "trunk_only": patch_all_aux,
    }
    for w in which:
        run_bench(w, variants[w])
