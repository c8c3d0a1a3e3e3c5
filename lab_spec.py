"""Bisect the on-device speculative loop's per-iteration cost (round 4).

The grounded spec bench measured 18.4 effective tok/s vs 314 plain —
~110 ms per verify iteration where a plain decode step costs ~3 ms. This
lab times the loop's components on the real chip:

  full      — run_spec_multi as shipped
  noverify  — loop body with the forward stubbed (preds = drafts[:, :1]
              pattern → accept-all), isolating proposer + scatters + loop
  fwd       — fori_loop of the T=k+1 verify forward alone (classic
              write-in-scan KV path), isolating the forward
  plain     — run_multi for reference

Usage: python lab_spec.py [--iters 32] [--k 8]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from bench import build
from vllm_rs_tpu.config import SamplingParams
from vllm_rs_tpu.ops.attn_meta import AttnMeta


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--size", default="0.6b")
    args = ap.parse_args()
    k = args.k
    iters = args.iters

    engine = build(args.size)
    runner = engine.runner
    # a live sequence with ~256 tokens of context
    sp = SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True)
    rs = np.random.RandomState(0)
    vocab = engine.econfig.model.vocab_size
    prompt = list(rs.randint(1, vocab - 1, size=256))
    sid = engine.add_request(prompt, sp)
    while not engine.requests[sid].seq.output_token_ids:
        engine.step()
    seq = engine.requests[sid].seq
    engine.scheduler.config = type(engine.scheduler.config)(
        **{**engine.scheduler.config.__dict__, "spec_decode_k": k,
           "multi_step_decode": iters}
    )

    from vllm_rs_tpu.core.scheduler import ScheduledBatch

    def mk_batch():
        engine.block_manager.append_slot(seq, iters + k + 1)
        return ScheduledBatch(kind="decode", seqs=[seq], n_steps=iters)

    def timed(fn, n=3):
        fn()  # compile
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return min(ts)

    # --- plain multi-step reference ---
    nt0 = seq.num_tokens

    def plain():
        seq.num_cached_tokens = 0
        while len(seq.output_token_ids) > 1:
            seq.output_token_ids.pop()
        out = runner.run_multi(mk_batch(), iters)
        np.asarray(out)

    t_plain = timed(plain)
    print(f"plain multi-step k={iters}: {t_plain*1e3:.1f} ms "
          f"({iters/t_plain:.0f} tok/s, {t_plain/iters*1e3:.2f} ms/iter)")

    # --- full spec loop ---
    def full():
        seq.num_cached_tokens = 0
        while len(seq.output_token_ids) > 1:
            seq.output_token_ids.pop()
        out = runner.run_spec_multi(mk_batch(), iters, k)
        return out

    st0 = dict(getattr(runner, "spec_stats", {}) or {})
    t_full = timed(full)
    st1 = runner.spec_stats
    vsteps = (st1["vsteps"] - st0.get("vsteps", 0)) // 4  # 4 runs total... approx
    print(f"spec loop budget={iters} k={k}: {t_full*1e3:.1f} ms "
          f"(~{max(vsteps,1)} iters/run)")

    # --- fori_loop of the verify forward alone ---
    B = 4
    T = k + 1
    MB = runner._bt_width([seq])
    bt = np.zeros((B, MB), np.int32)
    bt[0, : len(seq.block_table)] = seq.block_table[:MB]
    bt_j = jnp.asarray(bt)
    pos0 = seq.num_tokens - 1
    seq_slots = jnp.full((B,), runner.mamba_slots, jnp.int32)

    def fwd_loop(params, kv, n):
        def body(i, carry):
            kv, acc = carry
            pos = jnp.full((B,), pos0, jnp.int32)[:, None] + jnp.arange(T)[None, :]
            slot = jnp.full((B, T), runner.num_slots, jnp.int32)
            meta = AttnMeta(
                positions=pos,
                slot_mapping=slot,
                block_tables=bt_j,
                context_lens=jnp.full((B,), pos0 + k, jnp.int32),
                last_token_idx=jnp.full((B,), k, jnp.int32),
                seq_slots=seq_slots,
            )
            tok = jnp.full((B, T), 5, jnp.int32) + acc[:, None]
            kv, preds = runner._verify_impl(params, kv, tok, meta)
            return kv, acc + preds[:, 0]

        kv, acc = jax.lax.fori_loop(
            0, n, body, (kv, jnp.zeros((B,), jnp.int32))
        )
        return kv, acc

    jf = jax.jit(fwd_loop, static_argnames=("n",), donate_argnames=("kv",))

    def fwd():
        runner.kv, acc = jf(runner.params, runner.kv, iters)
        np.asarray(acc)

    t_fwd = timed(fwd)
    print(f"verify-forward fori_loop x{iters}: {t_fwd*1e3:.1f} ms "
          f"({t_fwd/iters*1e3:.2f} ms/iter)")

    # --- loop machinery without the forward ---
    from vllm_rs_tpu.utils.spec import propose_prompt_lookup_device

    Lbuf = 1024
    max_out = iters + k

    def shell_loop(tok_buf, cur_len, n):
        rows = jnp.arange(B, dtype=jnp.int32)
        iot_T = jnp.arange(T, dtype=jnp.int32)[None, :]
        out0 = jnp.zeros((B, max_out), jnp.int32)

        def body(i, carry):
            tok_buf, cur_len, n_out, out = carry
            drafts = propose_prompt_lookup_device(tok_buf, cur_len, k=k)
            preds = jnp.concatenate(
                [drafts, drafts[:, :1]], axis=1
            )  # accept-all stand-in
            n_emit = jnp.full((B,), 2, jnp.int32)
            tok_mask = iot_T < n_emit[:, None]
            buf_idx = jnp.where(tok_mask, cur_len[:, None] + iot_T, Lbuf)
            tok_buf = tok_buf.at[rows[:, None], buf_idx].set(preds, mode="drop")
            out_idx = jnp.where(tok_mask, n_out[:, None] + iot_T, max_out)
            out = out.at[rows[:, None], out_idx].set(preds, mode="drop")
            return (tok_buf, cur_len + n_emit, n_out + n_emit, out)

        return jax.lax.fori_loop(
            0, n, body, (tok_buf, cur_len, jnp.zeros((B,), jnp.int32), out0)
        )

    js = jax.jit(shell_loop, static_argnames=("n",))
    tb = jnp.zeros((B, Lbuf), jnp.int32)
    cl = jnp.full((B,), 256, jnp.int32)

    def shell():
        out = js(tb, cl, iters)
        np.asarray(out[2])

    t_shell = timed(shell)
    print(f"loop shell (proposer+scatters) x{iters}: {t_shell*1e3:.1f} ms "
          f"({t_shell/iters*1e3:.2f} ms/iter)")


if __name__ == "__main__":
    main()
