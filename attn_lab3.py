"""Decode attention lab for the LARGE-BATCH / short-context regime
(0.6B @ batch 256 — the reference's marquee comparison).

Bisects the per-grid-iteration cost of the paged decode kernel by timing
stripped kernel variants at the bench shape:
  full    — the production body
  noconcat— body without the [P*bs, HkD] VPU concats (computes on page 0
            only; WRONG numerics, timing only)
  empty   — no body at all (pure pipeline + DMA cost)
  nodma   — empty body AND all page index maps pinned to page 0 (the
            pipeline elides duplicate fetches → pure grid/fixed cost)

Honest timing: in-graph layer scan x fori repetition, differenced R=10-2
to cancel the tunnel RTT (kernel_lab.py::chain_time pattern).
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30

# 0.6B bench shape: qwen3-0.6b = 28 layers, Hq=16, Hk=8, D=128, bs=16
B = int(sys.argv[sys.argv.index("--batch") + 1]) if "--batch" in sys.argv else 256
Hq, Hk, D, bs = 16, 8, 128, 16
G = Hq // Hk
L = 28
CTX = int(sys.argv[sys.argv.index("--ctx") + 1]) if "--ctx" in sys.argv else 192
MB = 24  # block-table width tier (384 tokens)
P = 8

key = jax.random.PRNGKey(0)
# pool big enough that every row's pages are DISTINCT (aliased pages would
# be elided by the pipeline and understate DMA cost)
S = 65536
k_cache = jax.random.normal(key, (S, Hk * D), jnp.bfloat16)
v_cache = jax.random.normal(key, (S, Hk * D), jnp.bfloat16)
q = jax.random.normal(key, (B, Hk, G, D), jnp.bfloat16)


def make_kernel(mode):
    def kern(bt_ref, cl_ref, q_ref, *refs):
        k_refs = refs[:P]
        v_refs = refs[P : 2 * P]
        out_ref, m_ref, l_ref, acc_ref = refs[2 * P :]
        b = pl.program_id(0)
        j = pl.program_id(1)
        ctx = cl_ref[b]

        @pl.when(j == 0)
        def _():
            m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
            l_ref[...] = jnp.zeros_like(l_ref)
            acc_ref[...] = jnp.zeros_like(acc_ref)

        base = j * P * bs
        valid = base < ctx

        if mode in ("full", "noconcat"):

            @pl.when(valid)
            def _():
                if mode == "full":
                    kc = jnp.concatenate([k_refs[t][...] for t in range(P)], axis=0)
                    vc = jnp.concatenate([v_refs[t][...] for t in range(P)], axis=0)
                    W = P * bs
                else:
                    kc = k_refs[0][...]
                    vc = v_refs[0][...]
                    W = bs
                rows = []
                for h in range(Hk):
                    qh = q_ref[0, h].astype(jnp.bfloat16)
                    s = jax.lax.dot_general(
                        qh, kc[:, h * D : (h + 1) * D].astype(jnp.bfloat16),
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    rows.append(s)
                scores = jnp.concatenate(rows, axis=0) * 0.088
                kpos = base + jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
                scores = jnp.where(kpos < ctx, scores, _NEG_INF)
                m_prev = m_ref[...]
                l_prev = l_ref[...]
                m_cur = jnp.max(scores, axis=1, keepdims=True)
                m_new = jnp.maximum(m_prev, jnp.broadcast_to(m_cur, m_prev.shape))
                alpha = jnp.exp(m_prev - m_new)
                p = jnp.exp(scores - m_new[:, :1])
                l_new = alpha * l_prev + jnp.broadcast_to(
                    jnp.sum(p, axis=1, keepdims=True), l_prev.shape
                )
                pb = p.astype(jnp.bfloat16)
                pv_rows = []
                for h in range(Hk):
                    pv_rows.append(
                        jnp.dot(pb[h * G : (h + 1) * G],
                                vc[:, h * D : (h + 1) * D].astype(jnp.bfloat16),
                                preferred_element_type=jnp.float32)
                    )
                pv = jnp.concatenate(pv_rows, axis=0)
                acc_ref[...] = acc_ref[...] * alpha[:, :1] + pv
                m_ref[...] = m_new
                l_ref[...] = l_new

        @pl.when(j == pl.num_programs(1) - 1)
        def _():
            l = jnp.maximum(l_ref[:, :1], 1e-9)
            out_ref[0] = (acc_ref[...] / l).astype(out_ref.dtype).reshape(
                out_ref.shape[1:]
            )

    return kern


def build(mode):
    num_steps = -(-MB // P)

    def page_index(t):
        if mode == "nodma":
            def idx(b, j, bt_ref, cl_ref):
                return bt_ref[b, 0], 0
        else:
            def idx(b, j, bt_ref, cl_ref):
                return bt_ref[b, j * P + t], 0
        return idx

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, num_steps),
        in_specs=[
            pl.BlockSpec((1, Hk, G, D), lambda b, j, bt, cl: (b, 0, 0, 0)),
            *[pl.BlockSpec((bs, Hk * D), page_index(t)) for t in range(P)],
            *[pl.BlockSpec((bs, Hk * D), page_index(t)) for t in range(P)],
        ],
        out_specs=pl.BlockSpec((1, Hk, G, D), lambda b, j, bt, cl: (b, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((Hk * G, 128), jnp.float32),
            pltpu.VMEM((Hk * G, 128), jnp.float32),
            pltpu.VMEM((Hk * G, D), jnp.float32),
        ],
    )
    kmode = "empty" if mode == "nodma" else mode
    call = pl.pallas_call(
        make_kernel(kmode),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hk, G, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )
    return call


def time_mode(mode):
    # distinct pages per row (no cross-row elision), clamped walk
    bt = np.zeros((B, MB), np.int32)
    cl = np.full((B,), CTX, np.int32)
    blocks = -(-CTX // bs)
    for r in range(B):
        bt[r, :blocks] = (np.arange(blocks) + r * blocks) % (S // bs)
    last = np.maximum(cl - 1, 0) // bs
    walk = bt[np.arange(B)[:, None], np.minimum(np.arange(MB)[None, :], last[:, None])]
    walk = jnp.asarray(walk)
    clj = jnp.asarray(cl)
    call = build(mode)

    def run(h, R):
        def outer(i, h):
            def one(h, _):
                o = call(walk, clj, h, *([k_cache] * P), *([v_cache] * P))
                return o.astype(h.dtype), None
            h2, _ = jax.lax.scan(one, h, None, length=L)
            return h2
        return jnp.sum(jax.lax.fori_loop(0, R, outer, h).astype(jnp.float32))

    fs = {R: jax.jit(functools.partial(run, R=R)) for R in (2, 10)}

    def m(R, n=3):
        float(np.asarray(fs[R](q)))
        t0 = time.perf_counter()
        for _ in range(n):
            float(np.asarray(fs[R](q)))
        return (time.perf_counter() - t0) / n

    per_layer = (m(10) - m(2)) / (8 * L)
    iters = B * (-(-MB // P))
    print(
        f"{mode:9s} B={B} ctx={CTX}: {per_layer*1e6:8.1f} us/layer "
        f"({per_layer/iters*1e9:6.0f} ns/iter) -> {per_layer*L*1e3:6.2f} ms/step({L}L)",
        flush=True,
    )


if "--bs-sweep" in sys.argv:
    # bigger pages cut the ~20ns/page-slot pipeline bookkeeping; sweep
    # block_size x P at fixed ctx (clamped walk elides dead pages)
    for bsz, plist in ((16, (8, 24)), (32, (4, 12)), (64, (2, 6)), (128, (1, 3)), (256, (1, 2))):
        bs = bsz
        MB = -(-384 // bs)  # same 384-token table tier
        for p in plist:
            P = min(p, MB)
            time_mode("full")
elif "--sweep" in sys.argv:
    # how does the fixed cost scale with refs per iteration vs iterations?
    for p in (1, 2, 4, 8, 12, 24):
        P = p
        for mode in ("full", "empty"):
            time_mode(mode)
else:
    for mode in ("full", "noconcat", "empty", "nodma"):
        time_mode(mode)
