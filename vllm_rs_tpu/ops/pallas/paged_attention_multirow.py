"""Multi-row paged-attention decode kernel for the large-batch regime.

attn_lab3 (PERF_NOTES round 2b) bisected the single-row kernel at the
B=256 bench shape: ~628 ns of FIXED per-grid-iteration charge plus ~20 ns
per (page ref × iteration) of pipeline bookkeeping — at grid (256, 1) × 28
layers the fixed charge alone is ~4.5 ms/step while the KV bytes would
stream in 6.7 ms. Round 2's multi-row attempt regressed (537 → 614 ms)
because it computed the rows SERIALLY inside one iteration, destroying the
inter-iteration DMA/compute overlap.

This kernel processes RB sequences per iteration (grid B/RB × steps,
fixed charge ÷ RB) and keeps the body fully BATCHED: per kv head, the RB
rows' pages concatenate into one [RB·C, D] operand and one block-diagonal-
masked dot computes all rows' scores at once ([RB·G, RB·C]; the off-
diagonal blocks are masked to -inf so their prob mass is exactly zero).
The RB² score/PV waste is MXU work the byte-bound attention step has to
spare (~8 µs/layer at the bench shape); what matters is that no VPU/MXU
op serializes per row.

Dispatch (ops/attention.py): used for plain global attention (no sliding
window / chunked / int8) when the batch is large; the single-row kernel
(paged_attention.py) remains the general path.

Reference counterpart: the same paged-attention decode the reference runs
via attention-rs (call site src/models/layers/attention.rs:607-616) — its
CUDA kernel assigns one thread block per (seq, head); on TPU the analog
lever is rows per grid iteration.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vllm_rs_tpu.ops.attn_meta import AttnMeta
from vllm_rs_tpu.ops.pallas.paged_attention import to_bf16

_NEG_INF = -1e30


def _mr_decode_kernel(
    # scalar prefetch
    bt_ref,  # [2, B, MB] page walk (K plane, V plane)
    cl_ref,  # [B] int32 context lens
    # tensors
    q_ref,  # [RB, Hk, G, D]
    *refs,  # [k_self, v_self,] RB*P k pages, RB*P v pages, out, m, l, acc
    rows_per_step: int,
    pages_per_step: int,
    block_size: int,
    scale: float,
    logit_softcap: float,
    num_steps: int,
    num_kv_heads: int,
    head_dim: int,
    with_self: bool,
):
    RB = rows_per_step
    P = pages_per_step
    if with_self:
        ks_ref, vs_ref = refs[0], refs[1]  # [RB, 1, Hk*D]
        refs = refs[2:]
    k_refs = refs[: RB * P]
    v_refs = refs[RB * P : 2 * RB * P]
    out_ref, m_ref, l_ref, acc_ref = refs[2 * RB * P :]

    b = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    D = head_dim
    Hk = num_kv_heads
    G = q_ref.shape[2]
    C = P * block_size
    base = j * C
    # per-score-row context lens [Hk*RB*G, 1] (static python loop —
    # scalars from SMEM; score rows are h-major then r then g)
    ctx_rows = jnp.concatenate(
        [
            jnp.full((G, 1), cl_ref[b * RB + r], jnp.int32)
            for _h in range(num_kv_heads)
            for r in range(RB)
        ],
        axis=0,
    )
    max_ctx = cl_ref[b * RB]
    for r in range(1, RB):
        max_ctx = jnp.maximum(max_ctx, cl_ref[b * RB + r])

    @pl.when(base < max_ctx)
    def _():
        # [RB*C, Hk*D] — sublane concat of all rows' pages, row-major
        kc = jnp.concatenate(
            [k_refs[t][...] for t in range(RB * P)], axis=0
        )
        vc = jnp.concatenate(
            [v_refs[t][...] for t in range(RB * P)], axis=0
        )
        # block-diagonal masked scores, ONE dot per kv head. The mask is
        # built at FULL [Hk*RB*G, RB*C] size from iotas — jnp.tile of an
        # i1 (bool) array hits an unsupported tpu.bitcast_vreg when the
        # tiled sublane count is < 8 (Mosaic failure at RB=2)
        n_rows = Hk * RB * G
        col = jax.lax.broadcasted_iota(jnp.int32, (n_rows, RB * C), 1)
        kpos = base + col % C
        krow = col // C  # which sequence the column belongs to
        qrow = (
            jax.lax.broadcasted_iota(jnp.int32, (n_rows, 1), 0) % (RB * G)
        ) // G
        mask = (krow == qrow) & (kpos < ctx_rows)
        score_rows = []
        for h in range(Hk):
            q_h = q_ref[:, h].reshape(RB * G, D).astype(jnp.bfloat16)
            k_h = kc[:, h * D : (h + 1) * D]  # [RB*C, D]
            s_h = jax.lax.dot_general(
                q_h,
                to_bf16(k_h),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [RB*G, RB*C]
            score_rows.append(s_h)
        scores = jnp.concatenate(score_rows, axis=0) * scale  # [Hk*RB*G, RB*C]
        if logit_softcap > 0.0:
            scores = jnp.tanh(scores / logit_softcap) * logit_softcap
        scores = jnp.where(mask, scores, _NEG_INF)

        m_prev = m_ref[...]  # [Hk*RB*G, 128]
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
                jnp.dot(
                    pb[h * RB * G : (h + 1) * RB * G],
                    to_bf16(vc[:, h * D : (h + 1) * D]),
                    preferred_element_type=jnp.float32,
                )
            )  # [RB*G, D]
        pv = jnp.concatenate(pv_rows, axis=0)  # [Hk*RB*G, D]
        acc_ref[...] = acc_ref[...] * alpha[:, :1] + pv
        m_ref[...] = m_new
        l_ref[...] = l_new

    @pl.when(j == num_steps - 1)
    def _():
        if with_self:
            # current tokens' own K/V as one extra column per row
            s_rows = []
            for h in range(Hk):
                q_h = q_ref[:, h].astype(jnp.float32)  # [RB, G, D]
                k_s = ks_ref[:, 0, h * D : (h + 1) * D].astype(jnp.float32)
                s_rows.append(
                    jnp.sum(q_h * k_s[:, None, :], axis=2).reshape(RB * G, 1)
                )
            s_self = jnp.concatenate(s_rows, axis=0) * scale  # [Hk*RB*G, 1]
            if logit_softcap > 0.0:
                s_self = jnp.tanh(s_self / logit_softcap) * logit_softcap
            m_prev = m_ref[...]
            l_prev = l_ref[...]
            m_new = jnp.maximum(m_prev, jnp.broadcast_to(s_self, m_prev.shape))
            alpha = jnp.exp(m_prev - m_new)
            p_self = jnp.exp(s_self - m_new[:, :1])
            l_new = alpha * l_prev + jnp.broadcast_to(p_self, l_prev.shape)
            pv_rows = []
            for h in range(Hk):
                v_s = vs_ref[:, 0, h * D : (h + 1) * D].astype(jnp.float32)
                # [RB, 1, D] * [RB, G, 1] per row → [RB*G, D]
                pv_rows.append(
                    (
                        p_self[h * RB * G : (h + 1) * RB * G].reshape(RB, G, 1)
                        * v_s[:, None, :]
                    ).reshape(RB * G, D)
                )
            pv = jnp.concatenate(pv_rows, axis=0)
            acc_ref[...] = acc_ref[...] * alpha[:, :1] + pv
            m_ref[...] = m_new
            l_ref[...] = l_new
        l = jnp.maximum(l_ref[:, :1], 1e-9)
        o = (acc_ref[...] / l).astype(out_ref.dtype)  # [Hk*RB*G, D]
        # back to [RB, Hk, G, D]
        out_ref[...] = (
            o.reshape(Hk, RB, G, D).swapaxes(0, 1).reshape(out_ref.shape)
        )


@functools.partial(
    jax.jit,
    static_argnames=(
        "block_size", "scale", "logit_softcap", "rows_per_step",
        "pages_per_step", "interpret", "with_self", "slots_per_layer",
    ),
)
def _mr_decode_call(
    q,  # [B, Hk, G, D]
    k_cache,  # [S or L*2*S, Hk*D]
    v_cache,
    block_tables,
    context_lens,
    k_self,
    v_self,
    layer_idx,
    *,
    block_size: int,
    scale: float,
    logit_softcap: float,
    rows_per_step: int,
    pages_per_step: int,
    interpret: bool,
    with_self: bool,
    slots_per_layer: int,
):
    B, Hk, G, D = q.shape
    MB = block_tables.shape[1]
    RB = rows_per_step
    P = pages_per_step
    num_steps = -(-MB // P)
    assert B % RB == 0

    last = jnp.maximum(context_lens - 1, 0) // block_size
    pages = jnp.minimum(
        jax.lax.broadcasted_iota(jnp.int32, (B, MB), 1), last[:, None]
    )
    walk = jnp.take_along_axis(block_tables, pages, axis=1)
    if num_steps * P > MB:
        # index map reads column j*P+t up to num_steps*P-1: pad with the
        # clamped last page so a partial final step never reads OOB SMEM
        # (an arbitrary page index would feed a DMA — advisor r3 finding)
        walk = jnp.pad(walk, ((0, 0), (0, num_steps * P - MB)), mode="edge")
    if layer_idx is not None:
        sp = slots_per_layer // block_size
        walk = jnp.stack(
            [walk + (2 * layer_idx) * sp, walk + (2 * layer_idx + 1) * sp]
        )
    else:
        walk = jnp.stack([walk, walk])

    def page_index(plane, r, t):
        def idx(b, j, bt_ref, cl_ref):
            return bt_ref[plane, b * RB + r, j * P + t], 0

        return idx

    k_specs = [
        pl.BlockSpec((block_size, Hk * D), page_index(0, r, t))
        for r in range(RB)
        for t in range(P)
    ]
    v_specs = [
        pl.BlockSpec((block_size, Hk * D), page_index(1, r, t))
        for r in range(RB)
        for t in range(P)
    ]
    self_specs = (
        [pl.BlockSpec((RB, 1, Hk * D), lambda b, j, bt, cl: (b, 0, 0))] * 2
        if with_self
        else []
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B // RB, num_steps),
        in_specs=[
            pl.BlockSpec((RB, Hk, G, D), lambda b, j, bt, cl: (b, 0, 0, 0)),
            *self_specs,
            *k_specs,
            *v_specs,
        ],
        out_specs=pl.BlockSpec((RB, Hk, G, D), lambda b, j, bt, cl: (b, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((Hk * RB * G, 128), jnp.float32),  # m
            pltpu.VMEM((Hk * RB * G, 128), jnp.float32),  # l
            pltpu.VMEM((Hk * RB * G, D), jnp.float32),  # acc
        ],
    )
    kernel = functools.partial(
        _mr_decode_kernel,
        rows_per_step=RB,
        pages_per_step=P,
        block_size=block_size,
        scale=scale,
        logit_softcap=logit_softcap,
        num_steps=num_steps,
        num_kv_heads=Hk,
        head_dim=D,
        with_self=with_self,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hk, G, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(
        walk,
        context_lens,
        q,
        *([k_self, v_self] if with_self else []),
        *([k_cache] * (RB * P)),
        *([v_cache] * (RB * P)),
    )


def paged_attention_decode_multirow(
    q: jax.Array,  # [B, 1, Hq, D]
    k_cache: jax.Array,  # [S, Hk*D]; pooled: [L, 2, S, Hk*D] + layer_idx
    v_cache: jax.Array,
    meta: AttnMeta,
    *,
    block_size: int,
    scale: float,
    logit_softcap: float = 0.0,
    rows_per_step: int = 4,
    pages_per_step: Optional[int] = None,
    interpret: Optional[bool] = None,
    k_self: Optional[jax.Array] = None,
    v_self: Optional[jax.Array] = None,
    layer_idx: Optional[jax.Array] = None,
) -> jax.Array:
    """Multi-row decode over block tables (global attention only).
    Drop-in for paged_attention_decode_pallas at large B."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, T, Hq, D = q.shape
    assert T == 1
    slots_per_layer = 0
    if layer_idx is not None:
        L, two, S, HkD = k_cache.shape
        slots_per_layer = S
        k_cache = v_cache = k_cache.reshape(L * two * S, HkD)
    else:
        S, HkD = k_cache.shape
    Hk = HkD // D
    G = Hq // Hk
    MB = meta.block_tables.shape[1]
    RB = rows_per_step
    while B % RB:
        RB //= 2
    RB = max(RB, 1)
    if pages_per_step is None:
        pages_per_step = max(1, 384 // block_size)
    P = min(pages_per_step, MB)
    # VMEM budget: 2 planes × RB×P pages, double-buffered by the pipeline
    # (+ q/out/scratch) must stay under ~10 of the 16 MB/core
    page_bytes = block_size * HkD * 2
    while RB > 1 and 2 * RB * P * page_bytes * 2 > 10 * 2**20:
        if P > 1:
            P -= 1
        else:
            RB //= 2
    with_self = k_self is not None
    ctx = meta.context_lens
    if with_self:
        ctx = ctx - 1  # pages cover [0, pos)
    out = _mr_decode_call(
        q.reshape(B, Hk, G, D),
        k_cache,
        v_cache,
        meta.block_tables,
        ctx,
        k_self.reshape(B, 1, Hk * D) if with_self else None,
        v_self.reshape(B, 1, Hk * D) if with_self else None,
        layer_idx,
        block_size=block_size,
        scale=float(scale),
        logit_softcap=float(logit_softcap),
        rows_per_step=RB,
        pages_per_step=P,
        interpret=bool(interpret),
        with_self=with_self,
        slots_per_layer=slots_per_layer,
    )
    return out.reshape(B, 1, Hq, D)
