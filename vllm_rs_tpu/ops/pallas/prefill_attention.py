"""Chunked-prefill flash attention over the paged KV cache.

TPU counterpart of the reference's prefill attention kernels
(flash-attn / flashinfer prefill with paged KV, attention.rs:607-616):
query chunks of a sequence attend over ALL of that sequence's pages —
earlier context from prefix cache or previous chunks plus the chunk's own
freshly written KV — under a causal mask on absolute positions.

Structure (flash-attention over a page-walked KV stream):
- grid (B, n_q_tiles, n_kv_steps); each kv step DMAs P whole pages per
  operand via scalar-prefetched block tables (same trick as the decode
  kernel: pages past the needed range are clamped so the pipeline elides
  refetches).
- online softmax (m, l, acc) scratch per (kv-head, q-row-group); the
  causal mask compares absolute key positions (page-walk order == position
  order) with absolute query positions (chunk start + in-tile offset).
- a kv step is skipped when entirely masked: beyond context, or beyond the
  q tile's last position (strictly-future pages under causality).
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


def _prefill_kernel(
    # scalar prefetch
    bt_ref,  # [B, MB] block tables
    cl_ref,  # [B] context lens (chunk end position per row)
    qs_ref,  # [B] chunk start position per row
    sw_ref,  # [1] sliding window (0 = none)
    # tensors
    q_ref,  # [1, TQ, Hq*D]
    *refs,  # P k-page refs, P v-page refs, out, m, l, acc
    pages_per_step: int,
    block_size: int,
    scale: float,
    logit_softcap: float,
    num_kv_steps: int,
    num_kv_heads: int,
    groups: int,
    head_dim: int,
    q_tile: int,
    chunked: bool = False,
):
    P = pages_per_step
    k_refs = refs[:P]
    v_refs = refs[P : 2 * P]
    out_ref = refs[2 * P]
    m_ref, l_ref, acc_ref = refs[2 * P + 1 :]

    b = pl.program_id(0)
    qi = pl.program_id(1)
    j = pl.program_id(2)
    ctx = cl_ref[b]
    q_start = qs_ref[b] + qi * q_tile  # absolute position of tile row 0
    sw = sw_ref[0]

    @pl.when(j == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    base = j * P * block_size  # absolute position of this step's first key
    q_last = q_start + q_tile - 1
    valid = jnp.logical_and(base < ctx, base <= q_last)
    if chunked:
        # llama4 chunked attention: the tile's earliest admitted key is
        # the first row's chunk start, floor(q_start / C) * C
        lo_tile = (q_start // jnp.maximum(sw, 1)) * sw
        valid = jnp.logical_and(
            valid, jnp.logical_or(sw <= 0, base + P * block_size > lo_tile)
        )
    else:
        valid = jnp.logical_and(
            valid, jnp.logical_or(sw <= 0, base + P * block_size > q_start - sw)
        )

    @pl.when(valid)
    def _():
        D = head_dim
        Hk = num_kv_heads
        G = groups
        TQ = q_tile
        kc = jnp.concatenate([k_refs[t][...] for t in range(P)], axis=0)
        vc = jnp.concatenate([v_refs[t][...] for t in range(P)], axis=0)
        S = P * block_size
        kpos = base + jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
        qpos = q_start + jax.lax.broadcasted_iota(jnp.int32, (TQ * G, 1), 0) // G

        causal = kpos <= qpos  # [TQ*G, S]
        in_ctx = kpos < ctx
        mask = jnp.logical_and(causal, in_ctx)
        if chunked:
            lo_q = (qpos // jnp.maximum(sw, 1)) * sw  # per-row chunk start
            mask = jnp.logical_and(
                mask, jnp.logical_or(sw <= 0, kpos >= lo_q)
            )
        else:
            mask = jnp.logical_and(
                mask, jnp.logical_or(sw <= 0, kpos > qpos - sw)
            )

        for h in range(Hk):
            # q rows for head h: [TQ, G, D] → [TQ*G, D]
            q = q_ref[0, :, (h * G) * D : (h + 1) * G * D].reshape(TQ * G, D)
            k_h = kc[:, h * D : (h + 1) * D]
            s_h = (
                jax.lax.dot_general(
                    q.astype(jnp.bfloat16),
                    to_bf16(k_h),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                * scale
            )
            if logit_softcap > 0.0:
                s_h = jnp.tanh(s_h / logit_softcap) * logit_softcap
            s_h = jnp.where(mask, s_h, _NEG_INF)

            rows = slice(h * TQ * G, (h + 1) * TQ * G)
            m_prev = m_ref[rows, :]
            l_prev = l_ref[rows, :]
            m_cur = jnp.max(s_h, axis=1, keepdims=True)
            m_new = jnp.maximum(m_prev, jnp.broadcast_to(m_cur, m_prev.shape))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s_h - m_new[:, :1])
            l_new = alpha * l_prev + jnp.broadcast_to(
                jnp.sum(p, axis=1, keepdims=True), l_prev.shape
            )
            pv = jnp.dot(
                p.astype(jnp.bfloat16),
                to_bf16(vc[:, h * D : (h + 1) * D]),
                preferred_element_type=jnp.float32,
            )
            acc_ref[rows, :] = acc_ref[rows, :] * alpha[:, :1] + pv
            m_ref[rows, :] = m_new
            l_ref[rows, :] = l_new

    @pl.when(j == num_kv_steps - 1)
    def _():
        TQ = q_tile
        G = groups
        Hk = num_kv_heads
        D = head_dim
        l = jnp.maximum(l_ref[...][:, :1], 1e-9)
        o = acc_ref[...] / l  # [Hk*TQ*G, D]
        # rows are ordered h-major: [Hk, TQ, G, D] → [TQ, Hq*D]
        o = o.reshape(Hk, TQ, G * D)
        o = jnp.concatenate([o[h] for h in range(Hk)], axis=1)  # [TQ, Hk*G*D]
        out_ref[0] = o.astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "block_size", "scale", "logit_softcap",
        "pages_per_step", "q_tile", "interpret", "chunked",
    ),
)
def _prefill_call(
    q,  # [B, TQtot, Hq*D] (padded to q_tile multiple)
    k_cache,  # [S, Hk*D]
    v_cache,
    block_tables,
    context_lens,
    q_starts,  # [B]
    window,  # [1]
    *,
    block_size: int,
    scale: float,
    logit_softcap: float,
    pages_per_step: int,
    q_tile: int,
    interpret: bool,
    chunked: bool = False,
):
    B, TQtot, HqD = q.shape
    S, HkD = k_cache.shape
    MB = block_tables.shape[1]
    P = pages_per_step
    num_kv_steps = -(-MB // P)
    n_q_tiles = TQtot // q_tile
    D = 128  # lane-aligned head dim required
    Hk = HkD // D
    Hq = HqD // D
    G = Hq // Hk

    def page_index(t):
        def idx(b, qi, j, bt_ref, cl_ref, qs_ref, sw_ref):
            ctx = cl_ref[b]
            last = jnp.maximum(ctx - 1, 0) // block_size
            page = jnp.minimum(j * P + t, last)
            return bt_ref[b, page], 0

        return idx

    kv_specs = [pl.BlockSpec((block_size, HkD), page_index(t)) for t in range(P)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(B, n_q_tiles, num_kv_steps),
        in_specs=[
            pl.BlockSpec((1, q_tile, HqD), lambda b, qi, j, *_: (b, qi, 0)),
            *kv_specs,
            *kv_specs,
        ],
        out_specs=pl.BlockSpec((1, q_tile, HqD), lambda b, qi, j, *_: (b, qi, 0)),
        scratch_shapes=[
            pltpu.VMEM((Hk * q_tile * G, 128), jnp.float32),  # m
            pltpu.VMEM((Hk * q_tile * G, 128), jnp.float32),  # l
            pltpu.VMEM((Hk * q_tile * G, D), jnp.float32),  # acc
        ],
    )
    kernel = functools.partial(
        _prefill_kernel,
        pages_per_step=P,
        block_size=block_size,
        scale=scale,
        logit_softcap=logit_softcap,
        num_kv_steps=num_kv_steps,
        num_kv_heads=Hk,
        groups=G,
        head_dim=D,
        q_tile=q_tile,
        chunked=chunked,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, TQtot, HqD), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(block_tables, context_lens, q_starts, window, q, *([k_cache] * P), *([v_cache] * P))


def paged_prefill_pallas(
    q: jax.Array,  # [B, T, Hq, D]
    k_cache: jax.Array,  # [S, Hk*D]
    v_cache: jax.Array,
    meta: AttnMeta,
    *,
    block_size: int,
    scale: float,
    logit_softcap: float = 0.0,
    sliding_window=0,
    q_tile: int = 128,
    pages_per_step: int = 8,
    interpret: Optional[bool] = None,
    chunked: bool = False,
) -> jax.Array:
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, T, Hq, D = q.shape
    q_tile = min(q_tile, max(T, 8))
    Tp = -(-T // q_tile) * q_tile
    qf = q.reshape(B, T, Hq * D)
    if Tp != T:
        qf = jnp.pad(qf, ((0, 0), (0, Tp - T), (0, 0)))
    # chunk start per row = first query's absolute position
    q_starts = meta.positions[:, 0]
    if isinstance(sliding_window, jax.Array):
        window = sliding_window.astype(jnp.int32).reshape(1)
    else:
        window = jnp.full((1,), int(sliding_window), dtype=jnp.int32)
    MB = meta.block_tables.shape[1]
    out = _prefill_call(
        qf,
        k_cache,
        v_cache,
        meta.block_tables,
        meta.context_lens,
        q_starts.astype(jnp.int32),
        window,
        block_size=block_size,
        scale=float(scale),
        logit_softcap=float(logit_softcap),
        pages_per_step=min(pages_per_step, MB),
        q_tile=q_tile,
        interpret=bool(interpret),
        chunked=bool(chunked),
    )
    return out[:, :T].reshape(B, T, Hq, D)
