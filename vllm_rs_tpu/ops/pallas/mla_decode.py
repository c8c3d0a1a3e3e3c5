"""MLA paged-decode kernel (flash-decoding over compressed latent pages).

TPU counterpart of the reference's dedicated `mla_paged_decode` kernel
(src/models/layers/mla_attention.rs:335-460; attention-rs MLA kernels,
SURVEY §2.5). The XLA gather path in ops/mla.py scales to a few hundred
gather elements per layer but collapses at B ≳ 128 (PERF_NOTES round-2
measurements: dense gathers from a large pool are pathological on TPU at
that scale) — this kernel reuses the paged-attention machinery (in-graph
pre-clamped page walk, pooled layer offsets, per-page BlockSpec refs,
online softmax) for the latent layout.

Absorbed-form specifics that make this kernel MXU-friendly:
- One latent row serves as BOTH key and value: score = q_cat · row and
  out += p · row, where q_cat = [q_nope @ w_uk | q_pe] is [H, R+P]. Each
  page therefore needs ONE score dot and ONE pv dot — no per-kv-head loop.
- The query HEADS form the M dimension (H = 128 for DeepSeek-class
  models), so every MXU pass carries full rows — unlike GQA decode where
  M = G ≤ 8.
- R+P = 576 is not lane-aligned; both dots CONTRACT over it (Mosaic pads
  the 4.5-tile dimension with zeros, which is exact), and the accumulator
  carries the padded [H, R+P] — the caller slices [:R] for the w_uv
  projection.

Deferred-write decode: pages cover [0, pos); the current token's latent
row folds in as one extra column at the last grid step, and the caller
scatters all layers' rows once after the layer scan (ops/mla.py
scatter_deferred_mla).
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


def _mla_decode_kernel(
    # scalar prefetch
    walk_ref,  # [B, MB] int32 pre-clamped page walk (+ layer offset)
    cl_ref,  # [B] int32 context lens (EXCLUDING the current token)
    # tensors
    q_ref,  # [1, H, F] bf16 — [q_nope @ w_uk | q_pe]
    self_ref,  # [1, 1, F] current token's latent row (3-D so the block's
    # last two dims (1, F) equal the array dims — Mosaic block rule)
    *refs,  # P latent pages, out, m, l, acc
    pages_per_step: int,
    block_size: int,
    scale: float,
    num_steps: int,
):
    P = pages_per_step
    page_refs = refs[:P]
    out_ref = refs[P]
    m_ref, l_ref, acc_ref = refs[P + 1 :]

    b = pl.program_id(0)
    j = pl.program_id(1)
    ctx = cl_ref[b]

    @pl.when(j == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    base = j * P * block_size

    @pl.when(base < ctx)
    def _():
        # [P*bs, F] — sublane concat of contiguous latent pages
        rows = jnp.concatenate([page_refs[t][...] for t in range(P)], axis=0)
        q = q_ref[0].astype(jnp.bfloat16)  # [H, F]
        # ONE wide score dot: contraction over F covers ckv AND rope parts
        scores = jax.lax.dot_general(
            q, to_bf16(rows), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [H, P*bs]
        kpos = base + jax.lax.broadcasted_iota(
            jnp.int32, (1, P * block_size), dimension=1
        )
        scores = jnp.where(kpos < ctx, scores, _NEG_INF)

        m_prev = m_ref[...]  # [H, 128] (broadcast across lanes)
        l_prev = l_ref[...]
        m_cur = jnp.max(scores, axis=1, keepdims=True)  # [H, 1]
        m_new = jnp.maximum(m_prev, jnp.broadcast_to(m_cur, m_prev.shape))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(scores - m_new[:, :1])  # [H, P*bs]
        l_new = alpha * l_prev + jnp.broadcast_to(
            jnp.sum(p, axis=1, keepdims=True), l_prev.shape
        )
        # ONE pv dot: latent rows are the values (absorbed form)
        pv = jax.lax.dot_general(
            p.astype(jnp.bfloat16), to_bf16(rows),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [H, F]
        acc_ref[...] = acc_ref[...] * alpha[:, :1] + pv
        m_ref[...] = m_new
        l_ref[...] = l_new

    @pl.when(j == num_steps - 1)
    def _():
        # fold the current token's own latent as one extra column (its row
        # is scattered into the pool after the layer scan)
        q = q_ref[0].astype(jnp.float32)  # [H, F]
        row = self_ref[0, 0].astype(jnp.float32)  # [F]
        s_self = jnp.sum(q * row[None, :], axis=1, keepdims=True) * scale  # [H, 1]
        m_prev = m_ref[...]
        l_prev = l_ref[...]
        m_new = jnp.maximum(m_prev, jnp.broadcast_to(s_self, m_prev.shape))
        alpha = jnp.exp(m_prev - m_new)
        p_self = jnp.exp(s_self - m_new[:, :1])  # [H, 1]
        l_new = alpha * l_prev + jnp.broadcast_to(p_self, l_prev.shape)
        acc = acc_ref[...] * alpha[:, :1] + p_self * row[None, :]
        l = jnp.maximum(l_new[:, :1], 1e-9)
        out_ref[0] = (acc / l).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("block_size", "scale", "pages_per_step", "interpret"),
)
def _mla_decode_call(
    q_cat,  # [B, H, F]
    pool_flat,  # [L*S, F] latent pool (flattened; walk carries the offset)
    self_rows,  # [B, 1, F]
    walk,  # [B, MB] pre-clamped page ids (+ layer offset)
    context_lens,  # [B] EXCLUDING the current token
    *,
    block_size: int,
    scale: float,
    pages_per_step: int,
    interpret: bool,
):
    B, H, F = q_cat.shape
    MB = walk.shape[1]
    P = pages_per_step
    num_steps = -(-MB // P)
    if num_steps * P > MB:
        # index map reads column j*P+t up to num_steps*P-1: pad with the
        # clamped last page so a partial final step never reads OOB SMEM
        walk = jnp.pad(walk, ((0, 0), (0, num_steps * P - MB)), mode="edge")

    def page_index(t):
        def idx(b, j, walk_ref, cl_ref):
            return walk_ref[b, j * P + t], 0

        return idx

    page_specs = [pl.BlockSpec((block_size, F), page_index(t)) for t in range(P)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, num_steps),
        in_specs=[
            pl.BlockSpec((1, H, F), lambda b, j, w, c: (b, 0, 0)),
            pl.BlockSpec((1, 1, F), lambda b, j, w, c: (b, 0, 0)),
            *page_specs,
        ],
        out_specs=pl.BlockSpec((1, H, F), lambda b, j, w, c: (b, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((H, 128), jnp.float32),  # m
            pltpu.VMEM((H, 128), jnp.float32),  # l
            pltpu.VMEM((H, F), jnp.float32),  # acc
        ],
    )
    kernel = functools.partial(
        _mla_decode_kernel,
        pages_per_step=P,
        block_size=block_size,
        scale=scale,
        num_steps=num_steps,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, F), q_cat.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(walk, context_lens, q_cat, self_rows, *([pool_flat] * P))


def mla_paged_decode_pallas(
    q_nope: jax.Array,  # [B, 1, H, dn]
    q_pe: jax.Array,  # [B, 1, H, dr] (rope applied)
    ckv_new: jax.Array,  # [B, 1, R]
    kpe_new: jax.Array,  # [B, 1, P]
    pool: jax.Array,  # [L, S, R+P] full latent pool (read-only)
    layer_idx: jax.Array,  # traced int32
    w_uk: jax.Array,  # [H, dn, R]
    w_uv: jax.Array,  # [H, R, dv]
    meta: AttnMeta,
    *,
    block_size: int,
    scale: float,
    kv_lora_rank: int,
    pages_per_step: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Deferred-write absorbed MLA decode via the Pallas kernel.
    Drop-in for ops/mla.py::mla_paged_attention_deferred → [B, 1, H, dv]."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, T, H, dn = q_nope.shape
    assert T == 1
    R = kv_lora_rank
    L, S, F = pool.shape
    num_blocks = S // block_size

    # absorb w_uk once per step, then concatenate the rope part: ONE query
    # operand covers both score terms
    q_lat = jnp.einsum(
        "bthd,hdr->bthr", q_nope.astype(jnp.float32), w_uk.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    q_cat = jnp.concatenate(
        [q_lat[:, 0], q_pe[:, 0].astype(jnp.float32)], axis=-1
    ).astype(jnp.bfloat16)  # [B, H, F]
    self_rows = jnp.concatenate([ckv_new[:, 0], kpe_new[:, 0]], axis=-1).astype(
        pool.dtype
    )[:, None]  # [B, 1, F]

    # pre-clamped page walk + layer offset (see paged_attention.py: clamp
    # math inside index maps runs per (grid step × ref) on the sparse core)
    ctx = meta.context_lens - 1  # pages cover [0, pos)
    MB = meta.block_tables.shape[1]
    last = jnp.maximum(ctx - 1, 0) // block_size
    pages_idx = jnp.minimum(
        jax.lax.broadcasted_iota(jnp.int32, (B, MB), 1), last[:, None]
    )
    walk = jnp.take_along_axis(meta.block_tables, pages_idx, axis=1)
    walk = walk + layer_idx * num_blocks

    if pages_per_step is None:
        pages_per_step = max(1, 384 // block_size)
    P = min(pages_per_step, MB)

    out_cat = _mla_decode_call(
        q_cat,
        pool.reshape(L * S, F),
        self_rows,
        walk,
        ctx,
        block_size=block_size,
        scale=float(scale),
        pages_per_step=P,
        interpret=bool(interpret),
    )  # [B, H, F] — only [:R] (the latent part) is meaningful output
    out_lat = out_cat[..., :R].astype(jnp.float32)  # [B, H, R]
    out = jnp.einsum(
        "bhr,hrv->bhv", out_lat, w_uv.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    return out[:, None].astype(q_nope.dtype)  # [B, 1, H, dv]
