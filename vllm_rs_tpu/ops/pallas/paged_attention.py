"""Paged attention decode kernel (flash-decoding over block tables).

TPU counterpart of the reference's paged-attention decode kernels
(attention-rs; call site src/models/layers/attention.rs:607-616). One
query token per sequence attends over its block table:

- grid (B, ceil(MB / P)); each step DMAs P pages of K and P of V. The KV
  cache is slot-major ([S, Hk, D]) so one page is ONE fully contiguous
  descriptor of block_size*Hk*D*2 bytes — per-DMA overhead dominates small
  transfers on v5e, so descriptor size is the first-order perf knob.
- pages arrive as [bs, Hk*D]; a kv head is a lane-aligned column slice
  (D = 128 = one lane tile), so per-head views cost no relayout.
- online softmax (m, l, acc) carried in VMEM scratch across the page
  dimension, per kv head; pages past context_len are clamped to the last
  valid page so the pipeline elides duplicate fetches, and their scores
  are masked.
- GQA: q arrives as [B, Hk, G, D] (G = Hq // Hk query heads per kv head).

Supports logit softcap (gemma) and sliding windows.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vllm_rs_tpu.ops.attn_meta import AttnMeta

_NEG_INF = -1e30


def to_bf16(x):
    """Convert a KV tile to bf16 for the MXU feed.

    fp8-e4m3 takes a hand-rolled integer bit-twiddle instead of the IEEE
    convert: e4m3 (bias 7) maps into bf16 (bias 127) by placing sign/exp/
    mantissa and re-biasing the exponent (+120) — 6 integer VPU ops on
    16-bit lanes, all of which Mosaic lowers natively. The measured
    motivation: the generic fp8→bf16 convert made fp8-KV decode 2.65×
    SLOWER than bf16 KV at the 0.6b batch-256 shape (PERF_NOTES r4 #6),
    inverting the reference's fp8-KV win (kvcache_allocator.rs:188-193
    halves KV bytes). Semantics delta vs IEEE: exact ±0 maps to ±0 (the
    em==0 guard); e4m3 subnormals (magnitude < 2^-6 ≈ 0.016, far below
    KV magnitudes) decode up to 2× off (treated as normals); e4m3 NaN
    (0x7f) becomes a large finite value (KV data contains neither)."""
    if x.dtype == jnp.float8_e4m3fn:
        # arithmetic on int32 lanes: Mosaic's 16-bit integer shifts crash
        # the TPU compiler (bisected on-chip — u16 shl → tpu_compile_helper
        # exit 1); i32 is the native VPU lane width and lowers cleanly
        bits = jax.lax.bitcast_convert_type(x, jnp.uint8).astype(jnp.int32)
        sign = (bits & 0x80) << 8
        em = (bits & 0x7F) << 4  # exp+mantissa into the bf16 field positions
        mag = jnp.where(em == 0, 0, em + (120 << 7))  # re-bias 7 → 127
        return jax.lax.bitcast_convert_type(
            (sign | mag).astype(jnp.uint16), jnp.bfloat16
        )
    return x.astype(jnp.bfloat16)


def _decode_kernel(
    # scalar prefetch
    bt_ref,  # [B, MB] int32 block tables
    cl_ref,  # [B] int32 context lens
    sw_ref,  # [1] int32 sliding window (0 = global attention)
    # tensors
    q_ref,  # [1, Hk, G, D]
    *refs,  # [k_self, v_self,] P k pages, P v pages, [P ks, P vs scales,] out, m, l, acc
    pages_per_step: int,
    block_size: int,
    scale: float,
    logit_softcap: float,
    num_steps: int,
    num_kv_heads: int,
    head_dim: int,
    with_self: bool = False,
    kv_int8: bool = False,
    chunked: bool = False,
    with_lse: bool = False,
):
    P = pages_per_step
    if with_self:
        ks_ref, vs_ref = refs[0], refs[1]  # [1, 1, Hk*D] current token K/V
        refs = refs[2:]
    k_refs = refs[:P]
    v_refs = refs[P : 2 * P]
    refs = refs[2 * P :]
    if kv_int8:
        ksc_refs = refs[:P]  # [bs, Hk] f32 per-slot-per-head K scales
        vsc_refs = refs[P : 2 * P]
        refs = refs[2 * P :]
    out_ref = refs[0]
    refs = refs[1:]
    if with_lse:
        # extra outputs: the online-softmax running max and denominator,
        # so the caller can flash-merge this pool attention with another
        # partial (the verify forward's in-window part)
        m_out_ref, l_out_ref = refs[0], refs[1]  # [1, Hk*G, 128]
        refs = refs[2:]
    m_ref, l_ref, acc_ref = refs

    b = pl.program_id(0)
    j = pl.program_id(1)
    ctx = cl_ref[b]

    @pl.when(j == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    base = j * P * block_size
    sw = sw_ref[0]
    if chunked:
        # llama4 chunked attention (mod.rs chunked mask): keys from the
        # query's own chunk only — low bound floor(qpos / C) * C, where
        # the query position is ctx-1 (ctx excludes the query under
        # with_self, so it IS the query position there)
        qpos = ctx if with_self else ctx - 1
        sw_lo = (qpos // jnp.maximum(sw, 1)) * sw
    else:
        # first admitted key position under a sliding window. With deferred
        # self-KV (with_self) ctx excludes the query token itself: the window
        # [pos-sw+1, pos] then covers only sw-1 POOL positions plus the self
        # column, so the low bound shifts up by one (without the shift the
        # kernel attended sw+1 tokens — advisor finding, paged_attention.py:411)
        sw_lo = ctx - sw + (1 if with_self else 0)
    valid_step = base < ctx
    valid_step = jnp.logical_and(
        valid_step,
        jnp.logical_or(sw <= 0, base + P * block_size > sw_lo),
    )

    @pl.when(valid_step)
    def _():
        D = head_dim
        Hk = num_kv_heads
        # [P*bs, Hk*D] — sublane concat of contiguous pages (measured cheap)
        kc = jnp.concatenate([k_refs[t][...] for t in range(P)], axis=0)
        vc = jnp.concatenate([v_refs[t][...] for t in range(P)], axis=0)
        if kv_int8:
            # int8 KV: dequant folds into per-COLUMN multiplies — K scales
            # scale the score columns, V scales scale the prob columns
            # (dequant never touches the [*, D] data on the VPU)
            ksc = jnp.concatenate([ksc_refs[t][...] for t in range(P)], axis=0)
            vsc = jnp.concatenate([vsc_refs[t][...] for t in range(P)], axis=0)
        G = q_ref.shape[2]
        # per-head MXU dots (cheap), then ONE wide softmax update — the
        # per-head-loop version spent ~8x on small-vector op overhead
        score_rows = []
        for h in range(Hk):
            q = q_ref[0, h].astype(jnp.bfloat16)  # [G, D]
            k_h = kc[:, h * D : (h + 1) * D]  # lane-aligned slice, [P*bs, D]
            s_h = jax.lax.dot_general(
                q,
                to_bf16(k_h),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if kv_int8:
                s_h = s_h * ksc[:, h][None, :]
            score_rows.append(s_h)
        scores = jnp.concatenate(score_rows, axis=0) * scale  # [Hk*G, P*bs]
        if logit_softcap > 0.0:
            scores = jnp.tanh(scores / logit_softcap) * logit_softcap
        kpos = base + jax.lax.broadcasted_iota(
            jnp.int32, (1, P * block_size), dimension=1
        )
        mask = kpos < ctx
        mask = jnp.logical_and(
            mask, jnp.logical_or(sw <= 0, kpos >= sw_lo)
        )
        scores = jnp.where(mask, scores, _NEG_INF)

        m_prev = m_ref[...]  # [Hk*G, 128] (value broadcast across lanes)
        l_prev = l_ref[...]
        m_cur = jnp.max(scores, axis=1, keepdims=True)  # [Hk*G, 1]
        m_new = jnp.maximum(m_prev, jnp.broadcast_to(m_cur, m_prev.shape))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(scores - m_new[:, :1])  # [Hk*G, P*bs]
        l_new = alpha * l_prev + jnp.broadcast_to(
            jnp.sum(p, axis=1, keepdims=True), l_prev.shape
        )
        pb = p.astype(jnp.bfloat16)
        pv_rows = []
        for h in range(Hk):
            p_h = pb[h * G : (h + 1) * G]
            if kv_int8:
                p_h = (p[h * G : (h + 1) * G] * vsc[:, h][None, :]).astype(
                    jnp.bfloat16
                )
            pv_rows.append(
                jnp.dot(
                    p_h,
                    to_bf16(vc[:, h * D : (h + 1) * D]),
                    preferred_element_type=jnp.float32,
                )
            )
        pv = jnp.concatenate(pv_rows, axis=0)  # [Hk*G, D]
        acc_ref[...] = acc_ref[...] * alpha[:, :1] + pv
        m_ref[...] = m_new
        l_ref[...] = l_new

    @pl.when(j == num_steps - 1)
    def _():
        if with_self:
            # fold the current token's own K/V in as one extra column (its
            # KV is written to the pool after the layer scan, so the pages
            # do not contain it)
            D = head_dim
            Hk = num_kv_heads
            G = q_ref.shape[2]
            s_rows = []
            pv_rows = []
            for h in range(Hk):
                q = q_ref[0, h].astype(jnp.float32)  # [G, D]
                k_s = ks_ref[0, 0, h * D : (h + 1) * D].astype(jnp.float32)  # [D]
                s_rows.append(jnp.sum(q * k_s[None, :], axis=1, keepdims=True))
            s_self = jnp.concatenate(s_rows, axis=0) * scale  # [Hk*G, 1]
            if logit_softcap > 0.0:
                s_self = jnp.tanh(s_self / logit_softcap) * logit_softcap
            m_prev = m_ref[...]
            l_prev = l_ref[...]
            m_new = jnp.maximum(m_prev, jnp.broadcast_to(s_self, m_prev.shape))
            alpha = jnp.exp(m_prev - m_new)
            p_self = jnp.exp(s_self - m_new[:, :1])  # [Hk*G, 1]
            l_new = alpha * l_prev + jnp.broadcast_to(p_self, l_prev.shape)
            for h in range(Hk):
                v_s = vs_ref[0, 0, h * D : (h + 1) * D].astype(jnp.float32)
                pv_rows.append(p_self[h * G : (h + 1) * G] * v_s[None, :])
            pv = jnp.concatenate(pv_rows, axis=0)  # [Hk*G, D]
            acc_ref[...] = acc_ref[...] * alpha[:, :1] + pv
            m_ref[...] = m_new
            l_ref[...] = l_new
        l = jnp.maximum(l_ref[:, :1], 1e-9)
        out_ref[0] = (acc_ref[...] / l).astype(out_ref.dtype).reshape(out_ref.shape[1:])
        if with_lse:
            m_out_ref[0] = m_ref[...]
            l_out_ref[0] = l_ref[...]


@functools.partial(
    jax.jit,
    static_argnames=(
        "block_size", "scale", "logit_softcap",
        "pages_per_step", "interpret", "with_self", "kv_int8",
        "slots_per_layer", "chunked", "with_lse",
    ),
)
def _decode_call(
    q,  # [B, Hk, G, D]
    k_cache,  # [S, Hk*D] — blocked directly into (bs, Hk*D) pages, no reshape
    v_cache,
    block_tables,  # [B, MB]
    context_lens,  # [B]
    window,  # [1] int32 (0 = global)
    k_self=None,  # [B, Hk*D] current-token K (deferred-write decode)
    v_self=None,
    k_scales=None,  # [S, Hk] f32 (int8 KV)
    v_scales=None,
    layer_idx=None,  # traced int32 scalar: pooled mode (see below)
    *,
    block_size: int,
    scale: float,
    logit_softcap: float,
    pages_per_step: int,
    interpret: bool,
    with_self: bool = False,
    kv_int8: bool = False,
    slots_per_layer: int = 0,
    chunked: bool = False,
    with_lse: bool = False,
):
    B, Hk, G, D = q.shape
    MB = block_tables.shape[1]
    P = pages_per_step
    num_steps = -(-MB // P)

    # Pre-clamp the page walk IN-GRAPH (walk[b, p] = bt[b, min(p, last)]):
    # the index map becomes a single scalar load. Clamp math inside the
    # index map runs on the sparse core once per (grid step x ref) — at
    # grid (B, MB/P) x 2P refs it dominated short-context decode, and made
    # cost scale with the table width instead of the context (attn_lab.py:
    # MB=128 ctx=376 went 123 -> 33 us/layer). Clamped repeats are elided
    # by the pipeline, so dead pages cost nothing. The tiny gather is
    # loop-invariant across the layer scan (CSE'd by XLA).
    last = jnp.maximum(context_lens - 1, 0) // block_size
    pages = jnp.minimum(
        jax.lax.broadcasted_iota(jnp.int32, (B, MB), 1), last[:, None]
    )
    walk = jnp.take_along_axis(block_tables, pages, axis=1)
    if num_steps * P > MB:
        # the index map reads column j*P+t up to num_steps*P-1; pad with the
        # clamped last page so the final partial step never reads past the
        # table (an OOB SMEM read feeds an arbitrary page index to a DMA)
        walk = jnp.pad(walk, ((0, 0), (0, num_steps * P - MB)), mode="edge")

    # Pooled mode: k_cache IS the whole [L*2*S, F] pool and the layer
    # offset folds into the walk table — the kernel reads its layer's
    # pages directly from the pool. This removes the per-layer 32 MB
    # slice copy that feeding kv[i] to a pallas operand forces (attn_lab2:
    # the copy was 113 us/layer, 3.6 ms/step on the 8B — the kernel
    # itself costs ~30 us/layer).
    if layer_idx is not None:
        sp = slots_per_layer // block_size
        walk = jnp.stack(
            [walk + (2 * layer_idx) * sp, walk + (2 * layer_idx + 1) * sp]
        )  # [2, B, MB]: K plane, V plane
    else:
        walk = jnp.stack([walk, walk])

    def page_index(plane, t):
        def idx(b, j, bt_ref, cl_ref, sw_ref):
            return bt_ref[plane, b, j * P + t], 0

        return idx

    k_specs = [
        pl.BlockSpec((block_size, Hk * D), page_index(0, t)) for t in range(P)
    ]
    v_specs = [
        pl.BlockSpec((block_size, Hk * D), page_index(1, t)) for t in range(P)
    ]
    sc_specs = (
        [pl.BlockSpec((block_size, Hk), page_index(0, t)) for t in range(P)]
        + [pl.BlockSpec((block_size, Hk), page_index(1, t)) for t in range(P)]
        if kv_int8
        else []
    )
    self_specs = (
        [pl.BlockSpec((1, 1, Hk * D), lambda b, j, bt, cl, sw: (b, 0, 0))] * 2
        if with_self
        else []
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, num_steps),
        in_specs=[
            pl.BlockSpec((1, Hk, G, D), lambda b, j, bt, cl, sw: (b, 0, 0, 0)),
            *self_specs,
            *k_specs,
            *v_specs,
            *sc_specs,
        ],
        out_specs=[
            pl.BlockSpec((1, Hk, G, D), lambda b, j, bt, cl, sw: (b, 0, 0, 0)),
            *(
                [pl.BlockSpec((1, Hk * G, 128), lambda b, j, bt, cl, sw: (b, 0, 0))] * 2
                if with_lse
                else []
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((Hk * G, 128), jnp.float32),  # m
            pltpu.VMEM((Hk * G, 128), jnp.float32),  # l
            pltpu.VMEM((Hk * G, D), jnp.float32),  # acc
        ],
    )
    kernel = functools.partial(
        _decode_kernel,
        pages_per_step=P,
        block_size=block_size,
        scale=scale,
        logit_softcap=logit_softcap,
        num_steps=num_steps,
        num_kv_heads=Hk,
        head_dim=D,
        with_self=with_self,
        kv_int8=kv_int8,
        chunked=chunked,
        with_lse=with_lse,
    )
    out_shape = [jax.ShapeDtypeStruct((B, Hk, G, D), q.dtype)]
    if with_lse:
        out_shape += [jax.ShapeDtypeStruct((B, Hk * G, 128), jnp.float32)] * 2
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(
        walk,
        context_lens,
        window,
        q,
        *([k_self, v_self] if with_self else []),
        *([k_cache] * P),
        *([v_cache] * P),
        *(([k_scales] * P + [v_scales] * P) if kv_int8 else []),
    )
    if with_lse:
        out, m, l = out
        return out, m[:, :, 0], l[:, :, 0]
    return out[0]


def paged_attention_pallas(
    q: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    meta: AttnMeta,
    *,
    block_size: int,
    scale: float,
    logit_softcap: float = 0.0,
    sliding_window: int = 0,
    chunked: bool = False,
) -> jax.Array:
    """Backend entry: decode (T == 1) uses the flash-decoding kernel;
    prefill (T > 1) the chunked flash-prefill kernel over paged KV."""
    if q.shape[1] == 1:
        return paged_attention_decode_pallas(
            q,
            k_cache,
            v_cache,
            meta,
            block_size=block_size,
            scale=scale,
            logit_softcap=logit_softcap,
            sliding_window=sliding_window,
            chunked=chunked,
        )
    from vllm_rs_tpu.ops.pallas.prefill_attention import paged_prefill_pallas

    return paged_prefill_pallas(
        q,
        k_cache,
        v_cache,
        meta,
        block_size=block_size,
        scale=scale,
        logit_softcap=logit_softcap,
        sliding_window=sliding_window,
        chunked=chunked,
    )


def paged_attention_decode_pallas(
    q: jax.Array,  # [B, 1, Hq, D]
    k_cache: jax.Array,  # [S, Hk*D]; pooled mode: [L, 2, S, Hk*D] with layer_idx
    v_cache: jax.Array,
    meta: AttnMeta,
    *,
    block_size: int,
    scale: float,
    logit_softcap: float = 0.0,
    sliding_window: int = 0,
    pages_per_step: Optional[int] = None,
    interpret: Optional[bool] = None,
    k_self: Optional[jax.Array] = None,  # [B, 1, Hk, D] deferred-write K
    v_self: Optional[jax.Array] = None,
    k_scales: Optional[jax.Array] = None,  # [S, Hk] (int8 cache)
    v_scales: Optional[jax.Array] = None,
    layer_idx: Optional[jax.Array] = None,  # pooled mode (traced scalar)
    chunked: bool = False,  # llama4 chunked attention: window = chunk size
    with_lse: bool = False,  # also return (m, l) for flash-merging
) -> jax.Array:
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, T, Hq, D = q.shape
    assert T == 1, "decode kernel handles single-token queries"
    if with_lse:
        assert k_self is None and k_scales is None, (
            "with_lse is the pool-partial mode (verify forward): no self "
            "column, bf16 KV only"
        )
    slots_per_layer = 0
    if layer_idx is not None:
        # pooled mode: k_cache is the full [L, 2, S, F] pool; flatten to
        # [L*2*S, F] (a free reshape) and fold the layer offset into the
        # page walk so no per-layer slice ever materializes
        L, two, S, HkD = k_cache.shape
        slots_per_layer = S
        k_cache = v_cache = k_cache.reshape(L * two * S, HkD)
    else:
        S, HkD = k_cache.shape
    Hk = HkD // D
    G = Hq // Hk
    MB = meta.block_tables.shape[1]
    if pages_per_step is None:
        # ~384 slots per grid step: measured optimum across block sizes
        # (attn_lab3 --bs-sweep, B=256 ctx=192: bs=16 P=24 660us/layer vs
        # P=8 756; bs=64 P=6 542; bs=128 P=3 537). Grid-iteration cost is
        # dominated by per-page-ref pipeline bookkeeping (~20ns/slot) plus
        # a fixed per-iteration charge — wider steps amortize both.
        # Experiment knob (bench A/Bs only): VLLM_RS_TPU_SLOTS_PER_STEP.
        import os

        target = int(os.environ.get("VLLM_RS_TPU_SLOTS_PER_STEP", "384"))
        pages_per_step = max(1, target // block_size)
    P = min(pages_per_step, MB)
    qg = q.reshape(B, Hk, G, D)
    if isinstance(sliding_window, jax.Array):
        window = sliding_window.astype(jnp.int32).reshape(1)
    else:
        window = jnp.full((1,), int(sliding_window), dtype=jnp.int32)
    with_self = k_self is not None
    ctx = meta.context_lens
    if with_self:
        # the current token is not in the pool: pages cover [0, pos)
        ctx = ctx - 1
    out = _decode_call(
        qg,
        k_cache,
        v_cache,
        meta.block_tables,
        ctx,
        window,
        k_self.reshape(B, 1, Hk * D) if with_self else None,
        v_self.reshape(B, 1, Hk * D) if with_self else None,
        k_scales,
        v_scales,
        layer_idx,
        block_size=block_size,
        scale=float(scale),
        logit_softcap=float(logit_softcap),
        pages_per_step=P,
        interpret=bool(interpret),
        with_self=with_self,
        kv_int8=k_scales is not None,
        slots_per_layer=slots_per_layer,
        chunked=bool(chunked),
        with_lse=bool(with_lse),
    )
    if with_lse:
        o, m, l = out
        return o.reshape(B, 1, Hq, D), m, l
    return out.reshape(B, 1, Hq, D)
