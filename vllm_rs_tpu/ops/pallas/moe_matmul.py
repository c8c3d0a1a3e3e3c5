"""Indexed-expert quantized matmul for MoE decode.

y[m] = x[m] @ dequant(W[ids[m]]) — each row routes to its own expert.
Counterpart of the reference's decode-side MoE grouped GEMMs
(moe.rs moe_gemm* families). The previous decode path gathered and
dequantized the selected experts' weights to bf16 ([M, K, N] materialized
— 2-4x the weight traffic); this kernel streams each selected expert's
int8/int4 tiles straight from the stacked pool, scalar-prefetching the
expert id into the BlockSpec index maps, and dequantizes in-register.

Decode shapes: M = T·k ≤ 64 rows. Each row is its own MXU pass (M=1 per
dot) — wasteful on paper, but the op is weight-streaming-bound and the
MXU-pass element rate is independent of M on this hardware.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vllm_rs_tpu.quant.pack import PackedInt4Tensor, QuantizedTensor


def _cdiv(a, b):
    return -(-a // b)


def _w8_kernel(ids_ref, xs_ref, x_ref, w_ref, s_ref, out_ref, acc_ref, *, n_k, n_g, G):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[0]  # [1, BK]
    parts = []  # tree-reduced (quant_matmul.py: serial FMA chain stalls)
    for g in range(n_g):
        sl = slice(g * G, (g + 1) * G)
        p = jax.lax.dot_general(
            x[:, sl], w_ref[sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        parts.append(p.astype(jnp.float32) * s_ref[0, g])
    while len(parts) > 1:
        parts = [
            parts[i] + parts[i + 1] if i + 1 < len(parts) else parts[i]
            for i in range(0, len(parts), 2)
        ]
    acc_ref[...] = acc_ref[...] + parts[0]

    @pl.when(k == n_k - 1)
    def _():
        out_ref[0] = (acc_ref[...] * xs_ref[0]).astype(out_ref.dtype)


def _w4_kernel(
    ids_ref, xs_ref, x_ref, w_ref, s_lo_ref, s_hi_ref, out_ref, acc_ref,
    *, n_k, n_g, G,
):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = w_ref[...]  # [BKp, BN] packed: low nibble = row r, high = row K/2+r
    w32 = w.astype(jnp.int32)
    lo = ((w32 << 28) >> 28).astype(jnp.int8)
    hi = (w32 >> 4).astype(jnp.int8)
    BKp = w.shape[0]
    x = x_ref[0]  # [1, 2*BKp]
    parts = []  # tree-reduced (quant_matmul.py: serial FMA chain stalls)
    for g in range(n_g):
        sl = slice(g * G, (g + 1) * G)
        x_lo = x[:, sl]
        x_hi = x[:, BKp + g * G : BKp + (g + 1) * G]
        p_lo = jax.lax.dot_general(
            x_lo, lo[sl], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        p_hi = jax.lax.dot_general(
            x_hi, hi[sl], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        part = p_lo.astype(jnp.float32) * s_lo_ref[0, g]
        part += p_hi.astype(jnp.float32) * s_hi_ref[0, g]
        parts.append(part)
    while len(parts) > 1:
        parts = [
            parts[i] + parts[i + 1] if i + 1 < len(parts) else parts[i]
            for i in range(0, len(parts), 2)
        ]
    acc_ref[...] = acc_ref[...] + parts[0]

    @pl.when(k == n_k - 1)
    def _():
        out_ref[0] = (acc_ref[...] * xs_ref[0]).astype(out_ref.dtype)


def _quantize_rows_int8(x):
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=1, keepdims=True)
    s = jnp.maximum(amax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)
    return q, s


def _pick_bkbn(K_steps, N, G):
    BN = 128
    for d in range(1024, 127, -128):
        if N % d == 0:
            BN = d
            break
    BK = 0
    for cand in (1024, 512, 256, 128, 64):
        if K_steps % cand or cand % G:
            continue
        if 3 * cand * BN <= 6 * 2**20:  # weight tile + x + headroom
            BK = cand
            break
    return BK, BN


@functools.partial(jax.jit, static_argnames=("interpret",))
def _indexed_w8(x, ids, qweight, scales, *, interpret=False):
    """x [M, K] bf16, ids [M] i32, qweight [E, K, N] i8,
    scales [E, K/G, N] f32 → [M, N] bf16."""
    M, K = x.shape
    E, _, N = qweight.shape
    KG = scales.shape[1]
    G = K // KG
    BK, BN = _pick_bkbn(K, N, G)
    n_k = K // BK
    n_g = BK // G
    xq, xs = _quantize_rows_int8(x)
    w_flat = qweight.reshape(E * K, N)
    s_flat = scales.reshape(E * n_k, n_g, N)

    out = pl.pallas_call(
        functools.partial(_w8_kernel, n_k=n_k, n_g=n_g, G=G),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(M, N // BN, n_k),
            in_specs=[
                pl.BlockSpec((1, 1, 1), lambda m, n, k, ids: (m, 0, 0)),
                pl.BlockSpec((1, 1, BK), lambda m, n, k, ids: (m, 0, k)),
                pl.BlockSpec(
                    (BK, BN), lambda m, n, k, ids: (ids[m] * n_k + k, n)
                ),
                pl.BlockSpec(
                    (1, n_g, BN), lambda m, n, k, ids: (ids[m] * n_k + k, 0, n)
                ),
            ],
            out_specs=pl.BlockSpec((1, 1, BN), lambda m, n, k, ids: (m, 0, n)),
            scratch_shapes=[pltpu.VMEM((1, BN), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((M, 1, N), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * K * N, bytes_accessed=M * K * N // 8, transcendentals=0
        ),
        interpret=interpret,
    )(ids, xs.astype(jnp.float32)[:, None, :], xq[:, None, :], w_flat, s_flat)
    return out[:, 0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _indexed_w4(x, ids, qweight, scales, *, interpret=False):
    """x [M, K] bf16, ids [M] i32, qweight [E, K/2, N] packed i8 (canonical
    split-half layout: low nibble = row r, high = row K/2 + r),
    scales [E, K/G, N] f32 → [M, N] bf16."""
    M, K = x.shape
    E, Kh, N = qweight.shape
    KG = scales.shape[1]
    G = K // KG
    BKp, BN = _pick_bkbn(Kh, N, G)
    n_k = Kh // BKp
    n_g = BKp // G
    xq, xs = _quantize_rows_int8(x)
    # x rows must pair with the packed halves: [first half | second half]
    w_flat = qweight.reshape(E * Kh, N)
    # scales rows: lo scales = groups [0, Kh/G), hi = [Kh/G, 2Kh/G)
    s = scales.reshape(E, 2, Kh // G, N)
    s_lo = s[:, 0].reshape(E * n_k, n_g, N)
    s_hi = s[:, 1].reshape(E * n_k, n_g, N)
    # x split: row half alignment handled in-kernel via BKp offset: pass x
    # as [M, K] with the two halves at [k*BKp : (k+1)*BKp] and
    # [Kh + k*BKp : ...] — reorder x so each k-step's block holds both
    x2 = jnp.concatenate(
        [
            xq[:, :Kh].reshape(M, n_k, BKp),
            xq[:, Kh:].reshape(M, n_k, BKp),
        ],
        axis=2,
    ).reshape(M, 2 * Kh)

    out = pl.pallas_call(
        functools.partial(_w4_kernel, n_k=n_k, n_g=n_g, G=G),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(M, N // BN, n_k),
            in_specs=[
                pl.BlockSpec((1, 1, 1), lambda m, n, k, ids: (m, 0, 0)),
                pl.BlockSpec((1, 1, 2 * BKp), lambda m, n, k, ids: (m, 0, k)),
                pl.BlockSpec(
                    (BKp, BN), lambda m, n, k, ids: (ids[m] * n_k + k, n)
                ),
                pl.BlockSpec(
                    (1, n_g, BN), lambda m, n, k, ids: (ids[m] * n_k + k, 0, n)
                ),
                pl.BlockSpec(
                    (1, n_g, BN), lambda m, n, k, ids: (ids[m] * n_k + k, 0, n)
                ),
            ],
            out_specs=pl.BlockSpec((1, 1, BN), lambda m, n, k, ids: (m, 0, n)),
            scratch_shapes=[pltpu.VMEM((1, BN), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((M, 1, N), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * K * N, bytes_accessed=M * K * N // 16, transcendentals=0
        ),
        interpret=interpret,
    )(ids, xs.astype(jnp.float32)[:, None, :], x2[:, None, :], w_flat, s_lo, s_hi)
    return out[:, 0]


def moe_matmul_indexed(
    x: jax.Array,  # [M, K] bf16
    ids: jax.Array,  # [M] int32
    w,  # QuantizedTensor / PackedInt4Tensor with stacked [E, ...] leaves
    interpret: Optional[bool] = None,
) -> Optional[jax.Array]:
    """y[m] = x[m] @ dequant(w[ids[m]]); None when the shape/format is
    unsupported (caller falls back to the gather path)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if isinstance(w, QuantizedTensor):
        if w.zeros is not None:
            return None
        E, K, N = w.qweight.shape
        if N % 128 or K % 128 or x.shape[1] != K:
            return None
        G = K // w.scales.shape[1]
        BK, BN = _pick_bkbn(K, N, G)
        if BK == 0:
            return None
        return _indexed_w8(x, ids.astype(jnp.int32), w.qweight, w.scales,
                           interpret=interpret)
    if isinstance(w, PackedInt4Tensor):
        if w.zeros is not None:
            return None
        E, Kh, N = w.qweight.shape
        K = 2 * Kh
        if N % 128 or Kh % 128 or x.shape[1] != K:
            return None
        G = K // w.scales.shape[1]
        if Kh % G:
            return None
        BKp, BN = _pick_bkbn(Kh, N, G)
        if BKp == 0:
            return None
        return _indexed_w4(x, ids.astype(jnp.int32), w.qweight, w.scales,
                           interpret=interpret)
    return None
