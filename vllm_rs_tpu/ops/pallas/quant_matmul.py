"""Fused dequantize × matmul Pallas kernels (w4/w8 × a16/a8).

TPU counterpart of the reference's Marlin / GGUF-QMatMul GEMMs
(wna16.rs, utils/gptq.rs, linear.rs): weights stream from HBM in their
packed integer form (the bandwidth the batch-1 decode roofline is paid in)
and are dequantized *algebraically* — per quant group g with scale s_g and
zero z_g:

    y = x @ ((q - z_g) * s_g)
      = Σ_g  s_g * (x_g @ q_g)  -  (s_g z_g) * Σ_k∈g x_k

so the kernel never materializes per-row scale matrices; it does one MXU
dot per group plus a row-vector multiply and (for asymmetric formats) a
rank-1 correction.

Two activation modes, mirroring the reference's is_prefill dispatch
(linear.rs:20-45) but driven by the hardware:

- **a16** (prefill, M large): the group dot runs on integer-valued bf16
  (exact up to |q| ≤ 127), f32 accumulation. At large M the MXU amortizes
  rows, so the bf16 path is both fastest and most accurate.
- **a8** (decode, M small): at M ≤ 128 every MXU pass carries at most 128
  rows, so decode is *MXU-pass-bound*, not byte-bound — measured on v5e:
  bf16 passes cap at ~470 Gelem/s while the MXU's native s8×s8 mode runs
  ~845 Gelem/s, i.e. full HBM line rate for int8 weights. Activations are
  quantized per-token to int8 (absmax/127), the group dot accumulates
  int32 on the int8 MXU, and scales fold in as s_g · s_x[m] afterwards.
  Measured: w8a8 513 GB/s, w4a8 377 GB/s(i4) vs 224 GB/s(i4) for the a16
  kernel — 1.7-2.3x on the batch-1 decode path.

int4 uses the split-half packed layout (quant/pack.py): byte row i of
qweight [K//2, N] holds W[i] (low nibble) and W[i + K/2] (high nibble), so
each step handles the two halves as two dot chains with no interleave.

Tile sizes follow the measured v5e behavior: weight tiles ≥ ~0.5MB keep the
HBM stream at full rate; everything stays under an ~8MB VMEM budget.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vllm_rs_tpu.quant.pack import AnyQuantTensor, PackedInt4Tensor, QuantizedTensor


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(x: int, m: int) -> int:
    return _cdiv(x, m) * m


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _int4_kernel(
    x_lo_ref, x_hi_ref, w_ref, s_lo_ref, s_hi_ref, sz_lo_ref, sz_hi_ref,
    out_ref, acc_ref, *, n_k: int, group: int, has_zeros: bool,
):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = w_ref[...]  # [BKp, BN] int8, packed
    rows = w.shape[0]
    n_g = rows // group
    # int8 vector shifts don't lower in Mosaic — extract nibbles in int32
    w32 = w.astype(jnp.int32)
    lo = ((w32 << 28) >> 28).astype(jnp.bfloat16)
    hi = (w32 >> 4).astype(jnp.bfloat16)

    parts = []  # tree-reduced (see _w4a8_kernel: serial FMA chain stalls)
    for i in range(n_g):
        sl = slice(i * group, (i + 1) * group)
        x_lo = x_lo_ref[:, sl]
        x_hi = x_hi_ref[:, sl]
        p_lo = jnp.dot(x_lo, lo[sl], preferred_element_type=jnp.float32)
        p_hi = jnp.dot(x_hi, hi[sl], preferred_element_type=jnp.float32)
        part = s_lo_ref[:, i, :] * p_lo + s_hi_ref[:, i, :] * p_hi
        if has_zeros:
            xs_lo = jnp.sum(x_lo.astype(jnp.float32), axis=1, keepdims=True)
            xs_hi = jnp.sum(x_hi.astype(jnp.float32), axis=1, keepdims=True)
            part -= xs_lo * sz_lo_ref[:, i, :]
            part -= xs_hi * sz_hi_ref[:, i, :]
        parts.append(part)
    while len(parts) > 1:
        parts = [
            parts[i] + parts[i + 1] if i + 1 < len(parts) else parts[i]
            for i in range(0, len(parts), 2)
        ]
    acc_ref[...] = acc_ref[...] + parts[0]

    @pl.when(k == n_k - 1)
    def _():
        out_ref[...] = acc_ref[...].astype(out_ref.dtype)


def _int8_kernel(x_ref, w_ref, s_ref, out_ref, acc_ref, *, n_k: int, group: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = w_ref[...]
    rows = w.shape[0]
    n_g = rows // group
    wb = w.astype(jnp.bfloat16)
    parts = []  # tree-reduced (see _w4a8_kernel: serial FMA chain stalls)
    for i in range(n_g):
        sl = slice(i * group, (i + 1) * group)
        p = jnp.dot(x_ref[:, sl], wb[sl], preferred_element_type=jnp.float32)
        parts.append(s_ref[:, i, :] * p)
    while len(parts) > 1:
        parts = [
            parts[i] + parts[i + 1] if i + 1 < len(parts) else parts[i]
            for i in range(0, len(parts), 2)
        ]
    acc_ref[...] = acc_ref[...] + parts[0]

    @pl.when(k == n_k - 1)
    def _():
        out_ref[...] = acc_ref[...].astype(out_ref.dtype)


# ---------------------------------------------------------------------------
# host wrappers
# ---------------------------------------------------------------------------


# Per-shape (K_steps, N) → (BK, BN) tile overrides for decode-regime
# (M ≤ A8_MAX_ROWS) matmuls, each validated END-TO-END through bench.py
# (the repo rule: isolated chain sweeps don't transfer — PERF_NOTES
# round-2 finding #4). Populated by the round-3 gate_up/down tuning runs.
_TILE_OVERRIDES: dict = {}


def _env_tile_overrides():
    """VLLM_RS_TPU_TILES="KSTEPSxN:BK,BN;..." — experiment hook so tile
    candidates can be swept through bench.py without code edits."""
    import os

    out = {}
    spec = os.environ.get("VLLM_RS_TPU_TILES", "")
    for entry in filter(None, spec.split(";")):
        shape, _, tile = entry.partition(":")
        ks, _, n = shape.partition("x")
        bk, _, bn = tile.partition(",")
        out[(int(ks), int(n))] = (int(bk), int(bn))
    return out


_TILE_OVERRIDES.update(_env_tile_overrides())


def _pick_tiles(M: int, K_steps: int, N: int, group_rows: int):
    """(BM, BK, BN): BK in grid-step rows of the weight operand, always a
    multiple of the group size (one scale row per in-kernel dot).

    Isolated-chain tile sweeps (lab_trunk.py) suggested 1024x1024 tiles,
    but the end-to-end bench regressed (77.8 -> 75.9 tok/s) — isolated
    chain numbers have ±15% run-to-run variance and a different pipeline
    regime; tile changes must be validated through bench.py."""
    BM = min(_round_up(M, 16), 256)
    ov = _TILE_OVERRIDES.get((K_steps, N))
    if ov is not None and M <= A8_MAX_ROWS:
        BK, BN = ov
        if (
            K_steps % BK == 0 and BK % group_rows == 0
            and N % BN == 0 and BN % 128 == 0 and (BK >= 128 or BK == K_steps)
        ):
            return BM, BK, BN
    BN = 128
    for d in range(2048, 127, -128):
        if N % d == 0:
            BN = d
            break
    BK = 0
    # Mosaic requires the trailing block dims to divide (8, 128) or equal
    # the array dims — sub-128 BK is only legal when BK == K_steps
    for cand in (2048, 1024, 512, 256, 128, 64, 32):
        if cand < 128 and cand != K_steps:
            continue
        if K_steps % cand or cand % group_rows:
            continue
        n_g = cand // group_rows
        vmem = (
            2 * cand * BN  # weight tile, double buffered (int8)
            + 4 * BM * cand * 2  # two x halves, bf16, double buffered
            + BM * BN * 4  # f32 accumulator
            + BM * BN * 2 * 2  # output tile (double buffered)
            + 4 * 2 * n_g * BN * 4  # scale stripes, double buffered
        )
        if vmem <= 8 * 2**20:
            BK = cand
            break
    return BM, BK, BN


@functools.partial(jax.jit, static_argnames=("interpret", "out_dtype"))
def _int4_matmul(x, qweight, scales, zeros, *, interpret=False, out_dtype=jnp.bfloat16):
    M, K = x.shape
    Kh, N = qweight.shape  # Kh = K // 2
    KG = scales.shape[0]
    G = K // KG  # group size (low-half packed row i == unpacked row i)
    BM, BKp, BN = _pick_tiles(M, Kh, N, G)
    n_k = Kh // BKp
    n_m = _cdiv(M, BM)
    n_n = N // BN
    n_g = BKp // G

    # [KG/2, N] → [n_k, n_g, N] per-step stripes (zero-copy reshape)
    s_lo = scales[: KG // 2].reshape(n_k, n_g, N)
    s_hi = scales[KG // 2 :].reshape(n_k, n_g, N)
    has_zeros = zeros is not None
    if has_zeros:
        sz = scales * zeros
        sz_lo = sz[: KG // 2].reshape(n_k, n_g, N)
        sz_hi = sz[KG // 2 :].reshape(n_k, n_g, N)
    else:
        sz_lo, sz_hi = s_lo, s_hi  # dummies; kernel ignores them

    Mp = _round_up(M, BM)
    if Mp != M:
        x = jnp.pad(x, ((0, Mp - M), (0, 0)))

    sspec = pl.BlockSpec((1, n_g, BN), lambda m, n, k: (k, 0, n))
    out = pl.pallas_call(
        functools.partial(_int4_kernel, n_k=n_k, group=G, has_zeros=has_zeros),
        grid=(n_m, n_n, n_k),
        in_specs=[
            pl.BlockSpec((BM, BKp), lambda m, n, k: (m, k)),  # x low half
            pl.BlockSpec((BM, BKp), lambda m, n, k: (m, k + n_k)),  # x high half
            pl.BlockSpec((BKp, BN), lambda m, n, k: (k, n)),  # packed weights
            sspec, sspec, sspec, sspec,
        ],
        out_specs=pl.BlockSpec((BM, BN), lambda m, n, k: (m, n)),
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((BM, BN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * K * N,
            bytes_accessed=Kh * N + KG * N * 8 + Mp * K * 2 + Mp * N * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, x, qweight, s_lo, s_hi, sz_lo, sz_hi)
    return out[:M] if Mp != M else out


@functools.partial(jax.jit, static_argnames=("interpret", "out_dtype"))
def _int8_matmul(x, qweight, scales, *, interpret=False, out_dtype=jnp.bfloat16):
    M, K = x.shape
    _, N = qweight.shape
    KG = scales.shape[0]
    G = K // KG
    BM, BK, BN = _pick_tiles(M, K, N, G)
    n_k = K // BK
    n_m = _cdiv(M, BM)
    n_n = N // BN
    n_g = BK // G
    s_t = scales.reshape(n_k, n_g, N)

    Mp = _round_up(M, BM)
    if Mp != M:
        x = jnp.pad(x, ((0, Mp - M), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_int8_kernel, n_k=n_k, group=G),
        grid=(n_m, n_n, n_k),
        in_specs=[
            pl.BlockSpec((BM, BK), lambda m, n, k: (m, k)),
            pl.BlockSpec((BK, BN), lambda m, n, k: (k, n)),
            pl.BlockSpec((1, n_g, BN), lambda m, n, k: (k, 0, n)),
        ],
        out_specs=pl.BlockSpec((BM, BN), lambda m, n, k: (m, n)),
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((BM, BN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * K * N,
            bytes_accessed=K * N + KG * N * 4 + Mp * K * 2 + Mp * N * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, qweight, s_t)
    return out[:M] if Mp != M else out


# ---------------------------------------------------------------------------
# a8 decode kernels: per-token int8 activations on the native s8xs8 MXU
# ---------------------------------------------------------------------------


def _quantize_rows_int8(x: jax.Array):
    """Per-row absmax int8 quantization → (q [M,K] i8, scale [M,1] f32)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)
    xs = jnp.maximum(amax / 127.0, 1e-10)
    q = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
    return q, xs


def _w8a8_kernel(
    xs_ref, x_ref, w_ref, s_ref, sz_ref, out_ref, acc_ref,
    *, n_k: int, group: int, has_zeros: bool,
):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = w_ref[...]  # [BK, BN] int8
    n_g = w.shape[0] // group
    parts = []  # tree-reduced (see _w4a8_kernel: serial FMA chain stalls)
    for g in range(n_g):
        sl = slice(g * group, (g + 1) * group)
        xg = x_ref[:, sl]
        p = jax.lax.dot_general(
            xg, w[sl], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        part = p.astype(jnp.float32) * s_ref[0, g]
        if has_zeros:
            sx = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)
            part -= sx * sz_ref[0, g]
        parts.append(part)
    while len(parts) > 1:
        parts = [
            parts[i] + parts[i + 1] if i + 1 < len(parts) else parts[i]
            for i in range(0, len(parts), 2)
        ]
    acc_ref[...] = acc_ref[...] + parts[0]

    @pl.when(k == n_k - 1)
    def _():
        out_ref[...] = (acc_ref[...] * xs_ref[:, :1]).astype(out_ref.dtype)


def _w4a8_kernel(
    xs_ref, x_ref, w_ref, s_lo_ref, s_hi_ref, sz_lo_ref, sz_hi_ref,
    out_ref, acc_ref, *, n_k: int, group: int, has_zeros: bool,
    unpack: str = "tile",
):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = w_ref[...]  # [BKp, BN] packed int8
    BKp = w.shape[0]
    n_g = BKp // group
    if unpack == "tile":
        # whole-tile unpack up front (int32 widening: int8 vector shifts
        # don't lower in Mosaic)
        w32 = w.astype(jnp.int32)
        lo = ((w32 << 28) >> 28).astype(jnp.int8)
        hi = (w32 >> 4).astype(jnp.int8)
        unpack_g = lambda sl: (lo[sl], hi[sl])  # noqa: E731
    else:
        # per-group unpack inside the dot loop: ~group-sized VPU work the
        # compiler can software-pipeline against the previous group's MXU
        # dots, instead of a tile-sized unpack the dots wait behind
        def unpack_g(sl):
            wg = w[sl].astype(jnp.int32)
            return (
                ((wg << 28) >> 28).astype(jnp.int8),
                (wg >> 4).astype(jnp.int8),
            )
    # collect per-group contributions and tree-reduce: chaining `acc +=`
    # serializes every scale-FMA behind the previous one, stalling the
    # independent MXU dots behind the VPU chain (measured: group=512's
    # 2-deep chain ran ~40% faster than group=128's 16-deep chain)
    parts = []
    for g in range(n_g):
        sl = slice(g * group, (g + 1) * group)
        x_lo = x_ref[:, sl]
        x_hi = x_ref[:, BKp + g * group : BKp + (g + 1) * group]
        lo_g, hi_g = unpack_g(sl)
        p_lo = jax.lax.dot_general(
            x_lo, lo_g, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        p_hi = jax.lax.dot_general(
            x_hi, hi_g, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        part = p_lo.astype(jnp.float32) * s_lo_ref[0, g]
        part += p_hi.astype(jnp.float32) * s_hi_ref[0, g]
        if has_zeros:
            sx_lo = jnp.sum(x_lo.astype(jnp.float32), axis=1, keepdims=True)
            sx_hi = jnp.sum(x_hi.astype(jnp.float32), axis=1, keepdims=True)
            part -= sx_lo * sz_lo_ref[0, g]
            part -= sx_hi * sz_hi_ref[0, g]
        parts.append(part)
    while len(parts) > 1:  # pairwise tree reduction
        parts = [
            parts[i] + parts[i + 1] if i + 1 < len(parts) else parts[i]
            for i in range(0, len(parts), 2)
        ]
    acc_ref[...] = acc_ref[...] + parts[0]

    @pl.when(k == n_k - 1)
    def _():
        out_ref[...] = (acc_ref[...] * xs_ref[:, :1]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "out_dtype"))
def _int8_matmul_a8(x, qweight, scales, zeros, *, interpret=False, out_dtype=jnp.bfloat16):
    M, K = x.shape
    _, N = qweight.shape
    KG = scales.shape[0]
    G = K // KG
    BM, BK, BN = _pick_tiles(M, K, N, G)
    n_k = K // BK
    n_g = BK // G
    s_t = scales.reshape(n_k, n_g, N)
    has_zeros = zeros is not None
    sz_t = (scales * zeros).reshape(n_k, n_g, N) if has_zeros else s_t

    xq, xs = _quantize_rows_int8(x)
    Mp = _round_up(M, BM)
    if Mp != M:
        xq = jnp.pad(xq, ((0, Mp - M), (0, 0)))
        xs = jnp.pad(xs, ((0, Mp - M), (0, 0)))

    sspec = pl.BlockSpec((1, n_g, BN), lambda m, n, k: (k, 0, n))
    out = pl.pallas_call(
        functools.partial(_w8a8_kernel, n_k=n_k, group=G, has_zeros=has_zeros),
        grid=(_cdiv(Mp, BM), N // BN, n_k),
        in_specs=[
            pl.BlockSpec((BM, 1), lambda m, n, k: (m, 0)),
            pl.BlockSpec((BM, BK), lambda m, n, k: (m, k)),
            pl.BlockSpec((BK, BN), lambda m, n, k: (k, n)),
            sspec, sspec,
        ],
        out_specs=pl.BlockSpec((BM, BN), lambda m, n, k: (m, n)),
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((BM, BN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * K * N,
            bytes_accessed=K * N + KG * N * 4 + Mp * K + Mp * N * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xs.astype(jnp.float32), xq, qweight, s_t, sz_t)
    return out[:M] if Mp != M else out


@functools.partial(jax.jit, static_argnames=("interpret", "out_dtype"))
def _int4_matmul_a8(x, qweight, scales, zeros, *, interpret=False, out_dtype=jnp.bfloat16):
    M, K = x.shape
    Kh, N = qweight.shape
    KG = scales.shape[0]
    G = K // KG
    BM, BKp, BN = _pick_tiles(M, Kh, N, G)
    n_k = Kh // BKp
    n_g = BKp // G

    s_lo = scales[: KG // 2].reshape(n_k, n_g, N)
    s_hi = scales[KG // 2 :].reshape(n_k, n_g, N)
    has_zeros = zeros is not None
    if has_zeros:
        sz = scales * zeros
        sz_lo = sz[: KG // 2].reshape(n_k, n_g, N)
        sz_hi = sz[KG // 2 :].reshape(n_k, n_g, N)
    else:
        sz_lo, sz_hi = s_lo, s_hi

    xq, xs = _quantize_rows_int8(x)
    # interleave halves so each k-step's rows are contiguous: [lo_k | hi_k]
    xl = xq[:, : K // 2].reshape(M, n_k, BKp)
    xh = xq[:, K // 2 :].reshape(M, n_k, BKp)
    xx = jnp.concatenate([xl, xh], axis=2).reshape(M, n_k * 2 * BKp)

    Mp = _round_up(M, BM)
    if Mp != M:
        xx = jnp.pad(xx, ((0, Mp - M), (0, 0)))
        xs = jnp.pad(xs, ((0, Mp - M), (0, 0)))

    import os

    sspec = pl.BlockSpec((1, n_g, BN), lambda m, n, k: (k, 0, n))
    out = pl.pallas_call(
        functools.partial(
            _w4a8_kernel, n_k=n_k, group=G, has_zeros=has_zeros,
            unpack=os.environ.get("VLLM_RS_TPU_W4_UNPACK", "tile"),
        ),
        grid=(_cdiv(Mp, BM), N // BN, n_k),
        in_specs=[
            pl.BlockSpec((BM, 1), lambda m, n, k: (m, 0)),
            pl.BlockSpec((BM, 2 * BKp), lambda m, n, k: (m, k)),
            pl.BlockSpec((BKp, BN), lambda m, n, k: (k, n)),
            sspec, sspec, sspec, sspec,
        ],
        out_specs=pl.BlockSpec((BM, BN), lambda m, n, k: (m, n)),
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((BM, BN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * K * N,
            bytes_accessed=Kh * N + KG * N * 8 + Mp * K + Mp * N * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xs.astype(jnp.float32), xx, qweight, s_lo, s_hi, sz_lo, sz_hi)
    return out[:M] if Mp != M else out


def _w8a8_perchannel_kernel(xs_ref, x_ref, w_ref, s_ref, out_ref, acc_ref, *, n_k):
    """Per-channel (G == K) w8a8: pure int32 accumulation across k-steps,
    ONE s8xs8 MXU dot per step, scales folded once at the end. The fastest
    head kernel shape: K·127·127 < 2^31 keeps the int32 accumulator exact."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(k == n_k - 1)
    def _():
        out_ref[...] = (
            acc_ref[...].astype(jnp.float32) * s_ref[0] * xs_ref[:, :1]
        ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "out_dtype"))
def _int8_matmul_a8_perchannel(x, qweight, scales, *, interpret=False, out_dtype=jnp.bfloat16):
    M, K = x.shape
    _, N = qweight.shape
    BM, BK, BN = _pick_tiles(M, K, N, K)  # group == K
    if BK == 0:
        BK = min(K, 2048)
        while K % BK:
            BK //= 2
    n_k = K // BK
    assert K * 127 * 127 < 2**31, "int32 accumulator overflow"

    xq, xs = _quantize_rows_int8(x)
    Mp = _round_up(M, BM)
    if Mp != M:
        xq = jnp.pad(xq, ((0, Mp - M), (0, 0)))
        xs = jnp.pad(xs, ((0, Mp - M), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_w8a8_perchannel_kernel, n_k=n_k),
        grid=(_cdiv(Mp, BM), N // BN, n_k),
        in_specs=[
            pl.BlockSpec((BM, 1), lambda m, n, k: (m, 0)),
            pl.BlockSpec((BM, BK), lambda m, n, k: (m, k)),
            pl.BlockSpec((BK, BN), lambda m, n, k: (k, n)),
            pl.BlockSpec((1, BN), lambda m, n, k: (0, n)),
        ],
        out_specs=pl.BlockSpec((BM, BN), lambda m, n, k: (m, n)),
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((BM, BN), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * K * N,
            bytes_accessed=K * N + N * 4 + Mp * K + Mp * N * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xs.astype(jnp.float32), xq, qweight, scales)
    return out[:M] if Mp != M else out


# decode batches (M ≤ this) take the a8 path; prefill stays a16
A8_MAX_ROWS = 64


@jax.jit
def _int8_matmul_a8_xla(x, qweight, scales):
    """Per-channel w8a8 via XLA's native s8 dot (int32 accumulation,
    scales folded once). K·127·127 < 2^31 keeps the accumulator exact."""
    xq, xs = _quantize_rows_int8(x)
    acc = jax.lax.dot_general(
        xq, qweight, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    return (acc.astype(jnp.float32) * scales[0][None, :] * xs).astype(jnp.bfloat16)


def _supported(qt: AnyQuantTensor, M: int, a8: bool) -> bool:
    K, N = qt.shape
    G = qt.group_size
    if N % 128 != 0 or K % 64 != 0:
        return False
    if isinstance(qt, PackedInt4Tensor) and K % (2 * G) != 0:
        return False  # the split halves must each be group-aligned
    steps = K // 2 if isinstance(qt, PackedInt4Tensor) else K
    _, BK, _ = _pick_tiles(M, steps, N, G)
    if BK == 0:
        return False
    if BK < 128 and isinstance(qt, PackedInt4Tensor) and not a8:
        # the a16 int4 kernel blocks x at half-K width (two half-K specs);
        # Mosaic only allows sub-128 blocks equal to the array dim, which
        # holds for the a8 path's pre-interleaved [M, 2*BKp] x but not here
        return False
    return True


def quant_matmul_pallas(
    x: jax.Array, qt: AnyQuantTensor, interpret: Optional[bool] = None
) -> jax.Array:
    """y = x @ dequant(qt). x: [..., K] bf16 → [..., N] bf16."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    # measurement hook (PERF_NOTES r3): VLLM_RS_TPU_SPLIT_N=k splits the
    # call into k column-chunk pallas_calls — quantifies per-launch
    # pipeline fill/drain overhead at the bench level (if launches cost
    # ~17 us, SPLIT_N=4 adds ~100 launches/step → a visible tok/s drop)
    import os

    split = int(os.environ.get("VLLM_RS_TPU_SPLIT_N", "1"))
    if split > 1:
        N = qt.shape[1]
        if N % (split * 128) == 0:
            cols = N // split
            parts = [
                _quant_matmul_impl(
                    x,
                    type(qt)(
                        qt.qweight[:, i * cols : (i + 1) * cols],
                        qt.scales[:, i * cols : (i + 1) * cols],
                        None if qt.zeros is None
                        else qt.zeros[:, i * cols : (i + 1) * cols],
                    ),
                    interpret,
                )
                for i in range(split)
            ]
            return jnp.concatenate(parts, axis=-1)
    return _quant_matmul_impl(x, qt, interpret)


def _quant_matmul_impl(
    x: jax.Array, qt: AnyQuantTensor, interpret: bool
) -> jax.Array:
    lead = x.shape[:-1]
    K = x.shape[-1]
    x2 = x.reshape(-1, K).astype(jnp.bfloat16)
    use_a8 = x2.shape[0] <= A8_MAX_ROWS and not interpret
    if not _supported(qt, x2.shape[0], use_a8):
        from vllm_rs_tpu.ops.quant_matmul import quant_matmul_reference

        return quant_matmul_reference(x, qt)
    if isinstance(qt, PackedInt4Tensor):
        if use_a8:
            y = _int4_matmul_a8(x2, qt.qweight, qt.scales, qt.zeros, interpret=interpret)
        else:
            y = _int4_matmul(x2, qt.qweight, qt.scales, qt.zeros, interpret=interpret)
    else:
        if use_a8 and qt.scales.shape[0] == 1 and qt.zeros is None:
            # per-channel w8a8 (the lm_head shape): XLA's native s8xs8 dot
            # streams the weight at the HBM line rate (~747 GB/s isolated;
            # 0.70 ms in-situ = the 0.62 ms streaming floor) vs ~232 GB/s
            # for the hand-tiled Pallas kernel. The per-channel scale folds
            # after the full-K int32 accumulation, so no grouped partials
            # are needed (head_lab.py / step_bisect.py).
            y = _int8_matmul_a8_xla(x2, qt.qweight, qt.scales)
        elif use_a8:
            y = _int8_matmul_a8(x2, qt.qweight, qt.scales, qt.zeros, interpret=interpret)
        else:
            y = _int8_matmul(x2, qt.qweight, qt.scales, interpret=interpret)
    return y.reshape(*lead, y.shape[-1]).astype(x.dtype)
