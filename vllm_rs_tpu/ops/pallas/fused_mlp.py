"""Fused gated-MLP Pallas kernel: gate_up matmul + silu·mul + down matmul
in ONE kernel launch (w4a8 decode regime).

Why: at batch-1 the 8B trunk runs ~128 Pallas launches per decode step;
the measured per-launch pipeline fill/drain is ~8.3 µs (PERF_NOTES r3 #7,
SPLIT_N probe), and the gate_up→down boundary additionally round-trips the
[M, 2I] intermediate through HBM plus a separate activation-quantize pass.
Fusing the MLP pair removes 32 launches/step and keeps the intermediate in
VMEM. Reference counterpart: the per-layer gate/up/down GEMM trio in
mlp.rs — the reference fuses gate+up (MergedColumnLinear); this goes one
step further because on TPU the launch boundary is the cost.

Schedule: the grid iterates over the down-projection's PACKED row blocks
(split-half int4 packing pairs unpacked row r with r + I/2 in one byte
row, quant/pack.py). Step p therefore computes TWO tiles of the hidden
activation h = silu(x@Wg)·(x@Wu) — columns A = [p·BC, (p+1)·BC) and
B = I/2 + A — quantizes them per (row, tile), and immediately accumulates
their contribution h_A @ Wd[A] + h_B @ Wd[B] into a resident [M, D] f32
accumulator, consuming the down stripe's low and high nibbles exactly
once. Every weight byte streams exactly once; no intermediate HBM
traffic; one pipeline (no fill/drain between gate_up and down).

Numerics: stage-1 matches the unfused w4a8 kernel bit-for-bit (same group
dots, same tree reduction); stage-2 quantizes h per (row, BC-tile) instead
of per full row — a finer-grained (≥ as accurate) activation quantization,
so outputs differ from the unfused path at the int8-rounding level.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vllm_rs_tpu.quant.pack import PackedInt4Tensor

from vllm_rs_tpu.ops.pallas.quant_matmul import (
    _quantize_rows_int8,
    _round_up,
)


def _tree_sum(parts):
    while len(parts) > 1:
        parts = [
            parts[i] + parts[i + 1] if i + 1 < len(parts) else parts[i]
            for i in range(0, len(parts), 2)
        ]
    return parts[0]


def _fused_mlp_kernel(
    xs_ref, x_ref,
    wg_a, wg_b, wu_a, wu_b,
    sg_a, sg_b, su_a, su_b,
    wd_ref, sd_ref,
    out_ref, acc_ref,
    *, n_p: int, group: int, d_half: int, gelu: bool,
):
    p = pl.program_id(0)

    @pl.when(p == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    n_g1 = d_half // group  # stage-1 groups per K half

    def stage1(w_ref, s_ref):
        """x @ dequant(w_tile) → f32 [M, BC] (same algebra + tree
        reduction as _w4a8_kernel; x row-scale folded by the caller)."""
        w32 = w_ref[...].astype(jnp.int32)
        lo = ((w32 << 28) >> 28).astype(jnp.int8)
        hi = (w32 >> 4).astype(jnp.int8)
        parts = []
        for g in range(n_g1):
            sl = slice(g * group, (g + 1) * group)
            sh = slice(d_half + g * group, d_half + (g + 1) * group)
            p_lo = jax.lax.dot_general(
                x_ref[:, sl], lo[sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            p_hi = jax.lax.dot_general(
                x_ref[:, sh], hi[sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            parts.append(
                p_lo.astype(jnp.float32) * s_ref[g]
                + p_hi.astype(jnp.float32) * s_ref[n_g1 + g]
            )
        return _tree_sum(parts)

    xs = xs_ref[:, :1]

    def h_tile(wg, sg, wu, su):
        gate = stage1(wg, sg) * xs
        up = stage1(wu, su) * xs
        if gelu:
            act = jax.nn.gelu(gate, approximate=True)
        else:
            act = jax.nn.silu(gate)
        h = act * up
        # per (row, tile) int8 quantization — finer than the unfused
        # path's per-row absmax, so at least as accurate
        amax = jnp.max(jnp.abs(h), axis=1, keepdims=True)
        s_h = jnp.maximum(amax / 127.0, 1e-10)
        hq = jnp.clip(jnp.round(h / s_h), -127, 127).astype(jnp.int8)
        return hq, s_h

    hq_a, sh_a = h_tile(wg_a, sg_a, wu_a, su_a)
    hq_b, sh_b = h_tile(wg_b, sg_b, wu_b, su_b)

    w32 = wd_ref[...].astype(jnp.int32)
    d_lo = ((w32 << 28) >> 28).astype(jnp.int8)  # down rows A
    d_hi = (w32 >> 4).astype(jnp.int8)  # down rows B (= A + I/2)
    bc = d_lo.shape[0]
    n_g2 = bc // group
    # down scales ride as the FULL [I/G, D] array resident in VMEM (a
    # (BC/G, D) stripe block can violate Mosaic's sublane-divisibility
    # rule when BC/G < 8); rows are indexed dynamically per grid step
    half_groups = sd_ref.shape[0] // 2
    row0 = p * n_g2
    parts = []
    for g in range(n_g2):
        sl = slice(g * group, (g + 1) * group)
        p_a = jax.lax.dot_general(
            hq_a[:, sl], d_lo[sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        p_b = jax.lax.dot_general(
            hq_b[:, sl], d_hi[sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        sd_a = sd_ref[row0 + g]
        sd_b = sd_ref[half_groups + row0 + g]
        parts.append(
            p_a.astype(jnp.float32) * (sd_a * sh_a)
            + p_b.astype(jnp.float32) * (sd_b * sh_b)
        )
    acc_ref[...] = acc_ref[...] + _tree_sum(parts)

    @pl.when(p == n_p - 1)
    def _():
        out_ref[...] = acc_ref[...].astype(out_ref.dtype)


def _pick_bc(D: int, I: int, G: int, M: int) -> int:
    """Hidden-tile width BC: a divisor of I/2, multiple of max(G, 128),
    sized so the per-step operand set double-buffers inside ~8 MB VMEM."""
    base = max(G, 128)
    best = 0
    for bc in range(base, (I // 2) + 1, base):
        if (I // 2) % bc:
            continue
        vmem = 2 * (
            4 * (D // 2) * bc  # gate/up tiles (packed int8)
            + bc * D  # down stripe (packed int8)
            + 4 * (D // G) * bc * 4  # stage-1 scale stripes (f32)
        ) + (I // G) * D * 4  # full down scales, resident
        vmem += M * D * 4 + M * D * 2 + M * D  # acc + out + x
        if vmem <= 8 * 2**20:
            best = bc
        else:
            break
    return best


def fused_mlp_supported(gup, down, M: int, act: str, interpret: bool) -> bool:
    if not (isinstance(gup, PackedInt4Tensor) and isinstance(down, PackedInt4Tensor)):
        return False
    if gup.zeros is not None or down.zeros is not None:
        return False
    if act not in ("silu", "gelu_pytorch_tanh"):
        return False
    from vllm_rs_tpu.ops.pallas.quant_matmul import A8_MAX_ROWS

    if M > A8_MAX_ROWS or (not interpret and jax.default_backend() != "tpu"):
        return False
    D, I2 = gup.shape
    I, Dd = down.shape
    if I2 != 2 * I or Dd != D or D % 256 or I % 256:
        return False
    G = gup.group_size
    if down.group_size != G or D % (2 * G) or (I // 2) % G:
        return False
    return _pick_bc(D, I, G, _round_up(M, 16)) > 0


@functools.partial(jax.jit, static_argnames=("act", "interpret", "out_dtype"))
def fused_mlp_int4_a8(
    x, gup_q, gup_s, down_q, down_s, *, act="silu", interpret=False,
    out_dtype=jnp.bfloat16,
):
    """y = silu/gelu-gated MLP over split-half packed int4 weights, one
    pallas_call. x: [M, D] → [M, D]."""
    M, D = x.shape
    I = down_q.shape[0] * 2
    G = D // gup_s.shape[0]
    BM = min(_round_up(M, 16), 256)
    BC = _pick_bc(D, I, G, BM)
    n_p = (I // 2) // BC
    d_half = D // 2

    xq, xs = _quantize_rows_int8(x)
    Mp = _round_up(M, BM)
    if Mp != M:
        xq = jnp.pad(xq, ((0, Mp - M), (0, 0)))
        xs = jnp.pad(xs, ((0, Mp - M), (0, 0)))

    # block offsets (in BC-column units) into the [gate | up] axis
    off_gb = (I // 2) // BC
    off_ua = I // BC
    off_ub = off_ua + off_gb

    wspec = lambda off: pl.BlockSpec((d_half, BC), lambda p, o=off: (0, p + o))  # noqa: E731
    sspec1 = lambda off: pl.BlockSpec(  # noqa: E731
        (D // G, BC), lambda p, o=off: (0, p + o)
    )

    out = pl.pallas_call(
        functools.partial(
            _fused_mlp_kernel, n_p=n_p, group=G, d_half=d_half,
            gelu=(act == "gelu_pytorch_tanh"),
        ),
        grid=(n_p,),
        in_specs=[
            pl.BlockSpec((BM, 1), lambda p: (0, 0)),  # xs
            pl.BlockSpec((BM, D), lambda p: (0, 0)),  # xq
            wspec(0), wspec(off_gb), wspec(off_ua), wspec(off_ub),
            sspec1(0), sspec1(off_gb), sspec1(off_ua), sspec1(off_ub),
            pl.BlockSpec((BC, D), lambda p: (p, 0)),  # down stripe
            pl.BlockSpec((I // G, D), lambda p: (0, 0)),  # down scales, full
        ],
        out_specs=pl.BlockSpec((BM, D), lambda p: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((Mp, D), out_dtype),
        scratch_shapes=[pltpu.VMEM((BM, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * Mp * D * I,
            bytes_accessed=(
                D * I  # gate_up packed (D/2 rows × 2I cols)
                + (I // 2) * D  # down packed
                + (D // G) * 2 * I * 4 + (I // G) * D * 4  # scales
                + Mp * D + Mp * D * 2
            ),
            transcendentals=Mp * I,
        ),
        interpret=interpret,
    )(
        xs.astype(jnp.float32), xq,
        gup_q, gup_q, gup_q, gup_q,
        gup_s, gup_s, gup_s, gup_s,
        down_q, down_s,
    )
    return out[:M] if Mp != M else out
