"""lm_head kernel lab: [M, 4096] @ int8 [4096, 128256] per-channel scales.

Honest differenced in-graph timing (kernel_lab.chain_time). Sweeps tile
shapes; target: weight-streaming bound (~0.72 ms @ 735 GB/s for 525 MB).
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def chain_time(one_layer, Ws, x, R1=4, R2=24):
    """Differenced in-graph repetition (see kernel_lab.py)."""
    L = jax.tree_util.tree_leaves(Ws)[0].shape[0]

    def run(x, Ws, R):
        def outer(i, h):
            def f(h, w):
                y = one_layer(h, w)
                return y[:, : x.shape[1]].astype(jnp.bfloat16), None
            h, _ = jax.lax.scan(f, h, Ws)
            return h
        h = jax.lax.fori_loop(0, R, outer, x)
        return jnp.sum(h)

    fs = {R: jax.jit(functools.partial(run, R=R)) for R in (R1, R2)}

    def measure(R, n=3):
        float(np.asarray(fs[R](x, Ws)))
        t0 = time.perf_counter()
        for _ in range(n):
            float(np.asarray(fs[R](x, Ws)))
        return (time.perf_counter() - t0) / n

    tA, tB = measure(R1), measure(R2)
    return (tB - tA) / ((R2 - R1) * L)


key = jax.random.PRNGKey(0)
M, K, N = 8, 4096, 128256
L = 8  # chain layers (8 x 525 MB = 4.2 GB)

@jax.jit
def _mk(key):
    bits = jax.random.bits(key, (K, N), dtype=jnp.uint8)
    return jax.lax.bitcast_convert_type(bits, jnp.int8)

Wq = jnp.stack([_mk(k) for k in jax.random.split(key, L)])
Sc = jax.random.uniform(key, (L, 1, N), dtype=jnp.float32) * 0.01
x = jax.random.normal(key, (M, K), dtype=jnp.bfloat16)
GBS = K * N / 1e9  # int8 bytes per layer


def report(name, t):
    print(f"{name:34s} {t*1e6:8.1f} us -> {GBS/t:7.1f} GB/s(i8)", flush=True)


# -- current path ------------------------------------------------------------
from vllm_rs_tpu.ops.pallas.quant_matmul import _int8_matmul_a8_perchannel

t = chain_time(lambda h, w: _int8_matmul_a8_perchannel(h, w[0], w[1]), (Wq, Sc), x)
report("current perchannel (2048x768)", t)


# -- parametrized variant ----------------------------------------------------
def _kern(xs_ref, x_ref, w_ref, s_ref, out_ref, acc_ref, *, n_k):
    k = pl.program_id(2)
    if n_k > 1:
        @pl.when(k == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)
        acc_ref[...] += jax.lax.dot_general(
            x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        @pl.when(k == n_k - 1)
        def _():
            out_ref[...] = (
                acc_ref[...].astype(jnp.float32) * s_ref[0] * xs_ref[:, :1]
            ).astype(out_ref.dtype)
    else:
        acc = jax.lax.dot_general(
            x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        out_ref[...] = (
            acc.astype(jnp.float32) * s_ref[0] * xs_ref[:, :1]
        ).astype(out_ref.dtype)


def _quantize_rows(x):
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=1, keepdims=True)
    s = jnp.maximum(amax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)
    return q, s


@functools.partial(jax.jit, static_argnames=("BM", "BK", "BN", "NP"))
def head_v(x, w, s, *, BM, BK, BN, NP):
    Mx, Kx = x.shape
    assert w.shape[1] == NP, "pre-pad the weight outside the timed chain"
    n_k = Kx // BK
    xq, xs = _quantize_rows(x)
    Mp = max(BM, 16)
    xq = jnp.pad(xq, ((0, Mp - Mx), (0, 0)))
    xs = jnp.pad(xs, ((0, Mp - Mx), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_kern, n_k=n_k),
        grid=(1, NP // BN, n_k),
        in_specs=[
            pl.BlockSpec((Mp, 1), lambda m, n, k: (m, 0)),
            pl.BlockSpec((Mp, BK), lambda m, n, k: (m, k)),
            pl.BlockSpec((BK, BN), lambda m, n, k: (k, n)),
            pl.BlockSpec((1, BN), lambda m, n, k: (0, n)),
        ],
        out_specs=pl.BlockSpec((Mp, BN), lambda m, n, k: (m, n)),
        out_shape=jax.ShapeDtypeStruct((Mp, NP), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((Mp, BN), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Kx * NP, bytes_accessed=Kx * NP, transcendentals=0
        ),
    )(xs.astype(jnp.float32), xq, w, s)
    return out[:Mx, :N]


variants = [
    ("BK=2048 BN=384", dict(BM=8, BK=2048, BN=384, NP=N)),
    ("BK=2048 BN=768", dict(BM=8, BK=2048, BN=768, NP=N)),
    ("BK=1024 BN=768", dict(BM=8, BK=1024, BN=768, NP=N)),
    ("BK=4096 BN=256 fullK", dict(BM=8, BK=4096, BN=256, NP=N)),
    ("BK=4096 BN=384 fullK", dict(BM=8, BK=4096, BN=384, NP=N)),
    ("BK=4096 BN=768 fullK", dict(BM=8, BK=4096, BN=768, NP=N)),
    ("BK=4096 BN=512 padN fullK", dict(BM=8, BK=4096, BN=512, NP=128512)),
    ("BK=4096 BN=1024 padN fullK", dict(BM=8, BK=4096, BN=1024, NP=129024)),
    ("BK=2048 BN=2048 padN", dict(BM=8, BK=2048, BN=2048, NP=129024)),
    ("BK=4096 BN=2048 padN fullK", dict(BM=8, BK=4096, BN=2048, NP=129024)),
]
_padded = {}


def _stack_for(NP):
    if NP == N:
        return Wq, Sc
    if NP not in _padded:
        wp = jax.jit(lambda w: jnp.pad(w, ((0, 0), (0, 0), (0, NP - N))))(Wq)
        sp = jnp.pad(Sc, ((0, 0), (0, 0), (0, NP - N)))
        _padded[NP] = (jax.block_until_ready(wp), sp)
    return _padded[NP]


for name, kw in variants:
    try:
        Wv, Sv = _stack_for(kw["NP"])
        t = chain_time(lambda h, w, kw=kw: head_v(h, w[0], w[1], **kw), (Wv, Sv), x)
        report(name, t)
    except Exception as e:
        print(f"{name:34s} FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)


# -- XLA-native variants -----------------------------------------------------
@jax.jit
def head_xla_s8(x, w, s):
    xq, xs = _quantize_rows(x)
    acc = jax.lax.dot_general(
        xq, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    return (acc.astype(jnp.float32) * s[0] * xs).astype(jnp.bfloat16)


t = chain_time(lambda h, w: head_xla_s8(h, w[0], w[1]), (Wq, Sc), x)
report("XLA native s8 dot", t)


@jax.jit
def head_xla_bf16(x, w, s):
    return jnp.dot(x, (w.astype(jnp.bfloat16) * s[0][None, :].astype(jnp.bfloat16)), preferred_element_type=jnp.float32).astype(jnp.bfloat16)


t = chain_time(lambda h, w: head_xla_bf16(h, w[0], w[1]), (Wq, Sc), x)
report("XLA s8->bf16 convert dot", t)
