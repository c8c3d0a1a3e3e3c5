"""Trunk matmul lab: per-shape w4a8 rates for the 8B decode shapes and
variant experiments chasing the gap to the 845 Gelem/s s8 MXU-pass bound
(PERF_NOTES.md "trunk matmuls are 89% of bound").

Honest timings: scan-chained in-graph repetition, scalar fetch, two repeat
counts differenced (kernel_lab.py::chain_time)."""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from vllm_rs_tpu.ops.pallas.quant_matmul import (
    _int4_matmul_a8,
    _int8_matmul_a8,
    quant_matmul_pallas,
)
from vllm_rs_tpu.quant.pack import PackedInt4Tensor, QuantizedTensor

key = jax.random.PRNGKey(0)


def chain_time(fn, Ws, x, R1=4, R2=24):
    L = jax.tree_util.tree_leaves(Ws)[0].shape[0]

    def run(x, Ws, R):
        def outer(i, h):
            def f(h, w):
                y = fn(h, w)
                K = x.shape[1]
                if y.shape[1] < K:  # N < K: pad the carry (keeps the chain)
                    y = jnp.pad(y, ((0, 0), (0, K - y.shape[1])))
                return y[:, :K].astype(jnp.bfloat16), None

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


def w4(L, K, N, G=128):
    return PackedInt4Tensor(
        jax.random.randint(key, (L, K // 2, N), -128, 127, dtype=jnp.int8),
        jax.random.uniform(key, (L, K // G, N), dtype=jnp.float32) * 0.02,
        None,
    )


def w8(L, K, N, G=128):
    return QuantizedTensor(
        jax.random.randint(key, (L, K, N), -127, 127, dtype=jnp.int8),
        jax.random.uniform(key, (L, K // G, N), dtype=jnp.float32) * 0.02,
        None,
    )


SHAPES = [  # llama-3.1-8B decode trunk
    ("qkv", 4096, 6144),
    ("o", 4096, 4096),
    ("gate_up", 4096, 28672),
    ("down", 14336, 4096),
]

M = int(sys.argv[1]) if len(sys.argv) > 1 else 1
only = sys.argv[2:] or None
x_of = {K: jax.random.normal(key, (M, K), dtype=jnp.bfloat16) for K in (4096, 14336)}

total_i4 = 0.0
total_elems = 0
for name, K, N in SHAPES:
    if only and name not in only:
        continue
    L = max(2, min(12, (256 << 20) // (K * N // 2)))  # cap HBM per shape
    t4 = chain_time(lambda h, w: quant_matmul_pallas(h, w), w4(L, K, N), x_of[K])
    el = K * N
    print(
        f"w4a8 {name:8s} K={K:6d} N={N:6d}  {t4*1e6:8.1f} us  "
        f"{el/t4/1e9:7.1f} Gelem/s",
        flush=True,
    )
    total_i4 += t4
    total_elems += el

if not only:
    print(
        f"trunk/layer total {total_i4*1e3:6.3f} ms  -> x32 = {total_i4*32*1e3:6.2f} ms  "
        f"agg {total_elems/total_i4/1e9:7.1f} Gelem/s",
        flush=True,
    )

# w8a8 on one shape: same element count, no nibble unpack — isolates the
# unpack cost from MXU-pass scheduling
if not only or "w8" in (only or []):
    K, N = 4096, 14336  # gate_up-half-ish shape that fits int8
    L = 4
    t8 = chain_time(lambda h, w: quant_matmul_pallas(h, w), w8(L, K, N), x_of[K])
    print(
        f"w8a8 ref      K={K:6d} N={N:6d}  {t8*1e6:8.1f} us  "
        f"{K*N/t8/1e9:7.1f} Gelem/s",
        flush=True,
    )


# --- variant experiments -----------------------------------------------------
# vA: scale-free s8 dot with the same tiling → the ceiling of this grid
# vB: group=256/512 (fewer, deeper per-group dots + fewer scale FMAs)
if only and "var" in only:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from vllm_rs_tpu.ops.pallas.quant_matmul import _pick_tiles, _cdiv, _round_up

    def noscale_kernel(x_ref, w_ref, out_ref, acc_ref, *, n_k):
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
            out_ref[...] = acc_ref[...].astype(jnp.float32)

    def noscale_matmul(x, qw):
        M, K = x.shape
        _, N = qw.shape
        BM, BK, BN = _pick_tiles(M, K, N, 128)
        n_k = K // BK
        Mp = _round_up(M, BM)
        if Mp != M:
            x = jnp.pad(x, ((0, Mp - M), (0, 0)))
        out = pl.pallas_call(
            functools.partial(noscale_kernel, n_k=n_k),
            grid=(_cdiv(Mp, BM), N // BN, n_k),
            in_specs=[
                pl.BlockSpec((BM, BK), lambda m, n, k: (m, k)),
                pl.BlockSpec((BK, BN), lambda m, n, k: (k, n)),
            ],
            out_specs=pl.BlockSpec((BM, BN), lambda m, n, k: (m, n)),
            out_shape=jax.ShapeDtypeStruct((Mp, N), jnp.float32),
            scratch_shapes=[pltpu.VMEM((BM, BN), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
        )(x, qw)
        return out[:M]

    K, N, L = 4096, 28672, 2
    xq = jax.random.randint(key, (M, K), -127, 127, dtype=jnp.int8)
    w8s = jax.random.randint(key, (L, K, N), -127, 127, dtype=jnp.int8)
    t = chain_time(
        lambda h, w: noscale_matmul(
            jnp.clip(h, -127, 127).astype(jnp.int8), w
        ).astype(jnp.bfloat16)[:, :K],
        w8s,
        jax.random.normal(key, (M, K), jnp.bfloat16),
    )
    print(f"vA s8 no-scale K={K} N={N}: {t*1e6:8.1f} us  {K*N/t/1e9:7.1f} Gelem/s", flush=True)

    for G in (256, 512):
        t = chain_time(
            lambda h, w: quant_matmul_pallas(h, w), w4(2, K, N, G=G), x_of[4096]
        )
        print(f"vB w4a8 G={G} K={K} N={N}: {t*1e6:8.1f} us  {K*N/t/1e9:7.1f} Gelem/s", flush=True)

# vC: G=128 with forced BK (n_g per k-step = BK/G) — if a smaller BK hits
# the G=512 rate, the win is k-step scheduling, not dot depth, and we keep
# group-128 accuracy. Also re-runs the G sweep on a second shape.
if only and "bk" in only:
    import vllm_rs_tpu.ops.pallas.quant_matmul as qm

    orig_pick = qm._pick_tiles

    def run_bk(BK_force, K, N, G=128):
        def pick(M_, Ks_, N_, g_):
            BM, BK, BN = orig_pick(M_, Ks_, N_, g_)
            return BM, min(BK_force, Ks_), BN

        qm._pick_tiles = pick
        try:
            qm._int4_matmul_a8.clear_cache()
            t = chain_time(
                lambda h, w: quant_matmul_pallas(h, w), w4(2, K, N, G=G), x_of[K]
            )
        finally:
            qm._pick_tiles = orig_pick
            qm._int4_matmul_a8.clear_cache()
        print(
            f"vC w4a8 G={G} BK={BK_force} K={K} N={N}: {t*1e6:8.1f} us  "
            f"{K*N/t/1e9:7.1f} Gelem/s", flush=True,
        )

    for BK_force in (2048, 1024, 512, 256, 128):
        run_bk(BK_force, 4096, 28672)
    run_bk(512, 14336, 4096)
    run_bk(512, 4096, 6144)

# vD: (BK, BN) forced-tile sweep with the tree-reduced kernel. BN=1024
# lets BK=2048 fit VMEM → n_k=1: every weight tile visited once, acc
# written once (no k revisits).
if only and "bn" in only:
    import vllm_rs_tpu.ops.pallas.quant_matmul as qm

    orig_pick = qm._pick_tiles

    def run_tiles(BKf, BNf, K, N, G=128):
        def pick(M_, Ks_, N_, g_):
            BM, BK, BN = orig_pick(M_, Ks_, N_, g_)
            return BM, min(BKf, Ks_), (BNf if N_ % BNf == 0 else BN)

        qm._pick_tiles = pick
        try:
            qm._int4_matmul_a8.clear_cache()
            t = chain_time(
                lambda h, w: quant_matmul_pallas(h, w), w4(2, K, N, G=G), x_of[K]
            )
        finally:
            qm._pick_tiles = orig_pick
            qm._int4_matmul_a8.clear_cache()
        print(
            f"vD BK={BKf} BN={BNf} K={K} N={N}: {t*1e6:8.1f} us  "
            f"{K*N/t/1e9:7.1f} Gelem/s", flush=True,
        )

    for BKf, BNf in ((2048, 1024), (2048, 512), (1024, 1024), (1024, 512), (512, 2048)):
        run_tiles(BKf, BNf, 4096, 28672)
    run_tiles(2048, 1024, 14336, 4096)
    run_tiles(2048, 1024, 4096, 6144)
    run_tiles(2048, 1024, 4096, 4096)

# vE: square-tile validation on every trunk shape
if only and "sq" in only:
    import vllm_rs_tpu.ops.pallas.quant_matmul as qm

    orig_pick = qm._pick_tiles

    def run_tiles2(BKf, BNf, K, N, G=128):
        def pick(M_, Ks_, N_, g_):
            BM, BK, BN = orig_pick(M_, Ks_, N_, g_)
            BK2 = BKf if Ks_ % BKf == 0 else BK
            BN2 = BNf if N_ % BNf == 0 else BN
            return BM, BK2, BN2

        qm._pick_tiles = pick
        try:
            qm._int4_matmul_a8.clear_cache()
            t = chain_time(
                lambda h, w: quant_matmul_pallas(h, w), w4(2, K, N, G=G), x_of[K]
            )
        finally:
            qm._pick_tiles = orig_pick
            qm._int4_matmul_a8.clear_cache()
        print(
            f"vE BK={BKf} BN={BNf} K={K} N={N}: {t*1e6:8.1f} us  "
            f"{K*N/t/1e9:7.1f} Gelem/s", flush=True,
        )

    for name, K, N in SHAPES:
        run_tiles2(1024, 1024, K, N)
    run_tiles2(512, 1024, 4096, 28672)
    run_tiles2(1024, 1536, 4096, 6144)
