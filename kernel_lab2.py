"""Does Mosaic hit native int8 MXU? And what's the w8a8 grouped rate?"""
import functools, time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kernel_lab import chain_time  # differenced honest timing

key = jax.random.PRNGKey(0)
L, K, N, M, G = 12, 4096, 14336, 8, 128
x = jax.random.normal(key, (M, K), dtype=jnp.bfloat16)

# A) pure int8 x int8 dot, no scales — MXU mode probe
Wq8 = jax.random.randint(key, (L, K, N), -127, 127, dtype=jnp.int8)
def k_i8(x_ref, w_ref, o_ref, acc_ref, *, n_k):
    k = pl.program_id(2)
    @pl.when(k == 0)
    def _(): acc_ref[...] = jnp.zeros_like(acc_ref)
    acc_ref[...] += jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    @pl.when(k == n_k - 1)
    def _(): o_ref[...] = acc_ref[...].astype(jnp.float32)

def v_i8(h, w):
    BK, BN = 512, 2048
    n_k = K // BK
    xq = jnp.clip(jnp.round(h.astype(jnp.float32) * 16.0), -127, 127).astype(jnp.int8)
    return pl.pallas_call(
        functools.partial(k_i8, n_k=n_k),
        grid=(1, N // BN, n_k),
        in_specs=[pl.BlockSpec((M, BK), lambda m, nn, k: (0, k)),
                  pl.BlockSpec((BK, BN), lambda m, nn, k: (k, nn))],
        out_specs=pl.BlockSpec((M, BN), lambda m, nn, k: (0, nn)),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((M, BN), jnp.int32)],
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel","parallel","arbitrary")),
    )(xq, w)
try:
    t = chain_time(v_i8, Wq8, x)
    print(f"pallas s8xs8 MXU probe:    {t*1e6:8.1f} us/layer -> {K*N/t/1e9:7.1f} GB/s(i8) {K*N/t/1e9:7.1f} Gelem/s")
except Exception as e:
    print("s8xs8 failed:", str(e)[:250])

# B) w8a8 grouped with per-group scale applied on int32 partials
from vllm_rs_tpu.quant.pack import QuantizedTensor
Ws = QuantizedTensor(Wq8, jax.random.uniform(key, (L, K // G, N), jnp.float32) * 0.02, None)
def k_w8a8(xs_ref, x_ref, w_ref, s_ref, o_ref, acc_ref, *, n_k, n_g, G):
    k = pl.program_id(2)
    @pl.when(k == 0)
    def _(): acc_ref[...] = jnp.zeros_like(acc_ref)
    acc = acc_ref[...]
    for g in range(n_g):
        sl = slice(g * G, (g + 1) * G)
        p = jax.lax.dot_general(x_ref[:, sl], w_ref[sl], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        acc += p.astype(jnp.float32) * s_ref[0, g]
    acc_ref[...] = acc
    @pl.when(k == n_k - 1)
    def _(): o_ref[...] = (acc_ref[...] * xs_ref[:, :1]).astype(o_ref.dtype)

def v_w8a8(h, wq):
    qw, sc = wq.qweight, wq.scales
    BK, BN = 512, 2048
    n_k, n_g = K // BK, BK // G
    amax = jnp.max(jnp.abs(h.astype(jnp.float32)), axis=1, keepdims=True)
    xs = jnp.maximum(amax / 127.0, 1e-8)
    xq = jnp.clip(jnp.round(h.astype(jnp.float32) / xs), -127, 127).astype(jnp.int8)
    s = sc.reshape(n_k, n_g, N)
    return pl.pallas_call(
        functools.partial(k_w8a8, n_k=n_k, n_g=n_g, G=G),
        grid=(1, N // BN, n_k),
        in_specs=[pl.BlockSpec((M, 1), lambda m, nn, k: (0, 0)),
                  pl.BlockSpec((M, BK), lambda m, nn, k: (0, k)),
                  pl.BlockSpec((BK, BN), lambda m, nn, k: (k, nn)),
                  pl.BlockSpec((1, n_g, BN), lambda m, nn, k: (k, 0, nn))],
        out_specs=pl.BlockSpec((M, BN), lambda m, nn, k: (0, nn)),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((M, BN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel","parallel","arbitrary")),
    )(xs.astype(jnp.float32), xq, qw, s)
try:
    t = chain_time(v_w8a8, Ws, x)
    print(f"pallas w8a8 grouped:       {t*1e6:8.1f} us/layer -> {K*N/t/1e9:7.1f} GB/s(i8)")
except Exception as e:
    print("w8a8 failed:", str(e)[:250])

# C) w4a8: unpack nibbles to int8 then int8 MXU
Wq4 = QuantizedTensor(
    jax.random.randint(key, (L, K // 2, N), -128, 127, dtype=jnp.int8),
    jax.random.uniform(key, (L, K // G, N), jnp.float32) * 0.02, None)
def k_w4a8(xs_ref, x_ref, w_ref, s_ref, o_ref, acc_ref, *, n_k, n_g, G):
    k = pl.program_id(2)
    @pl.when(k == 0)
    def _(): acc_ref[...] = jnp.zeros_like(acc_ref)
    w = w_ref[...]
    w32 = w.astype(jnp.int32)
    lo = ((w32 << 28) >> 28).astype(jnp.int8)
    hi = (w32 >> 4).astype(jnp.int8)
    acc = acc_ref[...]
    half = x_ref.shape[1] // 2
    for g in range(n_g):
        sl = slice(g * G, (g + 1) * G)
        p = jax.lax.dot_general(x_ref[:, sl], lo[sl], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        p += jax.lax.dot_general(x_ref[:, half + g * G : half + (g + 1) * G], hi[sl],
                                 (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
        acc += p.astype(jnp.float32) * s_ref[0, g]
    acc_ref[...] = acc
    @pl.when(k == n_k - 1)
    def _(): o_ref[...] = (acc_ref[...] * xs_ref[:, :1]).astype(o_ref.dtype)

def v_w4a8(h, wq):
    qw, sc = wq.qweight, wq.scales  # [K/2, N], [K/G, N] (shared lo/hi scale here for probe)
    Kh = K // 2
    BKp, BN = 512, 2048
    n_k, n_g = Kh // BKp, BKp // G
    amax = jnp.max(jnp.abs(h.astype(jnp.float32)), axis=1, keepdims=True)
    xs = jnp.maximum(amax / 127.0, 1e-8)
    xq = jnp.clip(jnp.round(h.astype(jnp.float32) / xs), -127, 127).astype(jnp.int8)
    xl = xq[:, :Kh].reshape(M, n_k, BKp)
    xh = xq[:, Kh:].reshape(M, n_k, BKp)
    xx = jnp.concatenate([xl, xh], axis=2).reshape(M, n_k * 2 * BKp)
    s = sc[: Kh // G].reshape(n_k, n_g, N)
    return pl.pallas_call(
        functools.partial(k_w4a8, n_k=n_k, n_g=n_g, G=G),
        grid=(1, N // BN, n_k),
        in_specs=[pl.BlockSpec((M, 1), lambda m, nn, k: (0, 0)),
                  pl.BlockSpec((M, 2 * BKp), lambda m, nn, k: (0, k)),
                  pl.BlockSpec((BKp, BN), lambda m, nn, k: (k, nn)),
                  pl.BlockSpec((1, n_g, BN), lambda m, nn, k: (k, 0, nn))],
        out_specs=pl.BlockSpec((M, BN), lambda m, nn, k: (0, nn)),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((M, BN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel","parallel","arbitrary")),
    )(xs.astype(jnp.float32), xx, qw, s)
try:
    t = chain_time(v_w4a8, Wq4, x)
    print(f"pallas w4a8 unpack+MXU:    {t*1e6:8.1f} us/layer -> {K*N/2/t/1e9:7.1f} GB/s(i4)")
except Exception as e:
    print("w4a8 failed:", str(e)[:250])
