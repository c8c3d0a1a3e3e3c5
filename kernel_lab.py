"""Kernel-variant lab: honest scan-chained timings on the TPU."""
import functools, sys, time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def chain_time(one_layer, Ws, x, R1=4, R2=24):
    """Honest per-layer time: repeat the whole scan R times INSIDE one jit
    call (fori_loop), fetch a scalar to force completion, and difference two
    repeat counts to cancel the tunnel RTT + fixed overheads."""
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
        float(np.asarray(fs[R](x, Ws)))  # warmup/compile
        t0 = time.perf_counter()
        for _ in range(n):
            v = float(np.asarray(fs[R](x, Ws)))
        return (time.perf_counter() - t0) / n
    tA, tB = measure(R1), measure(R2)
    return (tB - tA) / ((R2 - R1) * L)

key = jax.random.PRNGKey(0)
L, K, N, M, G = 12, 4096, 14336, 8, 128
x = jax.random.normal(key, (M, K), dtype=jnp.bfloat16)
i4_bytes = K * N // 2

from vllm_rs_tpu.quant.pack import PackedInt4Tensor, QuantizedTensor
from vllm_rs_tpu.ops.pallas.quant_matmul import quant_matmul_pallas

Wq4 = PackedInt4Tensor(
    jax.random.randint(key, (L, K // 2, N), -128, 127, dtype=jnp.int8),
    jax.random.uniform(key, (L, K // G, N), dtype=jnp.float32) * 0.02,
    None,
)

t = chain_time(lambda h, w: quant_matmul_pallas(h, w), Wq4, x)
print(f"pallas int4 CURRENT:      {t*1e6:8.1f} us/layer -> {i4_bytes/t/1e9:7.1f} GB/s(i4)")

# variant A: single dot per k-step, scales repeated onto weights in VMEM
def kA(x_ref, w_ref, s_ref, o_ref, acc_ref, *, n_k, G):
    k = pl.program_id(2)
    @pl.when(k == 0)
    def _(): acc_ref[...] = jnp.zeros_like(acc_ref)
    w = w_ref[...]  # [BKp, BN] packed int8
    w32 = w.astype(jnp.int32)
    lo = ((w32 << 28) >> 28).astype(jnp.bfloat16)
    hi = (w32 >> 4).astype(jnp.bfloat16)
    s = s_ref[0]  # [2*n_g, BN] f32 (lo stripes then hi stripes)
    n_g = s.shape[0] // 2
    s_lo = pltpu.repeat(s[:n_g].astype(jnp.bfloat16), G, axis=0)   # [BKp, BN]
    s_hi = pltpu.repeat(s[n_g:].astype(jnp.bfloat16), G, axis=0)
    wf = jnp.concatenate([lo * s_lo, hi * s_hi], axis=0)  # [2*BKp, BN]
    acc_ref[...] += jnp.dot(x_ref[...], wf, preferred_element_type=jnp.float32)
    @pl.when(k == n_k - 1)
    def _(): o_ref[...] = acc_ref[...].astype(o_ref.dtype)

def vA(h, wq):
    qw, sc = wq.qweight, wq.scales  # [K/2, N], [K/G, N]
    Kh = qw.shape[0]
    BKp, BN = 512, 2048
    n_k = Kh // BKp
    n_g = BKp // G
    KG = sc.shape[0]
    # per-step scale stripes: lo half rows then hi half rows
    s_lo = sc[: KG // 2].reshape(n_k, n_g, N)
    s_hi = sc[KG // 2 :].reshape(n_k, n_g, N)
    s = jnp.concatenate([s_lo, s_hi], axis=1)  # [n_k, 2*n_g, N]
    # x split in halves matching packed rows: [M, K] -> lo rows then hi rows
    xl = h[:, : K // 2].reshape(M, n_k, BKp)
    xh = h[:, K // 2 :].reshape(M, n_k, BKp)
    xx = jnp.concatenate([xl, xh], axis=2).reshape(M, n_k * 2 * BKp)  # per-step [lo|hi]
    return pl.pallas_call(
        functools.partial(kA, n_k=n_k, G=G),
        grid=(1, N // BN, n_k),
        in_specs=[
            pl.BlockSpec((M, 2 * BKp), lambda m, nn, k: (0, k)),
            pl.BlockSpec((BKp, BN), lambda m, nn, k: (k, nn)),
            pl.BlockSpec((1, 2 * n_g, BN), lambda m, nn, k: (k, 0, nn)),
        ],
        out_specs=pl.BlockSpec((M, BN), lambda m, nn, k: (0, nn)),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((M, BN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(xx, qw, s)

try:
    t = chain_time(vA, Wq4, x)
    print(f"variant A repeat-scales:  {t*1e6:8.1f} us/layer -> {i4_bytes/t/1e9:7.1f} GB/s(i4)")
except Exception as e:
    print("variant A failed:", str(e)[:300])

# variant B: XLA unpack + dequant-materialize grouped (no pallas)
def vB(h, wq):
    qw, sc = wq.qweight, wq.scales
    lo = ((qw << 4) >> 4)
    hi = (qw >> 4)
    q = jnp.concatenate([lo, hi], axis=0).astype(jnp.bfloat16)  # [K, N]
    wf = (q.reshape(K // G, G, N) * sc[:, None, :].astype(jnp.bfloat16)).reshape(K, N)
    return jnp.dot(h, wf, preferred_element_type=jnp.float32)
t = chain_time(vB, Wq4, x)
print(f"variant B XLA dequant-mat:{t*1e6:8.1f} us/layer -> {i4_bytes/t/1e9:7.1f} GB/s(i4)")

# variant C: int8 single-dot pallas with repeat-scales
Wq8 = QuantizedTensor(
    jax.random.randint(key, (L, K, N), -127, 127, dtype=jnp.int8),
    jax.random.uniform(key, (L, K // G, N), dtype=jnp.float32) * 0.02,
    None,
)
def kC(x_ref, w_ref, s_ref, o_ref, acc_ref, *, n_k, G):
    k = pl.program_id(2)
    @pl.when(k == 0)
    def _(): acc_ref[...] = jnp.zeros_like(acc_ref)
    wf = w_ref[...].astype(jnp.bfloat16)
    s = pltpu.repeat(s_ref[0].astype(jnp.bfloat16), G, axis=0)
    acc_ref[...] += jnp.dot(x_ref[...], wf * s, preferred_element_type=jnp.float32)
    @pl.when(k == n_k - 1)
    def _(): o_ref[...] = acc_ref[...].astype(o_ref.dtype)

def vC(h, wq):
    qw, sc = wq.qweight, wq.scales
    BK, BN = 512, 2048
    n_k = K // BK
    n_g = BK // G
    s = sc.reshape(n_k, n_g, N)
    return pl.pallas_call(
        functools.partial(kC, n_k=n_k, G=G),
        grid=(1, N // BN, n_k),
        in_specs=[
            pl.BlockSpec((M, BK), lambda m, nn, k: (0, k)),
            pl.BlockSpec((BK, BN), lambda m, nn, k: (k, nn)),
            pl.BlockSpec((1, n_g, BN), lambda m, nn, k: (k, 0, nn)),
        ],
        out_specs=pl.BlockSpec((M, BN), lambda m, nn, k: (0, nn)),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((M, BN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(h, qw, s)
try:
    t = chain_time(vC, Wq8, x)
    print(f"variant C int8 repeat:    {t*1e6:8.1f} us/layer -> {K*N/t/1e9:7.1f} GB/s(i8)")
except Exception as e:
    print("variant C failed:", str(e)[:300])

# baseline: bf16 dense same shape
Wb = jax.random.normal(key, (L, K, N), dtype=jnp.bfloat16)
t = chain_time(lambda h, w: jnp.dot(h, w, preferred_element_type=jnp.float32), Wb, x)
print(f"bf16 dense XLA:           {t*1e6:8.1f} us/layer -> {K*N*2/t/1e9:7.1f} GB/s(bf16)")
