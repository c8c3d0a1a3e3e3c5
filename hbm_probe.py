"""Hardware-envelope probe: re-measure the PERF_NOTES roofline rows.

Quantifies environment drift (round-3 finding #4: the unchanged round-2
tree runs the 0.6b batch-256 bench 2.1x slower than round 2 recorded).
Three honest differenced in-graph measurements:

  bf16 dense matmul (M=8)    — HBM weight-stream rate (r1: ~735 GB/s)
  s8xs8 native MXU dot (M=8) — int8 pass rate       (r1: ~845 Gelem/s)
  HBM copy (big contiguous)  — raw read+write bandwidth
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

key = jax.random.PRNGKey(0)


def chain(fn, Ws, x, R1=4, R2=24):
    def run(x, Ws, R):
        def outer(i, h):
            def f(h, w):
                y = fn(h, w)
                K = x.shape[-1]
                return y[..., :K].astype(x.dtype), None

            h, _ = jax.lax.scan(f, h, Ws)
            return h

        return jnp.sum(jax.lax.fori_loop(0, R, outer, x))

    fs = {R: jax.jit(functools.partial(run, R=R)) for R in (R1, R2)}
    L = Ws.shape[0]

    def m(R, n=3):
        float(np.asarray(fs[R](x, Ws)))
        t0 = time.perf_counter()
        for _ in range(n):
            float(np.asarray(fs[R](x, Ws)))
        return (time.perf_counter() - t0) / n

    return (m(R2) - m(R1)) / ((R2 - R1) * L)


def main():
    M, K, N, L = 8, 4096, 4096, 8
    x16 = jax.random.normal(key, (M, K), jnp.bfloat16)
    W16 = jax.random.normal(key, (L, K, N), jnp.bfloat16)
    t = chain(lambda h, w: jnp.dot(h, w), W16, x16)
    print(f"bf16 dense matmul M=8: {K*N*2/t/1e9:7.1f} GB/s  ({t*1e6:.1f} us)")

    x8 = jax.random.randint(key, (M, K), -127, 127, dtype=jnp.int8)
    W8 = jax.random.randint(key, (L, K, N), -127, 127, dtype=jnp.int8)
    t = chain(
        lambda h, w: jax.lax.dot_general(
            h, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        ).astype(jnp.int8),
        W8,
        x8,
    )
    print(f"s8xs8 MXU dot M=8:    {K*N/t/1e9:7.1f} Gelem/s ({t*1e6:.1f} us)")

    # HBM read: full-array reduction of 64 MB buffers (the sum consumes
    # every element, so nothing is dead-code-eliminated)
    big = jax.random.normal(key, (L, 4096, 8192), jnp.bfloat16)  # 64 MB each
    t = chain(lambda h, w: h + jnp.sum(w).astype(jnp.bfloat16), big, x16)
    bytes_r = 4096 * 8192 * 2
    print(f"HBM full-array read:  {bytes_r/t/1e9:7.1f} GB/s  ({t*1e6:.1f} us)")


if __name__ == "__main__":
    main()
