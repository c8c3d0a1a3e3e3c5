"""Canonical quantization formats: pack/unpack roundtrip, dequant accuracy,
matmul reference."""

import jax
import jax.numpy as jnp
import numpy as np

from vllm_rs_tpu.ops.quant_matmul import quant_matmul_reference
from vllm_rs_tpu.quant.pack import (
    dequantize,
    pack_int4,
    quantize_int4,
    quantize_int8,
    unpack_int4,
)


def test_int4_pack_roundtrip():
    rs = np.random.RandomState(0)
    q = jnp.asarray(rs.randint(-8, 8, size=(64, 32)), dtype=jnp.int8)
    packed = pack_int4(q)
    assert packed.shape == (32, 32) and packed.dtype == jnp.int8
    assert jnp.array_equal(unpack_int4(packed), q)


def test_int8_quant_error_bounded():
    w = jax.random.normal(jax.random.PRNGKey(0), (128, 64))
    qt = quantize_int8(w, group=32)
    err = jnp.abs(dequantize(qt, jnp.float32) - w)
    # max error ≤ scale/2 per group
    scales = qt.scales  # [K//G, N]
    bound = jnp.repeat(scales, 32, axis=0) * 0.5 + 1e-6
    assert bool(jnp.all(err <= bound))


def test_int4_quant_error_bounded():
    w = jax.random.normal(jax.random.PRNGKey(1), (128, 64))
    qt = quantize_int4(w, group=32)
    err = jnp.abs(dequantize(qt, jnp.float32) - w)
    bound = jnp.repeat(qt.scales, 32, axis=0) * 0.75 + 1e-6
    assert bool(jnp.all(err <= bound))


def test_quant_matmul_close_to_dense():
    w = jax.random.normal(jax.random.PRNGKey(2), (256, 128)) * 0.05
    x = jax.random.normal(jax.random.PRNGKey(3), (4, 256)).astype(jnp.bfloat16)
    dense = (x @ w.astype(jnp.bfloat16)).astype(jnp.float32)
    # bounds reflect inherent quantization noise on gaussian weights
    for quantize, bound in (
        (lambda W: quantize_int8(W, 64), 0.02),
        (lambda W: quantize_int4(W, 64), 0.15),
    ):
        y = quant_matmul_reference(x, quantize(w)).astype(jnp.float32)
        rel = jnp.linalg.norm(y - dense) / (jnp.linalg.norm(dense) + 1e-6)
        assert float(rel) < bound, float(rel)
