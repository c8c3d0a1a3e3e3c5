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


class TestFp8Block:
    def test_roundtrip(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from vllm_rs_tpu.quant.fp8 import dequantize_fp8_block, quantize_fp8_block

        w = jax.random.normal(jax.random.PRNGKey(0), (256, 256), jnp.float32) * 0.05
        qt = quantize_fp8_block(w, block=(128, 128))
        back = dequantize_fp8_block(qt, jnp.float32)
        rel = np.abs(np.asarray(back) - np.asarray(w)).max() / np.abs(np.asarray(w)).max()
        assert rel < 0.08  # e4m3 has ~2 mantissa-bit relative error

    def test_matmul_matches_dequant(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from vllm_rs_tpu.quant.fp8 import (
            dequantize_fp8_block,
            fp8_matmul,
            quantize_fp8_block,
        )

        w = jax.random.normal(jax.random.PRNGKey(1), (256, 384), jnp.float32) * 0.05
        x = jax.random.normal(jax.random.PRNGKey(2), (4, 256), jnp.bfloat16)
        qt = quantize_fp8_block(w)
        got = np.asarray(fp8_matmul(x, qt), np.float32)
        expect = np.asarray(
            jnp.dot(x, dequantize_fp8_block(qt), preferred_element_type=jnp.float32),
            np.float32,
        )
        np.testing.assert_allclose(got, expect, atol=0.02, rtol=0.02)

    def test_linear_dispatch(self):
        import jax
        import jax.numpy as jnp

        from vllm_rs_tpu.models.layers import linear
        from vllm_rs_tpu.quant.fp8 import quantize_fp8_block

        w = jax.random.normal(jax.random.PRNGKey(0), (128, 128), jnp.float32) * 0.05
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 128), jnp.bfloat16)
        y = linear(quantize_fp8_block(w), x)
        assert y.shape == (2, 128)
