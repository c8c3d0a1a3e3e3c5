"""Pallas fused dequant-matmul vs the jnp reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_rs_tpu.ops.pallas.quant_matmul import quant_matmul_pallas
from vllm_rs_tpu.ops.quant_matmul import quant_matmul_reference
from vllm_rs_tpu.quant.pack import quantize_int4, quantize_int8


@pytest.mark.parametrize("M", [1, 8, 17, 64])
@pytest.mark.parametrize("K,N,G", [(256, 128, 128), (512, 256, 64), (512, 384, 128)])
def test_int4_matches_reference(M, K, N, G):
    kx, kw = jax.random.split(jax.random.PRNGKey(M * K + N))
    w = jax.random.normal(kw, (K, N)) * 0.05
    x = (jax.random.normal(kx, (M, K)) * 0.5).astype(jnp.bfloat16)
    qt = quantize_int4(w, group=G)
    ref = quant_matmul_reference(x, qt).astype(jnp.float32)
    got = quant_matmul_pallas(x, qt, interpret=True).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("M", [8, 33])
@pytest.mark.parametrize("K,N,G", [(256, 128, 128), (512, 256, 32)])
def test_int8_matches_reference(M, K, N, G):
    kx, kw = jax.random.split(jax.random.PRNGKey(7))
    w = jax.random.normal(kw, (K, N)) * 0.05
    x = (jax.random.normal(kx, (M, K)) * 0.5).astype(jnp.bfloat16)
    qt = quantize_int8(w, group=G)
    ref = quant_matmul_reference(x, qt).astype(jnp.float32)
    got = quant_matmul_pallas(x, qt, interpret=True).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-2, atol=2e-2)


def test_unsupported_shapes_fall_back():
    w = jax.random.normal(jax.random.PRNGKey(0), (96, 64)) * 0.05
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 96)).astype(jnp.bfloat16)
    qt = quantize_int8(w, group=32)
    got = quant_matmul_pallas(x, qt, interpret=True)
    ref = quant_matmul_reference(x, qt)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), rtol=2e-2, atol=2e-2
    )


def test_3d_input():
    w = jax.random.normal(jax.random.PRNGKey(2), (256, 128)) * 0.05
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 4, 256)).astype(jnp.bfloat16)
    qt = quantize_int4(w, group=128)
    got = quant_matmul_pallas(x, qt, interpret=True)
    assert got.shape == (2, 4, 128)
    ref = quant_matmul_reference(x, qt)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), rtol=2e-2, atol=2e-2
    )


class TestA8Kernels:
    """w8a8 / w4a8 decode kernels (int8 MXU path) vs dequant reference."""

    def _check(self, qt, M=8, K=256, rtol=0.04):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from vllm_rs_tpu.ops.pallas.quant_matmul import (
            _int4_matmul_a8,
            _int8_matmul_a8,
        )
        from vllm_rs_tpu.ops.quant_matmul import quant_matmul_reference
        from vllm_rs_tpu.quant.pack import PackedInt4Tensor

        x = jax.random.normal(jax.random.PRNGKey(1), (M, K), dtype=jnp.bfloat16)
        expect = np.asarray(quant_matmul_reference(x, qt), np.float32)
        if isinstance(qt, PackedInt4Tensor):
            got = _int4_matmul_a8(x, qt.qweight, qt.scales, qt.zeros, interpret=True)
        else:
            got = _int8_matmul_a8(x, qt.qweight, qt.scales, qt.zeros, interpret=True)
        got = np.asarray(got, np.float32)
        scale = np.abs(expect).max() + 1e-6
        assert np.abs(got - expect).max() / scale < rtol, (
            np.abs(got - expect).max() / scale
        )

    def test_w8a8(self):
        import jax
        import jax.numpy as jnp

        from vllm_rs_tpu.quant.pack import quantize_int8

        w = jax.random.normal(jax.random.PRNGKey(0), (256, 256), dtype=jnp.float32) * 0.05
        self._check(quantize_int8(w, group=64))

    def test_w4a8_symmetric(self):
        import jax
        import jax.numpy as jnp

        from vllm_rs_tpu.quant.pack import quantize_int4

        w = jax.random.normal(jax.random.PRNGKey(0), (256, 256), dtype=jnp.float32) * 0.05
        self._check(quantize_int4(w, group=64, symmetric=True))

    def test_w4a8_asymmetric_zeros(self):
        import jax
        import jax.numpy as jnp

        from vllm_rs_tpu.quant.pack import quantize_int4

        w = (
            jax.random.normal(jax.random.PRNGKey(2), (256, 256), dtype=jnp.float32) * 0.04
            + 0.02
        )
        self._check(quantize_int4(w, group=64, symmetric=False), rtol=0.05)
