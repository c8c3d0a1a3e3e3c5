"""Fused gated-MLP kernel (ops/pallas/fused_mlp.py): parity vs the
unfused dequant-reference path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_rs_tpu.ops.pallas.fused_mlp import (
    fused_mlp_int4_a8,
    fused_mlp_supported,
)
from vllm_rs_tpu.quant.pack import PackedInt4Tensor, quantize_int4


def _mk(K, N, G, key):
    w = jax.random.normal(key, (K, N), dtype=jnp.float32) * 0.05
    return quantize_int4(w, group=G)


def _ref_mlp(x, gup, down, act="silu"):
    """Unfused float reference with the same stage-boundary quantization
    the a8 kernels apply (per-row int8 activations)."""
    from vllm_rs_tpu.quant.pack import dequantize

    gu = x.astype(jnp.float32) @ dequantize(gup).astype(jnp.float32)
    I = gu.shape[-1] // 2
    gate, up = gu[:, :I], gu[:, I:]
    if act == "silu":
        h = jax.nn.silu(gate) * up
    else:
        h = jax.nn.gelu(gate, approximate=True) * up
    return h @ dequantize(down).astype(jnp.float32)


@pytest.mark.parametrize("M", [1, 5, 16])
@pytest.mark.parametrize("act", ["silu", "gelu_pytorch_tanh"])
def test_fused_mlp_parity(M, act):
    D, I, G = 256, 512, 128
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    gup = _mk(D, 2 * I, G, k1)
    down = _mk(I, D, G, k2)
    x = jax.random.normal(k3, (M, D), dtype=jnp.bfloat16) * 0.3
    assert fused_mlp_supported(gup, down, M, act, interpret=True)
    y = fused_mlp_int4_a8(
        x, gup.qweight, gup.scales, down.qweight, down.scales,
        act=act, interpret=True,
    )
    ref = _ref_mlp(x, gup, down, act)
    # int8 activation quantization at two stage boundaries bounds the
    # relative error; compare against the float-activation reference
    err = np.abs(np.asarray(y, np.float32) - np.asarray(ref))
    scale = np.abs(np.asarray(ref)).mean() + 1e-6
    assert err.mean() / scale < 0.05, err.mean() / scale


def test_fused_matches_unfused_a8_closely():
    """The fused kernel and the production unfused a8 path must agree to
    within their (different) activation-quantization granularities."""
    from vllm_rs_tpu.ops.pallas.quant_matmul import _int4_matmul_a8

    D, I, G = 256, 512, 128
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    gup = _mk(D, 2 * I, G, k1)
    down = _mk(I, D, G, k2)
    x = jax.random.normal(k3, (4, D), dtype=jnp.bfloat16) * 0.3

    y_f = fused_mlp_int4_a8(
        x, gup.qweight, gup.scales, down.qweight, down.scales,
        interpret=True,
    )
    gu = _int4_matmul_a8(
        x.astype(jnp.bfloat16), gup.qweight, gup.scales, gup.zeros,
        interpret=True,
    )
    gate, up = jnp.split(gu, 2, axis=-1)
    h = (jax.nn.silu(gate.astype(jnp.float32)) * up.astype(jnp.float32)).astype(
        jnp.bfloat16
    )
    y_u = _int4_matmul_a8(h, down.qweight, down.scales, down.zeros, interpret=True)
    err = np.abs(np.asarray(y_f, np.float32) - np.asarray(y_u, np.float32))
    scale = np.abs(np.asarray(y_u, np.float32)).mean() + 1e-6
    assert err.mean() / scale < 0.05, err.mean() / scale


def test_supported_gates():
    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    gup = _mk(256, 1024, 128, k1)
    down = _mk(512, 256, 128, k2)
    assert fused_mlp_supported(gup, down, 4, "silu", interpret=True)
    assert not fused_mlp_supported(gup, down, 4, "gelu", interpret=True)
    assert not fused_mlp_supported(gup, down, 500, "silu", interpret=True)
    # asymmetric (zeros) unsupported
    z = PackedInt4Tensor(gup.qweight, gup.scales, jnp.zeros_like(gup.scales))
    assert not fused_mlp_supported(z, down, 4, "silu", interpret=True)
    # mismatched shapes
    down_bad = _mk(256, 256, 128, k2)
    assert not fused_mlp_supported(gup, down_bad, 4, "silu", interpret=True)
