"""Indexed-expert quantized matmul (MoE decode kernel) vs dense reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_rs_tpu.ops.moe import moe_mlp_indexed, moe_mlp_reference
from vllm_rs_tpu.ops.pallas.moe_matmul import moe_matmul_indexed
from vllm_rs_tpu.quant.pack import dequantize, quantize_int4, quantize_int8

E, K, N = 4, 256, 384


def _stacked(quant_fn, group, seed=0):
    ws = []
    for e in range(E):
        w = jax.random.normal(jax.random.PRNGKey(seed + e), (K, N), jnp.float32) * 0.05
        ws.append(quant_fn(w, group))
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *ws)


@pytest.mark.parametrize("qfn,group", [(quantize_int8, 128), (quantize_int4, 128), (quantize_int8, 256)])
def test_indexed_matmul_matches_dequant(qfn, group):
    w = _stacked(qfn, group)
    M = 8
    x = jax.random.normal(jax.random.PRNGKey(9), (M, K), jnp.bfloat16)
    ids = jnp.asarray(np.random.RandomState(1).randint(0, E, size=M), jnp.int32)
    y = moe_matmul_indexed(x, ids, w, interpret=True)
    assert y is not None and y.shape == (M, N)
    # reference: per-row dequant matmul with the same a8 activation quant
    from vllm_rs_tpu.ops.pallas.moe_matmul import _quantize_rows_int8

    xq, xs = _quantize_rows_int8(x)
    for m in range(M):
        wd = dequantize(jax.tree_util.tree_map(lambda t: t[int(ids[m])], w), jnp.float32)
        want = (xq[m].astype(jnp.float32) * xs[m]) @ wd
        np.testing.assert_allclose(
            np.asarray(y[m], np.float32), np.asarray(want, np.float32),
            rtol=0.05, atol=0.05,
        )


def test_moe_mlp_indexed_matches_reference():
    wg = _stacked(quantize_int8, 128, seed=0)
    wu = _stacked(quantize_int8, 128, seed=10)
    # down: [E, N, K]
    wds = []
    for e in range(E):
        w = jax.random.normal(jax.random.PRNGKey(20 + e), (N, K), jnp.float32) * 0.05
        wds.append(quantize_int8(w, 128))
    wd = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *wds)

    T, k = 3, 2
    h = jax.random.normal(jax.random.PRNGKey(5), (T, K), jnp.bfloat16)
    ids = jnp.asarray([[0, 2], [1, 3], [2, 0]], jnp.int32)
    wts = jnp.asarray([[0.7, 0.3], [0.5, 0.5], [0.9, 0.1]], jnp.float32)
    y = moe_mlp_indexed(h, wts, ids, wg, wu, wd, "silu")
    assert y is not None
    ref = moe_mlp_reference(h, wts, ids, wg, wu, wd, "silu")
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(ref, np.float32), rtol=0.1, atol=0.05
    )


def test_unsupported_returns_none():
    # asymmetric int4 (zeros) falls back
    w = _stacked(lambda w, g: quantize_int4(w, g, symmetric=False), 128)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, K), jnp.bfloat16)
    ids = jnp.zeros((4,), jnp.int32)
    assert moe_matmul_indexed(x, ids, w, interpret=True) is None
