"""Verify-deferred attention (on-device speculative loop, T = k+1) vs the
classic write-then-attend reference.

The op under test splits attention into a POOL partial (decode kernel with
T folded into the GQA group dim, online-softmax (m, l) exported for
merging) and a dense in-WINDOW causal partial, flash-merged exactly
(ops/attention.py paged_attention_verify_deferred). Ground truth writes
the window KV into a throwaway cache and runs the ordinary gathered
attention.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_rs_tpu.ops.attn_meta import AttnMeta
from vllm_rs_tpu.ops.attention import (
    attend_gathered,
    paged_attention_verify_deferred,
)
from vllm_rs_tpu.ops.kv_cache import gather_kv_layer, write_kv_layer


def build_case(
    B=4, T=5, Hq=8, Hk=4, D=128, block_size=16, MB=8, seed=0, pool_lens=None
):
    rs = np.random.RandomState(seed)
    S = block_size * (B * MB + 1)
    kv_l = jnp.asarray(
        rs.randn(2, S, Hk * D), jnp.float32
    ).astype(jnp.bfloat16)
    q = jnp.asarray(rs.randn(B, T, Hq, D), jnp.float32).astype(jnp.bfloat16)
    k_new = jnp.asarray(rs.randn(B, T, Hk, D), jnp.float32).astype(jnp.bfloat16)
    v_new = jnp.asarray(rs.randn(B, T, Hk, D), jnp.float32).astype(jnp.bfloat16)
    if pool_lens is None:
        pool_lens = rs.randint(1, MB * block_size - T, size=B)
    pool_lens = np.asarray(pool_lens, np.int32)
    bt = np.arange(B * MB, dtype=np.int32).reshape(B, MB) + 1
    pos = pool_lens[:, None] + np.arange(T, dtype=np.int32)[None, :]
    page = np.minimum(pos // block_size, MB - 1)
    slot = np.take_along_axis(bt, page, axis=1) * block_size + pos % block_size
    slot = np.where(pool_lens[:, None] > 0, slot, S)  # inactive rows drop
    meta = AttnMeta(
        positions=jnp.asarray(pos),
        slot_mapping=jnp.asarray(slot.astype(np.int32)),
        block_tables=jnp.asarray(bt),
        context_lens=jnp.asarray(pool_lens + T),
        last_token_idx=jnp.full((B,), T - 1, jnp.int32),
        pool_lens=jnp.asarray(pool_lens),
    )
    return q, k_new, v_new, kv_l, meta


def ground_truth(q, k_new, v_new, kv_l, meta, *, block_size, scale, softcap=0.0):
    kv_tmp = write_kv_layer(kv_l, k_new, v_new, meta.slot_mapping)
    Hk = k_new.shape[2]
    k, v = gather_kv_layer(kv_tmp, meta.block_tables, block_size, Hk)
    return attend_gathered(
        q, k, v, meta, scale=scale, logit_softcap=softcap
    )


@pytest.mark.parametrize("backend", ["reference", "pallas"])
@pytest.mark.parametrize("pool", [[1, 5, 37, 100], [16, 32, 64, 90]])
def test_verify_deferred_matches_write_then_attend(backend, pool):
    q, k_new, v_new, kv_l, meta = build_case(pool_lens=pool)
    kw = dict(block_size=16, scale=0.088)
    ref = ground_truth(q, k_new, v_new, kv_l, meta, **kw)
    got = paged_attention_verify_deferred(
        q, k_new, v_new, kv_l, meta, backend=backend, **kw
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=3e-2, atol=3e-2,
    )


@pytest.mark.parametrize("backend", ["reference", "pallas"])
def test_verify_deferred_softcap(backend):
    q, k_new, v_new, kv_l, meta = build_case(seed=3, T=3)
    kw = dict(block_size=16, scale=0.1)
    ref = ground_truth(q, k_new, v_new, kv_l, meta, softcap=30.0, **kw)
    got = paged_attention_verify_deferred(
        q, k_new, v_new, kv_l, meta, backend=backend, logit_softcap=30.0, **kw
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=3e-2, atol=3e-2,
    )


@pytest.mark.parametrize("backend", ["reference", "pallas"])
def test_verify_deferred_pooled_layer_idx(backend):
    """The spec loop's real form: kv is the FULL [L, 2, S, F] pool and the
    kernel indexes its layer internally."""
    L = 3
    cases = [build_case(seed=10 + i) for i in range(L)]
    kv = jnp.stack([c[3] for c in cases])  # [L, 2, S, F]
    for li in range(L):
        q, k_new, v_new, kv_l, meta = cases[li]
        kw = dict(block_size=16, scale=0.088)
        ref = ground_truth(q, k_new, v_new, kv[li], meta, **kw)
        got = paged_attention_verify_deferred(
            q, k_new, v_new, kv, meta, backend=backend,
            layer_idx=jnp.asarray(li, jnp.int32), **kw
        )
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32),
            rtol=3e-2, atol=3e-2,
        )


@pytest.mark.parametrize("backend", ["reference", "pallas"])
def test_verify_deferred_inactive_rows_finite(backend):
    """Rows with pool_lens == 0 (inactive spec rows) must not produce
    NaN/Inf — their outputs are never emitted but must not poison jit."""
    q, k_new, v_new, kv_l, meta = build_case(pool_lens=[40, 0, 0, 0], seed=5)
    got = paged_attention_verify_deferred(
        q, k_new, v_new, kv_l, meta, backend=backend,
        block_size=16, scale=0.1,
    )
    got = np.asarray(got, np.float32)
    assert np.isfinite(got).all()
    ref = ground_truth(
        q, k_new, v_new, kv_l, meta, block_size=16, scale=0.1
    )
    np.testing.assert_allclose(
        got[:1], np.asarray(ref, np.float32)[:1], rtol=3e-2, atol=3e-2
    )
