"""Multi-row decode-attention kernel parity (interpret mode).

ops/pallas/paged_attention_multirow.py vs the jnp reference deferred path
(write-into-copy + gather attend): varied context lens, pooled layer
offsets, deferred self-KV, softcap, RB not dividing... (wrapper halves RB
until it divides B).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_rs_tpu.ops.attn_meta import AttnMeta
from vllm_rs_tpu.ops.attention import paged_attention_deferred
from vllm_rs_tpu.ops.pallas.paged_attention_multirow import (
    paged_attention_decode_multirow,
)


def _setup(B, Hk, G, D, L, block_size, MB, seed=0):
    rs = np.random.RandomState(seed)
    S = B * MB * block_size
    pool = jnp.asarray(
        rs.randn(L, 2, S, Hk * D) * 0.3, dtype=jnp.bfloat16
    )
    q = jnp.asarray(rs.randn(B, 1, Hk * G, D) * 0.3, dtype=jnp.bfloat16)
    k_new = jnp.asarray(rs.randn(B, 1, Hk, D) * 0.3, dtype=jnp.bfloat16)
    v_new = jnp.asarray(rs.randn(B, 1, Hk, D) * 0.3, dtype=jnp.bfloat16)
    ctx = rs.randint(1, MB * block_size + 1, size=B).astype(np.int32)
    bt = np.stack([np.arange(b * MB, (b + 1) * MB) for b in range(B)]).astype(
        np.int32
    )
    slots = (
        bt[np.arange(B), (ctx - 1) // block_size] * block_size
        + (ctx - 1) % block_size
    ).astype(np.int32)
    meta = AttnMeta(
        positions=jnp.asarray(ctx - 1, jnp.int32)[:, None],
        slot_mapping=jnp.asarray(slots)[:, None],
        block_tables=jnp.asarray(bt),
        context_lens=jnp.asarray(ctx),
        last_token_idx=jnp.zeros((B,), jnp.int32),
    )
    return pool, q, k_new, v_new, meta


@pytest.mark.parametrize("rows", [2, 4])
@pytest.mark.parametrize("softcap", [0.0, 30.0])
def test_multirow_matches_reference_pooled(rows, softcap):
    B, Hk, G, D, L, bs, MB = 8, 2, 2, 128, 3, 4, 4
    pool, q, k_new, v_new, meta = _setup(B, Hk, G, D, L, bs, MB)
    scale = D**-0.5
    for layer in (0, L - 1):
        li = jnp.asarray(layer, jnp.int32)
        want = paged_attention_deferred(
            q, k_new, v_new, pool, meta,
            block_size=bs, scale=scale, logit_softcap=softcap,
            backend="reference", layer_idx=li,
        )
        got = paged_attention_decode_multirow(
            q, pool, pool, meta,
            block_size=bs, scale=scale, logit_softcap=softcap,
            rows_per_step=rows, k_self=k_new, v_self=v_new,
            layer_idx=li, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            atol=2e-2, rtol=2e-2,
        )


def test_multirow_matches_singlerow_kernel():
    """Cross-check the two kernels against each other too (interpret)."""
    from vllm_rs_tpu.ops.pallas.paged_attention import (
        paged_attention_decode_pallas,
    )

    B, Hk, G, D, L, bs, MB = 16, 2, 4, 128, 2, 4, 6
    pool, q, k_new, v_new, meta = _setup(B, Hk, G, D, L, bs, MB, seed=5)
    scale = D**-0.5
    li = jnp.asarray(1, jnp.int32)
    a = paged_attention_decode_pallas(
        q, pool, pool, meta, block_size=bs, scale=scale,
        k_self=k_new, v_self=v_new, layer_idx=li, interpret=True,
    )
    b = paged_attention_decode_multirow(
        q, pool, pool, meta, block_size=bs, scale=scale, rows_per_step=4,
        k_self=k_new, v_self=v_new, layer_idx=li, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(b, np.float32), np.asarray(a, np.float32),
        atol=2e-2, rtol=2e-2,
    )


def test_multirow_non_pooled_without_self():
    B, Hk, G, D, bs, MB = 4, 2, 2, 128, 4, 3
    rs = np.random.RandomState(9)
    S = B * MB * bs
    k_cache = jnp.asarray(rs.randn(S, Hk * D) * 0.3, dtype=jnp.bfloat16)
    v_cache = jnp.asarray(rs.randn(S, Hk * D) * 0.3, dtype=jnp.bfloat16)
    q = jnp.asarray(rs.randn(B, 1, Hk * G, D) * 0.3, dtype=jnp.bfloat16)
    ctx = np.array([1, 4, 7, 12], np.int32)
    bt = np.stack([np.arange(b * MB, (b + 1) * MB) for b in range(B)]).astype(
        np.int32
    )
    meta = AttnMeta(
        positions=jnp.asarray(ctx - 1, jnp.int32)[:, None],
        slot_mapping=jnp.zeros((B, 1), jnp.int32),
        block_tables=jnp.asarray(bt),
        context_lens=jnp.asarray(ctx),
        last_token_idx=jnp.zeros((B,), jnp.int32),
    )
    from vllm_rs_tpu.ops.attention import paged_attention_reference

    want = paged_attention_reference(
        q, k_cache, v_cache, meta, block_size=bs, scale=D**-0.5
    )
    got = paged_attention_decode_multirow(
        q, k_cache, v_cache, meta, block_size=bs, scale=D**-0.5,
        rows_per_step=2, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=2e-2, rtol=2e-2,
    )
