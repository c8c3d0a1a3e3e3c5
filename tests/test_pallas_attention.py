"""Pallas paged-attention decode kernel vs the jnp reference (interpret
mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_rs_tpu.ops.attn_meta import AttnMeta
from vllm_rs_tpu.ops.pallas.paged_attention import paged_attention_decode_pallas
from vllm_rs_tpu.ops.attention import paged_attention_reference


def build_case(
    B=4, Hq=8, Hk=4, D=128, block_size=16, MB=8, seed=0, ctx_lens=None
):
    rs = np.random.RandomState(seed)
    S = block_size * (B * MB + 1)
    k_cache = jnp.asarray(rs.randn(S, Hk * D), jnp.float32).astype(jnp.bfloat16)
    v_cache = jnp.asarray(rs.randn(S, Hk * D), jnp.float32).astype(jnp.bfloat16)
    q = jnp.asarray(rs.randn(B, 1, Hq, D), jnp.float32).astype(jnp.bfloat16)
    if ctx_lens is None:
        ctx_lens = rs.randint(1, MB * block_size, size=B)
    ctx_lens = np.asarray(ctx_lens, np.int32)
    # distinct blocks per sequence
    bt = np.arange(B * MB, dtype=np.int32).reshape(B, MB) + 1
    positions = (ctx_lens - 1).reshape(B, 1).astype(np.int32)
    meta = AttnMeta(
        positions=jnp.asarray(positions),
        slot_mapping=jnp.full((B, 1), S, jnp.int32),
        block_tables=jnp.asarray(bt),
        context_lens=jnp.asarray(ctx_lens),
        last_token_idx=jnp.zeros((B,), jnp.int32),
    )
    return q, k_cache, v_cache, meta


@pytest.mark.parametrize("ctx", [[1, 5, 37, 128], [16, 32, 64, 100]])
def test_decode_matches_reference(ctx):
    q, k, v, meta = build_case(ctx_lens=ctx)
    ref = paged_attention_reference(q, k, v, meta, block_size=16, scale=0.088)
    got = paged_attention_decode_pallas(
        q, k, v, meta, block_size=16, scale=0.088, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), rtol=3e-2, atol=3e-2
    )


def test_decode_with_softcap():
    q, k, v, meta = build_case(seed=1)
    kw = dict(block_size=16, scale=0.088, logit_softcap=30.0)
    ref = paged_attention_reference(q, k, v, meta, **kw)
    got = paged_attention_decode_pallas(q, k, v, meta, interpret=True, **kw)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), rtol=3e-2, atol=3e-2
    )


def test_decode_sliding_window():
    q, k, v, meta = build_case(seed=2, ctx_lens=[100, 40, 7, 128])
    kw = dict(block_size=16, scale=0.088, sliding_window=32)
    ref = paged_attention_reference(q, k, v, meta, **kw)
    got = paged_attention_decode_pallas(q, k, v, meta, interpret=True, **kw)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), rtol=3e-2, atol=3e-2
    )


def test_decode_mha_group1():
    q, k, v, meta = build_case(Hq=4, Hk=4, seed=3)
    ref = paged_attention_reference(q, k, v, meta, block_size=16, scale=0.1)
    got = paged_attention_decode_pallas(
        q, k, v, meta, block_size=16, scale=0.1, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), rtol=3e-2, atol=3e-2
    )


def test_decode_padding_rows_dont_crash():
    q, k, v, meta = build_case(ctx_lens=[64, 0, 0, 0])  # 3 padded rows
    got = paged_attention_decode_pallas(
        q, k, v, meta, block_size=16, scale=0.1, interpret=True
    )
    ref = paged_attention_reference(q, k, v, meta, block_size=16, scale=0.1)
    np.testing.assert_allclose(
        np.asarray(got, np.float32)[:1], np.asarray(ref, np.float32)[:1],
        rtol=3e-2, atol=3e-2,
    )
    assert np.isfinite(np.asarray(got, np.float32)[:1]).all()


@pytest.mark.parametrize("sw", [8, 32, 1])
def test_decode_deferred_sliding_window(sw):
    """Deferred self-KV + sliding window must attend exactly sw tokens —
    the window low bound shifts by one when the self column is folded in
    separately (regression: the kernel attended sw+1 tokens)."""
    q, k, v, meta = build_case(seed=7, ctx_lens=[100, 40, 7, 128])
    kw = dict(block_size=16, scale=0.088, sliding_window=sw)
    ref = paged_attention_reference(q, k, v, meta, **kw)
    # extract the current token's own K/V from its cache slot so the
    # deferred call sees an identical attention problem
    B = q.shape[0]
    Hk, D = 4, 128
    bt = np.asarray(meta.block_tables)
    ctx = np.asarray(meta.context_lens)
    slots = np.array(
        [bt[b, (ctx[b] - 1) // 16] * 16 + (ctx[b] - 1) % 16 for b in range(B)]
    )
    ks = jnp.asarray(np.asarray(k)[slots]).reshape(B, 1, Hk, D)
    vs = jnp.asarray(np.asarray(v)[slots]).reshape(B, 1, Hk, D)
    got = paged_attention_decode_pallas(
        q, k, v, meta, interpret=True, k_self=ks, v_self=vs, **kw
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), rtol=3e-2, atol=3e-2
    )


def test_decode_pooled_mode_matches_per_layer():
    """Pooled mode (full [L,2,S,F] pool + traced layer_idx) must equal the
    per-layer two-array call for every layer."""
    B, Hq, Hk, D, bs, MB, L = 2, 8, 4, 128, 16, 4, 3
    rs = np.random.RandomState(3)
    S = bs * (B * MB + 1)
    pool = jnp.asarray(rs.randn(L, 2, S, Hk * D), jnp.float32).astype(jnp.bfloat16)
    q = jnp.asarray(rs.randn(B, 1, Hq, D), jnp.float32).astype(jnp.bfloat16)
    ks = jnp.asarray(rs.randn(B, 1, Hk, D), jnp.float32).astype(jnp.bfloat16)
    vs = jnp.asarray(rs.randn(B, 1, Hk, D), jnp.float32).astype(jnp.bfloat16)
    ctx = np.asarray([17, 49], np.int32)
    bt = np.arange(B * MB, dtype=np.int32).reshape(B, MB) + 1
    meta = AttnMeta(
        positions=jnp.asarray((ctx - 1).reshape(B, 1)),
        slot_mapping=jnp.full((B, 1), S, jnp.int32),
        block_tables=jnp.asarray(bt),
        context_lens=jnp.asarray(ctx),
        last_token_idx=jnp.zeros((B,), jnp.int32),
    )
    for li in range(L):
        pooled = paged_attention_decode_pallas(
            q, pool, pool, meta, block_size=bs, scale=0.09,
            k_self=ks, v_self=vs,
            layer_idx=jnp.asarray(li, jnp.int32), interpret=True,
        )
        per_layer = paged_attention_decode_pallas(
            q, pool[li, 0], pool[li, 1], meta, block_size=bs, scale=0.09,
            k_self=ks, v_self=vs, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(pooled, np.float32), np.asarray(per_layer, np.float32),
            rtol=1e-5, atol=1e-5, err_msg=f"layer {li}",
        )


@pytest.mark.parametrize("C", [16, 32, 64])
def test_decode_chunked_attention(C):
    """llama4 chunked attention: keys from the query's own chunk only,
    [floor(pos/C)*C, pos] — exact HF semantics, not a sliding window."""
    q, k, v, meta = build_case(seed=11, ctx_lens=[100, 40, 7, 128])
    kw = dict(block_size=16, scale=0.088, sliding_window=C, chunked=True)
    ref = paged_attention_reference(q, k, v, meta, **kw)
    got = paged_attention_decode_pallas(q, k, v, meta, interpret=True, **kw)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), rtol=3e-2, atol=3e-2
    )
    # sanity: chunked differs from sliding for off-boundary positions
    slid = paged_attention_reference(
        q, k, v, meta, block_size=16, scale=0.088, sliding_window=C
    )
    assert not np.allclose(np.asarray(ref, np.float32), np.asarray(slid, np.float32))


def test_decode_chunked_deferred():
    """Chunked + deferred self-KV: the pool holds [0, pos), the self column
    folds in separately; low bound is floor(pos/C)*C either way."""
    C = 32
    q, k, v, meta = build_case(seed=13, ctx_lens=[100, 40, 33, 128])
    kw = dict(block_size=16, scale=0.088, sliding_window=C, chunked=True)
    ref = paged_attention_reference(q, k, v, meta, **kw)
    B, Hk, D = q.shape[0], 4, 128
    pos = np.asarray(meta.positions).reshape(B)
    bt = np.asarray(meta.block_tables)
    slots = np.array(
        [bt[b, pos[b] // 16] * 16 + pos[b] % 16 for b in range(B)], np.int32
    )
    k_self = jnp.stack([k[s] for s in slots]).reshape(B, 1, Hk, D)
    v_self = jnp.stack([v[s] for s in slots]).reshape(B, 1, Hk, D)
    got = paged_attention_decode_pallas(
        q, k, v, meta, interpret=True, k_self=k_self, v_self=v_self, **kw
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), rtol=3e-2, atol=3e-2
    )
