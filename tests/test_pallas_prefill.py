"""Chunked-prefill flash kernel vs gather-based reference (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_rs_tpu.ops.attention import paged_attention_reference
from vllm_rs_tpu.ops.attn_meta import AttnMeta
from vllm_rs_tpu.ops.kv_cache import write_kv
from vllm_rs_tpu.ops.pallas.prefill_attention import paged_prefill_pallas


def _setup(B, T, start, Hq, Hk, D, block_size, MB, seed=0):
    """Each row: `start` tokens of earlier context already in cache, then a
    T-token chunk being prefilled (its KV also written)."""
    rs = np.random.RandomState(seed)
    S = (B * MB + 1) * block_size
    k_cache = jnp.zeros((S, Hk * D), jnp.float32)
    v_cache = jnp.zeros((S, Hk * D), jnp.float32)
    block_tables = np.zeros((B, MB), dtype=np.int32)
    for b in range(B):
        block_tables[b] = np.arange(b * MB, (b + 1) * MB)
    ctx = start + T
    # write context + chunk KV
    all_k = rs.randn(B, ctx, Hk, D).astype(np.float32)
    all_v = rs.randn(B, ctx, Hk, D).astype(np.float32)
    slot_all = np.zeros((B, ctx), dtype=np.int32)
    for b in range(B):
        for t in range(ctx):
            blk = block_tables[b][t // block_size]
            slot_all[b, t] = blk * block_size + t % block_size
    k_cache, v_cache = write_kv(
        k_cache, v_cache, jnp.asarray(all_k), jnp.asarray(all_v), jnp.asarray(slot_all)
    )
    q = jnp.asarray(rs.randn(B, T, Hq, D).astype(np.float32))
    positions = np.broadcast_to(
        np.arange(start, start + T, dtype=np.int32), (B, T)
    ).copy()
    meta = AttnMeta(
        positions=jnp.asarray(positions),
        slot_mapping=jnp.asarray(slot_all[:, start:]),
        block_tables=jnp.asarray(block_tables),
        context_lens=jnp.full((B,), ctx, jnp.int32),
        last_token_idx=jnp.full((B,), T - 1, jnp.int32),
    )
    return q.astype(jnp.bfloat16), k_cache.astype(jnp.bfloat16), v_cache.astype(jnp.bfloat16), meta


@pytest.mark.parametrize(
    "B,T,start,Hq,Hk,sw",
    [
        (2, 16, 0, 4, 2, 0),  # fresh prefill
        (2, 16, 32, 4, 2, 0),  # chunk with prior context (chunked prefill)
        (1, 48, 8, 8, 8, 0),  # MHA, odd sizes (q_tile padding)
        (2, 16, 32, 4, 2, 24),  # sliding window across the chunk boundary
    ],
)
def test_prefill_kernel_matches_reference(B, T, start, Hq, Hk, sw):
    D, bs = 128, 8
    MB = -(-(start + T) // bs) + 1
    q, kc, vc, meta = _setup(B, T, start, Hq, Hk, D, bs, MB)
    got = paged_prefill_pallas(
        q, kc, vc, meta, block_size=bs, scale=D ** -0.5, sliding_window=sw,
        q_tile=16, pages_per_step=2, interpret=True,
    )
    expect = paged_attention_reference(
        q, kc, vc, meta, block_size=bs, scale=D ** -0.5, sliding_window=sw
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(expect, np.float32),
        atol=0.02, rtol=0.02,
    )


def test_softcap():
    D, bs = 128, 8
    q, kc, vc, meta = _setup(1, 16, 0, 4, 2, D, bs, 4)
    got = paged_prefill_pallas(
        q, kc, vc, meta, block_size=bs, scale=D ** -0.5, logit_softcap=30.0,
        q_tile=16, pages_per_step=2, interpret=True,
    )
    expect = paged_attention_reference(
        q, kc, vc, meta, block_size=bs, scale=D ** -0.5, logit_softcap=30.0
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(expect, np.float32),
        atol=0.02, rtol=0.02,
    )


@pytest.mark.parametrize("C,start", [(16, 0), (24, 32), (32, 20)])
def test_prefill_chunked_attention(C, start):
    """llama4 chunked attention in the prefill kernel: every query row
    masks to its own chunk [floor(q/C)*C, q] — rows inside one tile can
    belong to different chunks."""
    D, bs, B, T, Hq, Hk = 128, 8, 2, 16, 4, 2
    MB = -(-(start + T) // bs) + 1
    q, kc, vc, meta = _setup(B, T, start, Hq, Hk, D, bs, MB)
    got = paged_prefill_pallas(
        q, kc, vc, meta, block_size=bs, scale=D ** -0.5, sliding_window=C,
        chunked=True, q_tile=16, pages_per_step=2, interpret=True,
    )
    expect = paged_attention_reference(
        q, kc, vc, meta, block_size=bs, scale=D ** -0.5, sliding_window=C,
        chunked=True,
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(expect, np.float32),
        atol=0.02, rtol=0.02,
    )
