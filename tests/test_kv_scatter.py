"""Parity: Pallas deferred-KV row-DMA scatter vs the XLA scatter path.

Interpret mode cannot catch Mosaic lowering failures (run chip_smoke.py /
scatter_lab.py on hardware for that), but it does verify addressing,
pad-slot drop (slot == S), dtype cast, and that untouched rows survive.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_rs_tpu.ops.attention import scatter_deferred_kv
from vllm_rs_tpu.ops.pallas.kv_scatter import scatter_rows_pallas, supported

L, B, S, F = 3, 8, 64, 1024


def _mk(seed=0, news_dtype=jnp.bfloat16):
    kk, kv_key, kp = jax.random.split(jax.random.PRNGKey(seed), 3)
    pool = jax.random.normal(kp, (L, 2, S, F), jnp.bfloat16)
    k_news = jax.random.normal(kk, (L, B, F), news_dtype)
    v_news = jax.random.normal(kv_key, (L, B, F), news_dtype)
    slots = np.array([0, 7, 13, 63, S, 42, S, 1], np.int32)  # pads == S
    return pool, k_news, v_news, jnp.asarray(slots)


@pytest.mark.parametrize("news_dtype", [jnp.bfloat16, jnp.float32])
def test_parity_vs_xla(news_dtype):
    pool, k_news, v_news, slots = _mk(news_dtype=news_dtype)
    want = scatter_deferred_kv(
        pool, k_news, v_news, slots.reshape(-1, 1), backend="xla"
    )
    got = scatter_rows_pallas(pool, k_news, v_news, slots, interpret=True)
    assert got.dtype == pool.dtype
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


def test_pad_rows_dropped_and_others_untouched():
    pool, k_news, v_news, slots = _mk(seed=3)
    before = np.asarray(pool)
    got = np.asarray(scatter_rows_pallas(pool, k_news, v_news, slots, interpret=True))
    written = {int(s) for s in np.asarray(slots) if s < S}
    kn = np.asarray(k_news.astype(jnp.bfloat16))
    vn = np.asarray(v_news.astype(jnp.bfloat16))
    sl = np.asarray(slots)
    for s in range(S):
        if s in written:
            b = int(np.nonzero(sl == s)[0][0])
            np.testing.assert_array_equal(got[:, 0, s], kn[:, b])
            np.testing.assert_array_equal(got[:, 1, s], vn[:, b])
        else:
            np.testing.assert_array_equal(got[:, :, s], before[:, :, s])


def test_supported_gating():
    assert supported((L, 2, S, 1024), jnp.bfloat16)
    assert not supported((L, 2, S, 512), jnp.bfloat16)  # sub-lane-aligned rows
    assert not supported((L, 2, S, 1024), jnp.float8_e4m3fn)  # 1-byte pool
    # the dispatcher must fall back to XLA for unsupported pools
    pool, k_news, v_news, slots = _mk(seed=5)
    pool512 = pool[..., :512]
    out = scatter_deferred_kv(
        pool512, k_news[..., :512], v_news[..., :512],
        slots.reshape(-1, 1), backend="pallas",
    )
    want = scatter_deferred_kv(
        pool512, k_news[..., :512], v_news[..., :512],
        slots.reshape(-1, 1), backend="xla",
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(want))
