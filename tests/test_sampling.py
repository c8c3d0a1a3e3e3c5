"""On-device sampling: filters, penalties, determinism (reference
logits_processor.rs semantics)."""

import jax
import jax.numpy as jnp
import numpy as np

from vllm_rs_tpu.ops.sampling import HISTORY_WINDOW, SamplingState, sample


def make_state(B, V, **overrides):
    d = dict(
        temperature=jnp.zeros(B),
        top_k=jnp.zeros(B, jnp.int32),
        top_p=jnp.ones(B),
        min_p=jnp.zeros(B),
        repetition_penalty=jnp.ones(B),
        frequency_penalty=jnp.zeros(B),
        presence_penalty=jnp.zeros(B),
        history=jnp.full((B, HISTORY_WINDOW), V, jnp.int32),
        rng_fold=jnp.arange(B, dtype=jnp.uint32),
        out_len=jnp.zeros(B, jnp.int32),
    )
    d.update(overrides)
    return SamplingState(**d)


def test_greedy_argmax():
    logits = jnp.asarray(np.random.RandomState(0).randn(4, 50), jnp.float32)
    st = make_state(4, 50)
    toks = sample(logits, st, jax.random.PRNGKey(0), needs_filters=False, needs_penalties=False)
    assert jnp.array_equal(toks, jnp.argmax(logits, -1).astype(jnp.int32))


def test_top_k_restricts_support():
    V = 64
    logits = jnp.asarray(np.random.RandomState(1).randn(1, V), jnp.float32)
    st = make_state(1, V, temperature=jnp.ones(1), top_k=jnp.asarray([3], jnp.int32))
    top3 = set(np.argsort(np.asarray(logits[0]))[-3:].tolist())
    for pos in range(50):
        toks = sample(
            logits,
            st._replace(out_len=jnp.asarray([pos], jnp.int32)),
            jax.random.PRNGKey(0),
            needs_filters=True,
            needs_penalties=False,
        )
        assert int(toks[0]) in top3


def test_top_p_one_is_noop_support():
    V = 32
    logits = jnp.zeros((1, V), jnp.float32)  # uniform
    st = make_state(1, V, temperature=jnp.ones(1))
    seen = set()
    for pos in range(100):
        toks = sample(
            logits,
            st._replace(out_len=jnp.asarray([pos], jnp.int32)),
            jax.random.PRNGKey(0),
            needs_filters=True,
            needs_penalties=False,
        )
        seen.add(int(toks[0]))
    assert len(seen) > 10  # samples spread over the support


def test_repetition_penalty_suppresses_history():
    V = 16
    logits = jnp.full((1, V), 0.5, jnp.float32).at[0, 5].set(1.0)
    history = jnp.full((1, HISTORY_WINDOW), V, jnp.int32).at[0, 0].set(5)
    st = make_state(
        1,
        V,
        repetition_penalty=jnp.asarray([100.0]),
        history=history,
    )
    toks = sample(logits, st, jax.random.PRNGKey(0), needs_filters=False, needs_penalties=True)
    assert int(toks[0]) != 5  # token 5 crushed by penalty


def test_frequency_penalty_counts():
    V = 16
    logits = jnp.zeros((1, V), jnp.float32).at[0, 3].set(0.5)
    history = jnp.full((1, HISTORY_WINDOW), V, jnp.int32)
    history = history.at[0, :4].set(3)  # token 3 appeared 4 times
    st = make_state(1, V, frequency_penalty=jnp.asarray([1.0]), history=history)
    toks = sample(logits, st, jax.random.PRNGKey(0), needs_filters=False, needs_penalties=True)
    assert int(toks[0]) != 3


def test_mixed_greedy_and_sampled_rows():
    V = 32
    logits = jnp.asarray(np.random.RandomState(2).randn(2, V), jnp.float32)
    st = make_state(
        2, V, temperature=jnp.asarray([0.0, 1.0]), top_k=jnp.asarray([0, 5], jnp.int32)
    )
    toks = sample(logits, st, jax.random.PRNGKey(0), needs_filters=True, needs_penalties=False)
    assert int(toks[0]) == int(jnp.argmax(logits[0]))
