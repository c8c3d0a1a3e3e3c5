"""Guided-decoding mask latency at real vocab scale (VERDICT r2 item 8).

First-visit automaton states walk the full vocabulary trie on the host
inside the per-token critical path (guided sequences force single-step
decode). These tests build a synthetic 150k-token BPE-like vocabulary and
bound the worst-case and p99 first-visit mask latency for the expensive
constraint kinds (json_schema, lark grammar), and verify the prefetch
overlap path (admission pre-warm + post-commit warm) returns identical
masks without recomputation.

Measured on the dev CPU (recorded in PERF_NOTES.md): trie build ~1 s;
with the (state, char) step memo, first-visit walks are 0.1-235 ms
(json_schema 0.3, json 23, lark-grammar 235 worst — was 1.9 s before the
step memo); memoized revisits ~2 µs. Bounds below are ~4x the measured
worst case to stay stable on slow CI hosts.
"""

import random
import string
import time

import pytest

from vllm_rs_tpu.utils.guidance import (
    GuidanceState,
    TokenTrie,
    build_constraint,
)

VOCAB = 150_000


def _synthetic_vocab(n=VOCAB):
    """BPE-like token strings: short subwords, space-prefixed words,
    numbers, punctuation, code fragments, some unicode."""
    rng = random.Random(7)
    toks = {}
    tid = 0

    def add(s):
        nonlocal tid
        if tid < n:
            toks[tid] = s
            tid += 1

    for ch in (string.printable[:-5] + "äöüßéèñ中日한"):
        add(ch)
    words = [
        "".join(rng.choice(string.ascii_lowercase) for _ in range(rng.randint(2, 9)))
        for _ in range(60_000)
    ]
    for w in words:
        add(" " + w)
        add(w)
    while tid < n:
        kind = rng.random()
        if kind < 0.2:
            add(str(rng.randint(0, 99999)))
        elif kind < 0.4:
            add(rng.choice(['",', '":', '"}', "',", "());", "]:", "=\"", "\n\n", "  "]))
        elif kind < 0.6:
            add(
                "".join(
                    rng.choice(string.ascii_letters + "_")
                    for _ in range(rng.randint(3, 12))
                )
            )
        else:
            add(
                " "
                + "".join(
                    rng.choice(string.ascii_lowercase) for _ in range(rng.randint(1, 14))
                )
            )
    return toks


@pytest.fixture(scope="module")
def trie():
    t0 = time.perf_counter()
    t = TokenTrie(_synthetic_vocab())
    print(f"\ntrie build ({VOCAB} tokens): {time.perf_counter() - t0:.2f}s")
    return t


SCHEMA = {
    "type": "object",
    "properties": {
        "name": {"type": "string"},
        "kind": {"enum": ["alpha", "beta", "gamma"]},
        "count": {"type": "integer"},
        "tags": {"type": "array", "items": {"type": "string"}},
        "nested": {
            "type": "object",
            "properties": {"x": {"type": "number"}, "y": {"type": "number"}},
            "required": ["x"],
        },
    },
    "required": ["name", "kind", "count"],
}

LARK = r"""
start: "result(" value ("," value)* ")"
value: NUMBER | WORD
NUMBER: /-?[0-9]+/
WORD: /[a-z_]+/
"""


def _drive(gs, trie, steps=60):
    """Simulate a guided decode: at each state take the mask (timed), then
    commit one allowed token (longest string first — crosses the most
    automaton states per commit, the worst case for state diversity)."""
    import collections

    id_to_str = {}

    def tok_str(tid):
        if tid not in id_to_str:
            # invert by walking — build once lazily
            stack = [(trie.root, "")]
            while stack:
                node, pre = stack.pop()
                for ch, child in node.items():
                    if ch is None:
                        for t in child:
                            id_to_str.setdefault(t, pre)
                    else:
                        stack.append((child, pre + ch))
        return id_to_str[tid]

    lat = []
    rng = random.Random(3)
    for _ in range(steps):
        t0 = time.perf_counter()
        allowed = gs.allowed_tokens()
        lat.append(time.perf_counter() - t0)
        if allowed is None:
            break
        if gs.is_complete and (not allowed or rng.random() < 0.1):
            break
        cands = [t for t in allowed if t not in gs.eos_ids]
        if not cands:
            break
        pick = rng.choice(cands)
        gs.advance(pick, tok_str(pick))
    return lat


def _p(lat, q):
    s = sorted(lat)
    return s[min(int(len(s) * q / 100), len(s) - 1)]


@pytest.mark.parametrize(
    "kind,arg,first_bound_ms,p99_bound_ms",
    [
        ("json_schema", SCHEMA, 100.0, 100.0),
        ("grammar", LARK, 1000.0, 1000.0),
        ("json", None, 400.0, 400.0),
    ],
)
def test_first_visit_mask_latency_bounded(trie, kind, arg, first_bound_ms, p99_bound_ms):
    auto = build_constraint(kind, arg)
    gs = GuidanceState(auto, trie, eos_ids=(0,))
    t0 = time.perf_counter()
    first = gs.allowed_tokens()
    t_first = (time.perf_counter() - t0) * 1e3
    assert first, "empty initial mask"
    lat = _drive(gs, trie)
    p99 = _p(lat, 99) * 1e3
    worst = max(lat) * 1e3
    print(
        f"{kind}: first {t_first:.1f} ms, p99 {p99:.1f} ms, "
        f"worst {worst:.1f} ms over {len(lat)} states "
        f"({len(gs._memo)} memoized)"
    )
    assert t_first < first_bound_ms, f"first-visit mask {t_first:.0f} ms"
    assert p99 < p99_bound_ms, f"p99 mask {p99:.0f} ms"


def test_memoized_revisit_is_fast(trie):
    auto = build_constraint("json_schema", SCHEMA)
    gs = GuidanceState(auto, trie, eos_ids=(0,))
    gs.allowed_tokens()
    t0 = time.perf_counter()
    for _ in range(100):
        gs.allowed_tokens()
    per = (time.perf_counter() - t0) / 100 * 1e3
    print(f"memoized revisit: {per:.3f} ms")
    assert per < 5.0


def test_prefetch_overlaps_and_matches(trie):
    auto = build_constraint("json_schema", SCHEMA)
    gs = GuidanceState(auto, trie, eos_ids=(0,))
    ref = GuidanceState(build_constraint("json_schema", SCHEMA), trie, eos_ids=(0,))

    gs.prefetch()  # admission pre-warm
    assert gs._pending is not None
    gs._pending[1].result()  # the device step would run here
    t0 = time.perf_counter()
    got = gs.allowed_tokens()
    t_hot = (time.perf_counter() - t0) * 1e3
    assert sorted(got) == sorted(ref.allowed_tokens())
    assert t_hot < 50.0, f"prefetched mask still took {t_hot:.0f} ms"


def test_prefetch_snapshot_not_live_state(trie):
    """A queued prefetch must compute the mask for the state it was
    scheduled in, even if advance() moves the live state meanwhile."""
    auto = build_constraint("json", None)
    gs = GuidanceState(auto, trie, eos_ids=(0,))
    key0 = auto.mask_key(gs.state)
    gs.prefetch()
    gs._pending[1].result()
    # move the live state: commit '{' then '"'
    gs.advance(1, "{")
    gs.advance(2, '"')
    ref = GuidanceState(build_constraint("json", None), trie, eos_ids=(0,))
    assert sorted(gs._memo[key0]) == sorted(ref.allowed_tokens())
