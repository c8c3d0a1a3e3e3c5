"""Stream pacing (core/pacer.py): smooth ITL delivery of multi-step bursts.

VERDICT r3 item 5: under deep multi-step, a streaming client saw k-token
bursts followed by step-sized stalls. Pacing re-delivers each burst across
the next step's duration without changing the schedule or the tokens.
"""

import queue
import threading
import time

import jax
import numpy as np
import pytest

from vllm_rs_tpu.config import (
    CacheConfig,
    EngineConfig,
    ModelConfig,
    SamplingParams,
    SchedulerConfig,
)
from vllm_rs_tpu.core.engine import LLMEngine
from vllm_rs_tpu.core.pacer import StreamPacer
from vllm_rs_tpu.core.runner import ModelRunner
from vllm_rs_tpu.models.llama import CausalLM


class _Item:
    def __init__(self, i, finished=False):
        self.i = i
        self.finished = finished

    def __repr__(self):
        return f"_Item({self.i}, finished={self.finished})"


def _drain(q, n, timeout=10.0):
    out = []
    deadline = time.monotonic() + timeout
    while len(out) < n and time.monotonic() < deadline:
        try:
            out.append((q.get(timeout=0.2), time.monotonic()))
        except queue.Empty:
            pass
    return out


class TestStreamPacer:
    def test_order_and_spread(self):
        p = StreamPacer()
        try:
            q = queue.Queue()
            items = [_Item(i) for i in range(8)]
            t0 = time.monotonic()
            p.schedule(1, q, items, span_s=0.4)
            got = _drain(q, 8)
            assert [it.i for it, _ in got] == list(range(8))
            # first item immediate, last near 0.9*span*(7/8) ≈ 0.31 s;
            # loose bounds for CI jitter
            assert got[0][1] - t0 < 0.15
            assert got[-1][1] - t0 > 0.15
        finally:
            p.stop()

    def test_flush_on_finish(self):
        p = StreamPacer()
        try:
            q = queue.Queue()
            items = [_Item(i) for i in range(7)] + [_Item(7, finished=True)]
            t0 = time.monotonic()
            p.schedule(1, q, items, span_s=5.0)
            got = _drain(q, 8, timeout=2.0)
            assert [it.i for it, _ in got] == list(range(8))
            assert got[-1][1] - t0 < 0.5  # no pacing when the burst finishes
        finally:
            p.stop()

    def test_new_burst_flushes_leftovers(self):
        p = StreamPacer()
        try:
            q = queue.Queue()
            p.schedule(1, q, [_Item(i) for i in range(4)], span_s=30.0)
            time.sleep(0.05)
            p.schedule(1, q, [_Item(i) for i in range(4, 8)], span_s=0.1)
            got = _drain(q, 8, timeout=2.0)
            # leftovers of burst 1 delivered before any of burst 2, in order
            assert [it.i for it, _ in got] == list(range(8))
        finally:
            p.stop()

    def test_flush_sid(self):
        p = StreamPacer()
        try:
            q1, q2 = queue.Queue(), queue.Queue()
            p.schedule(1, q1, [_Item(i) for i in range(4)], span_s=30.0)
            p.schedule(2, q2, [_Item(i) for i in range(4)], span_s=30.0)
            p.flush(1)
            got1 = _drain(q1, 4, timeout=1.0)
            assert [it.i for it, _ in got1] == [0, 1, 2, 3]
            assert q2.qsize() <= 1  # sid 2 still paced (first item immediate)
            p.flush()
            got2 = _drain(q2, 4, timeout=1.0)
            assert [it.i for it, _ in got2] == [0, 1, 2, 3]
        finally:
            p.stop()

    def test_interval_cap(self):
        """A degenerate span can never produce per-token gaps > 0.2 s."""
        p = StreamPacer()
        try:
            q = queue.Queue()
            t0 = time.monotonic()
            p.schedule(1, q, [_Item(i) for i in range(3)], span_s=100.0)
            got = _drain(q, 3, timeout=3.0)
            assert len(got) == 3
            assert got[-1][1] - t0 < 1.0  # 2 gaps × ≤0.2 s + jitter
        finally:
            p.stop()


def _engine(multi_step=1, pacing=False):
    cfg = ModelConfig(
        model_type="llama",
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        vocab_size=128,
        eos_token_ids=(0,),
    )
    ec = EngineConfig(
        model=cfg,
        cache=CacheConfig(block_size=4, num_blocks=64),
        scheduler=SchedulerConfig(
            max_num_seqs=4, chunk_size=16, max_model_len=128,
            prefill_buckets=(8, 16), multi_step_decode=multi_step,
            stream_pacing=pacing,
        ),
        prefill_buckets=(8, 16),
        decode_buckets=(4,),
    )
    m = CausalLM(cfg, block_size=4)
    params = m.init_params(jax.random.PRNGKey(0))
    return LLMEngine(ec, ModelRunner(m, params, ec))


def _stream_tokens(engine, prompt, max_tokens):
    engine.start_loop()
    try:
        sid = engine.add_request(
            prompt,
            SamplingParams(temperature=0.0, max_tokens=max_tokens, ignore_eos=True),
        )
        q = engine.get_stream(sid)
        toks, times = [], []
        while True:
            item = q.get(timeout=120)
            if item.token_id is not None:
                toks.append(item.token_id)
                times.append(time.monotonic())
            if item.finished:
                return toks, times, item.finish_reason
    finally:
        engine.stop_loop()


class TestEnginePacing:
    def test_tokens_identical_with_pacing(self):
        prompt = [5, 6, 7, 8, 9]
        ref, _, _ = _stream_tokens(_engine(4, pacing=False), prompt, 13)
        got, _, reason = _stream_tokens(_engine(4, pacing=True), prompt, 13)
        assert got == ref
        assert len(got) == 13
        assert reason == "length"

    def test_abort_flushes_paced_items(self):
        engine = _engine(4, pacing=True)
        engine.start_loop()
        try:
            sid = engine.add_request(
                [3, 4, 5],
                SamplingParams(temperature=0.0, max_tokens=64, ignore_eos=True),
            )
            q = engine.get_stream(sid)
            q.get(timeout=120)  # first token arrived → decode underway
            engine.abort_request(sid)
            items = []
            deadline = time.monotonic() + 10
            while time.monotonic() < deadline:
                item = q.get(timeout=10)
                items.append(item)
                if item.finished:
                    break
            assert items and items[-1].finished
            assert items[-1].finish_reason == "abort"
            # no token may trail the terminal item
            assert all(not it.finished for it in items[:-1])
        finally:
            engine.stop_loop()


class TestRamp:
    def test_multistep_ramp_under_pacing(self):
        """stream_pacing ramps k with the youngest stream's output length
        (power-of-two ladder) so a fresh stream's first gaps are small
        steps; without pacing k jumps straight to the configured value."""
        for pacing, expected_first in ((True, [2, 4, 8]), (False, [8, 8])):
            engine = _engine(8, pacing=pacing)
            engine.schedule_trace = []
            engine.generate(
                [[5, 6, 7]],
                SamplingParams(temperature=0.0, max_tokens=15, ignore_eos=True),
            )
            ks = [t[4] for t in engine.schedule_trace if t[1] == "decode"]
            assert ks[: len(expected_first)] == expected_first, (pacing, ks)

    def test_ramp_preserves_tokens(self):
        prompt = [9, 8, 7]
        sp = SamplingParams(temperature=0.0, max_tokens=21, ignore_eos=True)
        ref = _engine(1, pacing=False).generate([prompt], sp)[0].output_token_ids
        got = _engine(8, pacing=True).generate([prompt], sp)[0].output_token_ids
        assert got == ref
