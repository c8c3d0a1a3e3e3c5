"""Multi-host SPMD prerequisites: scheduler determinism + request feed."""

import time

import pytest

from vllm_rs_tpu.config import SamplingParams, SchedulerConfig
from vllm_rs_tpu.core.block_manager import BlockManager
from vllm_rs_tpu.core.scheduler import Scheduler
from vllm_rs_tpu.core.sequence import Sequence
from vllm_rs_tpu.parallel.multihost import RequestFeed, RequestFollower


def _replay(events):
    """Run the scheduler over a scripted event stream, recording decisions."""
    cfg = SchedulerConfig(
        max_num_seqs=4, chunk_size=16, max_model_len=64, prefill_buckets=(8, 16)
    )
    sched = Scheduler(cfg, BlockManager(24, 4))
    sched.set_eos_token_ids((0,))
    decisions = []
    seqs = {}
    for ev in events:
        if ev[0] == "add":
            _, sid, toks = ev
            s = Sequence(toks, SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True), seq_id=sid)
            seqs[sid] = s
            sched.add(s)
        else:  # step: schedule + synthesize deterministic tokens
            batch = sched.schedule()
            decisions.append(
                (
                    batch.kind,
                    tuple(s.seq_id for s in batch.seqs),
                    tuple(batch.chunk_sizes),
                    batch.n_steps,
                )
            )
            if not batch.is_empty:
                if batch.kind == "prefill":
                    toks = [(s.seq_id * 7 + 1) % 63 + 1 for s in batch.seqs]
                else:
                    toks = [(s.seq_id + len(s.output_token_ids)) % 63 + 1 for s in batch.seqs]
                sched.postprocess(batch, toks)
    return decisions


class TestDeterminism:
    def test_scheduler_is_deterministic(self):
        """The SPMD multi-host contract: identical request streams →
        bit-identical scheduling decisions on every host."""
        events = [("add", 100, list(range(2, 12)))]
        events += [("step",)] * 3
        events += [("add", 101, list(range(20, 45))), ("add", 102, list(range(50, 55)))]
        events += [("step",)] * 12
        a = _replay(events)
        b = _replay(events)
        assert a == b
        assert any(kind == "decode" for kind, *_ in a)
        assert any(kind == "prefill" for kind, *_ in a)


class TestRequestFeed:
    def test_broadcast_order_and_content(self):
        feed = RequestFeed(port=0)
        got = []
        follower = RequestFollower(
            ("127.0.0.1", feed.port),
            on_request=lambda sid, toks, sp: got.append((sid, toks, sp)),
        )
        time.sleep(0.2)  # let the follower register
        for i in range(5):
            feed.publish(1000 + i, [1, 2, i], {"temperature": 0.0})
        deadline = time.time() + 5
        while len(got) < 5 and time.time() < deadline:
            time.sleep(0.05)
        follower.close()
        feed.close()
        assert [g[0] for g in got] == [1000, 1001, 1002, 1003, 1004]
        assert got[2][1] == [1, 2, 2]
