"""2-process multi-host lockstep integration test.

Spawns two real OS processes that form one jax.distributed job (gloo CPU
collectives, 4 virtual devices each → one global 8-device mesh), shard the
same tiny model tp=8 across BOTH processes, and serve through the
step-marker protocol (parallel/multihost.py StepFeed/StepFollower): rank 0
is the leader ingesting requests — two up front, two injected mid-stream —
and rank 1 a headless follower. Both record every emitted token and every
scheduling decision.

Pass = bit-identical tokens AND bit-identical schedule traces on both
processes (the reference's moral equivalent: block_manager.rs:746-874
broadcast mirror + src/runner/runner.rs:249-434 lockstep loop).
"""

import json
import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_lockstep(tmp_path):
    worker = os.path.join(os.path.dirname(__file__), "mh_worker.py")
    coord, feed = _free_port(), _free_port()
    env = dict(os.environ)
    env.pop("PYTEST_CURRENT_TEST", None)
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(rank), str(coord), str(feed), str(tmp_path)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            cwd=os.path.dirname(os.path.dirname(worker)),
        )
        for rank in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=720)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out.decode(errors="replace"))
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-4000:]}"

    with open(tmp_path / "rank0.json") as f:
        r0 = json.load(f)
    with open(tmp_path / "rank1.json") as f:
        r1 = json.load(f)
    # bit-identical tokens for every request, including the two injected
    # mid-stream and the seeded sampled ones
    assert r0["tokens"] == r1["tokens"]
    assert len(r0["tokens"]) == 4
    assert all(len(v) > 0 for v in r0["tokens"].values())
    # bit-identical scheduling decisions at every step index
    assert r0["trace"] == r1["trace"]
    assert any(kind == "prefill" for _, kind, *_ in r0["trace"])
    assert any(kind == "decode" for _, kind, *_ in r0["trace"])
