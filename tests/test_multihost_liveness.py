"""Multi-host failure detection (VERDICT r2 item 5).

Reference counterpart: 1 Hz heartbeat between main process and runners,
runner exits on parent EOF, abort after 5 missed pings
(/root/reference/src/utils/heartbeat.rs:8-78, utils/command.rs).

Unit level: StepFeed/StepFollower liveness primitives. Process level: two
real OS processes serving through the step-marker feed; one is SIGKILLed
mid-serving and the survivor must cancel its in-flight requests and exit
within a bounded time instead of hanging on the next marker/collective.
"""

import os
import signal
import socket
import subprocess
import sys
import time

import pytest

from vllm_rs_tpu.parallel import multihost
from vllm_rs_tpu.parallel.multihost import (
    PeerLostError,
    StepDesyncError,
    StepFeed,
    StepFollower,
)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


# ---------------------------------------------------------------------------
# unit level
# ---------------------------------------------------------------------------


def test_follower_detects_feed_eof():
    feed = StepFeed(port=0)
    fol = StepFollower(("127.0.0.1", feed.port))
    feed.wait_followers(1, timeout=10)
    feed.publish(0, [], [], [])
    assert fol.next_marker(0, timeout=5)["step"] == 0
    feed.close()
    t0 = time.time()
    with pytest.raises(PeerLostError):
        # blocked fatal wait must wake on the EOF sentinel, not after the
        # full marker timeout
        fol.next_marker(1, timeout=None)
    assert time.time() - t0 < 5.0
    fol.close()


def test_follower_marker_timeout_is_fatal(monkeypatch):
    monkeypatch.setenv("VLLM_RS_TPU_MH_TIMEOUT_S", "0.3")
    feed = StepFeed(port=0)
    fol = StepFollower(("127.0.0.1", feed.port))
    feed.wait_followers(1, timeout=10)
    with pytest.raises(PeerLostError):
        fol.next_marker(0, timeout=None)  # None = engine has work
    # an idle poll with explicit timeout stays non-fatal
    assert fol.next_marker(0, timeout=0.05) is None
    feed.close()
    fol.close()


def test_step_gap_is_desync_error():
    feed = StepFeed(port=0)
    fol = StepFollower(("127.0.0.1", feed.port))
    feed.wait_followers(1, timeout=10)
    feed.publish(7, [], [], [])
    with pytest.raises(StepDesyncError):
        fol.next_marker(0, timeout=5)
    feed.close()
    fol.close()


def test_leader_detects_follower_death():
    feed = StepFeed(port=0)
    fol = StepFollower(("127.0.0.1", feed.port))
    feed.wait_followers(1, timeout=10)
    feed.check_liveness()  # alive: no raise
    fol.close()
    deadline = time.time() + 20  # generous: suite runs under heavy load
    while time.time() < deadline:
        try:
            feed.check_liveness()
        except PeerLostError:
            break
        time.sleep(0.05)
    else:
        pytest.fail("leader never noticed the dead follower")
    with pytest.raises(PeerLostError):
        feed.publish(0, [], [], [])
    feed.close()


def test_leader_detects_stale_heartbeat(monkeypatch):
    feed = StepFeed(port=0)
    # follower that never heartbeats (simulates a hung-but-connected peer)
    fol = StepFollower(("127.0.0.1", feed.port), heartbeat=False)
    feed.wait_followers(1, timeout=10)
    monkeypatch.setattr(multihost, "HB_INTERVAL_S", 0.05)
    monkeypatch.setattr(multihost, "HB_MISS_LIMIT", 3)
    time.sleep(0.5)
    with pytest.raises(PeerLostError):
        feed.check_liveness()
    feed.close()
    fol.close()


def test_pre_serving_feeds_keep_silent_drop():
    # before wait_followers (expected == 0) dead followers drop silently —
    # the legacy broadcast tests rely on this
    feed = StepFeed(port=0)
    fol = StepFollower(("127.0.0.1", feed.port))
    while feed.num_followers() < 1:
        time.sleep(0.01)
    fol.close()
    time.sleep(0.2)
    feed.publish(0, [], [], [])  # no raise
    feed.check_liveness()  # no raise
    feed.close()


# ---------------------------------------------------------------------------
# engine level (same-process leader+follower engines)
# ---------------------------------------------------------------------------


def _tiny_engine():
    import jax

    from vllm_rs_tpu.config import (
        CacheConfig, EngineConfig, ModelConfig, SchedulerConfig,
    )
    from vllm_rs_tpu.core.engine import LLMEngine
    from vllm_rs_tpu.core.runner import ModelRunner
    from vllm_rs_tpu.models.llama import CausalLM

    cfg = ModelConfig(
        model_type="qwen3", hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        vocab_size=256, eos_token_ids=(0,),
    )
    ec = EngineConfig(
        model=cfg,
        cache=CacheConfig(block_size=4, num_blocks=64),
        scheduler=SchedulerConfig(max_num_seqs=4, chunk_size=32,
                                  max_model_len=128,
                                  prefill_buckets=(8, 16, 32)),
        prefill_buckets=(8, 16, 32), decode_buckets=(4,),
    )
    model = CausalLM(cfg, block_size=4)
    params = model.init_params(jax.random.PRNGKey(0))
    return LLMEngine(ec, ModelRunner(model, params, ec))


def test_leader_engine_cancels_all_on_follower_death():
    from vllm_rs_tpu.config import SamplingParams

    leader = _tiny_engine()
    feed = StepFeed(port=0)
    leader.enable_multihost_leader(feed)
    fol = StepFollower(("127.0.0.1", feed.port))
    feed.wait_followers(1, timeout=10)

    sid = leader.add_request(
        [1, 2, 3], SamplingParams(temperature=0.0, max_tokens=64, ignore_eos=True)
    )
    leader.step()  # prefill published + run
    fol.close()  # follower dies mid-stream
    deadline = time.time() + 10
    raised = False
    while time.time() < deadline and not raised:
        try:
            leader.step()
        except PeerLostError:
            raised = True
        time.sleep(0.02)
    assert raised, "leader kept stepping with a dead follower"
    assert leader.mh_failed is not None
    assert leader.requests[sid].seq.is_finished
    item = None
    q = leader.get_stream(sid)
    while not q.empty():
        item = q.get_nowait()
    assert item is not None and item.finished and item.finish_reason == "error"
    assert not leader._running


# ---------------------------------------------------------------------------
# process level: SIGKILL one side mid-serving
# ---------------------------------------------------------------------------


def _spawn(rank: int, feed_port: int, env=None):
    worker = os.path.join(os.path.dirname(__file__), "mh_kill_worker.py")
    e = dict(os.environ)
    e.pop("PYTEST_CURRENT_TEST", None)
    if env:
        e.update(env)
    return subprocess.Popen(
        [sys.executable, worker, str(rank), str(feed_port)],
        env=e,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        cwd=os.path.dirname(os.path.dirname(worker)),
    )


def _wait_for(proc, token: str, timeout: float) -> str:
    """Read stdout lines until one contains `token`; returns that line.
    select()-gated so a silent-but-alive worker fails at the deadline
    instead of blocking readline forever (deflake: VERDICT r4 item 7)."""
    import select

    deadline = time.time() + timeout
    while time.time() < deadline:
        r, _, _ = select.select([proc.stdout], [], [], 1.0)
        if not r:
            if proc.poll() is not None:
                raise AssertionError(f"worker exited early (rc={proc.poll()})")
            continue
        line = proc.stdout.readline()
        if not line:
            raise AssertionError(f"worker exited early (rc={proc.poll()})")
        text = line.decode(errors="replace").strip()
        if token in text:
            return text
    raise AssertionError(f"'{token}' not seen within {timeout}s")


@pytest.mark.parametrize("victim_rank", [1, 0])
def test_two_process_kill_survivor_exits(victim_rank):
    feed_port = _free_port()
    env = {"VLLM_RS_TPU_MH_TIMEOUT_S": "10"}
    leader = _spawn(0, feed_port, env)
    follower = _spawn(1, feed_port, env)
    procs = {0: leader, 1: follower}
    try:
        _wait_for(leader, "READY", 300)
        _wait_for(follower, "READY", 300)
        # both mid-serving: tokens flowing on each side
        _wait_for(leader, "TOKENS", 120)
        _wait_for(follower, "TOKENS", 120)

        victim, survivor = procs[victim_rank], procs[1 - victim_rank]
        victim.send_signal(signal.SIGKILL)
        t0 = time.time()
        try:
            # generous bound: the liveness timeout is 10 s here, but the
            # suite runs these workers alongside heavy CPU-jax tests on a
            # 1-core host — a genuine hang is forever, so a wide bound
            # still guards the fail-fast contract while staying
            # trustworthy under load (deflake: VERDICT r4 item 7)
            out, _ = survivor.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            pytest.fail("survivor hung after peer SIGKILL")
        elapsed = time.time() - t0
        text = out.decode(errors="replace")
        assert survivor.returncode == 3, f"survivor rc={survivor.returncode}:\n{text[-2000:]}"
        assert "MH_FAILED" in text
        assert elapsed < 170, f"survivor took {elapsed:.1f}s to exit"
    finally:
        for p in procs.values():
            if p.poll() is None:
                p.kill()
        for p in procs.values():
            p.wait(timeout=10)
