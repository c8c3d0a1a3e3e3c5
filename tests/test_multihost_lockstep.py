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


def test_hybrid_lockstep_with_snapshots():
    """Leader + follower engines (separate runners, same weights) running a
    hybrid GDN model through the step-marker protocol: mamba snapshot
    capture, LRU state and restore decisions must evolve identically on
    both ranks — a divergent restore would desynchronize the recurrent
    state silently."""
    import time

    import jax
    import numpy as np

    from vllm_rs_tpu.config import (
        CacheConfig, EngineConfig, ModelConfig, SamplingParams, SchedulerConfig,
    )
    from vllm_rs_tpu.core.engine import LLMEngine
    from vllm_rs_tpu.core.runner import ModelRunner
    from vllm_rs_tpu.models.qwen3_next import Qwen3NextForCausalLM
    from vllm_rs_tpu.parallel.multihost import StepFeed, StepFollower

    cfg = ModelConfig(
        model_type="qwen3_next", hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        vocab_size=128, qk_norm=True, eos_token_ids=(0,),
        extra=(
            ("linear_num_key_heads", 2), ("linear_num_value_heads", 4),
            ("linear_key_head_dim", 8), ("linear_value_head_dim", 8),
            ("linear_conv_kernel_dim", 4), ("full_attention_interval", 4),
        ),
    )
    ec = EngineConfig(
        model=cfg,
        cache=CacheConfig(block_size=4, num_blocks=64, mamba_slots=8,
                          mamba_snapshot_slots=8,
                          mamba_snapshot_interval_blocks=1),
        scheduler=SchedulerConfig(max_num_seqs=4, chunk_size=8, max_model_len=128,
                                  prefill_buckets=(8, 16, 32)),
        prefill_buckets=(8, 16, 32), decode_buckets=(4,),
    )
    model = Qwen3NextForCausalLM(cfg, block_size=4)
    params = model.init_params(jax.random.PRNGKey(0))

    def make_engine():
        e = LLMEngine(ec, ModelRunner(Qwen3NextForCausalLM(cfg, block_size=4),
                                      params, ec))
        e.schedule_trace = []
        return e

    leader = make_engine()
    feed = StepFeed(port=0)
    leader.enable_multihost_leader(feed)
    follower_engine = make_engine()
    follower = StepFollower(("127.0.0.1", feed.port))
    follower_engine.enable_multihost_follower(follower)
    feed.wait_followers(1, timeout=30)

    sp = SamplingParams(temperature=0.0, max_tokens=5, ignore_eos=True)
    base = list(range(2, 26))  # 24 tokens: aligned chunks -> snapshots

    def run_to_finish(sids):
        deadline = time.time() + 600
        while time.time() < deadline:
            leader.step()
            follower_engine.step()
            if all(
                leader.requests[s].seq.is_finished
                and s in follower_engine.requests
                and follower_engine.requests[s].seq.is_finished
                for s in sids
            ):
                return
        raise TimeoutError("lockstep hybrid timeout")

    s1 = leader.add_request(base + [1, 2, 3], sp)
    run_to_finish([s1])
    # turn 2 shares the 24-token prefix: snapshot restore fires on BOTH
    s2 = leader.add_request(base + [4, 5, 6], sp)
    run_to_finish([s2])

    for sid in (s1, s2):
        assert (
            leader.requests[sid].seq.output_token_ids
            == follower_engine.requests[sid].seq.output_token_ids
        )
    assert leader.schedule_trace == follower_engine.schedule_trace
    assert leader.requests[s2].seq.num_prefix_cached_tokens == 24
    assert follower_engine.requests[s2].seq.num_prefix_cached_tokens == 24
    # identical snapshot pool state (hash -> slot index) on both ranks
    assert dict(leader._mamba_pool.index) == dict(follower_engine._mamba_pool.index)
    feed.close()
    follower.close()
