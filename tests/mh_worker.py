"""Worker process for the 2-process multi-host lockstep test.

Each process: jax.distributed init (gloo CPU collectives, 4 local devices
→ 8 global), builds the SAME tiny engine sharded tp=8 over the global
mesh, and runs the step-marker protocol (rank 0 leader + StepFeed, rank 1
follower). Rank 0 injects requests mid-stream; both ranks record emitted
tokens + the schedule trace and write them to JSON for the parent test to
compare bit-for-bit.

Run: python mh_worker.py <rank> <coord_port> <feed_port> <outdir>
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    rank = int(sys.argv[1])
    coord_port = sys.argv[2]
    feed_port = int(sys.argv[3])
    outdir = sys.argv[4]

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        f"localhost:{coord_port}", num_processes=2, process_id=rank
    )
    assert jax.device_count() == 8, jax.device_count()

    from vllm_rs_tpu.config import (
        CacheConfig,
        EngineConfig,
        ModelConfig,
        SamplingParams,
        SchedulerConfig,
    )
    from vllm_rs_tpu.core.engine import LLMEngine
    from vllm_rs_tpu.core.runner import ModelRunner
    from vllm_rs_tpu.models.llama import CausalLM
    from vllm_rs_tpu.parallel import make_mesh, shard_params
    from vllm_rs_tpu.parallel.multihost import StepFeed, StepFollower

    cfg = ModelConfig(
        model_type="llama",
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=8,
        num_key_value_heads=8,
        vocab_size=128,
        eos_token_ids=(0,),
    )
    ec = EngineConfig(
        model=cfg,
        cache=CacheConfig(block_size=4, num_blocks=64),
        scheduler=SchedulerConfig(
            max_num_seqs=4, chunk_size=16, max_model_len=64, prefill_buckets=(8, 16)
        ),
        prefill_buckets=(8, 16),
        decode_buckets=(4,),
        tp_size=8,
        seed=0,
    )
    model = CausalLM(cfg, block_size=4)
    params = model.init_params(jax.random.PRNGKey(0))
    mesh = make_mesh(tp_size=8, dp_size=1)
    params = shard_params(params, mesh)
    runner = ModelRunner(model, params, ec, mesh=mesh)
    engine = LLMEngine(ec, runner)
    engine.schedule_trace = []

    sp_g = SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True)
    sp_s = SamplingParams(temperature=0.8, seed=7, max_tokens=8, ignore_eos=True)

    if rank == 0:
        feed = StepFeed(port=feed_port)
        engine.enable_multihost_leader(feed)
        feed.wait_followers(1, timeout=180)

        import threading

        stop = [False]

        def loop():
            while not stop[0]:
                try:
                    if engine.step() == 0:
                        time.sleep(0.002)
                except Exception:
                    import traceback

                    traceback.print_exc()
                    os._exit(3)

        t = threading.Thread(target=loop, daemon=True)
        t.start()
        ids = [
            engine.add_request([5, 6, 7, 5, 6], sp_g),
            engine.add_request([9, 8, 7], sp_s),
        ]
        # inject the second wave mid-stream: wait for real decode progress
        deadline = time.time() + 600
        while engine.total_output_tokens < 6 and time.time() < deadline:
            time.sleep(0.02)
        ids += [
            engine.add_request([20, 21, 22, 23], sp_g),
            engine.add_request([3, 4], sp_s),
        ]
        while time.time() < deadline:
            if all(engine.requests[i].seq.is_finished for i in ids):
                break
            time.sleep(0.05)
        stop[0] = True
        t.join(timeout=10)
        assert all(engine.requests[i].seq.is_finished for i in ids), "leader timeout"
        out = {str(i): engine.requests[i].seq.output_token_ids for i in ids}
    else:
        # the leader's feed may not be listening yet — retry connect
        follower = None
        deadline = time.time() + 180
        while follower is None:
            try:
                follower = StepFollower(("127.0.0.1", feed_port))
            except OSError:
                if time.time() > deadline:
                    raise
                time.sleep(0.1)
        engine.enable_multihost_follower(follower)
        deadline = time.time() + 600
        while time.time() < deadline:
            engine.step()
            if len(engine.requests) >= 4 and all(
                st.seq.is_finished for st in engine.requests.values()
            ):
                break
        assert len(engine.requests) == 4, len(engine.requests)
        assert all(st.seq.is_finished for st in engine.requests.values()), (
            "follower timeout"
        )
        out = {
            str(st.seq.seq_id): st.seq.output_token_ids
            for st in engine.requests.values()
        }

    with open(os.path.join(outdir, f"rank{rank}.json"), "w") as f:
        json.dump({"tokens": out, "trace": engine.schedule_trace}, f)
    print(f"rank {rank} done: {len(out)} seqs, {len(engine.schedule_trace)} steps")


if __name__ == "__main__":
    main()
