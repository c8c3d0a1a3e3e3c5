"""Worker for tests/test_multihost_liveness.py's 2-process kill tests.

Runs a tiny CPU engine as multi-host leader (rank 0) or follower (rank 1)
over the step-marker feed — NO jax.distributed: the liveness protocol under
test is pure sockets, and a single-process mesh keeps the test fast. The
leader admits a long-running request and streams; when the peer dies the
survivor must cancel in-flight requests and exit code 3 within the bound
(reference heartbeat semantics: utils/heartbeat.rs:8-78).

Usage: mh_kill_worker.py <rank> <feed_port>
Prints "READY" once serving and "TOKENS <n>" as decode progresses.
"""

import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from vllm_rs_tpu.config import (  # noqa: E402
    CacheConfig, EngineConfig, ModelConfig, SamplingParams, SchedulerConfig,
)
from vllm_rs_tpu.core.engine import LLMEngine  # noqa: E402
from vllm_rs_tpu.core.runner import ModelRunner  # noqa: E402
from vllm_rs_tpu.models.llama import CausalLM  # noqa: E402
from vllm_rs_tpu.parallel.multihost import StepFeed, StepFollower  # noqa: E402


def make_engine():
    cfg = ModelConfig(
        model_type="qwen3", hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        vocab_size=256, eos_token_ids=(0,),
    )
    ec = EngineConfig(
        model=cfg,
        cache=CacheConfig(block_size=4, num_blocks=256),
        scheduler=SchedulerConfig(max_num_seqs=4, chunk_size=32,
                                  max_model_len=1024,
                                  prefill_buckets=(8, 16, 32)),
        prefill_buckets=(8, 16, 32), decode_buckets=(4,),
    )
    model = CausalLM(cfg, block_size=4)
    params = model.init_params(jax.random.PRNGKey(0))
    return LLMEngine(ec, ModelRunner(model, params, ec))


def main():
    rank = int(sys.argv[1])
    feed_port = int(sys.argv[2])
    engine = make_engine()

    def exit_on_failure():
        import os

        while engine.mh_failed is None:
            time.sleep(0.1)
        print(f"MH_FAILED {engine.mh_failed}", flush=True)
        # all in-flight requests must already be cancelled
        for st in engine.requests.values():
            if not st.seq.is_finished:
                print("UNFINISHED_REQUEST", flush=True)
                os._exit(4)
        os._exit(3)  # sys.exit only raises in this thread

    if rank == 0:
        feed = StepFeed(port=feed_port)
        engine.enable_multihost_leader(feed)
        # generous: under the full suite the follower's jax import + tiny
        # model compile can take minutes on a loaded CPU host
        feed.wait_followers(1, timeout=300)
        engine.start_loop()
        threading.Thread(target=exit_on_failure, daemon=False).start()
        sid = engine.add_request(
            [1, 2, 3, 4, 5],
            SamplingParams(temperature=0.0, max_tokens=100_000, ignore_eos=True),
        )
        print("READY", flush=True)
        q = engine.get_stream(sid)
        n = 0
        while True:
            item = q.get(timeout=120)
            if item.finish_reason == "error":
                # peer-loss cancel beat the watchdog to the stream
                time.sleep(30)  # exit_on_failure fires sys.exit(3)
            n += 1
            if n % 20 == 0:
                print(f"TOKENS {n}", flush=True)
    else:
        follower = StepFollower(("127.0.0.1", feed_port))
        engine.enable_multihost_follower(follower)
        engine.start_loop()
        threading.Thread(target=exit_on_failure, daemon=False).start()
        print("READY", flush=True)
        last = 0
        while True:
            time.sleep(0.5)
            tot = engine.total_output_tokens
            if tot != last:
                print(f"TOKENS {tot}", flush=True)
                last = tot


if __name__ == "__main__":
    main()
