"""Staggered arrivals into a busy engine (the Poisson-bench bug class).

The wave-style tests admit everything up front; round 5's steady-state
bench found a crash (admission past max_num_seqs overflowing the decode
bucket) and two throughput pathologies that only staggered arrivals
trigger. This drives the background engine loop with trickled mixed-
length arrivals at saturation and asserts every stream completes with a
terminal item and the right token count.
"""

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
from vllm_rs_tpu.core.runner import ModelRunner
from vllm_rs_tpu.models.llama import CausalLM


def _engine(**sched_kw):
    cfg = ModelConfig(
        model_type="qwen3",
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        vocab_size=256,
        qk_norm=True,
        eos_token_ids=(0,),
    )
    kw = dict(
        max_num_seqs=4, chunk_size=32, max_model_len=128,
        prefill_buckets=(8, 16, 32), multi_step_decode=4,
    )
    kw.update(sched_kw)
    ec = EngineConfig(
        model=cfg,
        cache=CacheConfig(block_size=4, num_blocks=96),
        scheduler=SchedulerConfig(**kw),
        prefill_buckets=(8, 16, 32),
        decode_buckets=(4,),
    )
    m = CausalLM(cfg, block_size=4)
    params = m.init_params(jax.random.PRNGKey(0))
    return LLMEngine(ec, ModelRunner(m, params, ec))


@pytest.mark.parametrize("pacing", [False, True])
def test_staggered_mixed_arrivals_all_complete(pacing):
    """Trickled mixed-length arrivals at max_num_seqs saturation: every
    stream gets its full token count and a terminal item; the engine
    loop never dies (the admission-overflow bug cancelled every active
    stream with finish_reason=error)."""
    eng = _engine(stream_pacing=pacing)
    eng.start_loop()
    rs = np.random.RandomState(0)
    n_streams = 12
    lens = [5, 9, 17, 25]
    outs = [7, 12, 4, 20]
    results = {}
    lock = threading.Lock()

    def worker(i):
        plen = lens[i % len(lens)]
        olen = outs[i % len(outs)]
        sid = eng.add_request(
            list(rs.randint(1, 255, size=plen)),
            SamplingParams(temperature=0.0, max_tokens=olen, ignore_eos=True),
        )
        q = eng.get_stream(sid)
        n = 0
        reason = None
        while True:
            item = q.get(timeout=120)
            if item.token_id is not None:
                n += 1
            if item.finished:
                reason = item.finish_reason
                break
        with lock:
            results[i] = (n, olen, reason)

    threads = []
    for i in range(n_streams):
        t = threading.Thread(target=worker, args=(i,))
        t.start()
        threads.append(t)
        time.sleep(0.05)  # trickle: arrivals land while earlier ones run
    for t in threads:
        t.join(timeout=300)
        assert not t.is_alive(), "stream worker hung"
    eng.stop_loop()

    assert len(results) == n_streams
    for i, (n, olen, reason) in results.items():
        assert reason == "length", (i, reason)
        assert n == olen, (i, n, olen)
