"""CLI: `python -m vllm_rs_tpu.server --model <dir|file.gguf> [...]`.

Counterpart of the reference's `vllm-rs --server` CLI (src/main.rs:20-230,
clap Args at server/mod.rs:858-1003).
"""

from __future__ import annotations

import argparse
import logging
import os


def main() -> None:
    ap = argparse.ArgumentParser("vllm_rs_tpu.server")
    ap.add_argument("--model", "-m", required=True, help="safetensors dir or .gguf file")
    ap.add_argument("--served-model-name", default=None)
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--quant", choices=["auto", "int8", "int4", "none"],
                    default="auto",
                    help="in-situ quantization of loaded weights (ISQ); "
                    "auto = int4 for FP4 (mxfp4/nvfp4) checkpoints so "
                    "weights stream at 4-bit, none otherwise; "
                    "none = always materialize bf16")
    ap.add_argument("--quant-group", type=int, default=128)
    ap.add_argument("--max-model-len", type=int, default=8192)
    ap.add_argument("--max-num-seqs", type=int, default=64)
    ap.add_argument("--block-size", type=int, default=16)
    ap.add_argument("--num-blocks", type=int, default=0, help="0 = auto-plan from free HBM")
    ap.add_argument(
        "--kv-dtype", default="bfloat16",
        choices=["bfloat16", "int8", "float8_e4m3fn"],
        help="KV cache storage dtype; int8 pairs per-slot-per-head scales, "
        "float8_e4m3fn is scale-free (reference kvcache_allocator.rs:188-193)",
    )
    ap.add_argument("--tp-size", type=int, default=1)
    ap.add_argument("--dp-size", type=int, default=1)
    ap.add_argument("--chunk-size", type=int, default=2048)
    ap.add_argument("--multi-step", type=int, default=1,
                    help="tokens decoded per host sync (on-device loop); "
                    ">1 amortizes dispatch cost on high-RTT links at the "
                    "price of burstier streaming")
    ap.add_argument("--stream-pacing", action="store_true",
                    help="pace multi-step bursts across the next step's "
                    "duration so streaming clients see smooth inter-token "
                    "latency (~step/k) instead of k-token bursts; costs "
                    "~15%% throughput at 64-stream saturation (fresh "
                    "streams ramp k up from k/8 so their first gap stays "
                    "small)")
    ap.add_argument("--admission-coalesce", type=int, default=1, metavar="ROWS",
                    help="hold new admissions (bounded rounds) until ROWS "
                    "can prefill together — under staggered arrivals each "
                    "finish-freed slot otherwise triggers its own tiny "
                    "dispatch-priced prefill step; 1 = immediate")
    ap.add_argument("--yarn-scaling-factor", type=float, default=0.0,
                    help="override/install YaRN rope scaling: extends the "
                    "context to factor x the original length (reference "
                    "utils/mod.rs:640-706)")
    ap.add_argument("--mcp-config", default=None,
                    help="JSON config of MCP servers to expose as tools")
    ap.add_argument("--profile-dir", default=None,
                    help="capture an xprof trace of the first N engine "
                    "steps into this directory (tensorboard-openable)")
    ap.add_argument("--profile-steps", type=int, default=64)
    # PD disaggregation (reference --pd-server/--pd-client, main.rs:20-230)
    ap.add_argument("--pd-server", type=int, default=None, metavar="PORT",
                    help="run as a prefill server on PORT (no HTTP API)")
    ap.add_argument("--pd-client", default=None, metavar="HOST:PORT",
                    help="offload long prefills to a PD server")
    ap.add_argument("--pd-min-prompt", type=int, default=128)
    # multi-host SPMD serving (SURVEY hard-part #2; parallel/multihost.py)
    ap.add_argument("--multihost", action="store_true",
                    help="serve one model sharded across multiple hosts "
                    "(rank 0 = HTTP leader, others headless followers)")
    ap.add_argument("--coordinator", default=None, metavar="HOST:PORT",
                    help="jax.distributed coordinator (auto-detected on "
                    "Cloud TPU when omitted)")
    ap.add_argument("--num-hosts", type=int, default=None)
    ap.add_argument("--host-rank", type=int, default=None)
    ap.add_argument("--feed-port", type=int, default=18533,
                    help="leader's step-marker feed port")
    ap.add_argument("--feed-host", default=None,
                    help="leader hostname for followers (defaults to the "
                    "coordinator host)")
    # interactive / bench modes (reference main.rs:44-103 --i / --batch)
    ap.add_argument("--i", dest="interactive", action="store_true",
                    help="interactive chat loop on stdin instead of serving")
    ap.add_argument("--batch", type=int, default=0, metavar="N",
                    help="run an N-request throughput bench and exit")
    ap.add_argument("--batch-prompt-len", type=int, default=64)
    ap.add_argument("--batch-max-tokens", type=int, default=128)
    ap.add_argument("--warmup", choices=["none", "decode", "full"], default="decode",
                    help="pre-compile bucket programs before serving "
                    "(reference CUDA-graph warmup_capture, runner.rs:1612)")
    ap.add_argument("--tool-parser", default="",
                    help="override the tool-call body format (reference "
                    "--enforce-parser): json|pythonic|llama|mistral|gemma|"
                    "gemma4|minimax")
    ap.add_argument("--log-level", default="INFO")
    args = ap.parse_args()

    logging.basicConfig(
        level=args.log_level,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
    )

    if args.multihost:
        # must run BEFORE any jax device use — makes jax.devices() global
        from vllm_rs_tpu.parallel.multihost import init_distributed

        init_distributed(args.coordinator, args.num_hosts, args.host_rank)

    from vllm_rs_tpu.api import EngineBuilder
    from vllm_rs_tpu.server.app import run_server
    from vllm_rs_tpu.utils.chat_template import ChatTemplate

    engine = EngineBuilder(
        model_path=args.model,
        quant=args.quant,
        quant_group=args.quant_group,
        block_size=args.block_size,
        max_model_len=args.max_model_len,
        max_num_seqs=args.max_num_seqs,
        chunk_size=args.chunk_size,
        multi_step=args.multi_step,
        stream_pacing=args.stream_pacing,
        admission_coalesce=args.admission_coalesce,
        kv_dtype=args.kv_dtype,
        num_blocks=args.num_blocks,
        tp_size=args.tp_size,
        dp_size=args.dp_size,
        yarn_scaling_factor=args.yarn_scaling_factor,
    ).build()

    tpl = None
    tc_path = os.path.join(args.model, "tokenizer_config.json")
    if os.path.isdir(args.model) and os.path.exists(tc_path):
        tpl = ChatTemplate.from_tokenizer_config(
            tc_path, engine.econfig.model.model_type
        )
    # Warmup BEFORE any leader/follower split: warmup programs are global-
    # mesh pjit computations, so under --multihost EVERY process must
    # dispatch them at the same sequence point — a leader warming up alone
    # while followers sit in their serving loop deadlocks on the first
    # cross-host collective. (reference CUDA-graph warmup_capture,
    # runner.rs:1612 — per-rank there, SPMD-global here)
    if not args.batch:
        sched = engine.econfig.scheduler
        engine.runner.warmup(
            mode=args.warmup,
            multi_step=sched.multi_step_decode,
            spec_k=sched.spec_decode_k,
        )
    if args.multihost:
        import jax

        from vllm_rs_tpu.parallel.multihost import StepFeed, StepFollower

        assert args.pd_server is None and args.pd_client is None, (
            "PD disaggregation and multi-host serving cannot be combined"
        )
        def _mh_watchdog(eng):
            # exit the whole process when a peer is lost: followers hold no
            # client connections, and a leader without its followers cannot
            # run another collective — lingering would just hang clients
            # (reference: runner process::exit on parent loss / heartbeat
            # abort, utils/heartbeat.rs:43-66)
            import threading as _t
            import time as _time

            def watch():
                while eng.mh_failed is None:
                    _time.sleep(0.25)
                logging.getLogger(__name__).error(
                    "multi-host peer lost (%s); exiting", eng.mh_failed
                )
                os._exit(1)

            _t.Thread(target=watch, daemon=True, name="mh-watchdog").start()

        if jax.process_index() == 0:
            feed = StepFeed(port=args.feed_port)
            engine.enable_multihost_leader(feed)
            n_followers = jax.process_count() - 1
            logging.getLogger(__name__).info(
                "multihost leader: waiting for %d followers on :%d",
                n_followers, feed.port,
            )
            feed.wait_followers(n_followers, timeout=600)
            _mh_watchdog(engine)
        else:
            host = args.feed_host or (
                args.coordinator.split(":")[0] if args.coordinator else "localhost"
            )
            follower = StepFollower((host, args.feed_port))
            engine.enable_multihost_follower(follower)
            engine.start_loop()
            _mh_watchdog(engine)
            logging.getLogger(__name__).info(
                "multihost follower %d serving headless", jax.process_index()
            )
            import signal

            signal.pause()
            return
    if args.batch:
        _run_batch_bench(engine, tpl, args)
        return
    if args.profile_dir:
        from vllm_rs_tpu.utils.profiling import StepProfiler

        engine.profiler = StepProfiler(args.profile_dir, args.profile_steps)
        engine.profiler.start()
    if args.interactive:
        _run_interactive(engine, tpl)
        return
    if args.pd_server is not None:
        from vllm_rs_tpu.transfer import PdServer

        srv = PdServer(engine, host=args.host, port=args.pd_server)
        srv.start()
        logging.getLogger(__name__).info("PD prefill server on :%d", srv.port)
        import signal

        signal.pause()
        return
    if args.pd_client:
        from vllm_rs_tpu.transfer import PdClient

        host, _, port = args.pd_client.rpartition(":")
        engine.pd_client = PdClient(
            engine, (host, int(port)), min_prompt_len=args.pd_min_prompt
        )
    mcp = None
    if args.mcp_config:
        from vllm_rs_tpu.mcp import McpManager

        mcp = McpManager.from_config_file(args.mcp_config)
    name = args.served_model_name or os.path.basename(os.path.normpath(args.model))
    run_server(
        engine, host=args.host, port=args.port, model_name=name,
        chat_template=tpl, mcp=mcp, tool_parser=args.tool_parser,
    )


def _run_interactive(engine, tpl) -> None:
    """Interactive chat REPL (reference main.rs --i interactive mode):
    multi-turn history, streamed tokens to stdout, /clear and /exit."""
    import queue as _q

    from vllm_rs_tpu.config import SamplingParams
    from vllm_rs_tpu.utils.chat_template import ChatTemplate

    tpl = tpl or ChatTemplate(model_type=engine.econfig.model.model_type)
    engine.start_loop()
    history = []
    print("interactive mode — /clear resets history, /exit quits", flush=True)
    try:
        while True:
            try:
                line = input(">>> ").strip()
            except EOFError:
                break
            if not line:
                continue
            if line in ("/exit", "/quit"):
                break
            if line == "/clear":
                history.clear()
                continue
            history.append({"role": "user", "content": line})
            prompt = tpl.render(history, add_generation_prompt=True)
            sid = engine.add_request(prompt, SamplingParams(max_tokens=1024))
            stream = engine.get_stream(sid)
            reply = []
            while True:
                try:
                    item = stream.get(timeout=120)
                except _q.Empty:
                    print("\n[timed out]", flush=True)
                    engine.abort_request(sid)
                    break
                if item.text:
                    print(item.text, end="", flush=True)
                    reply.append(item.text)
                if item.finished:
                    print(flush=True)
                    break
            history.append({"role": "assistant", "content": "".join(reply)})
    finally:
        engine.stop_loop()


def _run_batch_bench(engine, tpl, args) -> None:
    """N-request throughput bench (reference main.rs --batch, prompt/decode
    tokens-per-second print at main.rs:480-494)."""
    import time

    import numpy as np

    from vllm_rs_tpu.config import SamplingParams

    n = args.batch
    plen = args.batch_prompt_len
    rs = np.random.RandomState(0)
    vocab = engine.econfig.model.vocab_size
    prompts = [list(rs.randint(1, max(2, vocab - 10), size=plen)) for _ in range(n)]
    sp = SamplingParams(
        temperature=0.0, max_tokens=args.batch_max_tokens, ignore_eos=True
    )
    t0 = time.time()
    outs = engine.generate(prompts, sp)
    dt = time.time() - t0
    prompt_tokens = sum(len(p) for p in prompts)
    decode_tokens = sum(len(o.output_token_ids) for o in outs)
    print(
        f"batch {n}: {prompt_tokens} prompt + {decode_tokens} decode tokens "
        f"in {dt:.2f}s → {(prompt_tokens + decode_tokens) / dt:.2f} tok/s total, "
        f"{decode_tokens / dt:.2f} decode tok/s",
        flush=True,
    )


if __name__ == "__main__":
    main()
