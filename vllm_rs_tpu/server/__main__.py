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
    ap.add_argument("--quant", choices=["int8", "int4"], default=None,
                    help="in-situ quantization of loaded weights (ISQ)")
    ap.add_argument("--quant-group", type=int, default=128)
    ap.add_argument("--max-model-len", type=int, default=8192)
    ap.add_argument("--max-num-seqs", type=int, default=64)
    ap.add_argument("--block-size", type=int, default=16)
    ap.add_argument("--num-blocks", type=int, default=0, help="0 = auto-plan from free HBM")
    ap.add_argument("--kv-dtype", default="bfloat16", choices=["bfloat16", "int8"])
    ap.add_argument("--tp-size", type=int, default=1)
    ap.add_argument("--dp-size", type=int, default=1)
    ap.add_argument("--chunk-size", type=int, default=2048)
    ap.add_argument("--mcp-config", default=None,
                    help="JSON config of MCP servers to expose as tools")
    # PD disaggregation (reference --pd-server/--pd-client, main.rs:20-230)
    ap.add_argument("--pd-server", type=int, default=None, metavar="PORT",
                    help="run as a prefill server on PORT (no HTTP API)")
    ap.add_argument("--pd-client", default=None, metavar="HOST:PORT",
                    help="offload long prefills to a PD server")
    ap.add_argument("--pd-min-prompt", type=int, default=128)
    ap.add_argument("--log-level", default="INFO")
    args = ap.parse_args()

    logging.basicConfig(
        level=args.log_level,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
    )

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
        kv_dtype=args.kv_dtype,
        num_blocks=args.num_blocks,
        tp_size=args.tp_size,
        dp_size=args.dp_size,
    ).build()

    tpl = None
    tc_path = os.path.join(args.model, "tokenizer_config.json")
    if os.path.isdir(args.model) and os.path.exists(tc_path):
        tpl = ChatTemplate.from_tokenizer_config(
            tc_path, engine.econfig.model.model_type
        )
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
        chat_template=tpl, mcp=mcp,
    )


if __name__ == "__main__":
    main()
