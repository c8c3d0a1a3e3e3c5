"""MCP server over stdio.

Counterpart of the reference's MCP *server* mode (src/mcp/ exposes the
engine as an MCP tool). `python -m vllm_rs_tpu.mcp.server --model <path>`
serves a `generate` tool backed by a local engine; `--demo` serves an echo
tool (used by the test suite and as a protocol smoke target).
"""

from __future__ import annotations

import argparse
import json
import sys
from typing import Callable, Dict

from vllm_rs_tpu.mcp.client import PROTOCOL_VERSION


class McpServer:
    def __init__(self):
        self.tools: Dict[str, dict] = {}
        self.handlers: Dict[str, Callable[[dict], str]] = {}

    def add_tool(self, name: str, description: str, schema: dict, fn) -> None:
        self.tools[name] = {
            "name": name,
            "description": description,
            "inputSchema": schema,
        }
        self.handlers[name] = fn

    def _result(self, mid, result) -> None:
        sys.stdout.write(json.dumps({"jsonrpc": "2.0", "id": mid, "result": result}) + "\n")
        sys.stdout.flush()

    def serve_stdio(self) -> None:
        for line in sys.stdin:
            line = line.strip()
            if not line:
                continue
            msg = json.loads(line)
            method = msg.get("method")
            mid = msg.get("id")
            if method == "initialize":
                self._result(
                    mid,
                    {
                        "protocolVersion": PROTOCOL_VERSION,
                        "capabilities": {"tools": {}},
                        "serverInfo": {"name": "vllm_rs_tpu", "version": "0.1"},
                    },
                )
            elif method == "tools/list":
                self._result(mid, {"tools": list(self.tools.values())})
            elif method == "tools/call":
                params = msg.get("params", {})
                name = params.get("name")
                try:
                    text = self.handlers[name](params.get("arguments", {}))
                    self._result(
                        mid, {"content": [{"type": "text", "text": text}]}
                    )
                except Exception as e:
                    self._result(
                        mid,
                        {
                            "content": [{"type": "text", "text": f"error: {e}"}],
                            "isError": True,
                        },
                    )
            elif mid is not None:  # unknown request
                self._result(mid, {})


def main() -> None:
    ap = argparse.ArgumentParser("vllm_rs_tpu.mcp.server")
    ap.add_argument("--model", default=None)
    ap.add_argument("--demo", action="store_true", help="serve an echo tool only")
    ap.add_argument("--max-tokens", type=int, default=256)
    args = ap.parse_args()

    srv = McpServer()
    if args.demo or not args.model:
        srv.add_tool(
            "echo",
            "Echo the input text back",
            {"type": "object", "properties": {"text": {"type": "string"}}},
            lambda a: str(a.get("text", "")),
        )
    if args.model:
        from vllm_rs_tpu.api import EngineBuilder
        from vllm_rs_tpu.config import SamplingParams

        engine = EngineBuilder(args.model).build()

        def generate(a: dict) -> str:
            outs = engine.generate(
                [a.get("prompt", "")],
                SamplingParams(
                    temperature=float(a.get("temperature", 0.7)),
                    max_tokens=int(a.get("max_tokens", args.max_tokens)),
                ),
            )
            return outs[0].text

        srv.add_tool(
            "generate",
            "Generate a completion with the local model",
            {
                "type": "object",
                "properties": {
                    "prompt": {"type": "string"},
                    "max_tokens": {"type": "integer"},
                    "temperature": {"type": "number"},
                },
                "required": ["prompt"],
            },
            generate,
        )
    srv.serve_stdio()


if __name__ == "__main__":
    main()
