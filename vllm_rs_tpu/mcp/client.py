"""MCP (Model Context Protocol) client.

Counterpart of the reference's src/mcp/ (client manager over a multi-server
JSON config, stdio + HTTP transports, tool cache — mcp/mod.rs:9-21).
JSON-RPC 2.0; stdio transport speaks newline-delimited JSON to a spawned
server process, the HTTP transport POSTs to a streamable-HTTP endpoint.
"""

from __future__ import annotations

import json
import logging
import subprocess
import threading
from typing import Any, Dict, List, Optional

logger = logging.getLogger(__name__)

PROTOCOL_VERSION = "2024-11-05"


class StdioTransport:
    """Spawn an MCP server and exchange newline-delimited JSON-RPC."""

    def __init__(self, command: str, args: Optional[List[str]] = None, env=None):
        self.proc = subprocess.Popen(
            [command] + list(args or []),
            stdin=subprocess.PIPE,
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            env=env,
            text=True,
            bufsize=1,
        )
        self._lock = threading.Lock()

    def request(self, payload: dict, timeout: float = 30.0) -> dict:
        with self._lock:
            self.proc.stdin.write(json.dumps(payload) + "\n")
            self.proc.stdin.flush()
            while True:
                line = self.proc.stdout.readline()
                if not line:
                    raise ConnectionError("MCP server closed stdout")
                line = line.strip()
                if not line:
                    continue
                msg = json.loads(line)
                # skip server-initiated notifications
                if "id" in msg and msg["id"] == payload.get("id"):
                    return msg

    def notify(self, payload: dict) -> None:
        with self._lock:
            self.proc.stdin.write(json.dumps(payload) + "\n")
            self.proc.stdin.flush()

    def close(self) -> None:
        try:
            self.proc.terminate()
        except Exception:
            pass


class HttpTransport:
    """Streamable-HTTP MCP transport (single-shot JSON responses)."""

    def __init__(self, url: str, headers: Optional[dict] = None):
        self.url = url
        self.headers = {"Content-Type": "application/json", **(headers or {})}

    def request(self, payload: dict, timeout: float = 30.0) -> dict:
        import requests

        r = requests.post(self.url, json=payload, headers=self.headers, timeout=timeout)
        r.raise_for_status()
        return r.json()

    def notify(self, payload: dict) -> None:
        import requests

        requests.post(self.url, json=payload, headers=self.headers, timeout=10)

    def close(self) -> None:
        pass


class McpClient:
    """One connected MCP server: initialize handshake + tools/list + call."""

    def __init__(self, transport, name: str = "server"):
        self.transport = transport
        self.name = name
        self._id = 0
        self._tools: Optional[List[dict]] = None
        self._initialize()

    def _next_id(self) -> int:
        self._id += 1
        return self._id

    def _rpc(self, method: str, params: Optional[dict] = None) -> Any:
        msg = {"jsonrpc": "2.0", "id": self._next_id(), "method": method}
        if params is not None:
            msg["params"] = params
        resp = self.transport.request(msg)
        if "error" in resp:
            raise RuntimeError(f"MCP {method}: {resp['error']}")
        return resp.get("result")

    def _initialize(self) -> None:
        self._rpc(
            "initialize",
            {
                "protocolVersion": PROTOCOL_VERSION,
                "capabilities": {},
                "clientInfo": {"name": "vllm_rs_tpu", "version": "0.1"},
            },
        )
        self.transport.notify(
            {"jsonrpc": "2.0", "method": "notifications/initialized"}
        )

    def list_tools(self, refresh: bool = False) -> List[dict]:
        if self._tools is None or refresh:
            result = self._rpc("tools/list") or {}
            self._tools = result.get("tools", [])
        return self._tools

    def call_tool(self, name: str, arguments: dict) -> str:
        result = self._rpc("tools/call", {"name": name, "arguments": arguments}) or {}
        parts = []
        for c in result.get("content", []):
            if c.get("type") == "text":
                parts.append(c.get("text", ""))
        return "\n".join(parts)

    def close(self) -> None:
        self.transport.close()


class McpManager:
    """Multi-server manager (reference mcp client manager): JSON config
    {"mcpServers": {name: {"command", "args"} | {"url"}}} → aggregated
    tool list with server-qualified routing."""

    def __init__(self):
        self.clients: Dict[str, McpClient] = {}
        self._tool_to_server: Dict[str, str] = {}

    @staticmethod
    def from_config(config: dict) -> "McpManager":
        mgr = McpManager()
        for name, spec in (config.get("mcpServers") or {}).items():
            try:
                if "url" in spec:
                    t = HttpTransport(spec["url"], spec.get("headers"))
                else:
                    t = StdioTransport(
                        spec["command"], spec.get("args"), spec.get("env")
                    )
                mgr.clients[name] = McpClient(t, name=name)
            except Exception as e:  # pragma: no cover — config errors
                logger.warning("MCP server %s failed to start: %s", name, e)
        return mgr

    @staticmethod
    def from_config_file(path: str) -> "McpManager":
        with open(path) as f:
            return McpManager.from_config(json.load(f))

    def list_tools(self) -> List[dict]:
        """Aggregate tools in OpenAI function format."""
        out = []
        for sname, client in self.clients.items():
            for t in client.list_tools():
                self._tool_to_server[t["name"]] = sname
                out.append(
                    {
                        "type": "function",
                        "function": {
                            "name": t["name"],
                            "description": t.get("description", ""),
                            "parameters": t.get("inputSchema", {}),
                        },
                    }
                )
        return out

    def has_tool(self, name: str) -> bool:
        return name in self._tool_to_server

    def call(self, name: str, arguments: dict) -> str:
        server = self._tool_to_server.get(name)
        if server is None:
            raise KeyError(f"unknown MCP tool {name!r}")
        return self.clients[server].call_tool(name, arguments)

    def close(self) -> None:
        for c in self.clients.values():
            c.close()
