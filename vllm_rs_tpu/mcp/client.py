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


def _iter_sse_messages(lines):
    """Parse an SSE byte/str line iterator into (event, data) pairs. Data
    spanning multiple `data:` lines is joined with newlines per the spec."""
    event, data = "message", []
    for raw in lines:
        if isinstance(raw, bytes):
            raw = raw.decode("utf-8", errors="replace")
        line = raw.rstrip("\r\n")
        if line == "":
            if data:
                yield event, "\n".join(data)
            event, data = "message", []
        elif line.startswith(":"):
            continue  # comment/keepalive
        elif line.startswith("event:"):
            event = line[len("event:"):].strip()
        elif line.startswith("data:"):
            data.append(line[len("data:"):].lstrip())
    if data:
        yield event, "\n".join(data)


class HttpTransport:
    """Streamable-HTTP MCP transport (reference mcp/mod.rs:9-21 HTTP/SSE).

    Handles both response forms the spec allows for a POSTed JSON-RPC
    request: a single `application/json` body, or a `text/event-stream`
    whose events each carry a JSON-RPC message (the response is the event
    with the request's id; server-initiated notifications are skipped).

    Session management: an `Mcp-Session-Id` header returned by the server
    (typically on initialize) is echoed on every subsequent request; a 404
    means the session expired — the transport clears it and invokes
    `on_session_lost` (wired by McpClient to re-run the initialize
    handshake) before retrying the request once."""

    def __init__(self, url: str, headers: Optional[dict] = None):
        self.url = url
        self.headers = {
            "Content-Type": "application/json",
            "Accept": "application/json, text/event-stream",
            **(headers or {}),
        }
        self.session_id: Optional[str] = None
        # set by McpClient: re-runs initialize after session loss
        self.on_session_lost = None

    def _headers(self) -> dict:
        h = dict(self.headers)
        if self.session_id:
            h["Mcp-Session-Id"] = self.session_id
        return h

    def _post(self, payload: dict, timeout: float):
        import requests

        return requests.post(
            self.url, json=payload, headers=self._headers(),
            timeout=timeout, stream=True,
        )

    def request(self, payload: dict, timeout: float = 30.0, _retried=False) -> dict:
        r = self._post(payload, timeout)
        if r.status_code == 404 and self.session_id and not _retried:
            # session expired: re-establish and retry once
            logger.info("MCP session %s expired; re-initializing", self.session_id)
            self.session_id = None
            if self.on_session_lost is not None:
                self.on_session_lost()
            return self.request(payload, timeout, _retried=True)
        r.raise_for_status()
        sid = r.headers.get("Mcp-Session-Id") or r.headers.get("mcp-session-id")
        if sid:
            self.session_id = sid
        ctype = r.headers.get("Content-Type", "")
        if "text/event-stream" in ctype:
            want = payload.get("id")
            for _event, data in _iter_sse_messages(r.iter_lines(decode_unicode=False)):
                try:
                    msg = json.loads(data)
                except ValueError:
                    continue
                if msg.get("id") == want:
                    r.close()
                    return msg
            raise ConnectionError("SSE stream ended without a response")
        return r.json()

    def notify(self, payload: dict) -> None:
        r = self._post(payload, timeout=10)
        sid = r.headers.get("Mcp-Session-Id") or r.headers.get("mcp-session-id")
        if sid:
            self.session_id = sid
        r.close()

    def close(self) -> None:
        pass


class SseTransport:
    """Legacy HTTP+SSE MCP transport (protocol 2024-11-05, the common
    hosted form): a long-lived GET on the SSE url yields an `endpoint`
    event naming the POST url; requests POST there and responses arrive
    as `message` events on the GET stream, matched by JSON-RPC id."""

    def __init__(self, url: str, headers: Optional[dict] = None, timeout: float = 30.0):
        import queue as _queue

        import requests

        self.headers = dict(headers or {})
        self._resp = requests.get(
            url, headers={"Accept": "text/event-stream", **self.headers},
            stream=True, timeout=timeout,
        )
        self._resp.raise_for_status()
        # chunk_size=1: the default 512-byte chunk buffering would hold SSE
        # events back, and chunk_size=None blocks until EOF on streams
        # without a content length; byte-at-a-time is fine for this
        # control-plane traffic
        self._events = _iter_sse_messages(self._resp.iter_lines(chunk_size=1))
        # first event must name the POST endpoint
        for event, data in self._events:
            if event == "endpoint":
                from urllib.parse import urljoin

                self.post_url = urljoin(url, data.strip())
                break
        else:
            raise ConnectionError("SSE stream closed before endpoint event")
        self._pending: Dict[Any, "_queue.Queue"] = {}
        self._lock = threading.Lock()
        self._queue_mod = _queue
        self._reader = threading.Thread(target=self._read_loop, daemon=True)
        self._reader.start()

    def _read_loop(self) -> None:
        try:
            for event, data in self._events:
                if event not in ("message", ""):
                    continue
                try:
                    msg = json.loads(data)
                except ValueError:
                    continue
                with self._lock:
                    q = self._pending.get(msg.get("id"))
                if q is not None:
                    q.put(msg)
        except Exception:
            pass  # stream closed — pending requests time out

    def request(self, payload: dict, timeout: float = 30.0) -> dict:
        import requests

        q = self._queue_mod.Queue()
        with self._lock:
            self._pending[payload.get("id")] = q
        try:
            r = requests.post(
                self.post_url, json=payload,
                headers={"Content-Type": "application/json", **self.headers},
                timeout=timeout,
            )
            r.raise_for_status()
            # some servers echo the response directly on the POST
            if "application/json" in r.headers.get("Content-Type", "") and r.content:
                try:
                    msg = json.loads(r.content)
                    if msg.get("id") == payload.get("id"):
                        return msg
                except ValueError:
                    pass
            return q.get(timeout=timeout)
        except self._queue_mod.Empty:
            raise TimeoutError(f"MCP SSE response timeout ({timeout}s)") from None
        finally:
            with self._lock:
                self._pending.pop(payload.get("id"), None)

    def notify(self, payload: dict) -> None:
        import requests

        requests.post(
            self.post_url, json=payload,
            headers={"Content-Type": "application/json", **self.headers},
            timeout=10,
        )

    def close(self) -> None:
        try:
            self._resp.close()
        except Exception:
            pass


class McpClient:
    """One connected MCP server: initialize handshake + tools/list + call."""

    def __init__(self, transport, name: str = "server"):
        self.transport = transport
        self.name = name
        self._id = 0
        self._tools: Optional[List[dict]] = None
        if hasattr(transport, "on_session_lost"):
            # streamable-HTTP session re-establishment: redo the handshake
            transport.on_session_lost = self._initialize
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
                    # legacy HTTP+SSE servers advertise a .../sse endpoint;
                    # streamable-HTTP (with or without SSE responses) is
                    # the default (reference mcp/mod.rs:9-21)
                    if spec.get("transport") == "sse" or spec["url"].rstrip(
                        "/"
                    ).endswith("/sse"):
                        t = SseTransport(spec["url"], spec.get("headers"))
                    else:
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
