"""MCP SSE transports (VERDICT r2 item 9; reference mcp/mod.rs:9-21).

Fixture servers (plain http.server threads) exercise:
- streamable-HTTP whose responses arrive as `text/event-stream` bodies,
  with Mcp-Session-Id issuance and 404-triggered session re-establishment;
- the legacy HTTP+SSE form: long-lived GET stream yielding an `endpoint`
  event, responses pushed over the GET stream matched by JSON-RPC id.
"""

import json
import queue
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from vllm_rs_tpu.mcp import McpClient
from vllm_rs_tpu.mcp.client import HttpTransport, SseTransport, _iter_sse_messages


def _result_for(msg, tools):
    method = msg.get("method")
    if method == "initialize":
        return {"protocolVersion": "2024-11-05", "capabilities": {}}
    if method == "tools/list":
        return {"tools": tools}
    if method == "tools/call":
        args = msg["params"]["arguments"]
        return {"content": [{"type": "text", "text": args["text"].upper()}]}
    return {}


TOOLS = [{"name": "shout", "description": "upper", "inputSchema": {"type": "object"}}]


class _StreamableSseHandler(BaseHTTPRequestHandler):
    """Responds to every JSON-RPC POST with an SSE body; issues a session
    id on initialize and 404s stale session ids after a forced rotation."""

    server_version = "fixture"
    state = None  # injected: {"session": str, "rotations": int}

    def log_message(self, *a):  # silence
        pass

    def do_POST(self):
        n = int(self.headers.get("Content-Length", 0))
        msg = json.loads(self.rfile.read(n)) if n else {}
        state = type(self).state
        sid = self.headers.get("Mcp-Session-Id")
        if msg.get("method") == "initialize":
            state["session"] = f"sess-{state['inits']}"
            state["inits"] += 1
        elif sid != state["session"]:
            self.send_response(404)
            self.end_headers()
            return
        if "id" not in msg:  # notification
            self.send_response(202)
            self.send_header("Mcp-Session-Id", state["session"])
            self.end_headers()
            return
        resp = {"jsonrpc": "2.0", "id": msg["id"], "result": _result_for(msg, TOOLS)}
        # a server-initiated notification precedes the response on the
        # stream — the client must skip it
        body = (
            "event: message\ndata: "
            + json.dumps({"jsonrpc": "2.0", "method": "notifications/progress"})
            + "\n\nevent: message\ndata: "
            + json.dumps(resp)
            + "\n\n"
        ).encode()
        self.send_response(200)
        self.send_header("Content-Type", "text/event-stream")
        self.send_header("Mcp-Session-Id", state["session"])
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


@pytest.fixture
def sse_http_server():
    _StreamableSseHandler.state = {"session": None, "inits": 0}
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _StreamableSseHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv, _StreamableSseHandler.state
    srv.shutdown()


def test_sse_line_parser():
    lines = [
        b": keepalive",
        b"event: endpoint",
        b"data: /messages?sid=1",
        b"",
        b"data: {\"a\":",
        b"data: 1}",
        b"",
    ]
    out = list(_iter_sse_messages(lines))
    assert out[0] == ("endpoint", "/messages?sid=1")
    assert out[1] == ("message", '{"a":\n1}')


def test_streamable_http_sse_responses(sse_http_server):
    srv, state = sse_http_server
    url = f"http://127.0.0.1:{srv.server_address[1]}/mcp"
    client = McpClient(HttpTransport(url), name="sse")
    assert client.transport.session_id == "sess-0"
    tools = client.list_tools()
    assert tools[0]["name"] == "shout"
    assert client.call_tool("shout", {"text": "abc"}) == "ABC"


def test_session_reestablishment(sse_http_server):
    srv, state = sse_http_server
    url = f"http://127.0.0.1:{srv.server_address[1]}/mcp"
    client = McpClient(HttpTransport(url), name="sse")
    assert state["inits"] == 1
    # server rotates the session out from under the client (restart/expiry)
    state["session"] = "rotated-away"
    out = client.call_tool("shout", {"text": "again"})
    assert out == "AGAIN"
    assert state["inits"] == 2  # client re-ran initialize
    assert client.transport.session_id == "sess-1"


# ---------------------------------------------------------------------------
# legacy HTTP+SSE (GET stream + endpoint event)
# ---------------------------------------------------------------------------


class _LegacySseHandler(BaseHTTPRequestHandler):
    server_version = "fixture"
    outbox = None  # queue of JSON-RPC dicts to push on the GET stream

    def log_message(self, *a):
        pass

    def do_GET(self):
        self.send_response(200)
        self.send_header("Content-Type", "text/event-stream")
        self.end_headers()
        self.wfile.write(b"event: endpoint\ndata: /messages\n\n")
        self.wfile.flush()
        while True:
            msg = type(self).outbox.get()
            if msg is None:
                return
            data = f"event: message\ndata: {json.dumps(msg)}\n\n".encode()
            try:
                self.wfile.write(data)
                self.wfile.flush()
            except (BrokenPipeError, ConnectionError):
                return

    def do_POST(self):
        n = int(self.headers.get("Content-Length", 0))
        msg = json.loads(self.rfile.read(n)) if n else {}
        self.send_response(202)
        self.send_header("Content-Length", "0")
        self.end_headers()
        if "id" in msg:
            type(self).outbox.put(
                {"jsonrpc": "2.0", "id": msg["id"], "result": _result_for(msg, TOOLS)}
            )


@pytest.fixture
def legacy_sse_server():
    _LegacySseHandler.outbox = queue.Queue()
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _LegacySseHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    _LegacySseHandler.outbox.put(None)
    srv.shutdown()


def test_legacy_sse_transport(legacy_sse_server):
    url = f"http://127.0.0.1:{legacy_sse_server.server_address[1]}/sse"
    t = SseTransport(url)
    assert t.post_url.endswith("/messages")
    client = McpClient(t, name="legacy")
    assert client.list_tools()[0]["name"] == "shout"
    assert client.call_tool("shout", {"text": "xyz"}) == "XYZ"
    client.close()
