"""MCP client/server protocol tests (stdio transport round trip)."""

import sys

import pytest

from vllm_rs_tpu.mcp import McpClient, McpManager
from vllm_rs_tpu.mcp.client import StdioTransport


@pytest.fixture
def demo_client():
    t = StdioTransport(sys.executable, ["-m", "vllm_rs_tpu.mcp.server", "--demo"])
    c = McpClient(t, name="demo")
    yield c
    c.close()


class TestMcpStdio:
    def test_initialize_and_list(self, demo_client):
        tools = demo_client.list_tools()
        assert [t["name"] for t in tools] == ["echo"]
        assert "inputSchema" in tools[0]

    def test_call_tool(self, demo_client):
        out = demo_client.call_tool("echo", {"text": "hello mcp"})
        assert out == "hello mcp"


class TestMcpManager:
    def test_manager_aggregation_and_routing(self):
        mgr = McpManager.from_config(
            {
                "mcpServers": {
                    "demo": {
                        "command": sys.executable,
                        "args": ["-m", "vllm_rs_tpu.mcp.server", "--demo"],
                    }
                }
            }
        )
        try:
            tools = mgr.list_tools()
            assert tools[0]["type"] == "function"
            assert tools[0]["function"]["name"] == "echo"
            assert mgr.has_tool("echo")
            assert mgr.call("echo", {"text": "42"}) == "42"
        finally:
            mgr.close()
