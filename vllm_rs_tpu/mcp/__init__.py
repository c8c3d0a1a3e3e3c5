from vllm_rs_tpu.mcp.client import McpClient, McpManager  # noqa: F401
