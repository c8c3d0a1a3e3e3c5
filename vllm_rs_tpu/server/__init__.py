"""HTTP serving layer (OpenAI + Anthropic compatible).

Counterpart of the reference's src/server/ (SURVEY.md §2.7): axum →
aiohttp, same route surface:
  POST /v1/chat/completions   (OpenAI, stream + non-stream)
  POST /v1/completions        (plain completions)
  POST /v1/messages           (Anthropic Messages API + SSE events)
  POST /v1/messages/count_tokens
  POST /v1/embeddings
  GET  /v1/models
  GET  /v1/usage
  POST /tokenize  /detokenize
"""

from vllm_rs_tpu.server.app import build_app, run_server  # noqa: F401
