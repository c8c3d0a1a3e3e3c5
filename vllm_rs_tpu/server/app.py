"""Server assembly + lifecycle.

Counterpart of the reference's run_server route table (server/mod.rs:
1352-1518): wires the OpenAI and Anthropic route tables onto one aiohttp
app around a running LLMEngine.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Optional

from aiohttp import web

from vllm_rs_tpu.core.engine import LLMEngine
from vllm_rs_tpu.server.tool_parser import ToolConfig
from vllm_rs_tpu.utils.chat_template import ChatTemplate

logger = logging.getLogger(__name__)


def trim_prompt_replay_prefix(ids, reasoning_ids):
    """Trim a candidate replay suffix to start at its first reasoning-marker
    token; candidates with no reasoning token are rejected — replaying
    arbitrary prompt text into the output would corrupt plain completions
    (reference engine.rs:721-729)."""
    for i, t in enumerate(ids):
        if t in reasoning_ids:
            return list(ids[i:])
    return None


def build_prompt_replay_candidates(chat_template, tokenizer, tool_config):
    """Token-id replay suffixes for this template/tokenizer, longest first
    (reference build_prompt_replay_candidates, engine.rs:731-777): rendered
    for both enable_thinking variants, tokenized, trimmed to the reasoning
    marker."""

    def single_id(text):
        # markers must be real single vocab tokens — a WordLevel/BPE unk
        # fallback would alias every unknown marker onto one bogus id
        if hasattr(tokenizer, "token_to_id"):
            tid = tokenizer.token_to_id(text)
            return int(tid) if tid is not None else None
        try:
            enc = tokenizer.encode(text)
        except Exception:
            return None
        ids = enc.ids if hasattr(enc, "ids") else enc
        if len(ids) != 1:
            return None
        try:
            if tokenizer.decode(ids, skip_special_tokens=False) != text:
                return None
        except Exception:
            pass
        return int(ids[0])

    reasoning_ids = {
        i
        for m in tool_config.think_starts + tool_config.think_ends
        for i in (single_id(m),)
        if i is not None
    }
    if not reasoning_ids:
        return []
    candidates = []
    for enable_thinking in (True, False):
        suffix = chat_template.generation_prompt_replay_suffix(
            enable_thinking=enable_thinking
        )
        if not suffix:
            continue
        enc = tokenizer.encode(suffix)
        ids = enc.ids if hasattr(enc, "ids") else enc
        trimmed = trim_prompt_replay_prefix(list(ids), reasoning_ids)
        if trimmed and trimmed not in candidates:
            candidates.append(trimmed)
    candidates.sort(key=len, reverse=True)
    return candidates


class ServerState:
    def __init__(
        self,
        engine: LLMEngine,
        *,
        model_name: str = "model",
        chat_template: Optional[ChatTemplate] = None,
        tool_config: Optional[ToolConfig] = None,
        default_max_tokens: int = 1024,
        mcp=None,
        image_markers=None,
        tool_parser: str = "",
    ):
        self.engine = engine
        self.model_name = model_name
        mt = engine.econfig.model.model_type
        from vllm_rs_tpu.server.images import markers_for

        # (start, per-token pad, end) text inserted where an image appears
        self.image_markers = image_markers or markers_for(mt)
        self.chat_template = chat_template or ChatTemplate(model_type=mt)
        if tool_config is None:
            # discover dedicated marker/think token ids from the tokenizer
            # (reference special_tokens.rs; --enforce-parser override
            # main.rs:31-40 maps to tool_parser)
            tool_config = ToolConfig.for_model_type(mt, parser_override=tool_parser)
            if engine.tokenizer is not None:
                tool_config = tool_config.with_tokenizer(engine.tokenizer)
        self.tool_config = tool_config
        # multi-turn prefix continuation (reference engine.rs:731-791):
        # replay the generation-prompt suffix into outputs so next-turn
        # re-renders stay token-identical with the served prompt+output
        if engine.tokenizer is not None:
            try:
                cands = build_prompt_replay_candidates(
                    self.chat_template, engine.tokenizer, self.tool_config
                )
            except Exception:
                cands = []
            if cands:
                engine.set_prompt_replay_candidates(cands)
        self.default_max_tokens = default_max_tokens
        # MCP manager (reference server/mod.rs:1016-1127 MCP tool execution)
        self.mcp = mcp
        # per-session usage accounting (reference /v1/usage?session_id)
        self.session_usage: dict = {}
        self.created = int(time.time())

    def tokenize(self, text: str):
        tok = self.engine.tokenizer
        assert tok is not None, "server requires a tokenizer"
        ids = tok.encode(text)
        return list(ids.ids) if hasattr(ids, "ids") else list(ids)

    def detokenize(self, ids):
        tok = self.engine.tokenizer
        assert tok is not None
        try:
            return tok.decode(ids, skip_special_tokens=False)
        except TypeError:
            return tok.decode(ids)


def _chat_logger_middleware():
    """Opt-in request/response file logging (reference VLLM_RS_CHAT_LOGGER,
    server/logger.rs:31-85): set VLLM_RS_TPU_CHAT_LOGGER=1 to append JSONL
    records under ./log/."""
    import json
    import os
    import time as _t

    @web.middleware
    async def mw(request, handler):
        if not os.environ.get("VLLM_RS_TPU_CHAT_LOGGER"):
            return await handler(request)
        body = None
        if request.method == "POST" and request.path.startswith("/v1/"):
            try:
                body = await request.json()
            except Exception:
                body = None
        resp = await handler(request)
        if body is not None:
            os.makedirs("log", exist_ok=True)
            rec = {
                "ts": _t.time(),
                "path": request.path,
                "request": body,
                "status": getattr(resp, "status", None),
            }
            with open("log/chat_requests.jsonl", "a") as f:
                f.write(json.dumps(rec) + "\n")
        return resp

    return mw


def build_app(state: ServerState) -> web.Application:
    from vllm_rs_tpu.server import claude, openai

    @web.middleware
    async def _draining_mw(request, handler):
        from vllm_rs_tpu.core.engine import EngineDrainingError

        try:
            return await handler(request)
        except EngineDrainingError as e:
            return web.json_response(
                {"error": {"message": str(e), "type": "unavailable"}},
                status=503,
            )

    app = web.Application(middlewares=[_draining_mw, _chat_logger_middleware()])
    app["state"] = state
    app.add_routes(openai.routes)
    app.add_routes(claude.routes)

    async def health(_request):
        return web.json_response({"status": "ok"})

    async def index(_request):
        from vllm_rs_tpu.server.ui import INDEX_HTML

        return web.Response(text=INDEX_HTML, content_type="text/html")

    async def profile_start(request):
        """Begin an xprof trace capture (utils/profiling.py). Body (all
        optional): {"trace_dir": str, "max_steps": int} — max_steps 0
        captures until /v1/profile/stop."""
        try:
            body = await request.json()
        except Exception:
            body = {}
        engine = state.engine
        if engine.profiler is None:
            from vllm_rs_tpu.utils.profiling import StepProfiler

            engine.profiler = StepProfiler(
                body.get("trace_dir", "/tmp/vllm_rs_tpu_xprof"),
                max_steps=int(body.get("max_steps", 0)),
            )
        else:
            if "trace_dir" in body:
                engine.profiler.trace_dir = body["trace_dir"]
            if "max_steps" in body:
                engine.profiler.max_steps = int(body["max_steps"])
        started = engine.profiler.start()
        return web.json_response(
            {"started": started, "trace_dir": engine.profiler.trace_dir}
        )

    async def profile_stop(_request):
        engine = state.engine
        stopped = engine.profiler.stop() if engine.profiler is not None else False
        return web.json_response({"stopped": stopped})

    async def metrics(_request):
        """Prometheus text exposition of the engine's observability
        surface (beyond the reference, which ships no Prometheus/OTel —
        SURVEY §5 metrics row; the JSON twin lives at /v1/usage)."""
        return web.Response(
            text=prometheus_metrics(state.engine),
            content_type="text/plain",
            charset="utf-8",
        )

    async def on_shutdown(_app):
        """Graceful drain: refuse new admissions, let in-flight requests
        finish (bounded by VLLM_RS_TPU_DRAIN_TIMEOUT_S, default 30), then
        stop the engine loop. aiohttp invokes this on SIGINT/SIGTERM."""
        import asyncio

        engine = state.engine
        engine.begin_drain()
        deadline = asyncio.get_event_loop().time() + float(
            os.environ.get("VLLM_RS_TPU_DRAIN_TIMEOUT_S", "30")
        )
        while engine.scheduler.num_active > 0:
            if asyncio.get_event_loop().time() > deadline:
                logger.warning(
                    "drain timeout: %d requests still active",
                    engine.scheduler.num_active,
                )
                break
            await asyncio.sleep(0.1)
        logger.info("drained; stopping engine loop")

    app.router.add_get("/health", health)
    app.router.add_get("/", index)
    app.router.add_get("/metrics", metrics)
    app.router.add_post("/v1/profile/start", profile_start)
    app.router.add_post("/v1/profile/stop", profile_stop)
    app.on_shutdown.append(on_shutdown)
    return app


def prometheus_metrics(engine) -> str:
    """Render engine counters/gauges in the Prometheus text format."""
    u = engine.usage_stats()
    lines = []

    def emit(name, kind, value, help_text, labels=""):
        lines.append(f"# HELP vllm_rs_tpu_{name} {help_text}")
        lines.append(f"# TYPE vllm_rs_tpu_{name} {kind}")
        lines.append(f"vllm_rs_tpu_{name}{labels} {value}")

    emit("prompt_tokens_total", "counter", u["prompt_tokens"],
         "Prompt tokens admitted")
    emit("output_tokens_total", "counter", u["output_tokens"],
         "Tokens generated")
    emit("kv_blocks_total", "gauge", u["kv_blocks_total"], "KV block pool size")
    emit("kv_blocks_free", "gauge", u["kv_blocks_free"], "Free KV blocks")
    emit("kv_usage_ratio", "gauge", u["kv_usage_ratio"], "KV pool occupancy")
    emit("prefix_cache_blocks", "gauge", u["prefix_cache_blocks"],
         "Blocks held by the prefix cache")
    emit("active_requests", "gauge", u["active_requests"],
         "Requests admitted and not finished")
    for kind, st in (u.get("step_timings") or {}).items():
        for q in ("p50_ms", "p99_ms"):
            if q in st:
                lines.append(
                    f'vllm_rs_tpu_step_latency_ms{{kind="{kind}",q="{q[:-3]}"}} '
                    f"{st[q]}"
                )
        if "tokens_per_s" in st:
            lines.append(
                f'vllm_rs_tpu_step_tokens_per_sec{{kind="{kind}"}} '
                f"{st['tokens_per_s']}"
            )
    return "\n".join(lines) + "\n"


def run_server(
    engine: LLMEngine,
    *,
    host: str = "0.0.0.0",
    port: int = 8000,
    model_name: str = "model",
    chat_template: Optional[ChatTemplate] = None,
    mcp=None,
    tool_parser: str = "",
) -> None:
    """Start the engine loop and serve until interrupted."""
    engine.start_loop()
    state = ServerState(
        engine, model_name=model_name, chat_template=chat_template, mcp=mcp,
        tool_parser=tool_parser,
    )
    app = build_app(state)
    logger.info("serving %s on %s:%d", model_name, host, port)
    try:
        web.run_app(app, host=host, port=port, print=None)
    finally:
        engine.stop_loop()
