"""Anthropic Messages API routes.

Counterpart of the reference's server/claude_server.rs: content blocks
(text/tool_use/tool_result/thinking, claude_server.rs:77-370), the SSE
event stream (message_start, content_block_start/delta/stop, message_delta,
message_stop — claude_server.rs:1992), and /v1/messages/count_tokens
(claude_server.rs:3302).
"""

from __future__ import annotations

import asyncio
import json
import time
from typing import Any, Dict, List

from aiohttp import web

from vllm_rs_tpu.config import SamplingParams
from vllm_rs_tpu.server.protocol import finish_reason_claude, make_id
from vllm_rs_tpu.server.tool_parser import StreamParser

routes = web.RouteTableDef()


def _state(request: web.Request):
    return request.app["state"]


async def _next_item(queue):
    loop = asyncio.get_running_loop()
    return await loop.run_in_executor(None, queue.get)


def _messages_from_claude(body: Dict[str, Any], st=None):
    """Anthropic messages (+ system) → OpenAI-style messages for the chat
    template (claude_server.rs message mapping). With a server state,
    `image` source blocks decode through the model's preprocessing and
    become placeholder-token runs; returns (messages, images)."""
    images: List = []
    out: List[dict] = []
    system = body.get("system")
    if system:
        if isinstance(system, list):
            system = "".join(
                b.get("text", "") for b in system if b.get("type") == "text"
            )
        out.append({"role": "system", "content": system})
    for m in body.get("messages", []):
        content = m.get("content", "")
        if isinstance(content, list):
            parts = []
            for b in content:
                t = b.get("type")
                if t == "text":
                    parts.append(b.get("text", ""))
                elif t == "tool_result":
                    inner = b.get("content", "")
                    if isinstance(inner, list):
                        inner = "".join(
                            c.get("text", "") for c in inner if c.get("type") == "text"
                        )
                    parts.append(str(inner))
                elif t == "tool_use":
                    parts.append(
                        json.dumps({"name": b.get("name"), "arguments": b.get("input", {})})
                    )
                elif t == "image" and st is not None:
                    from vllm_rs_tpu.server.images import attach_image

                    src = b.get("source") or {}
                    if src.get("type") != "base64":
                        raise ValueError(
                            "image source must be base64 (no network egress)"
                        )
                    import base64 as _b64

                    text, img = attach_image(st, _b64.b64decode(src.get("data", "")))
                    parts.append(text)
                    images.append(img)
            content = "".join(parts)
        out.append({"role": m.get("role", "user"), "content": content})
    return out, images


def _sampling_from_claude(body: Dict[str, Any], default_max: int) -> SamplingParams:
    sp = SamplingParams(
        temperature=body.get("temperature", 1.0),
        top_p=body.get("top_p", 1.0) or 1.0,
        top_k=body.get("top_k", 0) or 0,
        max_tokens=body.get("max_tokens", default_max),
    )
    stops = body.get("stop_sequences")
    if stops:
        sp.stop = tuple(stops)
    return sp


def _claude_tools_to_openai(tools):
    if not tools:
        return None
    return [
        {
            "type": "function",
            "function": {
                "name": t.get("name"),
                "description": t.get("description", ""),
                "parameters": t.get("input_schema", {}),
            },
        }
        for t in tools
    ]


@routes.post("/v1/messages")
async def messages(request: web.Request) -> web.StreamResponse:
    st = _state(request)
    body = await request.json()
    rid = make_id("msg")
    sp = _sampling_from_claude(body, st.default_max_tokens)
    # Anthropic tool_choice (claude_server.rs handles auto/any/tool/none):
    # "none" hides tools from the prompt; "any"/"tool" force a valid tool
    # call through the grammar constraint
    tool_choice = body.get("tool_choice") or {}
    tc_type = tool_choice.get("type", "auto") if isinstance(tool_choice, dict) else "auto"
    tools = _claude_tools_to_openai(body.get("tools")) if tc_type != "none" else None
    if tools and tc_type in ("any", "tool"):
        names = [t["function"]["name"] for t in tools]
        if tc_type == "tool":
            names = [tool_choice.get("name")] if tool_choice.get("name") else names
        if names:
            by_name = {t["function"]["name"]: t["function"] for t in tools}
            schemas = {
                n: by_name[n]["parameters"]
                for n in names
                if isinstance(by_name.get(n, {}).get("parameters"), dict)
                and by_name[n]["parameters"]
            }
            spec = {
                "names": tuple(names),
                "start": st.tool_config.tool_start,
                "end": st.tool_config.tool_end,
                "style": "mistral" if st.tool_config.strategy == "mistral" else "json",
            }
            if schemas:
                spec["schemas"] = schemas
            sp.constraint = ("tool_call", spec)
    # extended thinking (claude_server.rs thinking budget): budget_tokens
    # maps to a char budget on the structured reasoning block; requires the
    # tokenizer to expose reasoning tokens (normalize_reasoning_controls)
    thinking = body.get("thinking") or {}
    if (
        isinstance(thinking, dict)
        and thinking.get("type") == "enabled"
        and st.tool_config.reasoning_markers is not None
    ):
        sp.reasoning_effort = "medium"
        sp.think_markers = tuple(st.tool_config.reasoning_markers)
        budget = thinking.get("budget_tokens")
        if isinstance(budget, int) and budget > 0:
            # ~4 chars per token: char-level automaton budget analog
            sp.reasoning_budget = budget * 4
    try:
        msgs, images = _messages_from_claude(body, st)
        prompt = st.chat_template.render(
            msgs,
            add_generation_prompt=True,
            tools=tools,
            enable_thinking=(body.get("thinking") or {}).get("type") == "enabled",
        )
        seq_id = st.engine.add_request(prompt, sp, images=images or None)
    except ValueError as e:
        return web.json_response(
            {"type": "error", "error": {"type": "invalid_request_error", "message": str(e)}},
            status=400,
        )
    queue = st.engine.get_stream(seq_id)
    seq = st.engine.requests[seq_id].seq
    parser = StreamParser(st.tool_config)
    model = body.get("model", st.model_name)

    if not body.get("stream"):
        text_parts, think_parts = [], []
        n_out = 0
        while True:
            item = await _next_item(queue)
            if item.token_id is not None:
                n_out += 1
            events = parser.push(item.text or "", item.token_id)
            if item.finished:
                events += parser.finish()
            for kind, payload in events:
                if kind == "content":
                    text_parts.append(payload)
                elif kind == "reasoning":
                    think_parts.append(payload)
            if item.finished:
                finish_reason = item.finish_reason
                break
        content: List[dict] = []
        if think_parts:
            content.append(
                {"type": "thinking", "thinking": "".join(think_parts), "signature": ""}
            )
        text = "".join(text_parts)
        if text or not parser.tool_calls:
            content.append({"type": "text", "text": text})
        for tc in parser.tool_calls:
            content.append(
                {
                    "type": "tool_use",
                    "id": tc.id.replace("call_", "toolu_"),
                    "name": tc.name,
                    "input": json.loads(tc.arguments or "{}"),
                }
            )
        return web.json_response(
            {
                "id": rid,
                "type": "message",
                "role": "assistant",
                "model": model,
                "content": content,
                "stop_reason": finish_reason_claude(finish_reason, bool(parser.tool_calls)),
                "stop_sequence": None,
                "usage": {
                    "input_tokens": len(seq.prompt_token_ids),
                    "output_tokens": n_out,
                    "cache_read_input_tokens": seq.num_prefix_cached_tokens,
                },
            }
        )

    # streaming SSE
    resp = web.StreamResponse(
        headers={"Content-Type": "text/event-stream", "Cache-Control": "no-cache"}
    )
    await resp.prepare(request)

    async def send(event: str, data: dict):
        await resp.write(f"event: {event}\ndata: {json.dumps(data)}\n\n".encode())

    await send(
        "message_start",
        {
            "type": "message_start",
            "message": {
                "id": rid,
                "type": "message",
                "role": "assistant",
                "model": model,
                "content": [],
                "stop_reason": None,
                "usage": {"input_tokens": len(seq.prompt_token_ids), "output_tokens": 0},
            },
        },
    )
    block_index = -1
    block_kind = None  # "text" | "thinking" | None
    n_out = 0

    async def open_block(kind: str, extra: dict):
        nonlocal block_index, block_kind
        if block_kind is not None:
            await send(
                "content_block_stop",
                {"type": "content_block_stop", "index": block_index},
            )
        block_index += 1
        block_kind = kind
        await send(
            "content_block_start",
            {"type": "content_block_start", "index": block_index, "content_block": extra},
        )

    try:
        while True:
            item = await _next_item(queue)
            if item.token_id is not None:
                n_out += 1
            events = parser.push(item.text or "", item.token_id)
            if item.finished:
                events += parser.finish()
            for kind, payload in events:
                if kind == "content":
                    if block_kind != "text":
                        await open_block("text", {"type": "text", "text": ""})
                    await send(
                        "content_block_delta",
                        {
                            "type": "content_block_delta",
                            "index": block_index,
                            "delta": {"type": "text_delta", "text": payload},
                        },
                    )
                elif kind == "reasoning":
                    if block_kind != "thinking":
                        await open_block("thinking", {"type": "thinking", "thinking": ""})
                    await send(
                        "content_block_delta",
                        {
                            "type": "content_block_delta",
                            "index": block_index,
                            "delta": {"type": "thinking_delta", "thinking": payload},
                        },
                    )
                else:  # tool_call
                    tc = payload
                    await open_block(
                        "tool_use",
                        {
                            "type": "tool_use",
                            "id": tc.id.replace("call_", "toolu_"),
                            "name": tc.name,
                            "input": {},
                        },
                    )
                    await send(
                        "content_block_delta",
                        {
                            "type": "content_block_delta",
                            "index": block_index,
                            "delta": {"type": "input_json_delta", "partial_json": tc.arguments},
                        },
                    )
                    await send(
                        "content_block_stop",
                        {"type": "content_block_stop", "index": block_index},
                    )
                    block_kind = None
            if item.finished:
                if block_kind is not None:
                    await send(
                        "content_block_stop",
                        {"type": "content_block_stop", "index": block_index},
                    )
                await send(
                    "message_delta",
                    {
                        "type": "message_delta",
                        "delta": {
                            "stop_reason": finish_reason_claude(
                                item.finish_reason, bool(parser.tool_calls)
                            ),
                            "stop_sequence": None,
                        },
                        "usage": {"output_tokens": n_out},
                    },
                )
                await send("message_stop", {"type": "message_stop"})
                break
    except (ConnectionResetError, asyncio.CancelledError):
        st.engine.abort_request(seq_id)
        raise
    return resp


@routes.post("/v1/messages/count_tokens")
async def count_tokens(request: web.Request) -> web.Response:
    st = _state(request)
    body = await request.json()
    msgs, _ = _messages_from_claude(body, st)
    prompt = st.chat_template.render(msgs, add_generation_prompt=True)
    return web.json_response({"input_tokens": len(st.tokenize(prompt))})
