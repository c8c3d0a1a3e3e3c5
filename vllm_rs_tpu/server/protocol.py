"""Wire types for the OpenAI- and Anthropic-compatible APIs.

Mirrors the reference's request/response structs (src/server/mod.rs:206-441
OpenAI superset incl. session_id/thinking/structured_outputs;
src/server/claude_server.rs:77-370 Anthropic content blocks). Python dicts
in/out — handlers validate the few fields they consume and pass sampling
knobs through SamplingParams.from_dict.
"""

from __future__ import annotations

import time
import uuid
from typing import Any, Dict, List, Optional

from vllm_rs_tpu.config import SamplingParams


def make_id(prefix: str) -> str:
    return f"{prefix}-{uuid.uuid4().hex[:24]}"


def sampling_from_openai(
    body: Dict[str, Any],
    default_max: int = 1024,
    gen_defaults: Optional[Dict[str, Any]] = None,
    tool_config=None,
) -> SamplingParams:
    """OpenAI request body → SamplingParams (server/mod.rs:206-441).

    gen_defaults is the model's generation_config.json: its knobs apply
    only where the request leaves them unset (reference config.rs:735-757
    applies GenerationConfig to unset sampling fields)."""
    gd = gen_defaults or {}

    def knob(name: str, fallback):
        v = body.get(name)
        if v is None:
            v = gd.get(name)
        return fallback if v is None else v

    sp = SamplingParams(
        temperature=knob("temperature", 1.0),
        top_p=knob("top_p", 1.0) or 1.0,
        top_k=knob("top_k", 0) or 0,
        min_p=knob("min_p", 0.0) or 0.0,
        max_tokens=body.get("max_tokens")
        or body.get("max_completion_tokens")
        or default_max,
        frequency_penalty=knob("frequency_penalty", 0.0) or 0.0,
        presence_penalty=knob("presence_penalty", 0.0) or 0.0,
        repetition_penalty=knob("repetition_penalty", 1.0) or 1.0,
        seed=body.get("seed"),
    )
    stop = body.get("stop")
    if isinstance(stop, str):
        sp.stop = (stop,)
    elif isinstance(stop, list):
        sp.stop = tuple(stop)
    rf = body.get("response_format")
    if isinstance(rf, dict):
        if rf.get("type") == "json_object":
            sp.constraint = ("json", None)
        elif rf.get("type") == "json_schema":
            schema = (rf.get("json_schema") or {}).get("schema")
            sp.constraint = ("json_schema", schema)
    so = body.get("structured_outputs")
    if isinstance(so, dict):
        for kind in ("regex", "choice", "grammar", "json_schema"):
            if kind in so:
                sp.constraint = (kind, so[kind])
                break
    # forced tool calls: compile the tool schemas into a grammar constraint
    # (reference tools/schema.rs builds an llguidance tool-call grammar)
    if sp.constraint is None and body.get("tools"):
        sp.constraint = tool_call_constraint(
            body["tools"], body.get("tool_choice", "auto"), tool_config
        )
    # reasoning controls (reference server/mod.rs:415-462
    # normalize_reasoning_controls): honored only when the tokenizer exposes
    # dedicated reasoning tokens; silently dropped otherwise, like the ref
    effort = body.get("reasoning_effort")
    if effort and str(effort).lower() != "none":
        markers = getattr(tool_config, "reasoning_markers", None)
        if markers is not None:
            sp.reasoning_effort = str(effort).lower()
            sp.think_markers = tuple(markers)
            # the reference sets params.thinking = Some(true) here
            # (normalize_reasoning_controls): the grammar forces a think
            # block, so the template MUST render the thinking prompt —
            # otherwise an explicit enable_thinking=false request would
            # contradict the constraint
            body["enable_thinking"] = True
            body.pop("thinking", None)
    return sp


def tool_call_constraint(tools, tool_choice, tool_config=None):
    """tool_choice "required"/{"function": {...}} → a constraint forcing a
    syntactically valid tool-call body in the MODEL FAMILY'S format
    (markers/style from its ToolConfig — the reference builds per-format
    grammars in tools/schema.rs). "auto"/None → no constraint."""
    if tool_choice in (None, "auto", "none"):
        return None
    fns = [t["function"] for t in tools if t.get("type") == "function"]
    names = [f["name"] for f in fns]
    if isinstance(tool_choice, dict):
        fn = (tool_choice.get("function") or {}).get("name")
        if fn:
            names = [fn]
    if not names:
        return None
    # per-tool parameter schemas constrain the arguments object itself
    # (reference tools/schema.rs compiles each tool's JSON schema into the
    # llguidance grammar, not just the name)
    schemas = {
        f["name"]: f["parameters"]
        for f in fns
        # empty {} means "any arguments" — leave those unconstrained
        if f["name"] in names and isinstance(f.get("parameters"), dict) and f["parameters"]
    }
    spec = {"names": tuple(names)}
    if schemas:
        spec["schemas"] = schemas
    if tool_config is not None:
        spec["start"] = tool_config.tool_start
        spec["end"] = tool_config.tool_end
        spec["style"] = (
            "mistral" if tool_config.strategy == "mistral" else "json"
        )
    return ("tool_call", spec)


def openai_chunk(
    rid: str, model: str, *, content: Optional[str] = None,
    reasoning_content: Optional[str] = None, role: Optional[str] = None,
    tool_calls: Optional[list] = None, finish_reason: Optional[str] = None,
    usage: Optional[dict] = None,
) -> dict:
    delta: Dict[str, Any] = {}
    if role is not None:
        delta["role"] = role
    if content is not None:
        delta["content"] = content
    if reasoning_content is not None:
        delta["reasoning_content"] = reasoning_content
    if tool_calls is not None:
        delta["tool_calls"] = tool_calls
    out = {
        "id": rid,
        "object": "chat.completion.chunk",
        "created": int(time.time()),
        "model": model,
        "choices": [
            {"index": 0, "delta": delta, "finish_reason": finish_reason}
        ],
    }
    if usage is not None:
        out["usage"] = usage
    return out


def openai_usage(
    prompt_tokens: int, completion_tokens: int, *, cached_tokens: int = 0,
    reasoning_tokens: int = 0,
) -> dict:
    """Usage with the reference's extensions (docs/prefix-cache.md:49-79)."""
    u = {
        "prompt_tokens": prompt_tokens,
        "completion_tokens": completion_tokens,
        "total_tokens": prompt_tokens + completion_tokens,
        "prompt_tokens_details": {"cached_tokens": cached_tokens},
    }
    if reasoning_tokens:
        u["completion_tokens_details"] = {"reasoning_tokens": reasoning_tokens}
    return u


def finish_reason_openai(reason: Optional[str], has_tool_calls: bool = False) -> str:
    if has_tool_calls:
        return "tool_calls"
    return {"length": "length"}.get(reason or "", "stop")


def finish_reason_claude(reason: Optional[str], has_tool_calls: bool = False) -> str:
    if has_tool_calls:
        return "tool_use"
    return {"length": "max_tokens"}.get(reason or "", "end_turn")
