"""Tool-call validation + feedback.

Counterpart of the reference's src/tools/helpers.rs: schema map from the
request's tools (build_tool_schema_map :38), forced-name retention
(retain_tool_calls_forced_name :55), validation of parsed calls against
schemas with human-readable feedback for the model
(filter_tool_calls :116, build_invalid_tool_call_feedback :69), argument
key normalization (normalize_argument_keys :447) and loose type coercion
(coerce_argument_types :521).
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, List, Optional, Tuple

from vllm_rs_tpu.server.tool_parser import ToolCall


def strict_validation_enabled() -> bool:
    """Opt-in (reference helpers.rs:25): invalid calls are dropped and a
    feedback message is synthesized for the next round."""
    return bool(os.environ.get("VLLM_RS_TPU_STRICT_TOOL_CALLS"))


def build_schema_map(tools: Optional[List[dict]]) -> Dict[str, dict]:
    """tool list (OpenAI shape) → {name: parameters-json-schema}."""
    out: Dict[str, dict] = {}
    for t in tools or []:
        if t.get("type") not in (None, "function"):
            continue
        fn = t.get("function") or t
        name = fn.get("name")
        if name:
            out[name] = fn.get("parameters") or {}
    return out


def forced_tool_name(tool_choice) -> Optional[str]:
    """tool_choice {"type":"function","function":{"name":X}} → X."""
    if isinstance(tool_choice, dict):
        return (tool_choice.get("function") or {}).get("name") or tool_choice.get(
            "name"
        )
    return None


_CAMEL_RE = re.compile(r"(?<=[a-z0-9])(?=[A-Z])")


def _key_candidates(key: str) -> List[str]:
    """Alternate spellings a model might use for a schema key
    (helpers.rs normalized_key_candidates)."""
    snake = _CAMEL_RE.sub("_", key).lower()
    camel = re.sub(r"_(\w)", lambda m: m.group(1).upper(), key)
    return list(dict.fromkeys([key, snake, camel, key.lower()]))


def normalize_arguments(args: Dict[str, Any], schema: dict) -> Dict[str, Any]:
    """Rename near-miss keys to their schema spelling and coerce obvious
    scalar types (helpers.rs normalize_argument_keys/coerce_argument_types)."""
    props = schema.get("properties") or {}
    if not props:
        return args
    by_alias: Dict[str, str] = {}
    for canonical in props:
        for alias in _key_candidates(canonical):
            by_alias.setdefault(alias, canonical)
    out: Dict[str, Any] = {}
    for k, v in args.items():
        canonical = by_alias.get(k, by_alias.get(k.lower(), k))
        out[canonical] = _coerce(v, (props.get(canonical) or {}).get("type"))
    return out


def _coerce(value: Any, ty: Optional[str]) -> Any:
    if not isinstance(value, str) or ty in (None, "string"):
        return value
    s = value.strip()
    try:
        if ty == "integer":
            return int(s)
        if ty == "number":
            return float(s)
        if ty == "boolean":
            return {"true": True, "false": False}[s.lower()]
        if ty in ("object", "array"):
            return json.loads(s)
    except (ValueError, KeyError, json.JSONDecodeError):
        pass
    return value


def _missing_required(args: Dict[str, Any], schema: dict) -> List[str]:
    req = schema.get("required") or []
    return [k for k in req if k not in args]


def validate_tool_calls(
    calls: List[ToolCall],
    schema_map: Dict[str, dict],
    forced_name: Optional[str] = None,
) -> Tuple[List[ToolCall], List[str]]:
    """Validate + normalize parsed calls.

    Returns (valid_calls, feedback): feedback strings describe each
    rejected call so the server can hand them back to the model in the next
    round (helpers.rs build_invalid_tool_call_feedback). Without schemas
    (schema_map empty) everything passes through untouched.
    """
    if not schema_map:
        return list(calls), []
    valid: List[ToolCall] = []
    feedback: List[str] = []
    allowed = ", ".join(sorted(schema_map))
    for c in calls:
        if forced_name and c.name != forced_name:
            feedback.append(
                f"Tool call '{c.name}' dropped: tool_choice forces '{forced_name}'."
            )
            continue
        schema = schema_map.get(c.name)
        if schema is None:
            feedback.append(
                f"Unknown tool '{c.name}'. Available tools: {allowed}."
            )
            continue
        try:
            args = json.loads(c.arguments or "{}")
        except json.JSONDecodeError:
            feedback.append(
                f"Tool call '{c.name}' has malformed JSON arguments."
            )
            continue
        if not isinstance(args, dict):
            feedback.append(
                f"Tool call '{c.name}' arguments must be a JSON object."
            )
            continue
        args = normalize_arguments(args, schema)
        missing = _missing_required(args, schema)
        if missing:
            feedback.append(
                f"Tool call '{c.name}' is missing required argument(s): "
                f"{', '.join(missing)}."
            )
            continue
        valid.append(ToolCall(name=c.name, arguments=json.dumps(args), id=c.id))
    return valid, feedback
