"""Streaming tool-call and reasoning-content parser.

Counterpart of the reference's server/parser.rs (4336 LoC) + the external
tool-parser crate it drives:
- per-model-family ToolConfig: start/end markers, token ids, body format
  strategy (parser.rs:290-412 — llama python_tag, llama4 pythonic,
  qwen <tool_call>, mistral [TOOL_CALLS], gemma function_call markers,
  gemma4 <|tool_call>, minimax XML envelope)
- a buffering state machine that holds back text that might be a marker
  prefix and flushes on false positives (parser.rs:259-286, 623), prefers
  token-ID detection when the tokenizer has dedicated marker tokens
  (parser.rs test_parser_token_id_strict_match), and keeps buffering when
  an end marker appears inside an unfinished XML parameter body
  (parser.rs test_fake_end_marker_inside_parameter_keeps_buffering)
- multi-call bodies, truncated-JSON repair at end-of-stream
  (parser.rs repair_streamed_json_arguments, finalize_buffered_tool_calls)
- <think> reasoning-content routing incl. prefilled-think detection
  (parser.rs:662-694) with marker discovery from the tokenizer
  (special_tokens.rs)

Pure host-side string processing — one instance per streamed request.
"""

from __future__ import annotations

import ast
import json
import os
import re
import time
import uuid
from dataclasses import dataclass, field, replace
from typing import Dict, List, Optional, Tuple

# reference VLLM_RS_TOOL_BUFFER_TIMEOUT_SECS (server.rs:367-372): a tool
# start marker without its end within this window flushes as plain content
# so a malformed generation cannot stall the stream
_TOOL_BUFFER_TIMEOUT = float(
    os.environ.get("VLLM_RS_TPU_TOOL_BUFFER_TIMEOUT_SECS", "30") or 30
)

# reasoning marker candidates probed against the tokenizer vocabulary
# (reference special_tokens.rs REASONING_START/END_TOKENS). Kept as
# explicit (start, end) PAIRS so a discovered start can never be matched
# against an unrelated end marker.
_THINK_MARKER_PAIRS = (
    ("<think>", "</think>"),
    ("<thinking>", "</thinking>"),
    ("<reasoning>", "</reasoning>"),
    ("<internal>", "</internal>"),
    ("<reflection>", "</reflection>"),
    ("<|think|>", "<|/think|>"),
    ("[THINK]", "[/THINK]"),
    ("<thought>", "</thought>"),
)


@dataclass(frozen=True)
class ToolConfig:
    """Markers + body-format strategy for one model family
    (reference ToolConfig::for_model_type, parser.rs:290-412)."""

    tool_start: str = "<tool_call>"
    tool_end: str = "</tool_call>"
    # extra accepted end markers (llama4 emits <|eom|> or <|eot|>)
    alt_tool_ends: Tuple[str, ...] = ()
    # body format: auto | json | pythonic | llama | mistral | gemma |
    # gemma4 | minimax
    strategy: str = "auto"
    think_start: str = "<think>"
    think_end: str = "</think>"
    # extra think marker pairs discovered from the tokenizer; index i of
    # alt_think_starts pairs with index i of alt_think_ends (always equal
    # length — constructed from _THINK_MARKER_PAIRS)
    alt_think_starts: Tuple[str, ...] = ()
    alt_think_ends: Tuple[str, ...] = ()
    # dedicated marker token ids; when present AND the caller passes token
    # ids to push(), literal marker text does NOT trigger (strict mode)
    start_token_ids: frozenset = frozenset()
    end_token_ids: frozenset = frozenset()
    # (start, end) think-marker pair that exists as dedicated tokenizer
    # tokens — reasoning_effort grammars require this (reference
    # server/mod.rs:443-462 normalize_reasoning_controls disables the
    # reasoning grammar when the tokenizer exposes no reasoning tokens)
    reasoning_markers: Optional[Tuple[str, str]] = None

    @property
    def think_starts(self) -> Tuple[str, ...]:
        return (self.think_start,) + self.alt_think_starts

    @property
    def think_ends(self) -> Tuple[str, ...]:
        return (self.think_end,) + self.alt_think_ends

    @property
    def tool_ends(self) -> Tuple[str, ...]:
        return (self.tool_end,) + self.alt_tool_ends

    @staticmethod
    def for_model_type(model_type: str, parser_override: str = "") -> "ToolConfig":
        """Family table (parser.rs:299-412). parser_override maps the
        reference's --enforce-parser CLI flag (main.rs:31-40)."""
        mt = model_type.lower()
        if mt.startswith("llama4"):
            cfg = ToolConfig(
                tool_start="<|python_start|>",
                tool_end="<|python_end|>",
                alt_tool_ends=("<|eom|>", "<|eot|>"),
                strategy="pythonic",
            )
        elif mt.startswith("llama") or mt in ("phi3", "phi4"):
            # llama3's python_tag format; phi ships llama-style in the
            # reference's text-only mode but uses <tool_call> markers —
            # keep phi on the default ChatML config below
            if mt.startswith("llama"):
                cfg = ToolConfig(
                    tool_start="<|python_tag|>",
                    tool_end="<|eom_id|>",
                    alt_tool_ends=("<|eot_id|>",),
                    strategy="llama",
                )
            else:
                cfg = ToolConfig()
        elif mt.startswith("mistral") or mt.startswith("ministral") or mt.startswith("pixtral"):
            # [TOOL_CALLS][{...}, {...}] — the body IS a JSON array; the
            # end is its balanced closing bracket (parser.rs:352-360)
            cfg = ToolConfig(
                tool_start="[TOOL_CALLS]", tool_end="]", strategy="mistral"
            )
        elif mt == "gemma4":
            cfg = ToolConfig(
                tool_start="<|tool_call>", tool_end="<tool_call|>",
                strategy="gemma4",
            )
        elif mt.startswith("gemma"):
            cfg = ToolConfig(
                tool_start="<start_function_call>",
                tool_end="<end_function_call>",
                strategy="gemma",
            )
        elif mt.startswith("minimax"):
            cfg = ToolConfig(
                tool_start="<minimax:tool_call>",
                tool_end="</minimax:tool_call>",
                strategy="minimax",
            )
        else:  # qwen/glm/deepseek/yi/stablelm/phi ChatML families
            cfg = ToolConfig()
        if parser_override:
            cfg = replace(cfg, strategy=parser_override)
        return cfg

    def with_tokenizer(self, tokenizer) -> "ToolConfig":
        """Discover dedicated marker/think token ids from the tokenizer
        (reference special_tokens.rs candidate_token_id: a candidate counts
        only if it encodes to exactly one token of itself)."""

        def single_id(text: str) -> Optional[int]:
            try:
                enc = tokenizer.encode(text)
            except Exception:
                return None
            ids = enc.ids if hasattr(enc, "ids") else enc
            toks = enc.tokens if hasattr(enc, "tokens") else None
            if len(ids) == 1 and (toks is None or toks[0] == text):
                return int(ids[0])
            return None

        start_ids = {i for i in (single_id(self.tool_start),) if i is not None}
        end_ids = {
            i
            for m in self.tool_ends
            for i in (single_id(m),)
            if i is not None
        }
        # Discover think markers as PAIRS: a pair is usable when its start
        # exists as a dedicated token (the end may still be detected as
        # text); reasoning_effort grammars additionally require BOTH as
        # dedicated tokens (reference server/mod.rs:443-462).
        alt_starts: List[str] = []
        alt_ends: List[str] = []
        reasoning = None
        for ts, te in _THINK_MARKER_PAIRS:
            sid = single_id(ts)
            if sid is None:
                continue
            eid = single_id(te)
            if reasoning is None and eid is not None:
                reasoning = (ts, te)
            if ts not in self.think_starts:
                alt_starts.append(ts)
                alt_ends.append(te)
        return replace(
            self,
            start_token_ids=frozenset(start_ids),
            end_token_ids=frozenset(end_ids),
            alt_think_starts=tuple(alt_starts),
            alt_think_ends=tuple(alt_ends),
            reasoning_markers=reasoning,
        )


@dataclass
class ToolCall:
    name: str
    arguments: str  # JSON string (OpenAI convention)
    id: str = ""


def _new_id() -> str:
    return f"call_{uuid.uuid4().hex[:16]}"


Event = Tuple[str, object]  # ("content"|"reasoning"|"tool_call", payload)


# ---------------------------------------------------------------------------
# body parsers (reference: external tool-parser crate strategies)
# ---------------------------------------------------------------------------


def repair_json(raw: str) -> Optional[str]:
    """Close an unterminated string and balance open brackets/braces so a
    truncated tool-call body still parses (reference
    repair_streamed_json_arguments, parser.rs; helpers.rs:247-314). Only
    structural tokens are appended — content is never altered."""
    stack = []
    in_str = False
    esc = False
    for ch in raw:
        if in_str:
            if esc:
                esc = False
            elif ch == "\\":
                esc = True
            elif ch == '"':
                in_str = False
            continue
        if ch == '"':
            in_str = True
        elif ch in "{[":
            stack.append("}" if ch == "{" else "]")
        elif ch in "}]":
            if stack and stack[-1] == ch:
                stack.pop()
            else:
                return None  # structurally broken beyond repair
    fixed = raw
    if esc:
        fixed = fixed[:-1]
    if in_str:
        fixed += '"'
    fixed += "".join(reversed(stack))
    try:
        json.loads(fixed)
        return fixed
    except json.JSONDecodeError:
        return None


def _call_from_obj(obj) -> Optional[ToolCall]:
    if not isinstance(obj, dict):
        return None
    name = obj.get("name") or (obj.get("function") or {}).get("name")
    if not name:
        return None
    args = obj.get("arguments", obj.get("parameters", {}))
    if isinstance(obj.get("function"), dict) and "arguments" in obj["function"]:
        args = obj["function"]["arguments"]
    if not isinstance(args, str):
        args = json.dumps(args)
    else:
        # arguments given as a JSON-encoded string: keep as-is if valid
        try:
            json.loads(args)
        except json.JSONDecodeError:
            rep = repair_json(args)
            if rep is None:
                return None
            args = rep
    return ToolCall(name=str(name), arguments=args, id=_new_id())


def _iter_json_values(text: str):
    """Yield successive top-level JSON values in text (objects/arrays),
    skipping separators (whitespace, commas, semicolons, newlines) — covers
    llama3's semicolon-separated multi-call bodies."""
    dec = json.JSONDecoder()
    i = 0
    n = len(text)
    while i < n:
        while i < n and text[i] in " \t\r\n,;":
            i += 1
        if i >= n:
            return
        try:
            val, end = dec.raw_decode(text, i)
        except json.JSONDecodeError:
            return
        yield val
        i = end


def parse_json_calls(body: str, *, repair: bool = False) -> Optional[List[ToolCall]]:
    """JSON bodies: one object, an array of objects, or several objects
    separated by newlines/semicolons (llama3)."""
    body = body.strip()
    if not body:
        return None
    vals = list(_iter_json_values(body))
    if not vals and repair:
        fixed = repair_json(body)
        if fixed is not None:
            vals = list(_iter_json_values(fixed))
    if not vals:
        return None
    calls: List[ToolCall] = []
    for v in vals:
        items = v if isinstance(v, list) else [v]
        for it in items:
            c = _call_from_obj(it)
            if c is None:
                return None
            calls.append(c)
    return calls or None


def _literal(node: ast.expr):
    try:
        return ast.literal_eval(node)
    except (ValueError, SyntaxError):
        raise ValueError("non-literal argument")


def parse_pythonic_calls(body: str) -> Optional[List[ToolCall]]:
    """Llama4 pythonic format: `[f(a="x"), g(n=5)]` or a bare call, names
    possibly dotted (llama3 builtins: `brave_search.call(query=...)`).
    Parsed with the ast module — no regex fragility."""
    body = body.strip().rstrip(";")
    if not body:
        return None
    try:
        tree = ast.parse(body, mode="eval")
    except SyntaxError:
        return None
    node = tree.body
    call_nodes = []
    if isinstance(node, (ast.List, ast.Tuple)):
        call_nodes = node.elts
    else:
        call_nodes = [node]
    calls: List[ToolCall] = []
    for cn in call_nodes:
        if not isinstance(cn, ast.Call):
            return None
        fn = cn.func
        parts = []
        while isinstance(fn, ast.Attribute):
            parts.append(fn.attr)
            fn = fn.value
        if not isinstance(fn, ast.Name):
            return None
        parts.append(fn.id)
        name = ".".join(reversed(parts))
        args: Dict[str, object] = {}
        try:
            for kw in cn.keywords:
                if kw.arg is None:
                    return None
                args[kw.arg] = _literal(kw.value)
            if cn.args:  # positional args only for single-arg builtins
                if len(cn.args) == 1 and not cn.keywords:
                    args["query"] = _literal(cn.args[0])
                else:
                    return None
        except ValueError:
            return None
        calls.append(ToolCall(name=name, arguments=json.dumps(args), id=_new_id()))
    return calls or None


def _loose_value(raw: str):
    """Parse a bare parameter value: JSON first, then python-ish literals,
    else the raw string (reference helpers.rs parse_loose_value +
    gemma4_parse_bare_value case-insensitivity)."""
    s = raw.strip()
    low = s.lower()
    if low == "true":
        return True
    if low == "false":
        return False
    if low in ("null", "none"):
        return None
    try:
        return json.loads(s)
    except json.JSONDecodeError:
        pass
    return s


_QWEN_FN_RE = re.compile(r"<function=([^>\n]+)>")
_QWEN_PARAM_RE = re.compile(r"<parameter=([^>\n]+)>")


def parse_qwen_xml_calls(body: str, *, allow_unclosed_tail: bool = False) -> Optional[List[ToolCall]]:
    """Qwen3-Coder XML envelope:
    <function=NAME>\n<parameter=KEY>\nVALUE\n</parameter>...</function>
    Values strip exactly one leading/trailing newline. With
    allow_unclosed_tail (end-of-stream recovery) the final parameter may
    miss its </parameter> (parser.rs
    test_finalize_recovers_unclosed_xml_parameter_content)."""
    calls: List[ToolCall] = []
    pos = 0
    while True:
        m = _QWEN_FN_RE.search(body, pos)
        if m is None:
            break
        name = m.group(1).strip()
        end_fn = body.find("</function>", m.end())
        seg_end = end_fn if end_fn != -1 else len(body)
        if end_fn == -1 and not allow_unclosed_tail:
            return None
        seg = body[m.end():seg_end]
        args: Dict[str, object] = {}
        ppos = 0
        while True:
            pm = _QWEN_PARAM_RE.search(seg, ppos)
            if pm is None:
                break
            key = pm.group(1).strip()
            close = seg.find("</parameter>", pm.end())
            if close == -1:
                if not allow_unclosed_tail:
                    return None
                val = seg[pm.end():]
                ppos = len(seg)
            else:
                val = seg[pm.end():close]
                ppos = close + len("</parameter>")
            val = val[1:] if val.startswith("\n") else val
            val = val[:-1] if val.endswith("\n") else val
            args[key] = _loose_value(val) if not _looks_texty(val) else val
        calls.append(ToolCall(name=name, arguments=json.dumps(args), id=_new_id()))
        pos = seg_end + (len("</function>") if end_fn != -1 else 0)
    return calls or None


def _looks_texty(val: str) -> bool:
    """Multi-line values are content, not literals — don't coerce."""
    return "\n" in val.strip()


_GLM_PAIR_RE = re.compile(r"<arg_key>(.*?)</arg_key>\s*<arg_value>(.*?)</arg_value>", re.S)


def parse_glm_xml_calls(body: str) -> Optional[List[ToolCall]]:
    """GLM4.7 format: NAME<arg_key>K</arg_key><arg_value>V</arg_value>...
    (parser.rs test_envelope_glm47_xml_format)."""
    first = body.find("<arg_key>")
    if first == -1:
        return None
    name = body[:first].strip()
    if not name or any(c in name for c in "<>{}"):
        return None
    # reject unbalanced key/value tags
    if body.count("<arg_key>") != body.count("</arg_key>") or body.count(
        "<arg_value>"
    ) != body.count("</arg_value>"):
        return None
    args: Dict[str, object] = {}
    for k, v in _GLM_PAIR_RE.findall(body):
        args[k.strip()] = _loose_value(v)
    if not args:
        return None
    return [ToolCall(name=name, arguments=json.dumps(args), id=_new_id())]


_MM_INVOKE_RE = re.compile(r"""<invoke\s+name=(['"])(.*?)\1\s*>""")
_MM_PARAM_RE = re.compile(r"""<parameter\s+name=(['"])(.*?)\1\s*>""")


def parse_minimax_xml_calls(body: str) -> Optional[List[ToolCall]]:
    """MiniMax envelope: <invoke name="X"><parameter name="K">V</parameter>
    ...</invoke>, possibly several invokes (parser.rs:155-255)."""
    calls: List[ToolCall] = []
    pos = 0
    while True:
        m = _MM_INVOKE_RE.search(body, pos)
        if m is None:
            break
        name = m.group(2)
        end_inv = body.find("</invoke>", m.end())
        seg_end = end_inv if end_inv != -1 else len(body)
        seg = body[m.end():seg_end]
        args: Dict[str, object] = {}
        ppos = 0
        while True:
            pm = _MM_PARAM_RE.search(seg, ppos)
            if pm is None:
                break
            close = seg.find("</parameter>", pm.end())
            if close == -1:
                val = seg[pm.end():]
                ppos = len(seg)
            else:
                val = seg[pm.end():close]
                ppos = close + len("</parameter>")
            args[pm.group(2)] = _loose_value(val)
        calls.append(ToolCall(name=name, arguments=json.dumps(args), id=_new_id()))
        pos = seg_end + (len("</invoke>") if end_inv != -1 else 0)
    return calls or None


_GEMMA4_RE = re.compile(r"call:\s*([\w.\-]+)\s*\{(.*)\}", re.S)


def parse_gemma4_calls(body: str) -> Optional[List[ToolCall]]:
    """Gemma4: call:NAME{key:<|"|>string<|"|>,count:5} — strings quoted
    with the <|"|> pseudo-token, bare values case-insensitive
    (parser.rs test_gemma4_tool_call_parse)."""
    m = _GEMMA4_RE.search(body)
    if m is None:
        return None
    name, inner = m.group(1), m.group(2)
    args: Dict[str, object] = {}
    # split on commas not inside <|"|> quotes
    Q = '<|"|>'
    parts: List[str] = []
    cur = ""
    in_q = False
    i = 0
    while i < len(inner):
        if inner.startswith(Q, i):
            in_q = not in_q
            cur += Q
            i += len(Q)
            continue
        c = inner[i]
        if c == "," and not in_q:
            parts.append(cur)
            cur = ""
        else:
            cur += c
        i += 1
    if cur.strip():
        parts.append(cur)
    for part in parts:
        if ":" not in part:
            return None
        k, v = part.split(":", 1)
        v = v.strip()
        if v.startswith(Q) and v.endswith(Q):
            args[k.strip()] = v[len(Q):-len(Q)]
        else:
            args[k.strip()] = _loose_value(v)
    return [ToolCall(name=name, arguments=json.dumps(args), id=_new_id())]


_STRATEGY_CHAINS: Dict[str, Tuple] = {
    # ordered fallback chains per strategy
    "json": (parse_json_calls,),
    "pythonic": (parse_pythonic_calls, parse_json_calls),
    "llama": (parse_json_calls, parse_pythonic_calls),
    "mistral": (parse_json_calls,),
    "gemma": (parse_json_calls, parse_pythonic_calls, parse_gemma4_calls),
    "gemma4": (parse_gemma4_calls, parse_json_calls),
    "minimax": (parse_minimax_xml_calls,),
    "auto": (
        parse_json_calls,
        parse_qwen_xml_calls,
        parse_glm_xml_calls,
        parse_minimax_xml_calls,
        parse_pythonic_calls,
    ),
}


def parse_tool_body(body: str, strategy: str, *, repair: bool = False) -> Optional[List[ToolCall]]:
    """Run the strategy's parser chain over a complete buffered body."""
    chain = _STRATEGY_CHAINS.get(strategy, _STRATEGY_CHAINS["auto"])
    for fn in chain:
        if fn is parse_json_calls:
            calls = fn(body, repair=repair)
        elif fn is parse_qwen_xml_calls:
            calls = fn(body, allow_unclosed_tail=repair)
        else:
            calls = fn(body)
        if calls:
            return calls
    return None


def _envelope_incomplete(body: str, strategy: str) -> bool:
    """True when the body contains structured-envelope markers that are not
    yet balanced — i.e. an end marker we just saw is probably literal text
    inside a parameter value, so keep buffering (parser.rs
    test_fake_end_marker_inside_parameter_keeps_buffering)."""
    if strategy in ("auto", "json"):
        if "<function=" in body:
            open_params = len(_QWEN_PARAM_RE.findall(body))
            if open_params > body.count("</parameter>"):
                return True
            if body.count("<function=") > body.count("</function>"):
                # function block itself unclosed — could still be mid-body
                return open_params > body.count("</parameter>")
        if "<arg_key>" in body and body.count("<arg_value>") > body.count(
            "</arg_value>"
        ):
            return True
    if strategy == "minimax":
        if body.count("<invoke ") > body.count("</invoke>"):
            return True
    return False


# ---------------------------------------------------------------------------
# streaming state machine
# ---------------------------------------------------------------------------


class StreamParser:
    """Incremental parser: push decoded text (+ optional token id), receive
    routed events."""

    NORMAL, THINK, TOOL = range(3)

    def __init__(self, config: ToolConfig, *, in_think: bool = False):
        self.cfg = config
        self.state = self.THINK if in_think else self.NORMAL
        self.buf = ""
        self.tool_calls: List[ToolCall] = []
        self._tool_since: Optional[float] = None
        self._tool_search_from = 0  # skip past rejected end markers
        self._active_think_end: Optional[str] = None

    # -- helpers -------------------------------------------------------------

    def _split_holdback(self, text: str, markers: List[str]) -> Tuple[str, str]:
        """Split text into (emit, hold) where hold is the longest tail that
        is a proper prefix of any marker (might complete next push)."""
        max_hold = 0
        for m in markers:
            for k in range(min(len(m) - 1, len(text)), 0, -1):
                if text.endswith(m[:k]):
                    max_hold = max(max_hold, k)
                    break
        if max_hold:
            return text[:-max_hold], text[-max_hold:]
        return text, ""

    @property
    def _strict_ids(self) -> bool:
        return bool(self.cfg.start_token_ids)

    def _enter_tool(self, events: List[Event]) -> None:
        self.state = self.TOOL
        self._tool_since = time.time()
        self._tool_search_from = 0

    def timeout_flush(self) -> List[Event]:
        """Flush a stalled tool buffer as plain content. Safe to call from
        a timer — the reference only checked on the next token, so a
        stream that stalls INSIDE a tool block never flushed
        (server.rs:367-372 flushes on timeout)."""
        if (
            self.state == self.TOOL
            and self._tool_since is not None
            and time.time() - self._tool_since > _TOOL_BUFFER_TIMEOUT
        ):
            ev: List[Event] = [("content", self.cfg.tool_start + self.buf)]
            self.buf = ""
            self.state = self.NORMAL
            self._tool_since = None
            return ev
        return []

    # -- main push -----------------------------------------------------------

    def push(self, text: str, token_id: Optional[int] = None) -> List[Event]:
        events: List[Event] = list(self.timeout_flush())

        # token-id marker detection (strict mode: parser.rs
        # test_parser_token_id_strict_match — literal marker TEXT does not
        # trigger when dedicated marker tokens exist)
        if token_id is not None and self._strict_ids:
            if self.state != self.TOOL and token_id in self.cfg.start_token_ids:
                if self.buf:
                    key = "reasoning" if self.state == self.THINK else "content"
                    events.append((key, self.buf))
                    self.buf = ""
                self._enter_tool(events)
                return events
            if self.state == self.TOOL and token_id in self.cfg.end_token_ids:
                events.extend(self._finish_tool_body(self.buf))
                self.buf = ""
                self.state = self.NORMAL
                self._tool_since = None
                return events

        self.buf += text
        progress = True
        while progress:
            progress = False
            if self.state == self.NORMAL:
                progress = self._scan_normal(events)
            elif self.state == self.THINK:
                progress = self._scan_think(events)
            else:
                progress = self._scan_tool(events)
        return events

    def _scan_normal(self, events: List[Event]) -> bool:
        candidates = []
        if not self._strict_ids:
            candidates.append((self.cfg.tool_start, self.TOOL, None))
        # think_starts[i] pairs with think_ends[i] (equal length by
        # construction — default pair + discovered _THINK_MARKER_PAIRS)
        for ts, te in zip(self.cfg.think_starts, self.cfg.think_ends):
            candidates.append((ts, self.THINK, te))
        best = None
        for marker, next_state, te in candidates:
            idx = self.buf.find(marker)
            if idx != -1 and (best is None or idx < best[0]):
                best = (idx, marker, next_state, te)
        if best is not None:
            idx, marker, next_state, te = best
            if idx:
                events.append(("content", self.buf[:idx]))
            self.buf = self.buf[idx + len(marker):]
            if next_state == self.TOOL:
                self._enter_tool(events)
            else:
                self.state = self.THINK
                self._active_think_end = te
            return True
        holds = [m for m, _, _ in candidates]
        emit, hold = self._split_holdback(self.buf, holds)
        if emit:
            events.append(("content", emit))
        self.buf = hold
        return False

    def _scan_think(self, events: List[Event]) -> bool:
        ends = (
            (self._active_think_end,)
            if self._active_think_end
            else self.cfg.think_ends
        )
        best = None
        for marker in ends:
            idx = self.buf.find(marker)
            if idx != -1 and (best is None or idx < best[0]):
                best = (idx, marker)
        if best is not None:
            idx, marker = best
            if idx:
                events.append(("reasoning", self.buf[:idx]))
            self.buf = self.buf[idx + len(marker):]
            self.state = self.NORMAL
            self._active_think_end = None
            return True
        emit, hold = self._split_holdback(self.buf, list(ends))
        if emit:
            events.append(("reasoning", emit))
        self.buf = hold
        return False

    def _scan_tool(self, events: List[Event]) -> bool:
        if self.cfg.strategy == "mistral":
            return self._scan_tool_mistral(events)
        if self._strict_ids and self.cfg.end_token_ids:
            return False  # end detection is token-id driven
        best = None
        for marker in self.cfg.tool_ends:
            idx = self.buf.find(marker, self._tool_search_from)
            if idx != -1 and (best is None or idx < best[0]):
                best = (idx, marker)
        if best is None:
            return False
        idx, marker = best
        body = self.buf[:idx]
        if _envelope_incomplete(body, self.cfg.strategy):
            # end marker inside an unfinished parameter: keep buffering,
            # but never re-test this offset
            self._tool_search_from = idx + len(marker)
            return False
        calls = parse_tool_body(body, self.cfg.strategy)
        self.buf = self.buf[idx + len(marker):]
        self.state = self.NORMAL
        self._tool_since = None
        if calls:
            self.tool_calls.extend(calls)
            events.extend(("tool_call", c) for c in calls)
        else:  # false positive → flush raw (parser.rs:623)
            events.append(("content", self.cfg.tool_start + body + marker))
        return True

    def _scan_tool_mistral(self, events: List[Event]) -> bool:
        """[TOOL_CALLS] body is a JSON array/object — detect completion by
        balanced-JSON scan instead of a textual end marker."""
        s = self.buf.lstrip()
        if not s:
            return False
        end = _balanced_json_end(s)
        if end is None:
            return False
        lead = len(self.buf) - len(s)
        body = self.buf[: lead + end]
        calls = parse_tool_body(body, "mistral")
        self.buf = self.buf[lead + end:]
        self.state = self.NORMAL
        self._tool_since = None
        if calls:
            self.tool_calls.extend(calls)
            events.extend(("tool_call", c) for c in calls)
        else:
            events.append(("content", self.cfg.tool_start + body))
        return True

    def _finish_tool_body(self, body: str) -> List[Event]:
        calls = parse_tool_body(body, self.cfg.strategy, repair=True)
        if calls:
            self.tool_calls.extend(calls)
            return [("tool_call", c) for c in calls]
        return [("content", self.cfg.tool_start + body)]

    def finish(self) -> List[Event]:
        """Flush at stream end; a truncated tool body goes through the
        repair chain (parser.rs finalize_buffered_tool_calls)."""
        events: List[Event] = []
        if self.buf or self.state == self.TOOL:
            if self.state == self.TOOL:
                events.extend(self._finish_tool_body(self.buf))
            elif self.state == self.THINK:
                if self.buf:
                    events.append(("reasoning", self.buf))
            elif self.buf:
                events.append(("content", self.buf))
            self.buf = ""
            self.state = self.NORMAL
        return events


def _balanced_json_end(s: str) -> Optional[int]:
    """Index one past the end of the first balanced JSON array/object in s,
    or None if incomplete. String/escape aware."""
    if not s or s[0] not in "[{":
        # bare object list without brackets: try a raw_decode
        try:
            _, end = json.JSONDecoder().raw_decode(s)
            return end
        except json.JSONDecodeError:
            return None
    depth = 0
    in_str = False
    esc = False
    for i, ch in enumerate(s):
        if in_str:
            if esc:
                esc = False
            elif ch == "\\":
                esc = True
            elif ch == '"':
                in_str = False
            continue
        if ch == '"':
            in_str = True
        elif ch in "[{":
            depth += 1
        elif ch in "]}":
            depth -= 1
            if depth == 0:
                return i + 1
    return None
