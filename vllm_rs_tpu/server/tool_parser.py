"""Streaming tool-call and reasoning-content parser.

Counterpart of the reference's server/parser.rs: per-model-family
ToolConfig (start/end tool markers, parser.rs:290-400), a buffering state
machine that holds back text that might be a marker prefix and flushes on
false positives (parser.rs:259-286, 623), and <think> reasoning-content
routing incl. prefilled-think detection (parser.rs:662-694).

Pure host-side string processing — one instance per streamed request.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

# reference VLLM_RS_TOOL_BUFFER_TIMEOUT_SECS (server.rs:367-372): a tool
# start marker without its end within this window flushes as plain content
# so a malformed generation cannot stall the stream
_TOOL_BUFFER_TIMEOUT = float(
    os.environ.get("VLLM_RS_TPU_TOOL_BUFFER_TIMEOUT_SECS", "30") or 30
)


@dataclass(frozen=True)
class ToolConfig:
    tool_start: str = "<tool_call>"
    tool_end: str = "</tool_call>"
    think_start: str = "<think>"
    think_end: str = "</think>"

    @staticmethod
    def for_model_type(model_type: str) -> "ToolConfig":
        if model_type.startswith("llama"):
            return ToolConfig(tool_start="<|python_tag|>", tool_end="<|eom_id|>")
        if model_type.startswith("mistral") or model_type.startswith("ministral"):
            return ToolConfig(tool_start="[TOOL_CALLS]", tool_end="[/TOOL_CALLS]")
        return ToolConfig()  # ChatML families (qwen/glm/deepseek/...)


@dataclass
class ToolCall:
    name: str
    arguments: str  # JSON string (OpenAI convention)
    id: str = ""


Event = Tuple[str, object]  # ("content"|"reasoning"|"tool_call", payload)


class StreamParser:
    """Incremental parser: push decoded text, receive routed events."""

    NORMAL, THINK, TOOL = range(3)

    def __init__(self, config: ToolConfig, *, in_think: bool = False):
        self.cfg = config
        self.state = self.THINK if in_think else self.NORMAL
        self.buf = ""
        self.tool_calls: List[ToolCall] = []
        self._tool_since: Optional[float] = None

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

    def push(self, text: str) -> List[Event]:
        self.buf += text
        events: List[Event] = []
        if (
            self.state == self.TOOL
            and self._tool_since is not None
            and time.time() - self._tool_since > _TOOL_BUFFER_TIMEOUT
        ):
            events.append(("content", self.cfg.tool_start + self.buf))
            self.buf = ""
            self.state = self.NORMAL
            self._tool_since = None
        progress = True
        while progress:
            progress = False
            if self.state == self.NORMAL:
                for marker, next_state in (
                    (self.cfg.tool_start, self.TOOL),
                    (self.cfg.think_start, self.THINK),
                ):
                    idx = self.buf.find(marker)
                    if idx != -1:
                        if idx:
                            events.append(("content", self.buf[:idx]))
                        self.buf = self.buf[idx + len(marker):]
                        self.state = next_state
                        if next_state == self.TOOL:
                            self._tool_since = time.time()
                        progress = True
                        break
                if not progress:
                    emit, hold = self._split_holdback(
                        self.buf, [self.cfg.tool_start, self.cfg.think_start]
                    )
                    if emit:
                        events.append(("content", emit))
                    self.buf = hold
            elif self.state == self.THINK:
                idx = self.buf.find(self.cfg.think_end)
                if idx != -1:
                    if idx:
                        events.append(("reasoning", self.buf[:idx]))
                    self.buf = self.buf[idx + len(self.cfg.think_end):]
                    self.state = self.NORMAL
                    progress = True
                else:
                    emit, hold = self._split_holdback(self.buf, [self.cfg.think_end])
                    if emit:
                        events.append(("reasoning", emit))
                    self.buf = hold
            else:  # TOOL: buffer whole body until end marker
                idx = self.buf.find(self.cfg.tool_end)
                if idx != -1:
                    body = self.buf[:idx]
                    self.buf = self.buf[idx + len(self.cfg.tool_end):]
                    self.state = self.NORMAL
                    tc = self._parse_tool(body)
                    if tc is not None:
                        self.tool_calls.append(tc)
                        events.append(("tool_call", tc))
                    else:  # false positive → flush raw (parser.rs:623)
                        events.append(
                            ("content", self.cfg.tool_start + body + self.cfg.tool_end)
                        )
                    progress = True
        return events

    def finish(self) -> List[Event]:
        """Flush any held-back text at stream end."""
        events: List[Event] = []
        if self.buf:
            if self.state == self.TOOL:
                tc = self._parse_tool(self.buf)
                if tc is not None:
                    self.tool_calls.append(tc)
                    events.append(("tool_call", tc))
                else:
                    events.append(("content", self.cfg.tool_start + self.buf))
            elif self.state == self.THINK:
                events.append(("reasoning", self.buf))
            else:
                events.append(("content", self.buf))
            self.buf = ""
        return events

    @staticmethod
    def _parse_tool(body: str) -> Optional[ToolCall]:
        """Parse a buffered tool body: JSON {"name": ..., "arguments": ...}."""
        import uuid

        try:
            obj = json.loads(body.strip())
        except json.JSONDecodeError:
            return None
        if not isinstance(obj, dict) or "name" not in obj:
            return None
        args = obj.get("arguments", obj.get("parameters", {}))
        if not isinstance(args, str):
            args = json.dumps(args)
        return ToolCall(
            name=str(obj["name"]),
            arguments=args,
            id=f"call_{uuid.uuid4().hex[:16]}",
        )
