"""Chat template rendering (jinja2).

Counterpart of the reference's utils/chat_template.rs (minijinja pycompat
rendering with tool messages; SURVEY.md §2.6). Uses real jinja2 with the HF
sandbox-compatible helpers (`raise_exception`, `tojson`) so
tokenizer_config.json `chat_template` strings render unchanged. When a
checkpoint ships no template, a per-family default is used (the reference's
arch → default template map, utils/mod.rs:1753).
"""

from __future__ import annotations

import json
from typing import Any, Dict, List, Optional

import jinja2

# default templates per model family (ChatML is the dominant convention)
_CHATML = (
    "{% for message in messages %}"
    "{{ '<|im_start|>' + message['role'] + '\n' + message['content'] + '<|im_end|>' + '\n' }}"
    "{% endfor %}"
    "{% if add_generation_prompt %}{{ '<|im_start|>assistant\n' }}{% endif %}"
)

_LLAMA3 = (
    "{% for message in messages %}"
    "{{ '<|start_header_id|>' + message['role'] + '<|end_header_id|>\n\n' + message['content'] + '<|eot_id|>' }}"
    "{% endfor %}"
    "{% if add_generation_prompt %}{{ '<|start_header_id|>assistant<|end_header_id|>\n\n' }}{% endif %}"
)

_GEMMA = (
    "{% for message in messages %}"
    "{% set role = 'model' if message['role'] == 'assistant' else message['role'] %}"
    "{{ '<start_of_turn>' + role + '\n' + message['content'] + '<end_of_turn>\n' }}"
    "{% endfor %}"
    "{% if add_generation_prompt %}{{ '<start_of_turn>model\n' }}{% endif %}"
)

_DEFAULT_TEMPLATES = {
    "llama": _LLAMA3,
    "mistral": _LLAMA3,
    "qwen2": _CHATML,
    "qwen3": _CHATML,
    "qwen2_moe": _CHATML,
    "qwen3_moe": _CHATML,
    "glm4": _CHATML,
    "glm4_moe": _CHATML,
    "deepseek_v2": _CHATML,
    "deepseek_v3": _CHATML,
    "gemma": _GEMMA,
    "gemma2": _GEMMA,
    "gemma3": _GEMMA,
    "phi3": _CHATML,
    "minimax": _CHATML,
}


def _raise_exception(msg):
    raise jinja2.exceptions.TemplateError(msg)


def _strip_generation_assistant_header(suffix_text: str) -> str:
    """Drop the assistant-role header line from a generation-prompt suffix,
    keeping only what follows it (reference chat_template.rs:228-244)."""
    first_line, sep, remainder = suffix_text.partition("\n")
    if not sep:
        return suffix_text
    # ChatML/Qwen-style "<|im_start|>assistant", MiniMax "]~b]ai"
    if first_line.endswith("assistant") or "]~b]" in first_line or first_line.endswith("ai"):
        return remainder
    return suffix_text


class ChatTemplate:
    """Render OpenAI-style message lists into a model prompt string."""

    def __init__(
        self,
        template: Optional[str] = None,
        *,
        model_type: str = "llama",
        bos_token: str = "",
        eos_token: str = "",
    ):
        self.source = template or _DEFAULT_TEMPLATES.get(model_type, _CHATML)
        env = jinja2.Environment(
            loader=jinja2.BaseLoader(),
            trim_blocks=True,
            lstrip_blocks=True,
            extensions=["jinja2.ext.loopcontrols"],
        )
        env.globals["raise_exception"] = _raise_exception
        env.filters["tojson"] = lambda x, **kw: json.dumps(x, **kw)
        env.policies["json.dumps_kwargs"] = {"ensure_ascii": False, "sort_keys": False}
        self._template = env.from_string(self.source)
        self.bos_token = bos_token
        self.eos_token = eos_token

    @staticmethod
    def from_tokenizer_config(path: str, model_type: str = "llama") -> "ChatTemplate":
        """Load from a tokenizer_config.json if it carries a chat_template."""
        with open(path) as f:
            cfg = json.load(f)
        tpl = cfg.get("chat_template")
        if isinstance(tpl, list):  # multi-template configs: pick "default"
            tpl = next(
                (t["template"] for t in tpl if t.get("name") == "default"),
                tpl[0]["template"] if tpl else None,
            )

        def _tok(v):
            return v["content"] if isinstance(v, dict) else (v or "")

        return ChatTemplate(
            tpl,
            model_type=model_type,
            bos_token=_tok(cfg.get("bos_token")),
            eos_token=_tok(cfg.get("eos_token")),
        )

    def render(
        self,
        messages: List[Dict[str, Any]],
        *,
        add_generation_prompt: bool = True,
        tools: Optional[List[dict]] = None,
        **extra,
    ) -> str:
        return self._template.render(
            messages=messages,
            add_generation_prompt=add_generation_prompt,
            tools=tools,
            bos_token=self.bos_token,
            eos_token=self.eos_token,
            **extra,
        )

    def generation_prompt_replay_suffix(
        self,
        tools: Optional[List[dict]] = None,
        **extra,
    ) -> Optional[str]:
        """The text the template appends AFTER the assistant header when
        opening a generation — e.g. qwen3's "<think>\\n" (thinking) or
        "<think>\\n\\n</think>\\n\\n" (non-thinking). These chars live in the
        PROMPT but belong to the assistant's response: replaying them into
        the output keeps next-turn template re-renders token-identical with
        the served prompt+output (reference chat_template.rs:466-484)."""
        probe = [{"role": "user", "content": "__VLLM_RS_TPU_REPLAY_PROBE__"}]
        try:
            with_gen = self.render(probe, add_generation_prompt=True, tools=tools, **extra)
            without = self.render(probe, add_generation_prompt=False, tools=tools, **extra)
        except Exception:
            return None
        if not with_gen.startswith(without):
            return None
        suffix = _strip_generation_assistant_header(with_gen[len(without):])
        return suffix or None
