"""Stream tool-call / reasoning parser + chat template tests."""

import pytest

from vllm_rs_tpu.server.tool_parser import StreamParser, ToolConfig
from vllm_rs_tpu.utils.chat_template import ChatTemplate


def collect(parser, pieces):
    events = []
    for p in pieces:
        events += parser.push(p)
    events += parser.finish()
    return events


class TestStreamParser:
    def test_plain_content(self):
        p = StreamParser(ToolConfig())
        ev = collect(p, ["hello ", "world"])
        assert ev == [("content", "hello "), ("content", "world")]

    def test_tool_call_split_across_pushes(self):
        p = StreamParser(ToolConfig())
        ev = collect(
            p,
            ["before <tool", '_call>{"name": "get_w', 'eather", "arguments": '
             '{"city": "SF"}}</tool_call> after'],
        )
        kinds = [k for k, _ in ev]
        assert kinds == ["content", "tool_call", "content"]
        tc = ev[1][1]
        assert tc.name == "get_weather"
        assert '"city"' in tc.arguments
        assert ev[0][1] == "before "
        assert ev[2][1] == " after"

    def test_false_positive_flush(self):
        p = StreamParser(ToolConfig())
        ev = collect(p, ["<tool_call>not json at all</tool_call>"])
        assert ev == [("content", "<tool_call>not json at all</tool_call>")]

    def test_reasoning_routing(self):
        p = StreamParser(ToolConfig())
        ev = collect(p, ["<think>thinking hard</think>answer"])
        assert ("reasoning", "thinking hard") in ev
        assert ev[-1] == ("content", "answer")

    def test_prefilled_think(self):
        # template already opened <think> (parser.rs:662-694)
        p = StreamParser(ToolConfig(), in_think=True)
        ev = collect(p, ["still thinking</think>done"])
        assert ev[0] == ("reasoning", "still thinking")
        assert ev[-1] == ("content", "done")

    def test_marker_prefix_heldback_then_released(self):
        p = StreamParser(ToolConfig())
        ev = p.push("text <to")
        assert ev == [("content", "text ")]  # "<to" held back
        ev = p.push("ken")  # not a marker after all
        assert ev == [("content", "<token")]

    def test_llama3_markers(self):
        cfg = ToolConfig.for_model_type("llama")
        p = StreamParser(cfg)
        ev = collect(p, ['<|python_tag|>{"name": "f", "arguments": {}}<|eom_id|>'])
        assert ev[0][0] == "tool_call"
        assert ev[0][1].name == "f"

    def test_multiple_tool_calls(self):
        p = StreamParser(ToolConfig())
        ev = collect(
            p,
            ['<tool_call>{"name": "a", "arguments": {}}</tool_call>'
             '<tool_call>{"name": "b", "arguments": {}}</tool_call>'],
        )
        assert [e[1].name for e in ev if e[0] == "tool_call"] == ["a", "b"]


class TestChatTemplate:
    MSGS = [
        {"role": "system", "content": "be brief"},
        {"role": "user", "content": "hi"},
    ]

    def test_chatml_default(self):
        t = ChatTemplate(model_type="qwen3")
        out = t.render(self.MSGS)
        assert "<|im_start|>system\nbe brief<|im_end|>" in out
        assert out.endswith("<|im_start|>assistant\n")

    def test_llama3_default(self):
        t = ChatTemplate(model_type="llama")
        out = t.render(self.MSGS)
        assert "<|start_header_id|>user<|end_header_id|>" in out
        assert out.endswith("<|start_header_id|>assistant<|end_header_id|>\n\n")

    def test_gemma_role_mapping(self):
        t = ChatTemplate(model_type="gemma3")
        out = t.render(
            [{"role": "user", "content": "q"}, {"role": "assistant", "content": "a"}],
            add_generation_prompt=True,
        )
        assert "<start_of_turn>model\na<end_of_turn>" in out

    def test_custom_hf_template(self):
        src = "{% for m in messages %}{{ m['role'] }}:{{ m['content'] }};{% endfor %}"
        t = ChatTemplate(src)
        assert t.render(self.MSGS) == "system:be brief;user:hi;"

    def test_raise_exception_helper(self):
        import jinja2

        t = ChatTemplate("{{ raise_exception('boom') }}")
        with pytest.raises(jinja2.exceptions.TemplateError):
            t.render([])
