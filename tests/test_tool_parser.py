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


class TestFamilyFormats:
    """Per-family body-format matrix (fixtures transcribed from the
    reference's parser.rs tests — formats, not code)."""

    def test_llama4_pythonic_single(self):
        cfg = ToolConfig.for_model_type("llama4")
        p = StreamParser(cfg)
        ev = collect(
            p,
            ['<|python_start|>[get_weather(location="Vancouver", '
             'units="celsius")]<|eom|>'],
        )
        calls = [e[1] for e in ev if e[0] == "tool_call"]
        assert len(calls) == 1 and calls[0].name == "get_weather"
        import json

        args = json.loads(calls[0].arguments)
        assert args == {"location": "Vancouver", "units": "celsius"}

    def test_llama4_pythonic_multiple(self):
        cfg = ToolConfig.for_model_type("llama4")
        p = StreamParser(cfg)
        ev = collect(
            p,
            ['<|python_start|>[get_weather(location="Vancouver"), '
             'calculate_route(start="Boston", end="New York")]<|eot|>'],
        )
        names = [e[1].name for e in ev if e[0] == "tool_call"]
        assert names == ["get_weather", "calculate_route"]

    def test_llama3_dotted_pythonic_builtin(self):
        cfg = ToolConfig.for_model_type("llama")
        p = StreamParser(cfg)
        ev = collect(
            p, ['<|python_tag|>brave_search.call(query="current GDP")<|eom_id|>']
        )
        calls = [e[1] for e in ev if e[0] == "tool_call"]
        assert calls and calls[0].name == "brave_search.call"

    def test_llama3_semicolon_separated_json(self):
        cfg = ToolConfig.for_model_type("llama")
        p = StreamParser(cfg)
        ev = collect(
            p,
            ['<|python_tag|>{"name": "a", "parameters": {"x": 1}}; '
             '{"name": "b", "parameters": {}}<|eom_id|>'],
        )
        names = [e[1].name for e in ev if e[0] == "tool_call"]
        assert names == ["a", "b"]

    def test_mistral_array_balanced_end(self):
        """[TOOL_CALLS] body is a JSON array whose own `]` is the end —
        nested brackets inside arguments must not end it early."""
        cfg = ToolConfig.for_model_type("mistral")
        p = StreamParser(cfg)
        ev = collect(
            p,
            ['before [TOOL_CALLS][{"name": "f", "arguments": '
             '{"ids": [1, 2, 3]}}] after'],
        )
        calls = [e[1] for e in ev if e[0] == "tool_call"]
        assert len(calls) == 1 and calls[0].name == "f"
        import json

        assert json.loads(calls[0].arguments)["ids"] == [1, 2, 3]
        assert [e[1] for e in ev if e[0] == "content"] == ["before ", " after"]

    def test_qwen_coder_xml_envelope(self):
        p = StreamParser(ToolConfig())  # auto strategy
        body = (
            "<tool_call>\n<function=Write>\n<parameter=file_path>\n/tmp/a.md\n"
            "</parameter>\n<parameter=content>\nline one\nline two\n"
            "</parameter>\n</function>\n</tool_call>"
        )
        ev = collect(p, [body])
        calls = [e[1] for e in ev if e[0] == "tool_call"]
        assert len(calls) == 1 and calls[0].name == "Write"
        import json

        args = json.loads(calls[0].arguments)
        assert args["file_path"] == "/tmp/a.md"
        assert args["content"] == "line one\nline two"

    def test_qwen_coder_fake_end_marker_inside_parameter(self):
        """An end marker inside an unfinished <parameter=> body must keep
        buffering until the real envelope closes."""
        p = StreamParser(ToolConfig())
        ev = p.push(
            "<tool_call>\n<function=Write>\n<parameter=content>\n"
            "docs mention `</tool_call>` literally\n"
        )
        assert ev == []  # still buffering
        ev = p.push("</parameter>\n</function>\n</tool_call>")
        calls = [e[1] for e in ev if e[0] == "tool_call"]
        assert len(calls) == 1
        import json

        assert "`</tool_call>` literally" in json.loads(calls[0].arguments)["content"]

    def test_glm47_arg_key_value(self):
        p = StreamParser(ToolConfig.for_model_type("glm4_moe_lite"))
        ev = collect(
            p,
            ["<tool_call>read<arg_key>filePath</arg_key>"
             "<arg_value>/tmp/test.rs</arg_value></tool_call>"],
        )
        calls = [e[1] for e in ev if e[0] == "tool_call"]
        assert len(calls) == 1 and calls[0].name == "read"
        import json

        assert json.loads(calls[0].arguments) == {"filePath": "/tmp/test.rs"}

    def test_minimax_xml_invoke(self):
        cfg = ToolConfig.for_model_type("minimax")
        p = StreamParser(cfg)
        ev = collect(
            p,
            ['<minimax:tool_call>\n<invoke name="search_web">\n'
             '<parameter name="query_tag">["technology"]</parameter>\n'
             '<parameter name="query_list">["OpenAI"]</parameter>\n'
             "</invoke>\n</minimax:tool_call>"],
        )
        calls = [e[1] for e in ev if e[0] == "tool_call"]
        assert len(calls) == 1 and calls[0].name == "search_web"
        import json

        args = json.loads(calls[0].arguments)
        assert args["query_tag"] == ["technology"]

    def test_gemma4_format(self):
        cfg = ToolConfig.for_model_type("gemma4")
        p = StreamParser(cfg)
        ev = collect(
            p,
            ['<|tool_call>call:search{query:<|"|>rust programming<|"|>,'
             "count:5}<tool_call|>"],
        )
        calls = [e[1] for e in ev if e[0] == "tool_call"]
        assert len(calls) == 1 and calls[0].name == "search"
        import json

        args = json.loads(calls[0].arguments)
        assert args == {"query": "rust programming", "count": 5}

    def test_gemma4_bare_values_case_insensitive(self):
        from vllm_rs_tpu.server.tool_parser import parse_gemma4_calls
        import json

        calls = parse_gemma4_calls("call:f{a:True,b:FALSE,c:None,d:42}")
        assert json.loads(calls[0].arguments) == {
            "a": True, "b": False, "c": None, "d": 42,
        }


class TestTokenIdStrict:
    def _cfg(self):
        return ToolConfig(
            start_token_ids=frozenset({151657}),
            end_token_ids=frozenset({151658}),
        )

    def test_token_id_triggers(self):
        p = StreamParser(self._cfg())
        ev = p.push("<tool_call>", token_id=151657)
        assert ev == []
        ev = p.push('{"name": "t", "arguments": {}}', token_id=5)
        assert ev == []
        ev = p.push("</tool_call>", token_id=151658)
        assert [e[0] for e in ev] == ["tool_call"]
        assert ev[0][1].name == "t"

    def test_literal_text_does_not_trigger_in_strict_mode(self):
        """parser.rs test_parser_token_id_strict_match: marker TEXT without
        the marker token id is plain content."""
        p = StreamParser(self._cfg())
        ev = p.push("<tool_call>", token_id=42)
        assert ("content", "<tool_call>") in ev

    def test_empty_text_marker_tokens_still_trigger(self):
        """Special marker tokens decode to EMPTY text under
        skip_special_tokens — the server must still push their ids, and the
        parser must act on a push whose text is empty."""
        p = StreamParser(self._cfg())
        assert p.push("", token_id=151657) == []
        assert p.push('{"name": "t", "arguments": {}}', token_id=5) == []
        ev = p.push("", token_id=151658)
        assert [e[0] for e in ev] == ["tool_call"]
        assert ev[0][1].name == "t"


class TestRepairAndFinalize:
    def test_truncated_json_recovered_at_eos(self):
        p = StreamParser(ToolConfig())
        p.push('<tool_call>{"name": "get_weather", "arguments": {"location": "NYC"')
        ev = p.finish()
        calls = [e[1] for e in ev if e[0] == "tool_call"]
        assert len(calls) == 1 and calls[0].name == "get_weather"
        import json

        assert json.loads(calls[0].arguments)["location"] == "NYC"

    def test_unclosed_xml_parameter_recovered_at_eos(self):
        p = StreamParser(ToolConfig())
        p.push(
            "<tool_call>\n<function=Write>\n<parameter=file_path>\n/tmp/a.md\n"
            "</parameter>\n<parameter=content>\n# Title\n"
        )
        ev = p.finish()
        calls = [e[1] for e in ev if e[0] == "tool_call"]
        assert len(calls) == 1 and calls[0].name == "Write"
        import json

        args = json.loads(calls[0].arguments)
        assert args["file_path"] == "/tmp/a.md"
        assert args["content"].strip() == "# Title"

    def test_unrecoverable_buffer_flushes_raw(self):
        p = StreamParser(ToolConfig())
        p.push("<tool_call>complete garbage ((( ")
        ev = p.finish()
        assert ev == [("content", "<tool_call>complete garbage ((( ")]

    def test_repair_json_balances_structural_tokens_only(self):
        from vllm_rs_tpu.server.tool_parser import repair_json
        import json

        raw = '{"file_path":"/tmp/a.rs","new_string":"fn a() { let x = vec![1,2,3]; }","replace_all":false'
        fixed = repair_json(raw)
        obj = json.loads(fixed)
        assert obj["new_string"] == "fn a() { let x = vec![1,2,3]; }"
        assert obj["replace_all"] is False

    def test_timeout_flush_via_timer(self, monkeypatch):
        import vllm_rs_tpu.server.tool_parser as tp

        p = StreamParser(ToolConfig())
        p.push("<tool_call>partial body")
        monkeypatch.setattr(tp, "_TOOL_BUFFER_TIMEOUT", -1.0)
        ev = p.timeout_flush()
        assert ev == [("content", "<tool_call>partial body")]
        assert p.state == p.NORMAL


class TestMarkerDiscovery:
    def test_with_tokenizer_discovers_single_token_markers(self):
        class FakeTok:
            table = {"<tool_call>": 7, "</tool_call>": 8, "<think>": 9,
                     "</think>": 10}

            def encode(self, s):
                class E:
                    pass

                e = E()
                if s in self.table:
                    e.ids = [self.table[s]]
                    e.tokens = [s]
                else:
                    e.ids = [1, 2]
                    e.tokens = list(s[:2])
                return e

        cfg = ToolConfig().with_tokenizer(FakeTok())
        assert cfg.start_token_ids == frozenset({7})
        assert cfg.end_token_ids == frozenset({8})

    def test_parser_override(self):
        cfg = ToolConfig.for_model_type("qwen3", parser_override="pythonic")
        assert cfg.strategy == "pythonic"

    def test_think_markers_discovered_as_pairs(self):
        """A discovered start must pair with ITS OWN end marker — never an
        unrelated end from an independently discovered list."""

        class FakeTok:
            # <reasoning> exists but </reasoning> does not; <internal> and
            # </internal> both exist
            table = {"<reasoning>": 20, "<internal>": 21, "</internal>": 22}

            def encode(self, s):
                class E:
                    pass

                e = E()
                if s in self.table:
                    e.ids = [self.table[s]]
                    e.tokens = [s]
                else:
                    e.ids = [1, 2]
                    e.tokens = list(s[:2])
                return e

        cfg = ToolConfig().with_tokenizer(FakeTok())
        pairs = dict(zip(cfg.think_starts, cfg.think_ends))
        assert pairs["<reasoning>"] == "</reasoning>"
        assert pairs["<internal>"] == "</internal>"
        # reasoning grammars need BOTH markers as dedicated tokens
        assert cfg.reasoning_markers == ("<internal>", "</internal>")
        # and the stream routes a <reasoning> block by its own end marker
        p = StreamParser(cfg)
        ev = p.push("<reasoning>deep thought</reasoning>done")
        assert ("reasoning", "deep thought") in ev
        assert ("content", "done") in ev


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


class TestToolChoiceSemantics:
    def test_openai_tool_choice_none_hides_tools(self):
        from vllm_rs_tpu.server.openai import _merged_tools

        class St:
            mcp = None

        tools = [{"type": "function", "function": {"name": "f", "parameters": {}}}]
        assert _merged_tools(St(), {"tools": tools}) == tools
        assert _merged_tools(St(), {"tools": tools, "tool_choice": "none"}) is None

    def test_validate_forced_name_retention(self):
        from vllm_rs_tpu.server.tool_parser import ToolCall
        from vllm_rs_tpu.server.tool_validate import (
            build_schema_map, validate_tool_calls,
        )

        tools = [
            {"type": "function", "function": {"name": "a", "parameters": {}}},
            {"type": "function", "function": {"name": "b", "parameters": {}}},
        ]
        calls = [ToolCall("a", "{}"), ToolCall("b", "{}")]
        valid, fb = validate_tool_calls(calls, build_schema_map(tools), "a")
        assert [c.name for c in valid] == ["a"]
        assert fb and "tool_choice" in fb[0]

    def test_validate_missing_required_and_unknown(self):
        from vllm_rs_tpu.server.tool_parser import ToolCall
        from vllm_rs_tpu.server.tool_validate import (
            build_schema_map, validate_tool_calls,
        )

        tools = [{"type": "function", "function": {
            "name": "get_weather",
            "parameters": {"type": "object",
                           "properties": {"location": {"type": "string"}},
                           "required": ["location"]},
        }}]
        smap = build_schema_map(tools)
        valid, fb = validate_tool_calls(
            [ToolCall("get_weather", "{}"), ToolCall("nope", "{}")], smap
        )
        assert valid == []
        assert any("missing required" in f for f in fb)
        assert any("Unknown tool" in f for f in fb)

    def test_validate_normalizes_keys_and_coerces_types(self):
        import json
        from vllm_rs_tpu.server.tool_parser import ToolCall
        from vllm_rs_tpu.server.tool_validate import (
            build_schema_map, validate_tool_calls,
        )

        tools = [{"type": "function", "function": {
            "name": "f",
            "parameters": {"type": "object",
                           "properties": {"file_path": {"type": "string"},
                                          "count": {"type": "integer"}},
                           "required": ["file_path"]},
        }}]
        calls = [ToolCall("f", json.dumps({"filePath": "/tmp/x", "count": "3"}))]
        valid, fb = validate_tool_calls(calls, build_schema_map(tools))
        assert not fb
        args = json.loads(valid[0].arguments)
        assert args == {"file_path": "/tmp/x", "count": 3}
