"""Round-2 guidance depth: recursive json_schema compilation, the lark
grammar kind, reasoning-effort think budgets, and schema-constrained tool
arguments (reference guidance.rs:57-130, utils/reasoning.rs,
server/mod.rs:415-462, tools/schema.rs)."""

import json

import pytest

from vllm_rs_tpu.utils.guidance import (
    GrammarError,
    GuidanceState,
    SchemaCompileError,
    TokenTrie,
    build_constraint,
    build_reasoning_automaton,
    compile_lark,
    schema_to_automaton,
    wrap_with_reasoning,
)


def accepts(auto, text: str) -> bool:
    st = auto.initial()
    for ch in text:
        st = auto.step(st, ch)
        if st is None:
            return False
    return auto.is_accepting(st)


class TestNestedSchema:
    def test_nested_object_round_trip(self):
        schema = {
            "type": "object",
            "properties": {
                "user": {
                    "type": "object",
                    "properties": {
                        "name": {"type": "string"},
                        "age": {"type": "integer"},
                    },
                    "required": ["name"],
                },
                "tags": {"type": "array", "items": {"type": "string"}},
            },
            "required": ["user"],
        }
        a = schema_to_automaton(schema)
        good = {"user": {"name": "ada", "age": 36}, "tags": ["x", "y"]}
        assert accepts(a, json.dumps(good))
        # properties emitted in declared order, optional ones droppable
        assert accepts(a, '{"user": {"name": "b"}}')
        # missing required inner property
        assert not accepts(a, '{"user": {"age": 3}}')
        # wrong type in nested array
        assert not accepts(a, '{"user": {"name": "a"}, "tags": [1]}')
        # unknown top-level property
        assert not accepts(a, '{"user": {"name": "a"}, "zz": 1}')

    def test_array_of_objects_with_bounds(self):
        schema = {
            "type": "array",
            "items": {
                "type": "object",
                "properties": {"id": {"type": "integer"}},
                "required": ["id"],
            },
            "minItems": 1,
            "maxItems": 2,
        }
        a = schema_to_automaton(schema)
        assert accepts(a, '[{"id": 1}]')
        assert accepts(a, '[{"id": 1}, {"id": 2}]')
        assert not accepts(a, "[]")
        assert not accepts(a, '[{"id": 1}, {"id": 2}, {"id": 3}]')

    def test_enum_const_anyof(self):
        a = schema_to_automaton(
            {
                "anyOf": [
                    {"enum": ["red", "green"]},
                    {"const": 42},
                    {"type": "null"},
                ]
            }
        )
        for ok in ('"red"', '"green"', "42", "null"):
            assert accepts(a, ok), ok
        for bad in ('"blue"', "43"):
            assert not accepts(a, bad), bad

    def test_recursive_ref(self):
        # a classic linked-list/tree schema exercising recursive $ref
        schema = {
            "$defs": {
                "node": {
                    "type": "object",
                    "properties": {
                        "v": {"type": "integer"},
                        "next": {
                            "anyOf": [{"$ref": "#/$defs/node"}, {"type": "null"}]
                        },
                    },
                    "required": ["v", "next"],
                }
            },
            "$ref": "#/$defs/node",
        }
        a = schema_to_automaton(schema)
        assert accepts(a, '{"v": 1, "next": {"v": 2, "next": null}}')
        assert not accepts(a, '{"v": 1}')

    def test_string_pattern_and_format(self):
        a = schema_to_automaton(
            {
                "type": "object",
                "properties": {
                    "when": {"type": "string", "format": "date"},
                    "code": {"type": "string", "pattern": "^[A-Z]{3}$"},
                },
                "required": ["when", "code"],
            }
        )
        assert accepts(a, '{"when": "2026-08-17", "code": "ABC"}')
        assert not accepts(a, '{"when": "not a date", "code": "ABC"}')
        assert not accepts(a, '{"when": "2026-08-17", "code": "abc"}')

    def test_additional_properties_schema(self):
        a = schema_to_automaton(
            {"type": "object", "additionalProperties": {"type": "integer"}}
        )
        assert accepts(a, '{"a": 1, "b": 2}')
        assert accepts(a, "{}")
        assert not accepts(a, '{"a": "x"}')

    def test_type_union(self):
        a = schema_to_automaton({"type": ["integer", "null"]})
        assert accepts(a, "7")
        assert accepts(a, "null")
        assert not accepts(a, '"7"')

    def test_unsupported_keyword_raises_with_path(self):
        with pytest.raises(SchemaCompileError) as e:
            schema_to_automaton(
                {
                    "type": "object",
                    "properties": {
                        "x": {"type": "array", "uniqueItems": True}
                    },
                }
            )
        assert "uniqueItems" in str(e.value)
        assert "#/properties/x" in str(e.value)

    def test_integer_range_enforced(self):
        """minimum/maximum on integers are honored — not silently dropped
        (the module contract: no silent degradation)."""
        a = schema_to_automaton({"type": "integer", "minimum": 0, "maximum": 10})
        for ok in ("0", "5", "10"):
            assert accepts(a, ok), ok
        for bad in ("-1", "11", "99999", "-42"):
            assert not accepts(a, bad), bad

    def test_integer_exclusive_bounds_and_multiple_of(self):
        a = schema_to_automaton(
            {
                "type": "integer",
                "exclusiveMinimum": 0,
                "exclusiveMaximum": 10,
                "multipleOf": 3,
            }
        )
        for ok in ("3", "6", "9"):
            assert accepts(a, ok), ok
        for bad in ("0", "10", "4"):
            assert not accepts(a, bad), bad

    def test_numeric_ranges_never_silently_dropped(self):
        # one-sided / huge integer ranges and bounds on 'number' raise
        with pytest.raises(SchemaCompileError):
            schema_to_automaton({"type": "integer", "minimum": 0})
        with pytest.raises(SchemaCompileError):
            schema_to_automaton(
                {"type": "integer", "minimum": 0, "maximum": 10**9}
            )
        with pytest.raises(SchemaCompileError):
            schema_to_automaton({"type": "number", "minimum": 0.5, "maximum": 2.0})

    def test_no_silent_degradation_via_build_constraint(self):
        # round-1 verdict weak #6: nested schemas must not silently fall
        # back to free-form JSON — unsupported now raises (→ HTTP 400)
        with pytest.raises(ValueError):
            build_constraint("json_schema", {"type": "object", "if": {}})

    def test_schema_constrained_token_filtering(self):
        """Drive a greedy walk through the token filter and check the
        produced text validates against the schema."""
        schema = {
            "type": "object",
            "properties": {
                "ok": {"type": "boolean"},
                "n": {"type": "integer"},
            },
            "required": ["ok", "n"],
        }
        vocab = [
            "{", "}", '"ok"', '"n"', ": ", ", ", "true", "false", "1", "23",
            "junk", '"no"',
        ]
        trie = TokenTrie({i: s for i, s in enumerate(vocab)})
        g = GuidanceState(schema_to_automaton(schema), trie, eos_ids=[99])
        text = ""
        for _ in range(32):
            allowed = g.allowed_tokens()
            assert allowed is not None and allowed, text
            if 99 in allowed:
                break
            tid = sorted(allowed)[0]
            g.advance(tid, vocab[tid])
            text += vocab[tid]
        assert g.is_complete, text
        doc = json.loads(text)
        assert set(doc) == {"ok", "n"}
        assert isinstance(doc["ok"], bool) and isinstance(doc["n"], int)


class TestGrammarKind:
    def test_basic_rules(self):
        g = compile_lark(
            """
start: greeting " " name
greeting: "hello" | "hi"
name: /[a-z]+/
"""
        )
        assert accepts(g, "hello world")
        assert accepts(g, "hi bob")
        assert not accepts(g, "hey bob")
        assert not accepts(g, "hello Bob")

    def test_quantifiers_and_recursion(self):
        g = compile_lark(
            """
start: "(" inner* ")"
inner: start | /[0-9]/
"""
        )
        assert accepts(g, "()")
        assert accepts(g, "(12(3)4)")
        assert not accepts(g, "(12(3)4")

    def test_token_id_refs(self):
        g = compile_lark(
            'start: <[5]> "x" <[6]>\n',
            token_decoder=lambda tid: {5: "<a>", 6: "</a>"}[tid],
        )
        assert accepts(g, "<a>x</a>")

    def test_undefined_rule_errors(self):
        with pytest.raises(GrammarError):
            compile_lark('start: nope "x"\n')

    def test_missing_start_errors(self):
        with pytest.raises(GrammarError):
            compile_lark('top: "x"\n')

    def test_grammar_via_build_constraint(self):
        a = build_constraint("grammar", 'start: "t1" | "t2"\n')
        assert accepts(a, "t1")
        assert not accepts(a, "t3")


class TestReasoningEffort:
    def test_none_returns_none(self):
        assert build_reasoning_automaton(None, "<think>", "</think>") is None
        assert build_reasoning_automaton("none", "<think>", "</think>") is None

    def test_low_budget(self):
        a = build_reasoning_automaton("low", "<think>", "</think>")
        assert accepts(a, "<think>\nshort thought\n</think>\n")
        # over ~300-char budget must die
        assert not accepts(a, "<think>\n" + "x" * 400 + "\n</think>\n")
        # empty thought not allowed (min 1 char)
        assert not accepts(a, "<think>\n\n</think>\n")

    def test_high_structured_phases(self):
        a = build_reasoning_automaton("high", "<think>", "</think>")
        text = (
            "<think>\n<ANALYZE>\nlooking\n</ANALYZE>\n"
            "<CRITIQUE>\nhmm\n</CRITIQUE>\n"
            "<STRUCTUREDANSWER>\nfine\n</STRUCTUREDANSWER>\n</think>\n"
        )
        assert accepts(a, text)
        assert not accepts(a, "<think>\nfreeform\n</think>\n")

    def test_wrap_composes_before_payload(self):
        from vllm_rs_tpu.utils.guidance import ChoiceAutomaton

        a = wrap_with_reasoning(
            ChoiceAutomaton(["yes", "no"]), "low", "<think>", "</think>"
        )
        assert accepts(a, "<think>\nbecause\n</think>\nyes")
        assert not accepts(a, "yes")  # reasoning block is mandatory
        assert not accepts(a, "<think>\nbecause\n</think>\nmaybe")

    def test_budget_override(self):
        a = build_reasoning_automaton(
            "medium", "<think>", "</think>", budget_chars=10
        )
        assert accepts(a, "<think>\n12345\n</think>\n")
        assert not accepts(a, "<think>\n" + "x" * 50 + "\n</think>\n")

    def test_guided_state_open_tail_unmasked(self):
        """After the think block closes with no base constraint, the tail is
        AnyText (open) — allowed_tokens() returns None (no mask)."""
        a = wrap_with_reasoning(None, "low", "<t>", "</t>")
        vocab = ["<t>", "</t>", "\n", "hi", "word"]
        trie = TokenTrie({i: s for i, s in enumerate(vocab)})
        g = GuidanceState(a, trie, eos_ids=[99])
        for tid in (0, 2, 3, 2, 1, 2):  # <t> \n hi \n </t> \n
            allowed = g.allowed_tokens()
            assert allowed is None or tid in allowed
            g.advance(tid, vocab[tid])
        assert g.allowed_tokens() is None  # open tail: unconstrained

    def test_mid_budget_universal_shares_mask(self):
        a = build_reasoning_automaton("medium", "<t>", "</t>")
        vocab = ["<t>", "</t>", "\n", "hi"]
        trie = TokenTrie({i: s for i, s in enumerate(vocab)})
        g = GuidanceState(a, trie, eos_ids=[99])
        for tid in (0, 2):
            g.advance(tid, vocab[tid])
        # deep inside the 1200-char budget, states bucket to one memo entry
        g.advance(3, "hi" * 8)
        k1 = a.mask_key(g.state)
        g.advance(3, "hi" * 8)
        assert a.mask_key(g.state) == k1


class TestServerWiring:
    def test_reasoning_dropped_without_tokenizer_markers(self):
        from vllm_rs_tpu.server.protocol import sampling_from_openai
        from vllm_rs_tpu.server.tool_parser import ToolConfig

        cfg = ToolConfig()  # no reasoning_markers discovered
        sp = sampling_from_openai(
            {"reasoning_effort": "high"}, tool_config=cfg
        )
        assert sp.reasoning_effort is None

    def test_reasoning_kept_with_markers(self):
        from dataclasses import replace

        from vllm_rs_tpu.server.protocol import sampling_from_openai
        from vllm_rs_tpu.server.tool_parser import ToolConfig

        cfg = replace(ToolConfig(), reasoning_markers=("<think>", "</think>"))
        sp = sampling_from_openai(
            {"reasoning_effort": "HIGH"}, tool_config=cfg
        )
        assert sp.reasoning_effort == "high"
        assert sp.think_markers == ("<think>", "</think>")

    def test_reasoning_effort_forces_thinking_prompt(self):
        """The reference's normalize_reasoning_controls sets
        params.thinking = Some(true): the grammar forces a think block, so
        an explicit enable_thinking=false must be overridden — the template
        and the constraint cannot contradict."""
        from dataclasses import replace

        from vllm_rs_tpu.server.protocol import sampling_from_openai
        from vllm_rs_tpu.server.tool_parser import ToolConfig

        cfg = replace(ToolConfig(), reasoning_markers=("<think>", "</think>"))
        body = {"reasoning_effort": "low", "enable_thinking": False}
        sp = sampling_from_openai(body, tool_config=cfg)
        assert sp.reasoning_effort == "low"
        assert body["enable_thinking"] is True
        # ... but without markers the effort is dropped AND thinking is
        # left alone
        body2 = {"reasoning_effort": "low", "enable_thinking": False}
        sampling_from_openai(body2, tool_config=ToolConfig())
        assert body2["enable_thinking"] is False

    def test_sampling_params_wire_round_trip(self):
        from vllm_rs_tpu.config import SamplingParams

        sp = SamplingParams(
            reasoning_effort="low",
            reasoning_budget=500,
            think_markers=("<think>", "</think>"),
        )
        sp2 = SamplingParams.from_dict(json.loads(json.dumps(sp.to_dict())))
        assert sp2.reasoning_effort == "low"
        assert sp2.reasoning_budget == 500
        assert sp2.think_markers == ("<think>", "</think>")

    def test_tool_args_schema_constrains_arguments(self):
        from vllm_rs_tpu.server.protocol import tool_call_constraint

        kind, spec = tool_call_constraint(
            [
                {
                    "type": "function",
                    "function": {
                        "name": "get_weather",
                        "parameters": {
                            "type": "object",
                            "properties": {"city": {"type": "string"}},
                            "required": ["city"],
                        },
                    },
                }
            ],
            "required",
        )
        a = build_constraint(kind, spec)
        good = '<tool_call>{"name": "get_weather", "arguments": {"city": "Oslo"}}</tool_call>'
        bad = '<tool_call>{"name": "get_weather", "arguments": {"zip": 1}}</tool_call>'
        assert accepts(a, good)
        assert not accepts(a, bad)

    def test_tool_args_unschema_still_any_json(self):
        from vllm_rs_tpu.server.protocol import tool_call_constraint

        kind, spec = tool_call_constraint(
            [{"type": "function", "function": {"name": "f", "parameters": {}}}],
            "required",
        )
        a = build_constraint(kind, spec)
        assert accepts(a, '<tool_call>{"name": "f", "arguments": {"x": [1]}}</tool_call>')


class TestServerEndToEnd:
    """HTTP-level checks against the tiny shared server fixture."""

    def test_unsupported_schema_rejected_400(self, tiny_server_url):
        import requests

        r = requests.post(
            f"{tiny_server_url}/v1/chat/completions",
            json={
                "model": "tiny-test",
                "messages": [{"role": "user", "content": "t5 t6"}],
                "max_tokens": 4,
                "structured_outputs": {
                    "json_schema": {"type": "object", "if": {}}
                },
            },
            timeout=60,
        )
        assert r.status_code == 400
        assert "unsupported json_schema" in json.dumps(r.json())

    def test_grammar_constrained_generation(self, tiny_server_url):
        import requests

        r = requests.post(
            f"{tiny_server_url}/v1/chat/completions",
            json={
                "model": "tiny-test",
                "messages": [{"role": "user", "content": "t5 t6"}],
                "max_tokens": 4,
                "temperature": 0.0,
                "structured_outputs": {"grammar": 'start: "t7" | "t9"\n'},
            },
            timeout=120,
        )
        assert r.status_code == 200, r.text
        content = r.json()["choices"][0]["message"]["content"]
        # the toy word-level tokenizer renders EOS (t0) as text — only the
        # constrained payload matters
        assert content.split()[0] in ("t7", "t9"), content

    def test_bad_grammar_rejected_400(self, tiny_server_url):
        import requests

        r = requests.post(
            f"{tiny_server_url}/v1/chat/completions",
            json={
                "model": "tiny-test",
                "messages": [{"role": "user", "content": "t5"}],
                "max_tokens": 4,
                "structured_outputs": {"grammar": 'start: missing_rule\n'},
            },
            timeout=60,
        )
        assert r.status_code == 400


# reuse the HTTP fixture from test_server.py
from tests.test_server import server as tiny_server_url  # noqa: E402,F401
