"""Guided decoding: regex NFA, JSON PDA, schema compilation, e2e masks."""

import json

import jax
import numpy as np
import pytest

from vllm_rs_tpu.utils.guidance import (
    ChoiceAutomaton,
    JsonAutomaton,
    RegexAutomaton,
    TokenTrie,
    GuidanceState,
    _schema_to_regex,
    build_constraint,
)


def accepts(auto, text: str) -> bool:
    st = auto.initial()
    for ch in text:
        st = auto.step(st, ch)
        if st is None:
            return False
    return auto.is_accepting(st)


class TestRegex:
    @pytest.mark.parametrize(
        "pattern,good,bad",
        [
            ("abc", ["abc"], ["ab", "abcd", "abd"]),
            ("a*b", ["b", "ab", "aaab"], ["a", "ba"]),
            ("a+", ["a", "aa"], ["", "b"]),
            ("colou?r", ["color", "colour"], ["colouur"]),
            ("(cat|dog)s?", ["cat", "dogs"], ["cats?x", "cow"]),
            ("[a-c]{2,3}", ["ab", "abc"], ["a", "abcd", "xy"]),
            (r"\d{3}-\d{4}", ["555-1234"], ["5551234", "55-1234"]),
            (r"[^0-9]+", ["abc!"], ["a1"]),
            (r"-?\d+(\.\d+)?", ["42", "-3.14"], ["42.", "-", "1.2.3"]),
        ],
    )
    def test_patterns(self, pattern, good, bad):
        a = RegexAutomaton(pattern)
        for g in good:
            assert accepts(a, g), (pattern, g)
        for b in bad:
            assert not accepts(a, b), (pattern, b)


class TestJsonAutomaton:
    @pytest.mark.parametrize(
        "text",
        [
            "{}",
            "[]",
            '"hi"',
            "true",
            "null",
            "-3.5e2",
            '{"a": 1, "b": [true, null, "x"]}',
            '{"nested": {"deep": [1, 2, {"k": "v"}]}}',
            '  { "a" : 1 } ',
        ],
    )
    def test_valid(self, text):
        assert accepts(JsonAutomaton(), text), text

    @pytest.mark.parametrize(
        "text",
        ["{", "{]", '{"a"}', '{"a": }', "[1,]", "01", '"unterminated', "tru", "{} {}"],
    )
    def test_invalid(self, text):
        assert not accepts(JsonAutomaton(), text), text


class TestSchemaRegex:
    def test_flat_object(self):
        rx = _schema_to_regex(
            {
                "type": "object",
                "properties": {
                    "name": {"type": "string"},
                    "age": {"type": "integer"},
                    "ok": {"type": "boolean"},
                },
            }
        )
        a = RegexAutomaton(rx)
        assert accepts(a, '{"name": "bob", "age": 42, "ok": true}')
        assert not accepts(a, '{"name": 13, "age": 42, "ok": true}')
        assert not accepts(a, '{"age": 42}')  # missing/reordered keys

    def test_enum(self):
        rx = _schema_to_regex({"enum": ["red", "green"]})
        a = RegexAutomaton(rx)
        assert accepts(a, '"red"')
        assert not accepts(a, '"blue"')

    def test_array(self):
        rx = _schema_to_regex({"type": "array", "items": {"type": "integer"}})
        a = RegexAutomaton(rx)
        assert accepts(a, "[1, 2, 3]")
        assert accepts(a, "[]")
        assert not accepts(a, '["a"]')


class TestTokenFiltering:
    def _trie(self, strings):
        return TokenTrie({i: s for i, s in enumerate(strings)})

    def test_choice_filtering(self):
        trie = self._trie(["yes", "no", "y", "es", "maybe", "n"])
        g = GuidanceState(ChoiceAutomaton(["yes", "no"]), trie, eos_ids=[99])
        allowed = set(g.allowed_tokens())
        assert allowed == {0, 1, 2, 5}  # "yes","no","y","n"
        g.advance(2, "y")
        allowed = set(g.allowed_tokens())
        assert allowed == {3}  # only "es" completes "yes"
        g.advance(3, "es")
        assert g.is_complete
        assert 99 in g.allowed_tokens()  # EOS allowed at accept

    def test_regex_filtering(self):
        trie = self._trie(["1", "2", "a", "12", "1a"])
        g = GuidanceState(RegexAutomaton(r"\d+"), trie, eos_ids=[99])
        allowed = set(g.allowed_tokens())
        assert allowed == {0, 1, 3}  # digits only; "1a" dies at 'a'


class TestEndToEnd:
    def _engine(self):
        from tests.test_server import make_test_tokenizer
        from vllm_rs_tpu.config import (
            CacheConfig,
            EngineConfig,
            ModelConfig,
            SchedulerConfig,
        )
        from vllm_rs_tpu.core.engine import LLMEngine
        from vllm_rs_tpu.core.runner import ModelRunner
        from vllm_rs_tpu.models.llama import CausalLM

        cfg = ModelConfig(
            model_type="llama",
            hidden_size=64,
            intermediate_size=128,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            vocab_size=64,
            eos_token_ids=(0,),
        )
        ec = EngineConfig(
            model=cfg,
            cache=CacheConfig(block_size=4, num_blocks=64),
            scheduler=SchedulerConfig(
                max_num_seqs=4, chunk_size=16, max_model_len=64, prefill_buckets=(8, 16)
            ),
            prefill_buckets=(8, 16),
            decode_buckets=(4,),
        )
        m = CausalLM(cfg, block_size=4)
        params = m.init_params(jax.random.PRNGKey(0))
        return LLMEngine(
            ec, ModelRunner(m, params, ec), tokenizer=make_test_tokenizer(64)
        )

    def test_choice_constrained_generation(self):
        from vllm_rs_tpu.config import SamplingParams

        engine = self._engine()
        # constrain output to exactly the text "t7" or "t9" (single tokens
        # in the word-level test tokenizer)
        outs = engine.generate(
            [[5, 6]],
            SamplingParams(
                temperature=0.0,
                max_tokens=4,
                constraint=("choice", ["t7", "t9"]),
            ),
        )
        toks = outs[0].output_token_ids
        assert toks[0] in (7, 9)
        # after completing the choice only EOS is allowed
        assert toks[-1] == 0 or len(toks) == 1


class TestToolCallConstraint:
    def test_chain_accepts_valid_tool_call(self):
        from vllm_rs_tpu.utils.guidance import build_constraint

        a = build_constraint("tool_call", ("get_weather", "search"))
        text = '<tool_call>{"name": "search", "arguments": {"q": "x"}}</tool_call>'
        st = a.initial()
        for ch in text:
            st = a.step(st, ch)
            assert st is not None, ch
        assert a.is_accepting(st)

    def test_chain_rejects_unknown_name(self):
        from vllm_rs_tpu.utils.guidance import build_constraint

        a = build_constraint("tool_call", ("get_weather",))
        st = a.initial()
        dead = False
        for ch in '<tool_call>{"name": "hack"':
            st = a.step(st, ch)
            if st is None:
                dead = True
                break
        assert dead

    def test_sampling_params_from_tool_choice(self):
        from vllm_rs_tpu.server.protocol import sampling_from_openai

        body = {
            "tools": [
                {"type": "function", "function": {"name": "f1", "parameters": {}}}
            ],
            "tool_choice": "required",
        }
        sp = sampling_from_openai(body)
        assert sp.constraint == ("tool_call", {"names": ("f1",)})
        body["tool_choice"] = "auto"
        assert sampling_from_openai(body).constraint is None


class TestFamilyAwareToolConstraint:
    def test_forced_output_matches_family_parser(self):
        """The forced-call grammar must emit the model family's own
        markers so its StreamParser recognizes the result."""
        from vllm_rs_tpu.server.protocol import tool_call_constraint
        from vllm_rs_tpu.server.tool_parser import StreamParser, ToolConfig
        from vllm_rs_tpu.utils.guidance import build_constraint

        for family in ("llama", "qwen3", "mistral"):
            cfg = ToolConfig.for_model_type(family)
            kind, spec = tool_call_constraint(
                [{"type": "function", "function": {"name": "f", "parameters": {}}}],
                "required",
                cfg,
            )
            auto = build_constraint(kind, spec)
            # walk the automaton along a representative forced emission
            if spec.get("style") == "mistral":
                emission = cfg.tool_start + '[{"name": "f", "arguments": {}}]'
            else:
                emission = (
                    cfg.tool_start + '{"name": "f", "arguments": {}}' + cfg.tool_end
                )
            state = auto.initial()
            for ch in emission:
                state = auto.step(state, ch)
                assert state is not None, (family, ch, emission)
            assert auto.is_accepting(state), family
            # and the family parser extracts the call from that emission
            p = StreamParser(cfg)
            ev = p.push(emission) + p.finish()
            calls = [e[1] for e in ev if e[0] == "tool_call"]
            assert len(calls) == 1 and calls[0].name == "f", (family, ev)
