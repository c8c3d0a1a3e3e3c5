"""Multi-turn prefix continuation via prompt replay (VERDICT round-1 #6;
reference engine.rs:731-791,1034-1037 + chat_template.rs:466-484): the
generation-prompt suffix (e.g. "<think>\\n") is replayed into the output so
the next turn's template re-render is token-identical with the served
prompt+output and the prefix cache keeps hitting."""

import asyncio
import threading
import time

import jax
import pytest
import requests

from vllm_rs_tpu.utils.chat_template import ChatTemplate

# analog of the reference's THINKING_TEMPLATE test fixture
# (chat_template.rs:491-503), word-spaced so the toy word-level tokenizer
# can encode every marker as one token
THINKING_TEMPLATE = """\
{%- for message in messages -%}
im_start_{{ message.role }}
{{ message.content }} im_end
{% endfor -%}
{%- if add_generation_prompt -%}
im_start_assistant
{% if enable_thinking is defined and enable_thinking == false %}<think> </think> {% else %}<think> {% endif %}
{%- endif -%}"""

HEADER_ONLY_TEMPLATE = """\
{%- for message in messages -%}
im_start_{{ message.role }}
{{ message.content }} im_end
{% endfor -%}
{%- if add_generation_prompt -%}
im_start_assistant
{% endif -%}"""


def make_word_tokenizer(vocab_words):
    from tokenizers import Tokenizer, models, pre_tokenizers
    from tokenizers.decoders import Decoder

    vocab = {w: i for i, w in enumerate(vocab_words)}
    tok = Tokenizer(models.WordLevel(vocab, unk_token=vocab_words[1]))
    tok.pre_tokenizer = pre_tokenizers.WhitespaceSplit()
    return tok


class TestReplaySuffixExtraction:
    def test_thinking_suffix(self):
        tpl = ChatTemplate(THINKING_TEMPLATE)
        assert (
            tpl.generation_prompt_replay_suffix(enable_thinking=True)
            == "<think> "
        )

    def test_disabled_thinking_suffix(self):
        tpl = ChatTemplate(THINKING_TEMPLATE)
        assert (
            tpl.generation_prompt_replay_suffix(enable_thinking=False)
            == "<think> </think> "
        )

    def test_header_only_yields_none(self):
        tpl = ChatTemplate(HEADER_ONLY_TEMPLATE)
        assert tpl.generation_prompt_replay_suffix() is None


class TestTrimReplayPrefix:
    """Mirrors the reference's trim_prompt_replay_prefix unit tests
    (engine.rs:1781-1849)."""

    def test_single_reasoning_token(self):
        from vllm_rs_tpu.server.app import trim_prompt_replay_prefix

        assert trim_prompt_replay_prefix([99], {42, 99, 100}) == [99]

    def test_multi_token_starting_with_reasoning(self):
        from vllm_rs_tpu.server.app import trim_prompt_replay_prefix

        assert trim_prompt_replay_prefix([42, 7], {42, 100}) == [42, 7]

    def test_trims_leading_non_reasoning(self):
        from vllm_rs_tpu.server.app import trim_prompt_replay_prefix

        assert trim_prompt_replay_prefix([7, 42, 8], {42, 100}) == [42, 8]

    def test_rejects_without_reasoning_token(self):
        from vllm_rs_tpu.server.app import trim_prompt_replay_prefix

        assert trim_prompt_replay_prefix([7, 8], {42, 100}) is None

    def test_rejects_empty(self):
        from vllm_rs_tpu.server.app import trim_prompt_replay_prefix

        assert trim_prompt_replay_prefix([], {42, 100}) is None


class TestCandidateBuilder:
    def test_candidates_from_thinking_template(self):
        from vllm_rs_tpu.server.app import build_prompt_replay_candidates
        from vllm_rs_tpu.server.tool_parser import ToolConfig

        words = [f"t{i}" for i in range(8)] + [
            "<think>", "</think>", "im_start_user", "im_start_assistant", "im_end",
        ]
        tok = make_word_tokenizer(words)
        cfg = ToolConfig().with_tokenizer(tok)
        cands = build_prompt_replay_candidates(
            ChatTemplate(THINKING_TEMPLATE), tok, cfg
        )
        think, think_end = words.index("<think>"), words.index("</think>")
        assert [think, think_end] in cands
        assert [think] in cands
        # longest first
        assert cands[0] == [think, think_end]

    def test_no_reasoning_tokens_no_candidates(self):
        from vllm_rs_tpu.server.app import build_prompt_replay_candidates
        from vllm_rs_tpu.server.tool_parser import ToolConfig

        words = [f"t{i}" for i in range(8)]
        tok = make_word_tokenizer(words)
        cands = build_prompt_replay_candidates(
            ChatTemplate(THINKING_TEMPLATE), tok, ToolConfig().with_tokenizer(tok)
        )
        assert cands == []


VOCAB = [f"t{i}" for i in range(48)] + [
    "<think>", "</think>", "im_start_user", "im_start_assistant",
    "im_start_system", "im_end",
]
THINK = VOCAB.index("<think>")
THINK_END = VOCAB.index("</think>")


def _tiny_engine():
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
        model_type="qwen3",
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
        cache=CacheConfig(block_size=4, num_blocks=128),
        scheduler=SchedulerConfig(
            max_num_seqs=4, chunk_size=32, max_model_len=128,
            prefill_buckets=(8, 16, 32, 64),
        ),
        prefill_buckets=(8, 16, 32, 64),
        decode_buckets=(4,),
    )
    m = CausalLM(cfg, block_size=4)
    params = m.init_params(jax.random.PRNGKey(3))
    return LLMEngine(
        ec, ModelRunner(m, params, ec), tokenizer=make_word_tokenizer(VOCAB)
    )


class TestEngineReplay:
    def test_first_delta_carries_replay_text(self):
        from vllm_rs_tpu.config import SamplingParams

        engine = _tiny_engine()
        engine.set_prompt_replay_candidates([[THINK]])
        prompt = [5, 6, 7, THINK]  # ends with the candidate
        sid = engine.add_request(prompt, SamplingParams(temperature=0.0, max_tokens=3, ignore_eos=True))
        while not engine.requests[sid].seq.is_finished:
            if engine.step() == 0 and not engine.scheduler.has_work():
                break
        out = engine._output_of(sid)
        assert out.text.startswith("<think>"), out.text
        # replay tokens are not counted as output tokens
        assert len(out.output_token_ids) == 3

    def test_non_matching_prompt_untouched(self):
        from vllm_rs_tpu.config import SamplingParams

        engine = _tiny_engine()
        engine.set_prompt_replay_candidates([[THINK]])
        sid = engine.add_request([5, 6, 7], SamplingParams(temperature=0.0, max_tokens=2, ignore_eos=True))
        while not engine.requests[sid].seq.is_finished:
            if engine.step() == 0 and not engine.scheduler.has_work():
                break
        out = engine._output_of(sid)
        assert not out.text.startswith("<think>")


@pytest.fixture(scope="module")
def replay_server():
    """HTTP server whose template opens generations with "<think> "."""
    from aiohttp import web

    from vllm_rs_tpu.server.app import ServerState, build_app

    engine = _tiny_engine()
    engine.start_loop()
    state = ServerState(
        engine,
        model_name="tiny-replay",
        chat_template=ChatTemplate(THINKING_TEMPLATE),
    )
    app = build_app(state)
    loop = asyncio.new_event_loop()
    box = {}

    def run():
        asyncio.set_event_loop(loop)

        async def start():
            r = web.AppRunner(app)
            await r.setup()
            site = web.TCPSite(r, "127.0.0.1", 0)
            await site.start()
            box["port"] = site._server.sockets[0].getsockname()[1]

        loop.run_until_complete(start())
        loop.run_forever()

    t = threading.Thread(target=run, daemon=True)
    t.start()
    for _ in range(100):
        if "port" in box:
            break
        time.sleep(0.05)
    base = f"http://127.0.0.1:{box['port']}"
    for _ in range(50):
        try:
            if requests.get(base + "/health", timeout=1).ok:
                break
        except Exception:
            time.sleep(0.1)
    yield base
    loop.call_soon_threadsafe(loop.stop)
    engine.stop_loop()


class TestTwoTurnPrefixContinuation:
    def test_turn2_prefill_is_roughly_the_delta(self, replay_server):
        """The round-1 verdict's acceptance test: turn 2 re-renders the
        conversation (assistant content = turn 1's returned text, which
        includes the replayed "<think>" prefix) and its prefill must hit
        the prefix cache for ≈ the whole turn-1 prompt+output."""
        turn1 = {
            "model": "tiny-replay",
            "messages": [{"role": "user", "content": "t5 t6 t7 t8 t9 t10 t11 t12"}],
            "max_tokens": 6,
            "temperature": 0.0,
            "ignore_eos": True,
        }
        r1 = requests.post(
            f"{replay_server}/v1/chat/completions", json=turn1, timeout=120
        )
        assert r1.ok, r1.text
        body1 = r1.json()
        msg1 = body1["choices"][0]["message"]
        # the replayed "<think>" opens a reasoning block, so the generated
        # text lands in reasoning_content; a thinking-aware client renders
        # the assistant turn as think-block + content (the templates that
        # keep think blocks re-render exactly this shape)
        assert msg1.get("reasoning_content"), msg1
        content1 = (
            "<think> " + msg1["reasoning_content"] + " " + (msg1["content"] or "")
        ).strip()
        turn2 = {
            "model": "tiny-replay",
            "messages": [
                {"role": "user", "content": "t5 t6 t7 t8 t9 t10 t11 t12"},
                {"role": "assistant", "content": content1},
                {"role": "user", "content": "t13 t14"},
            ],
            "max_tokens": 4,
            "temperature": 0.0,
            "ignore_eos": True,
        }
        r2 = requests.post(
            f"{replay_server}/v1/chat/completions", json=turn2, timeout=120
        )
        assert r2.ok, r2.text
        usage2 = r2.json()["usage"]
        cached = usage2.get("prompt_tokens_details", {}).get("cached_tokens", 0)
        prompt1_tokens = body1["usage"]["prompt_tokens"]
        # prefix reuse must cover most of turn 1's prompt + output
        # (block-rounded, hence ">= prompt1 - block_size")
        assert cached >= prompt1_tokens - 4, (cached, prompt1_tokens, usage2)
