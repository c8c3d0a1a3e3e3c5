"""Multimodal HTTP APIs: image content through chat completions + Claude.

Counterpart of the reference's build_messages_and_images flow
(server/mod.rs:1128-1351): OpenAI `image_url` data: URLs and Anthropic
base64 `image` blocks are preprocessed into vision embeddings spliced at
placeholder positions.
"""

import asyncio
import base64
import io
import json
import threading
import time

import jax
import pytest
import urllib.request

from tests.test_multimodal import _vl_engine
from tests.test_server import make_test_tokenizer
from vllm_rs_tpu.server.app import ServerState, build_app
from vllm_rs_tpu.server.images import decode_image_source, markers_for


def _png_b64(color=(255, 0, 0), w=32, h=32) -> str:
    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (w, h), color).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def test_markers_per_family():
    assert markers_for("qwen3_vl")[1] == "<|image_pad|>"
    assert markers_for("gemma3")[1] == "<image_soft_token>"
    assert markers_for("mistral3")[1] == "[IMG]"
    assert markers_for("llama4")[0] == "<|image_start|>"


def test_decode_image_source():
    raw = b"hello-image"
    b64 = base64.b64encode(raw).decode()
    assert decode_image_source("data:image/png;base64," + b64) == raw
    assert decode_image_source(b64) == raw
    assert decode_image_source("https://example.com/x.png") is None


@pytest.fixture(scope="module")
def vl_server():
    engine, _ = _vl_engine()
    engine.tokenizer = make_test_tokenizer(128)
    engine.start_loop()
    # word-level tokenizer: each pad word "t100" tokenizes to the image
    # placeholder id 100
    state = ServerState(
        engine, model_name="tiny-vl", image_markers=("", "t100 ", "")
    )
    app = build_app(state)
    loop = asyncio.new_event_loop()
    from aiohttp import web

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

    threading.Thread(target=run, daemon=True).start()
    for _ in range(100):
        if "port" in box:
            break
        time.sleep(0.05)
    yield f"http://127.0.0.1:{box['port']}"
    engine.stop_loop()
    loop.call_soon_threadsafe(loop.stop)


def _post(url, body):
    req = urllib.request.Request(
        url, data=json.dumps(body).encode(), headers={"Content-Type": "application/json"}
    )
    with urllib.request.urlopen(req) as r:
        return json.loads(r.read())


def test_chat_completions_with_image(vl_server):
    body = {
        "messages": [
            {
                "role": "user",
                "content": [
                    {"type": "text", "text": "t5 t6 "},
                    {
                        "type": "image_url",
                        "image_url": {"url": "data:image/png;base64," + _png_b64()},
                    },
                    {"type": "text", "text": " t7"},
                ],
            }
        ],
        "max_tokens": 4,
        "temperature": 0.0,
    }
    out = _post(vl_server + "/v1/chat/completions", body)
    assert out["choices"][0]["message"]["content"]
    assert out["usage"]["completion_tokens"] >= 1


def test_chat_completions_image_changes_output(vl_server):
    def run(color):
        body = {
            "messages": [
                {
                    "role": "user",
                    "content": [
                        {"type": "text", "text": "t5 "},
                        {
                            "type": "image_url",
                            "image_url": {
                                "url": "data:image/png;base64," + _png_b64(color)
                            },
                        },
                    ],
                }
            ],
            "max_tokens": 6,
            "temperature": 0.0,
        }
        return _post(vl_server + "/v1/chat/completions", body)["choices"][0][
            "message"
        ]["content"]

    assert run((255, 0, 0)) != run((0, 0, 255))


def test_http_image_url_rejected(vl_server):
    body = {
        "messages": [
            {
                "role": "user",
                "content": [
                    {
                        "type": "image_url",
                        "image_url": {"url": "https://example.com/cat.png"},
                    }
                ],
            }
        ],
        "max_tokens": 2,
    }
    req = urllib.request.Request(
        vl_server + "/v1/chat/completions",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req)
    assert e.value.code == 400


def test_claude_messages_with_image(vl_server):
    body = {
        "model": "tiny-vl",
        "max_tokens": 4,
        "temperature": 0.0,
        "messages": [
            {
                "role": "user",
                "content": [
                    {"type": "text", "text": "t9 "},
                    {
                        "type": "image",
                        "source": {
                            "type": "base64",
                            "media_type": "image/png",
                            "data": _png_b64((0, 200, 50)),
                        },
                    },
                ],
            }
        ],
    }
    out = _post(vl_server + "/v1/messages", body)
    assert out["content"] and out["content"][0]["type"] == "text"
