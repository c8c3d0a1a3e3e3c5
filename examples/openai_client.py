"""Hit a running server with plain HTTP (reference example/server.py).

Start the server first:
    python -m vllm_rs_tpu.server --model /path/to/model --port 8000
"""

import json

import requests

BASE = "http://127.0.0.1:8000"

# non-streaming
r = requests.post(
    f"{BASE}/v1/chat/completions",
    json={
        "model": "model",
        "messages": [{"role": "user", "content": "Say hi in three words."}],
        "max_tokens": 32,
    },
)
print(r.json()["choices"][0]["message"]["content"])

# streaming
with requests.post(
    f"{BASE}/v1/chat/completions",
    json={
        "model": "model",
        "messages": [{"role": "user", "content": "Count to five."}],
        "max_tokens": 32,
        "stream": True,
    },
    stream=True,
) as r:
    for line in r.iter_lines():
        if line.startswith(b"data: ") and line != b"data: [DONE]":
            delta = json.loads(line[6:])["choices"][0]["delta"]
            print(delta.get("content", ""), end="", flush=True)
print()

# Anthropic Messages API
r = requests.post(
    f"{BASE}/v1/messages",
    json={
        "model": "model",
        "max_tokens": 32,
        "messages": [{"role": "user", "content": "Hello!"}],
    },
)
print(r.json()["content"][0]["text"])
