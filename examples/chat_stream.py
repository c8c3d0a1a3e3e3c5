"""Streaming chat through the engine (reference example/chat.py).

    python examples/chat_stream.py --model /path/to/model
"""

import argparse

from vllm_rs_tpu import SamplingParams
from vllm_rs_tpu.api import EngineBuilder
from vllm_rs_tpu.utils.chat_template import ChatTemplate


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", "-m", required=True)
    args = ap.parse_args()

    engine = EngineBuilder(args.model).build()
    engine.start_loop()
    tpl = ChatTemplate(model_type=engine.econfig.model.model_type)

    history = []
    try:
        while True:
            user = input("you> ")
            if user.strip() in ("exit", "quit"):
                break
            history.append({"role": "user", "content": user})
            prompt = tpl.render(history, add_generation_prompt=True)
            sid = engine.add_request(prompt, SamplingParams(temperature=0.7, max_tokens=512))
            q = engine.get_stream(sid)
            reply = []
            print("bot> ", end="", flush=True)
            while True:
                item = q.get()
                print(item.text, end="", flush=True)
                reply.append(item.text)
                if item.finished:
                    break
            print()
            history.append({"role": "assistant", "content": "".join(reply)})
    finally:
        engine.stop_loop()


if __name__ == "__main__":
    main()
