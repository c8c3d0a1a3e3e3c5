"""Batch completion through the library API (reference example/completion.py).

    python examples/completion.py --model /path/to/model [--quant int4]
"""

import argparse

from vllm_rs_tpu import SamplingParams
from vllm_rs_tpu.api import LLM


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", "-m", required=True)
    ap.add_argument("--quant", choices=["int8", "int4"], default=None)
    ap.add_argument("--max-tokens", type=int, default=128)
    ap.add_argument("--prompt", default="The capital of France is")
    args = ap.parse_args()

    llm = LLM(args.model, quant=args.quant)
    outs = llm.generate(
        args.prompt,
        SamplingParams(temperature=0.7, top_p=0.9, max_tokens=args.max_tokens),
    )
    for o in outs:
        print(o.text)
        print(f"--- {len(o.output_token_ids)} tokens, ttft {o.ttft_s:.3f}s")


if __name__ == "__main__":
    main()
