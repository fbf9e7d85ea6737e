#!/usr/bin/env python
"""Interactive chat CLI (reference: examples/chat/chat_cli.py:195).

Usage:
  python examples/chat_cli.py --model /path/to/hf-checkpoint \\
      [--max-seq-len 2048] [--temperature 0.7] [--top-k 50] \\
      [--strategy m1_graph|speculative|jacobi] [--fp8]

The checkpoint directory needs model.safetensors (or sharded index),
config.json, and tokenizer.json.
"""

from __future__ import annotations


import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import argparse
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--max-seq-len", type=int, default=2048)
    ap.add_argument("--max-new-tokens", type=int, default=256)
    ap.add_argument("--temperature", type=float, default=0.7)
    ap.add_argument("--top-k", type=int, default=50)
    ap.add_argument("--strategy", default="m1_graph",
                    choices=["m1", "m1_graph", "speculative", "jacobi"])
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--fp8", action="store_true",
                    help="quantize weights to fp8 after load")
    ap.add_argument("--template", default="chatml")
    args = ap.parse_args()

    from pygpukit_tpu.llm import (
        ChatMessage, Tokenizer, apply_chat_template,
        load_model_from_safetensors, quantize_model_params,
    )
    from pygpukit_tpu.llm.decode import STRATEGIES

    print(f"loading {args.model} ...", flush=True)
    t0 = time.time()
    model = load_model_from_safetensors(args.model, dtype=args.dtype,
                                        max_seq_len=args.max_seq_len)
    if args.fp8:
        model.params = quantize_model_params(model.params, "fp8")
    tok = Tokenizer(args.model)
    print(f"loaded in {time.time() - t0:.1f}s "
          f"({model.config.num_layers} layers, "
          f"vocab {model.config.vocab_size})")

    history: list[ChatMessage] = []
    eos = tok.token_to_id("<|im_end|>") or tok.token_to_id("</s>")

    while True:
        try:
            user = input("\nyou> ").strip()
        except (EOFError, KeyboardInterrupt):
            break
        if user in ("/exit", "/quit"):
            break
        if user == "/reset":
            history.clear()
            continue
        history.append(ChatMessage("user", user))
        prompt = apply_chat_template(history, template=args.template)
        ids = tok.encode(prompt)

        t0 = time.time()
        if args.temperature <= 0 and args.strategy != "m1":
            strat = STRATEGIES[args.strategy]()
            if args.strategy == "speculative":
                strat = STRATEGIES[args.strategy](
                    n_draft_layers=max(2, model.config.num_layers // 6))
            strat.bind(model)
            out_ids = strat.generate(ids, args.max_new_tokens,
                                     eos_token_id=eos)
        else:
            out_ids = model.generate(ids, args.max_new_tokens,
                                     temperature=args.temperature,
                                     top_k=args.top_k, eos_token_id=eos)
        dt = time.time() - t0
        text = tok.decode([t for t in out_ids if t != eos])
        print(f"assistant> {text}")
        print(f"[{len(out_ids)} tokens, {len(out_ids) / dt:.1f} tok/s]")
        history.append(ChatMessage("assistant", text))


if __name__ == "__main__":
    sys.exit(main())
