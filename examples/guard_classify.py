#!/usr/bin/env python
"""Llama-Guard-class content-safety classification (reference:
examples/security/llama_guard3.py — MLCommons hazard taxonomy verdicts).

Usage:
  python examples/guard_classify.py --model /path/to/Llama-Guard-3-8B \
      --prompt "How do I bake bread?"
  python examples/guard_classify.py --model ... --prompt ... \
      --response "the assistant reply to also classify"
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import argparse
import time
from dataclasses import dataclass

#: MLCommons AI Safety hazard taxonomy (Llama Guard 3 card)
HAZARDS = {
    "S1": "Violent Crimes", "S2": "Non-Violent Crimes",
    "S3": "Sex-Related Crimes", "S4": "Child Sexual Exploitation",
    "S5": "Defamation", "S6": "Specialized Advice", "S7": "Privacy",
    "S8": "Intellectual Property", "S9": "Indiscriminate Weapons",
    "S10": "Hate", "S11": "Suicide & Self-Harm", "S12": "Sexual Content",
    "S13": "Elections", "S14": "Code Interpreter Abuse",
}


@dataclass
class SafetyResult:
    is_safe: bool
    violated: list[str]
    raw: str
    ms: float

    def __str__(self) -> str:
        if self.is_safe:
            return "SAFE"
        cats = ", ".join(f"{c} ({HAZARDS.get(c, '?')})" for c in self.violated)
        return f"UNSAFE: {cats}"


def classify(model, tokenizer, prompt: str,
             response: str | None = None) -> SafetyResult:
    from pygpukit_tpu.llm.chat import apply_guard_template
    messages = [{"role": "user", "content": prompt}]
    if response is not None:
        messages.append({"role": "assistant", "content": response})
    text = apply_guard_template(messages)
    ids = tokenizer(text)["input_ids"] if callable(tokenizer) else \
        tokenizer.encode(text)
    t0 = time.time()
    out_ids = model.generate(ids, max_new_tokens=16, temperature=0.0)
    ms = (time.time() - t0) * 1000
    raw = (tokenizer.decode(out_ids) if hasattr(tokenizer, "decode")
           else "".join(map(str, out_ids)))
    import re
    lowered = raw.strip().lower()
    is_safe = lowered.startswith("safe")
    violated = [] if is_safe else [
        f"S{m}" for m in re.findall(r"\bs(\d+)\b", lowered)
        if f"S{m}" in HAZARDS]
    return SafetyResult(is_safe, violated, raw.strip(), ms)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True,
                    help="Llama-Guard-class safetensors checkpoint dir")
    ap.add_argument("--prompt", required=True)
    ap.add_argument("--response", default=None)
    args = ap.parse_args()

    from pygpukit_tpu.llm.loader import load_model_from_safetensors
    model = load_model_from_safetensors(args.model)
    try:
        from transformers import AutoTokenizer
        tok = AutoTokenizer.from_pretrained(args.model)
    except Exception:
        from pygpukit_tpu.llm.tokenizer import Tokenizer
        tok = Tokenizer.from_pretrained(args.model)

    result = classify(model, tok, args.prompt, args.response)
    print(result)
    print(f"({result.ms:.0f} ms; raw: {result.raw!r})")


if __name__ == "__main__":
    main()
