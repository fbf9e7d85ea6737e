"""Chat templating (reference: src/pygpukit/llm/chat.py:36,157).

Supports the common template families: ChatML (Qwen), Llama-2 [INST],
Llama-3 header style, and a plain fallback.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Literal

Role = Literal["system", "user", "assistant"]


@dataclass
class ChatMessage:
    role: Role
    content: str


def apply_chat_template(messages: list[ChatMessage | dict],
                        template: str = "chatml",
                        add_generation_prompt: bool = True) -> str:
    msgs = [m if isinstance(m, ChatMessage) else ChatMessage(**m) for m in messages]
    if template == "chatml":
        out = []
        for m in msgs:
            out.append(f"<|im_start|>{m.role}\n{m.content}<|im_end|>\n")
        if add_generation_prompt:
            out.append("<|im_start|>assistant\n")
        return "".join(out)
    if template == "llama2":
        sys_txt = ""
        out = []
        for m in msgs:
            if m.role == "system":
                sys_txt = f"<<SYS>>\n{m.content}\n<</SYS>>\n\n"
            elif m.role == "user":
                out.append(f"[INST] {sys_txt}{m.content} [/INST]")
                sys_txt = ""
            else:
                out.append(f" {m.content} ")
        return "<s>" + "".join(out)
    if template == "llama3":
        out = ["<|begin_of_text|>"]
        for m in msgs:
            out.append(f"<|start_header_id|>{m.role}<|end_header_id|>\n\n"
                       f"{m.content}<|eot_id|>")
        if add_generation_prompt:
            out.append("<|start_header_id|>assistant<|end_header_id|>\n\n")
        return "".join(out)
    # plain
    body = "\n".join(f"{m.role}: {m.content}" for m in msgs)
    return body + ("\nassistant:" if add_generation_prompt else "")


TEMPLATES = ("chatml", "llama2", "llama3", "plain")
