"""Named chat templates.

Re-creation of the reference's template registry
(``python/sglang/lang/chat_template.py`` + ``--chat-template``): when a
checkpoint's tokenizer ships no (or the wrong) chat template, the
server selects one by name, or loads a raw Jinja file whose content is
installed as ``tokenizer.chat_template``.
"""

from __future__ import annotations

from typing import Callable, Dict, List

Messages = List[dict]


def _llama3(messages: Messages) -> str:
    out = ["<|begin_of_text|>"]
    for m in messages:
        out.append(
            f"<|start_header_id|>{m['role']}<|end_header_id|>\n\n"
            f"{m['content']}<|eot_id|>"
        )
    out.append("<|start_header_id|>assistant<|end_header_id|>\n\n")
    return "".join(out)


def _chatml(messages: Messages) -> str:
    out = []
    for m in messages:
        out.append(f"<|im_start|>{m['role']}\n{m['content']}<|im_end|>\n")
    out.append("<|im_start|>assistant\n")
    return "".join(out)


def _gemma(messages: Messages) -> str:
    out = ["<bos>"]
    for m in messages:
        role = "model" if m["role"] == "assistant" else m["role"]
        out.append(f"<start_of_turn>{role}\n{m['content']}<end_of_turn>\n")
    out.append("<start_of_turn>model\n")
    return "".join(out)


def _vicuna(messages: Messages) -> str:
    out = []
    for m in messages:
        if m["role"] == "system":
            out.append(m["content"] + "\n\n")
        elif m["role"] == "user":
            out.append(f"USER: {m['content']}\n")
        else:
            out.append(f"ASSISTANT: {m['content']}</s>\n")
    out.append("ASSISTANT:")
    return "".join(out)


def _deepseek3(messages: Messages) -> str:
    out = ["<|begin of sentence|>"]
    for m in messages:
        if m["role"] == "system":
            out.append(m["content"])
        elif m["role"] == "user":
            out.append(f"<|User|>{m['content']}")
        else:
            out.append(f"<|Assistant|>{m['content']}<|end of sentence|>")
    out.append("<|Assistant|>")
    return "".join(out)


def _mistral(messages: Messages) -> str:
    out = ["<s>"]
    system = ""
    for m in messages:
        if m["role"] == "system":
            system = m["content"] + "\n\n"
        elif m["role"] == "user":
            out.append(f"[INST] {system}{m['content']} [/INST]")
            system = ""
        else:
            out.append(f" {m['content']}</s>")
    return "".join(out)


CHAT_TEMPLATES: Dict[str, Callable[[Messages], str]] = {
    "llama-3": _llama3,
    "llama-3-instruct": _llama3,
    "chatml": _chatml,
    "qwen": _chatml,
    "qwen2": _chatml,
    "gemma": _gemma,
    "gemma-it": _gemma,
    "vicuna": _vicuna,
    "vicuna_v1.1": _vicuna,
    "deepseek-v3": _deepseek3,
    "mistral": _mistral,
}


def get_chat_template(name: str) -> Callable[[Messages], str]:
    try:
        return CHAT_TEMPLATES[name]
    except KeyError:
        raise ValueError(
            f"unknown chat template {name!r}; known: "
            f"{sorted(CHAT_TEMPLATES)} (or pass a .jinja file path)"
        )


def apply_server_template(server_args, tokenizer, messages: Messages):
    """Resolve --chat-template: a registry name renders directly; a
    .jinja path installs its content onto the tokenizer (rendered by
    HF); None falls through to the tokenizer's own template."""
    name = getattr(server_args, "chat_template", None)
    if not name:
        return None
    if name.endswith(".jinja"):
        with open(name) as f:
            content = f.read()
        if tokenizer is None:
            raise ValueError(".jinja chat templates need a tokenizer")
        tokenizer.chat_template = content
        return None  # tokenizer path renders it
    return get_chat_template(name)(messages)
