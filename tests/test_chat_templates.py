"""Named chat templates + --chat-template override (reference
lang/chat_template.py registry)."""

import pytest

from sglang_security_tpu.entrypoints.openai_api.chat_templates import (
    CHAT_TEMPLATES,
    apply_server_template,
    get_chat_template,
)

MSGS = [
    {"role": "system", "content": "be brief"},
    {"role": "user", "content": "hi"},
    {"role": "assistant", "content": "hello"},
    {"role": "user", "content": "bye?"},
]


def test_registry_shapes():
    for name, fn in CHAT_TEMPLATES.items():
        out = fn(MSGS)
        assert "hi" in out and "bye?" in out, name
        # always ends ready for the assistant turn
        assert out.rstrip().endswith(
            ("assistant", "<|Assistant|>", "model", "ASSISTANT:",
             "[/INST]")
        ) or out.endswith("assistant\n") or out.endswith("\n\n"), (
            name, out[-40:])


def test_llama3_format():
    out = get_chat_template("llama-3")(MSGS)
    assert out.startswith("<|begin_of_text|>")
    assert "<|start_header_id|>user<|end_header_id|>\n\nhi<|eot_id|>" in out
    assert out.endswith("<|start_header_id|>assistant<|end_header_id|>\n\n")


def test_chatml_format():
    out = get_chat_template("chatml")(MSGS)
    assert "<|im_start|>user\nhi<|im_end|>" in out
    assert out.endswith("<|im_start|>assistant\n")


def test_unknown_name_raises():
    with pytest.raises(ValueError, match="unknown chat template"):
        get_chat_template("nope")


class _Args:
    chat_template = "chatml"


def test_apply_server_template_name():
    out = apply_server_template(_Args(), None, MSGS)
    assert out.endswith("<|im_start|>assistant\n")


def test_apply_server_template_jinja(tmp_path):
    class Tok:
        chat_template = None

        def apply_chat_template(self, messages, tokenize=False,
                                add_generation_prompt=True, tools=None):
            return self.chat_template + "|" + messages[-1]["content"]

    f = tmp_path / "t.jinja"
    f.write_text("CUSTOM")

    class Args:
        chat_template = str(f)

    tok = Tok()
    assert apply_server_template(Args(), tok, MSGS) is None
    assert tok.chat_template == "CUSTOM"


def test_end_to_end_chat_with_named_template(tmp_path_factory):
    from sglang_security_tpu.entrypoints.openai_api.adapter import (
        chat_to_gri,
    )
    from sglang_security_tpu.entrypoints.openai_api.protocol import (
        ChatCompletionRequest,
    )

    class Args:
        chat_template = "llama-3"

    req = ChatCompletionRequest(
        model="x", messages=[{"role": "user", "content": "ping"}],
        max_tokens=4,
    )
    gri = chat_to_gri(req, tokenizer=None, server_args=Args())
    assert gri.text.startswith("<|begin_of_text|>")
    assert "ping" in gri.text
