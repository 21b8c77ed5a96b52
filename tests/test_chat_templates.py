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


def test_fim_completion_templates():
    from sglang_security_tpu.entrypoints.openai_api.completion_templates import (
        build_fim_prompt,
        load_completion_template,
    )

    out = build_fim_prompt("deepseek-coder", "def f(:", "return 1")
    assert out == "<|fim▁begin|>def f(:<|fim▁hole|>return 1<|fim▁end|>"
    out = build_fim_prompt("starcoder", "A", "B")
    assert out == "<fim_prefix>A<fim_suffix>B<fim_middle>"
    with pytest.raises(ValueError, match="completion-template"):
        build_fim_prompt(None, "a", "b")
    assert load_completion_template("codellama") == "codellama"


def test_fim_custom_json(tmp_path):
    import json as _json

    from sglang_security_tpu.entrypoints.openai_api.completion_templates import (
        build_fim_prompt,
        load_completion_template,
    )

    f = tmp_path / "fim.json"
    f.write_text(_json.dumps({
        "name": "custom", "fim_begin_token": "<B>",
        "fim_middle_token": "<M>", "fim_end_token": "<E>",
        "fim_position": "MIDDLE",
    }))
    assert load_completion_template(str(f)) == "custom"
    assert build_fim_prompt("custom", "p", "s") == "<B>p<M>s<E>"


def test_fim_through_adapter():
    from sglang_security_tpu.entrypoints.openai_api.adapter import (
        completion_to_gri,
    )
    from sglang_security_tpu.entrypoints.openai_api.protocol import (
        CompletionRequest,
    )

    class Args:
        completion_template = "starcoder"

    req = CompletionRequest(model="x", prompt="front", suffix="back",
                            max_tokens=4)
    gri = completion_to_gri(req, Args())
    assert gri.text == "<fim_prefix>front<fim_suffix>back<fim_middle>"
