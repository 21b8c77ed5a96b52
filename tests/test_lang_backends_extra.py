"""LiteLLM / VertexAI DSL backends (reference lang/backend/litellm.py,
vertexai.py): gated imports and request plumbing via a stub SDK."""

import sys
import types

import pytest


def test_litellm_gated_import(monkeypatch):
    monkeypatch.setitem(sys.modules, "litellm", None)
    # None in sys.modules -> import raises ImportError
    from sglang_security_tpu.lang import LiteLLMBackend

    with pytest.raises(ImportError):
        LiteLLMBackend("gpt-4o-mini")


def test_litellm_plumbing(monkeypatch):
    calls = {}

    stub = types.ModuleType("litellm")

    def completion(**kw):
        calls.update(kw)
        msg = types.SimpleNamespace(content="hello-from-litellm")
        choice = types.SimpleNamespace(message=msg)
        return types.SimpleNamespace(choices=[choice])

    stub.completion = completion
    monkeypatch.setitem(sys.modules, "litellm", stub)
    from sglang_security_tpu.lang import LiteLLMBackend

    be = LiteLLMBackend("gpt-x", api_key="k", timeout=5.0)
    out = be.generate("hi there", {"max_new_tokens": 7,
                                   "temperature": 0.5})
    assert out == "hello-from-litellm"
    assert calls["model"] == "gpt-x"
    assert calls["max_tokens"] == 7
    assert calls["temperature"] == 0.5
    assert calls["messages"][0]["content"] == "hi there"


def test_vertexai_requires_credentials():
    """The SDK is present in this image; without GCP credentials the
    backend must fail loudly at construction (not silently no-op)."""
    from sglang_security_tpu.lang import VertexAIBackend

    with pytest.raises(Exception):
        VertexAIBackend("gemini-pro")
