"""External API backends for the DSL.

Re-creation of the reference's OpenAI / Anthropic language backends
(``lang/backend/openai.py``, ``lang/backend/anthropic.py``): run DSL
programs against any OpenAI-compatible completions endpoint (including
this package's own HTTP server) or an Anthropic messages endpoint.
"""

from __future__ import annotations

import logging
from typing import Optional

logger = logging.getLogger(__name__)


class OpenAIBackend:
    """Any OpenAI-compatible server (chat or text completions)."""

    def __init__(self, base_url: str, model: str = "default",
                 api_key: str = "EMPTY", chat: bool = False,
                 timeout: float = 600.0):
        self.base_url = base_url.rstrip("/")
        self.model = model
        self.api_key = api_key
        self.chat = chat
        self.timeout = timeout

    def _headers(self):
        return {"Authorization": f"Bearer {self.api_key}",
                "Content-Type": "application/json"}

    def generate(self, prompt: str, sp: dict, user_id=None,
                 images=None) -> str:
        import requests

        common = {
            "model": self.model,
            "max_tokens": sp.get("max_new_tokens", 128),
            "temperature": sp.get("temperature", 0.0),
            "top_p": sp.get("top_p", 1.0),
            "stop": sp.get("stop"),
        }
        if user_id is not None:
            common["user"] = user_id
        if self.chat:
            r = requests.post(
                self.base_url + "/v1/chat/completions",
                headers=self._headers(),
                json={**common,
                      "messages": [{"role": "user", "content": prompt}]},
                timeout=self.timeout,
            )
            r.raise_for_status()
            return r.json()["choices"][0]["message"]["content"]
        r = requests.post(
            self.base_url + "/v1/completions",
            headers=self._headers(),
            json={**common, "prompt": prompt},
            timeout=self.timeout,
        )
        r.raise_for_status()
        return r.json()["choices"][0]["text"]


class LiteLLMBackend:
    """Any provider routed through the ``litellm`` SDK (reference
    ``lang/backend/litellm.py``).  The SDK is not baked into this image,
    so the import is deferred and gated: constructing the backend
    without litellm installed raises the original ImportError, exactly
    like the reference."""

    def __init__(self, model: str, api_key: Optional[str] = None,
                 base_url: Optional[str] = None, timeout: float = 600.0,
                 **client_params):
        try:
            import litellm  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "LiteLLMBackend requires the `litellm` package"
            ) from e
        self._litellm = litellm
        self.model = model
        self.client_params = {
            "api_key": api_key, "base_url": base_url,
            "timeout": timeout, **client_params,
        }

    def generate(self, prompt: str, sp: dict, user_id=None,
                 images=None) -> str:
        ret = self._litellm.completion(
            model=self.model,
            messages=[{"role": "user", "content": prompt}],
            max_tokens=sp.get("max_new_tokens", 128),
            temperature=sp.get("temperature", 0.0),
            top_p=sp.get("top_p", 1.0),
            stop=sp.get("stop"),
            **{k: v for k, v in self.client_params.items()
               if v is not None},
        )
        return ret.choices[0].message.content


class VertexAIBackend:
    """Google Vertex AI (reference ``lang/backend/vertexai.py``).
    Deferred, gated import of the ``vertexai`` SDK (not baked in); DSL
    text runs as a single-turn generate_content call."""

    def __init__(self, model: str, project: Optional[str] = None,
                 location: Optional[str] = None, safety_settings=None):
        try:
            import vertexai
            from vertexai.generative_models import GenerativeModel
        except ImportError as e:
            raise ImportError(
                "VertexAIBackend requires the `google-cloud-aiplatform`"
                " package"
            ) from e
        if project or location:
            vertexai.init(project=project, location=location)
        self._model = GenerativeModel(model)
        self.safety_settings = safety_settings

    def generate(self, prompt: str, sp: dict, user_id=None,
                 images=None) -> str:
        ret = self._model.generate_content(
            prompt,
            generation_config={
                "max_output_tokens": sp.get("max_new_tokens", 128),
                "temperature": sp.get("temperature", 0.0),
                "top_p": sp.get("top_p", 1.0),
                "stop_sequences": sp.get("stop") or None,
            },
            safety_settings=self.safety_settings,
        )
        return ret.text


class AnthropicBackend:
    """Anthropic-style /v1/messages endpoint (reference
    lang/backend/anthropic.py; DSL text accumulates as one user turn)."""

    def __init__(self, model: str, api_key: Optional[str] = None,
                 base_url: str = "https://api.anthropic.com",
                 timeout: float = 600.0):
        import os

        self.model = model
        self.api_key = api_key or os.environ.get("ANTHROPIC_API_KEY", "")
        self.base_url = base_url.rstrip("/")
        self.timeout = timeout

    def generate(self, prompt: str, sp: dict, user_id=None,
                 images=None) -> str:
        import requests

        r = requests.post(
            self.base_url + "/v1/messages",
            headers={
                "x-api-key": self.api_key,
                "anthropic-version": "2023-06-01",
                "Content-Type": "application/json",
            },
            json={
                "model": self.model,
                "max_tokens": sp.get("max_new_tokens", 128),
                "temperature": sp.get("temperature", 0.0),
                "stop_sequences": sp.get("stop") or None,
                "messages": [{"role": "user", "content": prompt}],
            },
            timeout=self.timeout,
        )
        r.raise_for_status()
        blocks = r.json().get("content", [])
        return "".join(b.get("text", "") for b in blocks)
