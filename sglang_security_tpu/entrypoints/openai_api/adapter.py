"""OpenAI protocol <-> internal GenerateReqInput conversion.

Parity with the reference's ``srt/openai_api/adapter.py``
(``v1_generate_request:514``, ``v1_chat_generate_request:950``): request
mapping, chat templating via the tokenizer, streaming chunk assembly.
"""

from __future__ import annotations

import logging
from typing import Optional

from sglang_security_tpu.entrypoints.openai_api.protocol import (
    ChatCompletionRequest,
    CompletionRequest,
)
from sglang_security_tpu.managers.io_struct import GenerateReqInput

logger = logging.getLogger(__name__)


def completion_to_gri(req: CompletionRequest,
                      server_args=None) -> GenerateReqInput:
    sp = {
        "max_new_tokens": req.max_tokens,
        "temperature": req.temperature,
        "top_p": req.top_p,
        "top_k": req.top_k,
        "min_p": req.min_p,
        "stop": req.stop,
        "presence_penalty": req.presence_penalty,
        "frequency_penalty": req.frequency_penalty,
        "repetition_penalty": req.repetition_penalty,
        "ignore_eos": req.ignore_eos,
        "json_schema": req.json_schema,
        "regex": req.regex,
        "ebnf": req.ebnf,
        "logit_bias": {int(k): float(v)
                       for k, v in (req.logit_bias or {}).items()} or None,
    }
    prompt = req.prompt
    if req.suffix and isinstance(prompt, str):
        # FIM code completion (reference code_completion_parser.py)
        from sglang_security_tpu.entrypoints.openai_api.completion_templates import (
            build_fim_prompt,
            load_completion_template,
        )

        name = None
        if server_args is not None and server_args.completion_template:
            name = load_completion_template(
                server_args.completion_template
            )
        prompt = build_fim_prompt(name, prompt, req.suffix)
    text = None
    input_ids = None
    if isinstance(prompt, str):
        text = prompt
    elif prompt and isinstance(prompt[0], int):
        input_ids = prompt
    elif prompt and isinstance(prompt[0], str):
        text = list(prompt)
        sp = [dict(sp) for _ in prompt]
    else:
        input_ids = prompt
        sp = [dict(sp) for _ in prompt]
    return GenerateReqInput(
        text=text,
        input_ids=input_ids,
        sampling_params=sp,
        stream=req.stream,
        user_id=req.user_id or req.user,
        return_logprob=req.logprobs is not None,
        top_logprobs_num=req.logprobs or 0,
    )


def build_chat_prompt(tokenizer, req: ChatCompletionRequest,
                      server_args=None):
    """Returns (prompt_text, images): image_url content parts become
    ``<image>`` placeholders in the text (the served VLM's tokenizer maps
    them to its image token) and the image payloads are collected in
    order (reference v1_chat_generate_request image handling).
    --chat-template (registry name or .jinja path) overrides the
    tokenizer's own template."""
    images = []
    messages = []
    for m in req.messages:
        if isinstance(m.content, str):
            content = m.content
        else:
            content = _flatten_content(m.content, images)
        messages.append({"role": m.role, "content": content})
    if server_args is not None and server_args.chat_template:
        from sglang_security_tpu.entrypoints.openai_api.chat_templates import (
            apply_server_template,
        )

        rendered = apply_server_template(server_args, tokenizer, messages)
        if rendered is not None:
            return rendered, images
    if tokenizer is not None and getattr(tokenizer, "chat_template", None):
        try:
            return tokenizer.apply_chat_template(
                messages, tokenize=False, add_generation_prompt=True,
                tools=req.tools,
            ), images
        except Exception:
            logger.warning("chat template failed; using fallback", exc_info=True)
    # fallback template
    parts = []
    for m in messages:
        parts.append(f"<|{m['role']}|>\n{m['content']}")
    parts.append("<|assistant|>\n")
    return "\n".join(parts), images


def _flatten_content(content, images=None) -> str:
    if content is None:
        return ""
    out = []
    for item in content:
        if not isinstance(item, dict):
            continue
        if item.get("type") == "text":
            out.append(item.get("text", ""))
        elif item.get("type") == "image_url" and images is not None:
            url = (item.get("image_url") or {}).get("url", "")
            images.append(url)
            out.append("<image>")
    return "\n".join(out)


def chat_to_gri(req: ChatCompletionRequest, tokenizer,
                server_args=None) -> GenerateReqInput:
    prompt, images = build_chat_prompt(tokenizer, req, server_args)
    max_tokens = req.max_completion_tokens or req.max_tokens or 512
    json_schema = None
    if req.response_format and req.response_format.type == "json_schema":
        import json as _json

        schema = (req.response_format.json_schema or {}).get("schema")
        if schema is not None:
            json_schema = _json.dumps(schema)
    regex = None
    if req.tools and req.tool_choice not in (None, "none", "auto"):
        # forced tool call ("required" or a named tool): constrain decoding
        # to a valid call in the server's tool-call dialect (reference
        # ebnf_composer.build_ebnf bound to xgrammar; here composed
        # directly onto the native grammar engine's regex IR)
        from sglang_security_tpu.function_call.ebnf_composer import (
            build_tool_call_regex,
        )

        fmt = getattr(server_args, "tool_call_parser", None) or "auto"
        if fmt == "auto":
            fmt = "json"
        regex = build_tool_call_regex(
            req.tools, fmt=fmt, tool_choice=req.tool_choice
        )
        # a forced tool call wins over response_format: grammar_spec()
        # prefers json_schema, so leaving both set would silently drop
        # the tool constraint (ADVICE r3)
        json_schema = None
    sp = {
        "max_new_tokens": max_tokens,
        "temperature": req.temperature,
        "top_p": req.top_p,
        "top_k": req.top_k,
        "min_p": req.min_p,
        "stop": req.stop,
        "presence_penalty": req.presence_penalty,
        "frequency_penalty": req.frequency_penalty,
        "repetition_penalty": req.repetition_penalty,
        "ignore_eos": req.ignore_eos,
        "json_schema": json_schema,
        "regex": regex,
        "logit_bias": {int(k): float(v)
                       for k, v in (req.logit_bias or {}).items()} or None,
    }
    return GenerateReqInput(
        text=prompt,
        sampling_params=sp,
        stream=req.stream,
        user_id=req.user_id or req.user,
        return_logprob=req.logprobs,
        top_logprobs_num=req.top_logprobs or 0,
        image_data=images or None,
    )
