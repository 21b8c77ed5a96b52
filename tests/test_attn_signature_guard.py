"""Guard against forward-kwarg drift across model subclasses.

Round-4 postmortem: a new kwarg (``spec_verify``) added to
``LlamaForCausalLM._attn_apply`` and threaded through the shared layer
scan broke every subclass that overrode ``_attn_apply`` with an explicit
keyword list (Gemma2/3, DeepSeek family) — 16 red tests at the snapshot.

This test enforces the convention: any override of a shared per-layer
hook must either accept ``**kw`` or explicitly list every kwarg the base
class's scan passes.  It inspects signatures (cheap; no tracing), so it
catches the drift the moment a new kwarg lands in the base.
"""

import inspect

from sglang_security_tpu.models.registry import MODEL_REGISTRY
from sglang_security_tpu.models.llama import LlamaForCausalLM

# Hooks invoked from the shared Llama layer scan with keyword arguments.
SHARED_HOOKS = ["_attn_apply", "_ffn_apply"]


def _kwargs_of(fn):
    sig = inspect.signature(fn)
    names = set()
    has_var_kw = False
    for p in sig.parameters.values():
        if p.kind == inspect.Parameter.VAR_KEYWORD:
            has_var_kw = True
        elif p.kind in (
            inspect.Parameter.KEYWORD_ONLY,
            inspect.Parameter.POSITIONAL_OR_KEYWORD,
        ):
            names.add(p.name)
    return names, has_var_kw


def test_attn_apply_overrides_accept_base_kwargs():
    base_kwargs = {
        hook: _kwargs_of(getattr(LlamaForCausalLM, hook))[0]
        for hook in SHARED_HOOKS
    }
    offenders = []
    seen = set()
    for arch, cls in sorted(MODEL_REGISTRY.items()):
        for hook in SHARED_HOOKS:
            fn = getattr(cls, hook, None)
            base_fn = getattr(LlamaForCausalLM, hook, None)
            if fn is None or base_fn is None or fn is base_fn:
                continue
            # Only classes sharing the Llama body/scan are called with the
            # base kwarg set.
            if not issubclass(cls, LlamaForCausalLM):
                continue
            key = (cls.__qualname__, hook)
            if key in seen:
                continue
            seen.add(key)
            names, var_kw = _kwargs_of(fn)
            if var_kw:
                continue
            missing = base_kwargs[hook] - names - {"self"}
            if missing:
                offenders.append(f"{cls.__qualname__}.{hook}: missing {sorted(missing)}")
    assert not offenders, (
        "Subclass hook overrides out of sync with the base layer scan "
        "(add **kw or the new kwargs):\n" + "\n".join(offenders)
    )
