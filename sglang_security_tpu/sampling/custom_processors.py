"""Custom logit processors.

TPU-native form of the reference's custom logit processor support
(``sampling/custom_logit_processor.py`` + ``--enable-custom-logit-
processor``): the reference ships pickled callables per request and
runs them eagerly on the GPU logits; under XLA the processor must be
traceable, so processors register by NAME server-side and requests
select one via ``sampling_params.custom_logit_processor`` with float
``custom_params``.  The active processor set becomes part of the
compiled step (a static key), per-request row masks select which rows
each processor rewrites, and per-request params arrive as [S] arrays.

A processor is ``fn(logits [S, V] f32, params: dict[str, [S] f32])
-> [S, V] f32`` built from jax/jnp ops only.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax.numpy as jnp

_REGISTRY: Dict[str, Callable] = {}


def register_custom_logit_processor(name: str, fn: Callable) -> None:
    _REGISTRY[name] = fn


def get_custom_logit_processor(name: str) -> Callable:
    try:
        return _REGISTRY[name]
    except KeyError:
        raise ValueError(
            f"unknown custom logit processor {name!r}; registered: "
            f"{sorted(_REGISTRY)}"
        )


# ---- built-ins (reference examples) ------------------------------------
def _disallow_token(logits, params):
    """params: token_id (and optional penalty, default -inf)."""
    tok = params["token_id"].astype(jnp.int32)  # [S]
    rows = jnp.arange(logits.shape[0])
    return logits.at[rows, tok].set(-1e30)


def _min_token_boost(logits, params):
    """Additively boost one token id by params['bias']."""
    tok = params["token_id"].astype(jnp.int32)
    rows = jnp.arange(logits.shape[0])
    return logits.at[rows, tok].add(params.get("bias", 0.0))


register_custom_logit_processor("disallow_token", _disallow_token)
register_custom_logit_processor("boost_token", _min_token_boost)
