"""Mesh construction + parameter/KV sharding specs.

The TPU replacement for the reference's rank-process parallel machinery
(``srt/distributed/parallel_state.py``, TP linear classes): parallelism
is a ``jax.sharding.Mesh`` with named axes and PartitionSpec trees over
the param/KV pytrees.  ``shard_map`` wraps the step so the Pallas
attention kernel runs on local KV heads; collectives (psum after
row-parallel projections, all-gather of vocab-sharded logits) are
explicit in the model code — they ride ICI, inserted exactly where the
reference calls NCCL all-reduce (``srt/models/llama.py`` o_proj/down_proj).

Axes:
  dp — data parallel (batch dim of the step; across pod slices via DCN)
  tp — tensor parallel (heads / hidden; intra-slice over ICI)
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def build_mesh(tp_size: int = 1, dp_size: int = 1, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    n = tp_size * dp_size
    assert len(devices) >= n, (len(devices), n)
    arr = np.asarray(devices[:n]).reshape(dp_size, tp_size)
    return Mesh(arr, axis_names=("dp", "tp"))


# ---------------------------------------------------------------- params
def _linear_pspec(p: dict, col_parallel: bool) -> dict:
    """PartitionSpec dict matching a linear param dict's structure.

    Column-parallel (qkv, gate_up, lm_head): shard output dim.
    Row-parallel (o, down): shard input dim; output needs a psum.
    Leading stacked-layer axis (if present) is handled by the caller
    adding a leading None.
    """
    if "w" in p:
        spec = {"w": P(None, "tp") if col_parallel else P("tp", None)}
    elif "packed" in p:
        if col_parallel:
            spec = {"packed": P(None, "tp"), "scale": P(None, "tp"),
                    "zero": P(None, "tp")}
        else:
            spec = {"packed": P("tp", None), "scale": P("tp", None),
                    "zero": P("tp", None)}
    elif "w_q" in p:
        if col_parallel:
            spec = {"w_q": P(None, "tp"), "w_scale": P(None, "tp")}
        else:
            spec = {"w_q": P("tp", None), "w_scale": P(None, None)}
    else:
        raise ValueError(list(p))
    if "b" in p:
        spec["b"] = P("tp") if col_parallel else P(None)
    return spec


def llama_param_pspecs(params: dict) -> dict:
    """PartitionSpec tree for the llama param layout (models/llama.py)."""

    def add_layer_dim(spec_dict):
        return jax.tree.map(
            lambda s: P(*((None,) + tuple(s))), spec_dict,
            is_leaf=lambda x: isinstance(x, P),
        )

    lp = params["layers"]
    layers = {
        "input_norm": P(None, None),
        "post_norm": P(None, None),
        "qkv": add_layer_dim(_linear_pspec(lp["qkv"], True)),
        "o": add_layer_dim(_linear_pspec(lp["o"], False)),
    }
    if "q_norm" in lp:  # per-head QK norm (replicated [L, hd])
        layers["q_norm"] = P(None, None)
        layers["k_norm"] = P(None, None)
    if "gate_up" in lp:  # dense FFN
        layers["gate_up"] = add_layer_dim(_linear_pspec(lp["gate_up"], True))
        layers["down"] = add_layer_dim(_linear_pspec(lp["down"], False))
    if "router" in lp:  # MoE: experts sharded over tp (expert parallelism)
        layers["router"] = P(None, None, None)
        layers["experts_gate_up"] = P(None, "tp", None, None)
        layers["experts_down"] = P(None, "tp", None, None)
        if "router_bias" in lp:
            layers["router_bias"] = P(None, None)
    if "shared_gate_up" in lp:
        layers["shared_gate_up"] = add_layer_dim(
            _linear_pspec(lp["shared_gate_up"], True)
        )
        layers["shared_down"] = add_layer_dim(
            _linear_pspec(lp["shared_down"], False)
        )
        layers["shared_gate"] = P(None, None, None)
    # norms carry the stacked layer dim only
    layers["input_norm"] = P(None, None)
    layers["post_norm"] = P(None, None)
    spec = {
        "embed": P(None, None),  # replicated (vocab gather stays local)
        "final_norm": P(None),
        "layers": layers,
    }
    if "lm_head" in params:
        spec["lm_head"] = _linear_pspec(params["lm_head"], True)
    return spec


def kv_pspec() -> P:
    """KV pool [L, Hkv, tokens, hd] (flat, head-major): shard heads over tp."""
    return P(None, "tp", None, None)


def shard_params(params: dict, mesh: Mesh) -> dict:
    specs = llama_param_pspecs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params,
        specs,
        is_leaf=lambda x: not isinstance(x, dict),
    )
