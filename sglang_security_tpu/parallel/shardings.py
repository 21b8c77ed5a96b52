"""Mesh construction + parameter/KV sharding specs.

The TPU replacement for the reference's rank-process parallel machinery
(``srt/distributed/parallel_state.py:1102-1177``, TP linear classes
``srt/layers/linear.py:102-1130``): parallelism is a
``jax.sharding.Mesh`` with named axes and PartitionSpec trees over the
param/KV pytrees.  ``shard_map`` wraps the step so the Pallas attention
kernel runs on local KV heads; collectives (psum after row-parallel
projections, all-gather of vocab-sharded logits) are explicit in the
model code — they ride ICI, inserted exactly where the reference calls
NCCL all-reduce (``srt/models/llama.py`` o_proj/down_proj).

Axes:
  dp — data parallel (batch dim of the step; across pod slices via DCN).
       In-process DP is engine-level (replica per dp rank, reference
       ``data_parallel_controller.py`` semantics), so runner meshes are
       (1, tp); the axis exists so specs stay uniform.
  tp — tensor parallel (heads / hidden / experts; intra-slice over ICI)
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def build_mesh(
    tp_size: int = 1, dp_size: int = 1, pp_size: int = 1, devices=None
) -> Mesh:
    """Mesh axes (dp, pp, tp): tp innermost so it rides the closest ICI
    links; pp stages are adjacent groups of tp blocks."""
    if devices is None:
        devices = jax.devices()
    n = tp_size * dp_size * pp_size
    assert len(devices) >= n, (len(devices), n)
    arr = np.asarray(devices[:n]).reshape(dp_size, pp_size, tp_size)
    return Mesh(arr, axis_names=("dp", "pp", "tp"))


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


_COL_KEYS = ("qkv", "gate_up", "shared_gate_up")
_ROW_KEYS = ("o", "down", "shared_down")
# per-head MLA factors: shard the head dim (dim 1 after the layer stack)
_HEAD_STACKED = ("w_uk", "w_uv")
# column-parallel plain arrays (output columns are head-major)
_COL_PLAIN = ("q_b", "q_proj")
# expert-stacked weights: shard experts (EP rides the tp axis);
# int8-expert scales [E, 1, N] shard the same way
_EXPERT_KEYS = ("experts_gate_up", "experts_down",
                "experts_gate_up_scale", "experts_down_scale")


def _layer_pspecs(lp: dict, pp: bool = False) -> dict:
    """Specs for one stacked layer-group dict (leading dim = layers);
    with ``pp`` the layer dim shards over the pipeline axis."""
    lead = "pp" if pp else None

    def add_layer_dim(spec_dict):
        return jax.tree.map(
            lambda s: P(*((lead,) + tuple(s))), spec_dict,
            is_leaf=lambda x: isinstance(x, P),
        )

    def repl(v):
        ndim = jax.tree.leaves(v)[0].ndim
        return P(*((lead,) + (None,) * (ndim - 1)))

    specs = {}
    for key, val in lp.items():
        if key in _COL_KEYS:
            specs[key] = add_layer_dim(_linear_pspec(val, True))
        elif key in _ROW_KEYS:
            specs[key] = add_layer_dim(_linear_pspec(val, False))
        elif key in _COL_PLAIN:
            specs[key] = P(lead, None, "tp")
        elif key in _HEAD_STACKED:
            specs[key] = P(lead, "tp", None, None)
        elif key in _EXPERT_KEYS:
            specs[key] = P(lead, "tp", None, None)
        else:
            # norms, routers, kv_a, biases ... — replicated within a
            # stage (still layer-sharded over pp)
            specs[key] = jax.tree.map(
                lambda a: P(*((lead,) + (None,) * (a.ndim - 1))), val
            ) if isinstance(val, dict) else repl(val)
    return specs


def param_pspecs(params: dict, pp: bool = False) -> dict:
    """PartitionSpec tree for any model family's param layout (stacked
    layer groups; call before ``unroll_params``)."""
    spec = {}
    for key, val in params.items():
        if key in ("layers", "dense_layers"):
            assert not isinstance(val, list), "build pspecs before unrolling"
            spec[key] = _layer_pspecs(val, pp=pp)
        elif key == "embed":
            spec[key] = P(None, None)  # replicated (tied logits stay local)
        elif key == "final_norm":
            # plain weight vector, or {"w","b"} for LayerNorm families
            spec[key] = (
                jax.tree.map(lambda a: P(None), val)
                if isinstance(val, dict) else P(None)
            )
        elif key == "lm_head":
            spec[key] = _linear_pspec(val, True)
        else:
            spec[key] = jax.tree.map(lambda a: P(*((None,) * a.ndim)), val)
    return spec


# kept for round-1 callers/tests
llama_param_pspecs = param_pspecs


def unroll_pspecs(pspecs: dict, params_unrolled: dict) -> dict:
    """Match a pspec tree to ``Model.unroll_params`` output: stacked layer
    groups become per-layer lists with the leading layer dim dropped."""

    def strip(s):
        return P(*tuple(s)[1:])

    out = dict(pspecs)
    for key in ("layers", "dense_layers"):
        if key in params_unrolled and isinstance(params_unrolled[key], list):
            per_layer = jax.tree.map(
                strip, pspecs[key], is_leaf=lambda x: isinstance(x, P)
            )
            out[key] = [per_layer for _ in params_unrolled[key]]
    return out


def kv_pspec(
    num_kv_heads: int, tp_size: int, pp: bool = False, dp: bool = False
) -> P:
    """KV pool [L, Hkv, tokens, hd] (flat, head-major): shard heads over
    tp when divisible; MLA (one latent head) replicates the pool across
    tp like the reference's MQA TP.  Under pp the layer dim shards over
    the pipeline axis — each stage holds KV only for its own layers.
    Under dp attention the token dim shards over dp — each dp group
    holds only its own requests' pages (the point of dp attention for
    MLA: no tp replication of the latent KV)."""
    lead = "pp" if pp else None
    tok = "dp" if dp else None
    if tp_size > 1 and num_kv_heads % tp_size == 0:
        return P(lead, "tp", tok, None)
    return P(lead, None, tok, None)


def shard_params(params: dict, mesh: Mesh, pspecs: Optional[dict] = None) -> dict:
    if pspecs is None:
        pspecs = param_pspecs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params,
        pspecs,
        is_leaf=lambda x: not isinstance(x, dict),
    )
