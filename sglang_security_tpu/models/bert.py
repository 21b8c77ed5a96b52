"""BERT-family bidirectional encoders on the encode path.

Capability parity with the reference's ``srt/models/bert.py`` (BertModel
/ Contriever) and ``roberta.py`` (XLMRobertaModel): full bidirectional
self-attention (block-diagonal across the batched sequences), learned
absolute positions + token-type embeddings, post-LN transformer blocks,
and the reference's Pooler(LAST, normalize=True) pooling
(``bert.py:337``).  Served through Engine.encode / /v1/embeddings.

The paged KV pool is pass-through: encoders generate nothing, so the
forward runs plain batched attention under one prefill step.  RoBERTa
differs only by its position-id offset (padding_idx + 1).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from sglang_security_tpu.layers.norms import layer_norm
from sglang_security_tpu.models.config import ModelConfig


def _act(name):
    return {"gelu": jax.nn.gelu, "relu": jax.nn.relu,
            "silu": jax.nn.silu}.get(name, jax.nn.gelu)


class BertModel:
    is_pooling_model = True
    position_offset = 0  # RoBERTa: padding_idx + 1

    def __init__(self, config: ModelConfig, quantization=None,
                 tp_size: int = 1):
        # encoders are small; quantization/TP intentionally unused
        self.config = config
        self.quantization = None
        self.tp_size = 1
        self.kv_page_size = 32
        raw = config.raw
        self.ln_eps = float(raw.get("layer_norm_eps", 1e-12))
        config.max_position = int(
            raw.get("max_position_embeddings", config.max_position)
        )

    # ------------------------------------------------------------ params
    def init_dummy_params(self, seed: int = 0, dtype=jnp.float32,
                          unique_layers: bool = False):
        cfg = self.config
        key = jax.random.PRNGKey(seed)
        H, I, V = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
        c = [0]

        def rand(*shape):
            c[0] += 1
            return jax.random.normal(
                jax.random.fold_in(key, c[0]), shape, jnp.float32
            ).astype(dtype) * (1.0 / np.sqrt(shape[0]))

        def ln():
            return {"w": jnp.ones((H,), dtype), "b": jnp.zeros((H,), dtype)}

        def one_layer(_):
            return {
                "q_w": rand(H, H), "q_b": jnp.zeros((H,), dtype),
                "k_w": rand(H, H), "k_b": jnp.zeros((H,), dtype),
                "v_w": rand(H, H), "v_b": jnp.zeros((H,), dtype),
                "o_w": rand(H, H), "o_b": jnp.zeros((H,), dtype),
                "attn_ln": ln(),
                "fc_w": rand(H, I), "fc_b": jnp.zeros((I,), dtype),
                "out_w": rand(I, H), "out_b": jnp.zeros((H,), dtype),
                "out_ln": ln(),
            }

        layers = [one_layer(i) for i in range(cfg.num_layers)]
        return {
            "word_emb": rand(V, H),
            "pos_emb": rand(cfg.max_position, H),
            "type_emb": rand(2, H),
            "emb_ln": ln(),
            "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
        }

    def load_weights(self, get_tensor, dtype=jnp.float32):
        cfg = self.config

        def probe(name):
            try:
                get_tensor(name)
                return True
            except KeyError:
                return False

        # hub exports may or may not carry the bert./roberta. prefix
        pre = ""
        for cand in ("bert.", "roberta.", ""):
            if probe(cand + "embeddings.word_embeddings.weight"):
                pre = cand
                break

        def t(name):
            return jnp.asarray(get_tensor(pre + name)).astype(jnp.float32)

        def ln(prefix):
            return {"w": t(prefix + ".weight").astype(dtype),
                    "b": t(prefix + ".bias").astype(dtype)}

        def lin(prefix, transpose=True):
            w = t(prefix + ".weight")
            return (w.T if transpose else w).astype(dtype)

        layers = []
        for i in range(cfg.num_layers):
            p = f"encoder.layer.{i}."
            a = p + "attention."
            layers.append({
                "q_w": lin(a + "self.query"),
                "q_b": t(a + "self.query.bias").astype(dtype),
                "k_w": lin(a + "self.key"),
                "k_b": t(a + "self.key.bias").astype(dtype),
                "v_w": lin(a + "self.value"),
                "v_b": t(a + "self.value.bias").astype(dtype),
                "o_w": lin(a + "output.dense"),
                "o_b": t(a + "output.dense.bias").astype(dtype),
                "attn_ln": ln(a + "output.LayerNorm"),
                "fc_w": lin(p + "intermediate.dense"),
                "fc_b": t(p + "intermediate.dense.bias").astype(dtype),
                "out_w": lin(p + "output.dense"),
                "out_b": t(p + "output.dense.bias").astype(dtype),
                "out_ln": ln(p + "output.LayerNorm"),
            })
        return {
            "word_emb": t("embeddings.word_embeddings.weight").astype(dtype),
            "pos_emb": t(
                "embeddings.position_embeddings.weight"
            ).astype(dtype),
            "type_emb": t(
                "embeddings.token_type_embeddings.weight"
            ).astype(dtype),
            "emb_ln": ln("embeddings.LayerNorm"),
            "layers": jax.tree.map(
                lambda *xs: jnp.stack(xs), *layers
            ),
        }

    def unroll_params(self, params):
        return params  # scan over the stacked encoder is fine

    # ----------------------------------------------------------- forward
    def forward(self, params, k_pages, v_pages, fb, *, block_q,
                pages_per_block: int = 8, interpret: Optional[bool] = None,
                tp_size: int = 1, tp_axis=None, pp_axis=None,
                pp_size: int = 1, pp_microbatches: int = 1, dp_axis=None,
                lora=None, return_all: bool = False):
        assert tp_axis is None and pp_axis is None and dp_axis is None, (
            "encoder embedding models run single-shard"
        )
        cfg = self.config
        T = fb.token_ids.shape[0]
        S = fb.q_starts.shape[0]
        Hq = cfg.num_q_heads
        hd = cfg.hidden_size // Hq

        pos = jnp.clip(
            fb.positions + self.position_offset, 0,
            params["pos_emb"].shape[0] - 1,
        )
        x = (
            params["word_emb"][fb.token_ids]
            + params["pos_emb"][pos]
            + params["type_emb"][0]
        )
        x = layer_norm(x, params["emb_ln"]["w"], params["emb_ln"]["b"],
                       self.ln_eps)

        # block-diagonal bidirectional mask over the packed sequences:
        # row r belongs to the sequence whose [start, start+len) covers it
        rows = jnp.arange(T, dtype=jnp.int32)
        seg = (
            jnp.sum(rows[:, None] >= fb.q_starts[None, :], axis=1) - 1
        )  # [T] sequence index (last segment for padding rows)
        seg = jnp.clip(seg, 0, S - 1)
        valid = rows < fb.q_starts[seg] + fb.q_lens[seg]
        mask = (
            (seg[:, None] == seg[None, :])
            & valid[:, None]
            & valid[None, :]
        )
        neg = jnp.asarray(-1e30, jnp.float32)

        def body(x, lp):
            q = (x @ lp["q_w"] + lp["q_b"]).reshape(T, Hq, hd)
            k = (x @ lp["k_w"] + lp["k_b"]).reshape(T, Hq, hd)
            v = (x @ lp["v_w"] + lp["v_b"]).reshape(T, Hq, hd)
            scores = jnp.einsum(
                "qhd,khd->hqk", q, k, preferred_element_type=jnp.float32
            ) * (hd**-0.5)
            scores = jnp.where(mask[None], scores, neg)
            probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
            o = jnp.einsum("hqk,khd->qhd", probs, v).reshape(T, Hq * hd)
            o = o @ lp["o_w"] + lp["o_b"]
            x = layer_norm(x + o, lp["attn_ln"]["w"], lp["attn_ln"]["b"],
                           self.ln_eps)
            h = _act(cfg.act_fn)(x @ lp["fc_w"] + lp["fc_b"])
            h = h @ lp["out_w"] + lp["out_b"]
            x = layer_norm(x + h, lp["out_ln"]["w"], lp["out_ln"]["b"],
                           self.ln_eps)
            return x, None

        x, _ = jax.lax.scan(body, x, params["layers"])
        safe = jnp.clip(fb.out_rows, 0, T - 1)
        return x[safe], k_pages, v_pages

    def pool(self, params, hidden):
        h = hidden.astype(jnp.float32)
        return h * jax.lax.rsqrt(
            jnp.maximum(jnp.sum(h * h, axis=-1, keepdims=True), 1e-12)
        )


class XLMRobertaModel(BertModel):
    """RoBERTa positions start at padding_idx + 1 (HF convention)."""

    def __init__(self, config, quantization=None, tp_size: int = 1):
        super().__init__(config, quantization, tp_size)
        self.position_offset = int(config.raw.get("pad_token_id", 1)) + 1
