"""Reward and sequence-classification heads on the llama-family body.

Capability parity with the reference's ``srt/models/qwen2_rm.py``
(Qwen2ForRewardModel: MLP score head, last-token pooling, no
normalization) and ``llama_classification.py`` /
``qwen2_classification.py`` (single linear score head producing
``num_labels`` logits).  Served through the encode path
(Engine.encode / /v1/embeddings): the "embedding" of a request is the
reward score / class logits.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sglang_security_tpu.models.llama import LlamaForCausalLM


class Qwen2ForRewardModel(LlamaForCausalLM):
    """score = Linear(H, H) -> ReLU -> Linear(H, 1) on the last token."""

    is_pooling_model = True

    def __init__(self, config, quantization=None, tp_size: int = 1):
        # these checkpoints carry no lm_head; tie so the base loader
        # skips it (logits are never computed on the pooling path)
        config.tie_word_embeddings = True
        super().__init__(config, quantization, tp_size)

    def load_weights(self, get_tensor, dtype=jnp.bfloat16):
        params = super().load_weights(get_tensor, dtype)
        t = lambda n: jnp.asarray(get_tensor(n)).astype(jnp.float32)
        params["score"] = {
            "w0": t("score.0.weight").T.astype(dtype),
            "b0": t("score.0.bias").astype(dtype),
            "w2": t("score.2.weight").T.astype(dtype),
            "b2": t("score.2.bias").astype(dtype),
        }
        return params

    def pool(self, params, hidden):
        sc = params["score"]
        h = hidden.astype(jnp.float32)
        h = jax.nn.relu(
            h @ sc["w0"].astype(jnp.float32) + sc["b0"].astype(jnp.float32)
        )
        return h @ sc["w2"].astype(jnp.float32) + sc["b2"].astype(jnp.float32)


class LlamaForSequenceClassification(LlamaForCausalLM):
    """Single linear ``score`` head -> [S, num_labels] logits (HF
    *ForSequenceClassification convention, last-token pooling)."""

    is_pooling_model = True

    def __init__(self, config, quantization=None, tp_size: int = 1):
        config.tie_word_embeddings = True
        super().__init__(config, quantization, tp_size)

    def load_weights(self, get_tensor, dtype=jnp.bfloat16):
        params = super().load_weights(get_tensor, dtype)
        params["score"] = {
            "w": jnp.asarray(get_tensor("score.weight")).T.astype(dtype),
        }
        return params

    def pool(self, params, hidden):
        h = hidden.astype(jnp.float32)
        return h @ params["score"]["w"].astype(jnp.float32)


class Qwen2ForSequenceClassification(LlamaForSequenceClassification):
    pass


def _make_score_head(base_cls, head_name: str = "score"):
    """Bolt a bias-free linear head + last-token pooling onto any body
    (reference gemma2_reward.py / internlm2_reward.py pattern)."""

    class ScoreHead(base_cls):
        is_pooling_model = True

        def __init__(self, config, quantization=None, tp_size: int = 1):
            config.tie_word_embeddings = True
            super().__init__(config, quantization, tp_size)

        def load_weights(self, get_tensor, dtype=jnp.bfloat16):
            params = super().load_weights(get_tensor, dtype)
            params["score"] = {
                "w": jnp.asarray(
                    get_tensor(f"{head_name}.weight")
                ).T.astype(dtype),
            }
            return params

        def pool(self, params, hidden):
            h = hidden.astype(jnp.float32)
            return h @ params["score"]["w"].astype(jnp.float32)

    return ScoreHead


class LlamaEmbeddingModel(LlamaForCausalLM):
    """Decoder-as-embedder (e5-mistral class): last-token hidden state,
    L2-normalized (reference ``srt/models/llama_embedding.py`` with
    ``Pooler(pooling_type=LAST, normalize=True)``).  Checkpoints are
    bare ``MistralModel``/``LlamaModel`` exports whose tensor names may
    lack the ``model.`` prefix."""

    is_pooling_model = True

    def __init__(self, config, quantization=None, tp_size: int = 1):
        config.tie_word_embeddings = True  # no lm_head in the checkpoint
        super().__init__(config, quantization, tp_size)

    def load_weights(self, get_tensor, dtype=jnp.bfloat16):
        try:
            get_tensor("model.embed_tokens.weight")
            fetch = get_tensor
        except KeyError:
            fetch = lambda name: get_tensor(name.removeprefix("model."))
        return super().load_weights(fetch, dtype)

    def pool(self, params, hidden):
        h = hidden.astype(jnp.float32)
        return h * jax.lax.rsqrt(
            jnp.maximum(jnp.sum(h * h, axis=-1, keepdims=True), 1e-12)
        )
