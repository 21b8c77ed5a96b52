"""In-jit token sampling pipeline.

Capability parity with the reference's ``srt/layers/sampler.py`` +
``sampling/sampling_batch_info.py``: per-request temperature, top-k,
top-p, min-p, greedy, grammar vocab masking, and repetition penalties —
all executed on device inside the step function so decode needs no
host round-trip.  One descending sort per row serves both exact top-k
and exact top-p.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


class SamplingTensors(NamedTuple):
    """Per-row sampling controls, padded to the batch bucket."""

    temperature: jax.Array  # [B, 1] f32; 0 => greedy
    top_k: jax.Array  # [B] i32; 0 or >=V => disabled
    top_p: jax.Array  # [B] f32; 1.0 => disabled
    min_p: jax.Array  # [B] f32; 0.0 => disabled
    presence_penalty: jax.Array  # [B, 1] f32
    frequency_penalty: jax.Array  # [B, 1] f32
    repetition_penalty: jax.Array  # [B, 1] f32; 1.0 = off
    # sparse per-row logit bias (OpenAI logit_bias): token ids (-1 pad)
    # + additive values, scattered onto the logits in-jit
    bias_tokens: Optional[jax.Array] = None  # [B, NB] i32
    bias_values: Optional[jax.Array] = None  # [B, NB] f32

    @classmethod
    def greedy(cls, batch: int):
        return cls(
            temperature=jnp.zeros((batch, 1), jnp.float32),
            top_k=jnp.zeros((batch,), jnp.int32),
            top_p=jnp.ones((batch,), jnp.float32),
            min_p=jnp.zeros((batch,), jnp.float32),
            presence_penalty=jnp.zeros((batch, 1), jnp.float32),
            frequency_penalty=jnp.zeros((batch, 1), jnp.float32),
            repetition_penalty=jnp.ones((batch, 1), jnp.float32),
        )


def apply_penalties(
    logits: jax.Array,  # [B, V] f32
    output_counts: jax.Array,  # [B, V] i32 counts of generated tokens
    presence_penalty: jax.Array,  # [B, 1]
    frequency_penalty: jax.Array,  # [B, 1]
    repetition_penalty: jax.Array,  # [B, 1] (1.0 = off)
) -> jax.Array:
    logits = logits - frequency_penalty * output_counts
    logits = logits - presence_penalty * (output_counts > 0)
    pos = logits > 0
    seen = output_counts > 0
    rp = jnp.where(seen, repetition_penalty, 1.0)
    logits = jnp.where(pos, logits / rp, logits * rp)
    return logits


APPROX_TOPK = 64  # nucleus truncation window for mode="topk"


def _adjust_logits(logits, s, vocab_mask=None, output_counts=None):
    """Shared pre-sampling logit adjustment: penalties, grammar vocab
    mask, OpenAI logit_bias."""
    logits = logits.astype(jnp.float32)
    if output_counts is not None:
        logits = apply_penalties(
            logits,
            output_counts,
            s.presence_penalty,
            s.frequency_penalty,
            s.repetition_penalty,
        )
    if vocab_mask is not None:
        logits = jnp.where(vocab_mask, logits, NEG_INF)
    if s.bias_tokens is not None:
        # OpenAI logit_bias: out-of-range pad ids (-1 -> V) are dropped
        B, V = logits.shape
        rows = jnp.arange(B, dtype=jnp.int32)[:, None]
        toks = jnp.where(s.bias_tokens >= 0, s.bias_tokens, V)
        logits = logits.at[rows, toks].add(s.bias_values, mode="drop")
    return logits


def sample(
    logits: jax.Array,  # [B, V] (any float dtype)
    s: SamplingTensors,
    key: jax.Array,
    vocab_mask: Optional[jax.Array] = None,  # [B, V] bool, True = allowed
    output_counts: Optional[jax.Array] = None,  # [B, V] generated-token counts
    mode: str = "topk",  # "greedy" | "categorical" | "topk" | "full"
) -> jax.Array:
    """Returns sampled token ids [B] (greedy rows use argmax).

    ``mode`` is a static, host-chosen fast path (the runner inspects the
    batch's sampling params):
      greedy       all rows temperature 0 — one argmax, no sort
      categorical  no top-k/p/min-p filtering — softmax sample, no sort
      topk         top-k/p/min-p computed over the APPROX_TOPK head of the
                   distribution (lax.top_k); exact for top_k <= APPROX_TOPK
                   and numerically indistinguishable for practical top_p
      full         exact thresholds via a full-vocab sort
    """
    logits = _adjust_logits(logits, s, vocab_mask, output_counts)
    B, V = logits.shape

    greedy_ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if mode == "greedy":
        return greedy_ids

    temp = jnp.maximum(s.temperature, 1e-5)
    scaled = logits / temp

    if mode == "categorical":
        sampled = jax.random.categorical(key, scaled, axis=-1)
    elif mode == "topk":
        kk = min(APPROX_TOPK, V)
        top_logits, top_idx = jax.lax.top_k(scaled, kk)  # [B, kk]
        probs = jax.nn.softmax(top_logits, axis=-1)
        cumsum = jnp.cumsum(probs, axis=-1)
        in_nucleus = cumsum - probs < s.top_p[:, None]
        k = jnp.clip(jnp.where(s.top_k <= 0, V, s.top_k), 1, V)
        rank = jnp.arange(kk)[None, :]
        allowed = in_nucleus & (rank < k[:, None])
        allowed = allowed & (probs >= s.min_p[:, None] * probs[:, 0:1])
        masked = jnp.where(allowed, top_logits, NEG_INF)
        choice = jax.random.categorical(key, masked, axis=-1)
        sampled = jnp.take_along_axis(top_idx, choice[:, None], axis=-1)[:, 0]
    else:  # full: exact thresholds via sort
        probs = jax.nn.softmax(scaled, axis=-1)
        sorted_probs = jax.lax.sort(probs, dimension=-1, is_stable=False)[
            :, ::-1
        ]
        cumsum = jnp.cumsum(sorted_probs, axis=-1)
        in_nucleus = cumsum - sorted_probs < s.top_p[:, None]
        p_thresh = jnp.min(
            jnp.where(in_nucleus, sorted_probs, jnp.inf), axis=-1,
            keepdims=True,
        )
        k = jnp.clip(jnp.where(s.top_k <= 0, V, s.top_k), 1, V)
        k_thresh = jnp.take_along_axis(sorted_probs, (k - 1)[:, None], axis=-1)
        m_thresh = s.min_p[:, None] * sorted_probs[:, 0:1]
        thresh = jnp.maximum(jnp.maximum(p_thresh, k_thresh), m_thresh)
        allowed = probs >= thresh
        masked = jnp.where(allowed, scaled, NEG_INF)
        sampled = jax.random.categorical(key, masked, axis=-1)

    is_greedy = (s.temperature[:, 0] == 0.0)
    return jnp.where(is_greedy, greedy_ids, sampled).astype(jnp.int32)


def compute_logprobs(logits: jax.Array, tokens: jax.Array) -> jax.Array:
    """Log-prob of `tokens` [B] under `logits` [B, V]."""
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.take_along_axis(lp, tokens[:, None], axis=-1)[:, 0]


def _filtered_logits(logits, s, mode):
    """Full-vocab [R, V] logits with the sampler's temperature scaling
    and top-k/p/min-p filtering applied (NEG_INF outside the allowed
    set) — the exact distribution ``sample`` draws from, materialized so
    spec-verify can evaluate token probabilities under it."""
    R, V = logits.shape
    temp = jnp.maximum(s.temperature, 1e-5)
    scaled = logits / temp
    if mode in ("greedy", "categorical"):
        return scaled
    if mode == "topk":
        kk = min(APPROX_TOPK, V)
        top_logits, top_idx = jax.lax.top_k(scaled, kk)
        probs = jax.nn.softmax(top_logits, axis=-1)
        cumsum = jnp.cumsum(probs, axis=-1)
        in_nucleus = cumsum - probs < s.top_p[:, None]
        k = jnp.clip(jnp.where(s.top_k <= 0, V, s.top_k), 1, V)
        rank = jnp.arange(kk)[None, :]
        allowed = in_nucleus & (rank < k[:, None])
        allowed = allowed & (probs >= s.min_p[:, None] * probs[:, 0:1])
        rows = jnp.arange(R, dtype=jnp.int32)[:, None]
        return jnp.full_like(scaled, NEG_INF).at[rows, top_idx].set(
            jnp.where(allowed, top_logits, NEG_INF)
        )
    # mode == "full": exact thresholds
    probs = jax.nn.softmax(scaled, axis=-1)
    sorted_probs = jax.lax.sort(probs, dimension=-1, is_stable=False)[:, ::-1]
    cumsum = jnp.cumsum(sorted_probs, axis=-1)
    in_nucleus = cumsum - sorted_probs < s.top_p[:, None]
    p_thresh = jnp.min(
        jnp.where(in_nucleus, sorted_probs, jnp.inf), axis=-1, keepdims=True
    )
    k = jnp.clip(jnp.where(s.top_k <= 0, V, s.top_k), 1, V)
    k_thresh = jnp.take_along_axis(sorted_probs, (k - 1)[:, None], axis=-1)
    m_thresh = s.min_p[:, None] * sorted_probs[:, 0:1]
    thresh = jnp.maximum(jnp.maximum(p_thresh, k_thresh), m_thresh)
    return jnp.where(probs >= thresh, scaled, NEG_INF)


def spec_verify_sample(
    logits: jax.Array,  # [R, V] verify-row logits
    s: SamplingTensors,
    key: jax.Array,
    parent_rows: jax.Array,  # [R] i32 row index of each row's tree parent
    fed_tokens: jax.Array,  # [R] i32 draft token fed at each row (-1 pad)
    vocab_mask: Optional[jax.Array] = None,
    output_counts: Optional[jax.Array] = None,
    mode: str = "topk",
):
    """Distribution-preserving speculative verification outputs
    (reference ``sgl-kernel/csrc/speculative/speculative_sampling.cu``
    accept/reject semantics, recast for deterministic drafts):

      sampled [R]      the target's own sample per row (bonus token /
                       greedy compare), identical to ``sample``'s output
      edge_prob [R]    P(fed_tokens[r] | row parent_rows[r]) under the
                       FILTERED sampling distribution — the stochastic
                       accept probability of draft node r
      fallback [R]     a sample from row r's filtered distribution with
                       ALL of r's children's draft tokens masked out: the
                       residual distribution after rejecting them
                       (recursive rejection sampling; delta-q drafts)

    At temperature 0 edge_prob collapses to {0, 1} at the argmax and
    fallback to the argmax over non-children, so greedy accept is the
    special case."""
    R, V = logits.shape
    adjusted = _adjust_logits(logits, s, vocab_mask, output_counts)
    filt = _filtered_logits(adjusted, s, mode)
    greedy_ids = jnp.argmax(adjusted, axis=-1).astype(jnp.int32)
    is_greedy = s.temperature[:, 0] == 0.0

    probs = jax.nn.softmax(filt, axis=-1)
    safe_parent = jnp.clip(parent_rows, 0, R - 1)
    safe_fed = jnp.clip(fed_tokens, 0, V - 1)
    edge_prob = jnp.where(
        parent_rows >= 0, probs[safe_parent, safe_fed], 0.0
    )
    # greedy parents: exact-match accept (avoids 1e-5-temperature
    # softmax under/overflow edge cases)
    edge_prob = jnp.where(
        is_greedy[safe_parent] & (parent_rows >= 0),
        (greedy_ids[safe_parent] == safe_fed).astype(jnp.float32),
        edge_prob,
    )

    # mask each row's children tokens out of its own distribution
    drop_rows = jnp.where(parent_rows >= 0, safe_parent, R)
    child_masked = filt.at[drop_rows, safe_fed].set(NEG_INF, mode="drop")

    k1, k2 = jax.random.split(key)
    sampled = jnp.where(
        is_greedy, greedy_ids, jax.random.categorical(k1, filt, axis=-1)
    ).astype(jnp.int32)
    fallback = jnp.where(
        is_greedy,
        jnp.argmax(child_masked, axis=-1).astype(jnp.int32),
        jax.random.categorical(k2, child_masked, axis=-1).astype(jnp.int32),
    )
    return sampled, edge_prob, fallback
