"""Distribution-preserving stochastic speculative acceptance tests
(VERDICT r3 task 4; reference semantics:
``sgl-kernel/csrc/speculative/speculative_sampling.cu`` /
``tree_speculative_sampling_target_only``).

Two layers of evidence:
  * sampler-level χ²: simulate many accept/reject walks through
    ``spec_verify_sample`` outputs and compare the committed-token
    distribution against the target softmax — chain and tree (recursive
    rejection over sibling drafts).
  * engine-level χ²: the NGRAM spec engine at temperature 1.0 / top_k 4
    must produce the same output distribution as the non-spec engine.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats

from sglang_security_tpu.layers.sampler import (
    SamplingTensors,
    spec_verify_sample,
)
from sglang_security_tpu.entrypoints.engine import Engine
from sglang_security_tpu.server_args import ServerArgs
from sglang_security_tpu.test_utils import make_tiny_llama


def _tensors(R, temperature=1.0, top_k=0):
    return SamplingTensors(
        temperature=jnp.full((R, 1), temperature, jnp.float32),
        top_k=jnp.full((R,), top_k, jnp.int32),
        top_p=jnp.ones((R,), jnp.float32),
        min_p=jnp.zeros((R,), jnp.float32),
        presence_penalty=jnp.zeros((R, 1), jnp.float32),
        frequency_penalty=jnp.zeros((R, 1), jnp.float32),
        repetition_penalty=jnp.ones((R, 1), jnp.float32),
    )


def _chi2_vs_expected(counts, probs, n):
    """One-sample χ² of observed counts vs expected probs (p > 0.001)."""
    exp = probs * n
    keep = exp > 3  # standard validity rule-of-thumb
    stat = float(np.sum((counts[keep] - exp[keep]) ** 2 / exp[keep]))
    dof = int(keep.sum()) - 1
    p = stats.chi2.sf(stat, max(dof, 1))
    return p


def test_chain_accept_distribution_chi2():
    """Committed token after one draft position ~ target softmax."""
    rng = np.random.default_rng(0)
    V = 12
    logits_parent = jnp.asarray(rng.standard_normal(V), jnp.float32)
    target = np.asarray(jax.nn.softmax(logits_parent))
    draft = int(np.argsort(target)[-2])  # a plausible (not argmax) draft

    # rows: [parent, child-fed-draft]
    logits = jnp.stack([logits_parent, logits_parent])
    s = _tensors(2)
    parent_rows = jnp.asarray([-1, 0], jnp.int32)
    fed = jnp.asarray([0, draft], jnp.int32)

    fn = jax.jit(lambda key: spec_verify_sample(
        logits, s, key, parent_rows, fed, mode="categorical"))
    N = 4000
    keys = jax.random.split(jax.random.PRNGKey(1), N)
    sampled_all, edge_all, fb_all = jax.vmap(fn)(keys)
    edge = np.asarray(edge_all)[:, 1]
    fallback = np.asarray(fb_all)[:, 0]
    u = rng.random(N)
    committed = np.where(u < edge, draft, fallback)

    counts = np.bincount(committed, minlength=V).astype(np.float64)
    p = _chi2_vs_expected(counts, target, N)
    assert p > 1e-3, (p, counts / N, target)
    # sanity: the draft token is genuinely accepted sometimes
    assert (committed == draft).sum() > 0.5 * N * target[draft]


def test_tree_sibling_rejection_distribution_chi2():
    """Two sibling drafts under one parent: recursive rejection keeps the
    committed-token distribution equal to the target softmax."""
    rng = np.random.default_rng(2)
    V = 10
    logits_parent = jnp.asarray(rng.standard_normal(V), jnp.float32)
    target = np.asarray(jax.nn.softmax(logits_parent))
    order = np.argsort(target)
    d1, d2 = int(order[-1]), int(order[-3])  # two drafted children

    logits = jnp.stack([logits_parent] * 3)
    s = _tensors(3)
    parent_rows = jnp.asarray([-1, 0, 0], jnp.int32)
    fed = jnp.asarray([0, d1, d2], jnp.int32)

    fn = jax.jit(lambda key: spec_verify_sample(
        logits, s, key, parent_rows, fed, mode="categorical"))
    N = 4000
    keys = jax.random.split(jax.random.PRNGKey(3), N)
    _, edge_all, fb_all = jax.vmap(fn)(keys)
    edge = np.asarray(edge_all)
    fallback = np.asarray(fb_all)[:, 0]  # parent's residual (both masked)

    committed = np.empty(N, np.int64)
    u = rng.random((N, 2))
    for t in range(N):
        p1, p2 = edge[t, 1], edge[t, 2]
        if u[t, 0] < p1:
            committed[t] = d1
        elif (1 - p1) > 1e-9 and u[t, 1] * (1 - p1) < p2:
            committed[t] = d2
        else:
            committed[t] = fallback[t]

    counts = np.bincount(committed, minlength=V).astype(np.float64)
    p = _chi2_vs_expected(counts, target, N)
    assert p > 1e-3, (p, counts / N, target)


def test_greedy_is_exact_match_special_case():
    """Temperature 0: edge_prob ∈ {0,1} at the argmax, fallback = argmax
    over non-children — identical to the old exact-match greedy accept."""
    rng = np.random.default_rng(4)
    V = 16
    logits_parent = jnp.asarray(rng.standard_normal(V), jnp.float32)
    argmax = int(np.argmax(np.asarray(logits_parent)))
    other = (argmax + 1) % V

    logits = jnp.stack([logits_parent] * 3)
    s = _tensors(3, temperature=0.0)
    parent_rows = jnp.asarray([-1, 0, 0], jnp.int32)
    fed = jnp.asarray([0, argmax, other], jnp.int32)
    _, edge, fb = spec_verify_sample(
        logits, s, jax.random.PRNGKey(0), parent_rows, fed, mode="greedy")
    edge = np.asarray(edge)
    assert edge[1] == 1.0 and edge[2] == 0.0
    # fallback masks both children: best remaining token
    masked = np.asarray(logits_parent).copy()
    masked[[argmax, other]] = -np.inf
    assert int(fb[0]) == int(np.argmax(masked))


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("tiny_spec_stoch") / "llama")
    make_tiny_llama(path)
    return path


def _engine(model_path, spec):
    return Engine(ServerArgs(
        model_path=model_path, dtype="float32", max_total_tokens=8192,
        page_size=8, prefill_token_buckets=[128],
        decode_bs_buckets=[1, 4, 64], max_seq_pages_buckets=[8, 16],
        speculative_algorithm="NGRAM" if spec else None,
        speculative_num_draft_tokens=4, random_seed=0,
        max_running_requests=64, log_level="warning",
    ))


def test_engine_temp1_distribution_and_accepts(model_path):
    """Engine-level: at temperature 1.0 / top_k 4 the spec engine's
    output distribution matches the non-spec engine (two-sample χ² over
    sampled outputs), and drafts get accepted stochastically (accept
    length meaningfully > 1 at temperature > 0 — the exact-match rule
    this replaces would accept almost nothing here).

    The NGRAM drafter rarely fires on random-model output, so the
    drafter is patched to always propose the base run's two most common
    tokens: ANY deterministic draft must leave the output distribution
    unchanged."""
    sp = {"temperature": 1.0, "top_k": 4, "max_new_tokens": 4,
          "ignore_eos": True}
    prompt = [7, 8, 9, 10] * 4
    N = 192

    def collect(spec, draft_tokens=None):
        eng = _engine(model_path, spec)
        if draft_tokens is not None:
            eng.scheduler.spec_drafter.draft = (
                lambda all_ids: list(draft_tokens)
            )
        try:
            outs = eng.generate(
                input_ids=[prompt] * N, sampling_params=sp)
            pairs = [tuple(o["output_ids"]) for o in outs]
            sched = eng.scheduler
            stats_ = (sched.spec_accept_sum, sched.spec_verify_count)
        finally:
            eng.shutdown()
        return pairs, stats_

    base_pairs, _ = collect(False)
    flat = [t for p in base_pairs for t in p[1:]]
    vals, cnts = np.unique(flat, return_counts=True)
    common = [int(t) for t in vals[np.argsort(cnts)[::-1][:2]]]
    spec_pairs, (acc_sum, ver_cnt) = collect(True, draft_tokens=common)

    cats = sorted(set(base_pairs) | set(spec_pairs))
    idx = {c: i for i, c in enumerate(cats)}
    o1 = np.bincount([idx[c] for c in base_pairs], minlength=len(cats))
    o2 = np.bincount([idx[c] for c in spec_pairs], minlength=len(cats))
    # two-sample χ² with pooled expectation; merge rare categories
    pooled = (o1 + o2) / 2
    keep = pooled >= 4
    o1k = np.append(o1[keep], o1[~keep].sum())
    o2k = np.append(o2[keep], o2[~keep].sum())
    ek = (o1k + o2k) / 2
    nz = ek > 0
    stat = float((((o1k - ek) ** 2 / np.where(nz, ek, 1))[nz]).sum()
                 + (((o2k - ek) ** 2 / np.where(nz, ek, 1))[nz]).sum())
    dof = int(nz.sum()) - 1
    p = stats.chi2.sf(stat, max(dof, 1))
    assert p > 1e-3, (p, list(zip(cats, o1, o2)))

    assert ver_cnt > 0
    accept_len = acc_sum / ver_cnt
    assert accept_len > 1.1, accept_len


def test_spec_composes_with_grammar(model_path):
    """Per-request gating (VERDICT r3 weak #4): a grammar request no
    longer disables speculation for the batch — per-row DFA masks ride
    the verify step and the output still satisfies the constraint."""
    eng = _engine(model_path, spec=True)
    # force drafts so spec rounds actually run
    eng.scheduler.spec_drafter.draft = lambda all_ids: [11, 12]
    try:
        sp = {"temperature": 0.0, "max_new_tokens": 8, "ignore_eos": True,
              "regex": "[ab]{8}"}
        out = eng.generate(prompt="hello", sampling_params=sp)
        sched = eng.scheduler
        assert sched.spec_verify_count > 0
        import re

        assert re.fullmatch(r"[ab]{0,8}", out["text"]), out["text"]
    finally:
        eng.shutdown()


def test_spec_composes_with_penalties(model_path):
    """Presence penalties no longer disable speculation; penalty counts
    update from committed tokens only."""
    eng = _engine(model_path, spec=True)
    eng.scheduler.spec_drafter.draft = lambda all_ids: [11, 12]
    try:
        sp = {"temperature": 0.0, "max_new_tokens": 12, "ignore_eos": True,
              "presence_penalty": 1.5}
        out = eng.generate(prompt="hello", sampling_params=sp)
        sched = eng.scheduler
        assert sched.spec_verify_count > 0
        assert len(out["output_ids"]) == 12
        # a strong presence penalty forbids immediate greedy repetition
        ids = out["output_ids"]
        assert any(ids[i] != ids[0] for i in range(1, len(ids)))
    finally:
        eng.shutdown()
