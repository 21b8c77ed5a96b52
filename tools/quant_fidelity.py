"""On-chip quantization-fidelity proxy (VERDICT r3 item #5).

Real-weights GSM8K is unreachable in this environment (no network, no
local checkpoints), so this measures what CAN be measured on the chip:
teacher-forced logit fidelity of the INT4 (w4a16) and W4A8 serving
paths against the bf16 path on the SAME dummy-seeded weights, at true
Llama-3-8B layer shapes (half depth: 16 layers, so bf16 + transients
fit the 16 GB HBM; per-layer error is shape-exact, depth only compounds
it).  Metrics over ~2k teacher-forced positions:

  * mean / p99 KL(bf16 ‖ quant) in nats
  * top-1 agreement (greedy-decode match rate)
  * top-8 overlap (sampling-pool preservation)

Reference intent: test_eval_accuracy_large.py:54 (GSM8K delta <= 1%);
the GSM8K harness (eval/) stays wired for when weights are reachable.

Run:  python tools/quant_fidelity.py     (needs the axon tunnel)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

HALF_LLAMA3_8B = {
    "architectures": ["LlamaForCausalLM"],
    "hidden_size": 4096,
    "intermediate_size": 14336,
    # 4 layers, not model depth: RANDOM weights are chaotic — per-layer
    # perturbations (quantization noise included) amplify exponentially
    # with depth, so a deep dummy forward measures chaos, not quant
    # quality (r5 finding: 16 layers gave 18-26 nat KLs for EVERY
    # variant).  Shallow depth bounds the Lyapunov growth; depth
    # compounding on real checkpoints is contractive (trained norms)
    # and is what the GSM8K north star will measure.
    "num_hidden_layers": 4,
    "num_attention_heads": 32,
    "num_key_value_heads": 8,
    "head_dim": 128,
    "vocab_size": 128256,
    "rms_norm_eps": 1e-5,
    "rope_theta": 500000.0,
    "max_position_embeddings": 8192,
    "tie_word_embeddings": False,
    "model_type": "llama",
}

SEQ_LEN = 512
N_SEQS = 4
PAGE_SIZE = 64
CHUNK = 256


def model_logprobs(quantization, lm_head="auto"):
    """Teacher-forced log-softmax rows [N_SEQS*SEQ_LEN, V] (host f32),
    computed with the production prefill path (Pallas attention +
    quantized Pallas matmuls, interpret=False)."""
    import jax
    import jax.numpy as jnp

    from sglang_security_tpu.model_executor.forward_batch import ForwardBatch
    from sglang_security_tpu.model_loader.loader import load_model

    model_dir = "/tmp/fidelity_llama3_8b_half"
    os.makedirs(model_dir, exist_ok=True)
    with open(os.path.join(model_dir, "config.json"), "w") as f:
        json.dump(HALF_LLAMA3_8B, f)
    model, params, cfg = load_model(
        model_dir, load_format="dummy", quantization=quantization,
        dtype="bfloat16", seed=0, lm_head_quantization=lm_head,
    )
    model.kv_page_size = PAGE_SIZE

    pps = SEQ_LEN // PAGE_SIZE
    kshape = (cfg.num_layers, cfg.kv_cache_num_heads,
              (pps + 1) * PAGE_SIZE, cfg.kv_cache_head_dim)

    @jax.jit
    def prefill(params, toks):
        k_pages = jnp.zeros(kshape, jnp.bfloat16)
        v_pages = jnp.zeros(kshape, jnp.bfloat16)
        n = SEQ_LEN
        slots = PAGE_SIZE + jnp.arange(n, dtype=jnp.int32)
        pages = 1 + jnp.arange(pps, dtype=jnp.int32)
        fb = ForwardBatch(
            token_ids=toks,
            positions=jnp.arange(n, dtype=jnp.int32),
            slots=slots,
            q_starts=jnp.asarray([0], jnp.int32),
            q_lens=jnp.asarray([n], jnp.int32),
            kv_lens=jnp.asarray([n], jnp.int32),
            page_indices=pages[None],
            out_rows=jnp.asarray([n - 1], jnp.int32),
        )
        _, x_all, _, _ = model.forward(
            params, k_pages, v_pages, fb, block_q=128, pages_per_block=2,
            interpret=False, return_all=True,
        )
        return x_all

    @jax.jit
    def lp_chunk(params, x):
        logits = model.compute_logits(params, x)
        return jax.nn.log_softmax(logits, axis=-1)

    rng = np.random.default_rng(7)
    out = []
    for s in range(N_SEQS):
        toks = rng.integers(10, 120000, SEQ_LEN).astype(np.int32)
        x_all = prefill(params, jnp.asarray(toks))
        for c0 in range(0, SEQ_LEN, CHUNK):
            lp = lp_chunk(params, x_all[c0 : c0 + CHUNK])
            out.append(np.asarray(jax.device_get(lp), np.float32))
    del params, model
    return np.concatenate(out, axis=0)


def compare(ref_lp, q_lp, k=8):
    p = np.exp(ref_lp)
    # q_lp rows can hold -inf (log_softmax underflow on extreme int4
    # logits); where ref mass is ~0 the term is 0, not 0*inf=NaN
    diff = ref_lp - np.maximum(q_lp, -80.0)
    kl = np.where(p > 0, p * diff, 0.0).sum(-1)
    top1 = ref_lp.argmax(-1) == q_lp.argmax(-1)
    rtop = np.argpartition(-ref_lp, k, axis=-1)[:, :k]
    qtop = np.argpartition(-q_lp, k, axis=-1)[:, :k]
    overlap = np.asarray([
        len(set(a) & set(b)) / k for a, b in zip(rtop, qtop)
    ])
    return {
        "kl_mean_nats": float(kl.mean()),
        "kl_p99_nats": float(np.percentile(kl, 99)),
        "top1_agreement": float(top1.mean()),
        "top8_overlap": float(overlap.mean()),
        "positions": int(ref_lp.shape[0]),
    }


def main() -> None:
    import jax

    # structured dummy weights (VERDICT r4 task 6): lognormal
    # per-channel scales + 1% x8 outlier channels on every linear (the
    # statistic that stresses group quantization in real checkpoints)
    # and a low-rank-dominant lm_head (non-degenerate logit gaps, so
    # top-1 agreement is meaningful instead of a coin flip over
    # near-iid logits)
    os.environ["SGLANG_TPU_DUMMY_SPECTRUM"] = "structured"
    print("devices:", jax.devices(), flush=True)
    print("bf16 reference pass...", flush=True)
    ref = model_logprobs(None)
    ent = float(-(np.exp(ref) * ref).sum(-1).mean())
    print(f"reference entropy {ent:.2f} nats", flush=True)
    results = {}
    # auto = the serving default (int8 per-channel lm_head with any
    # quantized body); the bf16head variant isolates the head's
    # incremental cost for the gate
    for name, q, head in (
        ("int4", "int4", "auto"),
        ("w4a8", "w4a8", "auto"),
        ("w4a8_bf16head", "w4a8", "none"),
        # head in isolation: bf16 body + int8 per-channel lm_head —
        # the cleanest signal for the int8-head default decision
        ("int8head_only", None, "int8"),
    ):
        print(f"{name} pass...", flush=True)
        qlp = model_logprobs(q, lm_head=head)
        results[name] = compare(ref, qlp)
        del qlp
        print(name, results[name], flush=True)
    print(json.dumps({
        "proxy": "teacher-forced logit fidelity vs bf16, llama3-8b "
                 "layer shapes (4 layers — random deep nets are "
                 "chaotic, see HALF_LLAMA3_8B comment), STRUCTURED "
                 "dummy weights (outlier channels, norm-preserving)",
        "reference_entropy_nats": ent,
        "interpretation": "KL columns are the decision signal: body "
                          "quantization (w4a8_bf16head) vs the int8 "
                          "lm_head's isolated cost (int8head_only). "
                          "r5 run: int8 head = 0.17 nats / top1 0.90 "
                          "alone — 5x the w4a8 body's 0.033 nats — so "
                          "the serving default follows the reference "
                          "(lm_head unquantized); opt in with "
                          "--lm-head-quantization int8 for +2.2% "
                          "throughput. top-1 among body variants is "
                          "gap-limited (near-uniform dummy logits), "
                          "not error-limited. North star stays GSM8K "
                          "delta <=1% when real weights are reachable "
                          "(BASELINE.json).",
        "results": results,
    }))


if __name__ == "__main__":
    main()
