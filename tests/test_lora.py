"""LoRA serving tests: adapter output == merged-weights output exactly."""

import json
import os

import numpy as np
import pytest

from sglang_security_tpu.entrypoints.engine import Engine
from sglang_security_tpu.server_args import ServerArgs
from sglang_security_tpu.test_utils import TINY_LLAMA_CONFIG, make_tiny_llama

SP = {"temperature": 0.0, "max_new_tokens": 8, "ignore_eos": True}


def make_adapter(path, base_cfg, rank=4, alpha=8, seed=7):
    """Write a PEFT-format adapter + return its delta weights."""
    from safetensors.numpy import save_file

    rng = np.random.default_rng(seed)
    os.makedirs(path, exist_ok=True)
    H = base_cfg["hidden_size"]
    I = base_cfg["intermediate_size"]
    hd = base_cfg["head_dim"]
    Hq, Hkv = base_cfg["num_attention_heads"], base_cfg["num_key_value_heads"]
    L = base_cfg["num_hidden_layers"]
    targets = {
        "q_proj": (H, Hq * hd), "k_proj": (H, Hkv * hd),
        "v_proj": (H, Hkv * hd), "o_proj": (Hq * hd, H),
        "gate_proj": (H, I), "up_proj": (H, I), "down_proj": (I, H),
    }
    tensors = {}
    deltas = {}
    for li in range(L):
        for proj, (k, n) in targets.items():
            A = (rng.standard_normal((rank, k)) * 0.05).astype(np.float32)
            B = (rng.standard_normal((n, rank)) * 0.05).astype(np.float32)
            base = "self_attn" if "proj" in proj and proj[0] in "qkvo" else "mlp"
            name = (
                f"base_model.model.model.layers.{li}.{base}.{proj}"
            )
            tensors[name + ".lora_A.weight"] = A
            tensors[name + ".lora_B.weight"] = B
            deltas[(li, proj)] = (B @ A).T * (alpha / rank)  # [k, n]
    save_file(tensors, os.path.join(path, "adapter_model.safetensors"))
    with open(os.path.join(path, "adapter_config.json"), "w") as f:
        json.dump({"r": rank, "lora_alpha": alpha,
                   "target_modules": list(targets)}, f)
    return deltas


def merge_into_checkpoint(src_dir, dst_dir, deltas):
    """Bake the adapter into a new checkpoint (ground truth)."""
    import shutil

    from safetensors.numpy import load_file, save_file

    os.makedirs(dst_dir, exist_ok=True)
    for f in os.listdir(src_dir):
        if not f.endswith(".safetensors"):
            shutil.copy(os.path.join(src_dir, f), os.path.join(dst_dir, f))
    t = load_file(os.path.join(src_dir, "model.safetensors"))
    for (li, proj), delta in deltas.items():
        base = "self_attn" if proj[0] in "qkvo" else "mlp"
        name = f"model.layers.{li}.{base}.{proj}.weight"
        t[name] = t[name] + delta.T.astype(np.float32)  # HF stores [out, in]
    save_file(t, os.path.join(dst_dir, "model.safetensors"))


def engine_for(path, **kw):
    return Engine(
        ServerArgs(model_path=path, dtype="float32", max_total_tokens=4096,
                   page_size=8, prefill_token_buckets=[128],
                   decode_bs_buckets=[1, 4], max_seq_pages_buckets=[8, 16],
                   random_seed=0, **kw)
    )


def test_lora_matches_merged_weights(tmp_path_factory):
    base_dir = str(tmp_path_factory.mktemp("lora") / "base")
    adapter_dir = str(tmp_path_factory.mktemp("lora") / "adapter")
    merged_dir = str(tmp_path_factory.mktemp("lora") / "merged")
    make_tiny_llama(base_dir)
    deltas = make_adapter(adapter_dir, TINY_LLAMA_CONFIG)
    merge_into_checkpoint(base_dir, merged_dir, deltas)

    prompt = list(range(30, 50))

    merged = engine_for(merged_dir)
    try:
        ref = merged.generate(input_ids=prompt, sampling_params=SP)
    finally:
        merged.shutdown()

    eng = engine_for(base_dir)
    try:
        base_out = eng.generate(input_ids=prompt, sampling_params=SP)
        lora_out = eng.generate(
            input_ids=prompt, sampling_params=SP, lora_path=adapter_dir
        )
        # adapter changes behavior...
        assert lora_out["output_ids"] == ref["output_ids"], (
            lora_out["output_ids"], ref["output_ids"],
        )
        # ...and non-adapter requests still use the base weights
        base_again = eng.generate(input_ids=prompt, sampling_params=SP)
        assert base_again["output_ids"] == base_out["output_ids"]
    finally:
        eng.shutdown()


def test_mixed_batch_two_adapters(tmp_path_factory):
    base_dir = str(tmp_path_factory.mktemp("lora2") / "base")
    a1 = str(tmp_path_factory.mktemp("lora2") / "a1")
    a2 = str(tmp_path_factory.mktemp("lora2") / "a2")
    make_tiny_llama(base_dir)
    make_adapter(a1, TINY_LLAMA_CONFIG, seed=11)
    make_adapter(a2, TINY_LLAMA_CONFIG, seed=22)

    eng = engine_for(base_dir)
    try:
        p = list(range(60, 80))
        solo1 = eng.generate(input_ids=p, sampling_params=SP, lora_path=a1)
        solo2 = eng.generate(input_ids=p, sampling_params=SP, lora_path=a2)
        eng.flush_cache()
        import concurrent.futures as cf

        with cf.ThreadPoolExecutor(2) as ex:
            f1 = ex.submit(eng.generate, input_ids=p, sampling_params=SP,
                           lora_path=a1)
            f2 = ex.submit(eng.generate, input_ids=p, sampling_params=SP,
                           lora_path=a2)
            b1, b2 = f1.result(), f2.result()
        assert b1["output_ids"] == solo1["output_ids"]
        assert b2["output_ids"] == solo2["output_ids"]
        assert solo1["output_ids"] != solo2["output_ids"]
    finally:
        eng.shutdown()


def test_lora_under_tp2(tmp_path_factory):
    """LoRA with tensor parallelism: merged-target B columns are
    interleave-sharded like the base weights, row-parallel A shards
    ride the layer psum — outputs must equal the tp=1 adapter run."""
    base_dir = str(tmp_path_factory.mktemp("lora_tp") / "base")
    adapter_dir = str(tmp_path_factory.mktemp("lora_tp") / "adapter")
    make_tiny_llama(base_dir)
    make_adapter(adapter_dir, TINY_LLAMA_CONFIG)
    prompt = list(range(30, 50))

    eng = engine_for(base_dir)
    try:
        ref = eng.generate(
            input_ids=prompt, sampling_params=SP, lora_path=adapter_dir
        )
    finally:
        eng.shutdown()

    eng = engine_for(base_dir, tp_size=2)
    try:
        out = eng.generate(
            input_ids=prompt, sampling_params=SP, lora_path=adapter_dir
        )
        assert out["output_ids"] == ref["output_ids"]
        # base requests on the same engine stay un-adapted
        base_out = eng.generate(input_ids=prompt, sampling_params=SP)
        assert base_out["output_ids"] != ref["output_ids"]
    finally:
        eng.shutdown()
