"""Shared test fixtures: tiny HF-format checkpoints + parity helpers.

The analog of the reference's ``python/sglang/test/test_utils.py`` +
``runners.py`` HF-parity harness (SURVEY.md §4): create a tiny random
llama checkpoint on disk (config.json + safetensors + tokenizer), so
engine tests and HF-logit-parity tests run without network access.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

TINY_LLAMA_CONFIG = {
    "architectures": ["LlamaForCausalLM"],
    "hidden_size": 128,
    "intermediate_size": 256,
    "num_hidden_layers": 2,
    "num_attention_heads": 4,
    "num_key_value_heads": 2,
    "head_dim": 32,
    "vocab_size": 512,
    "rms_norm_eps": 1e-5,
    "rope_theta": 10000.0,
    "max_position_embeddings": 2048,
    "tie_word_embeddings": False,
    "bos_token_id": 1,
    "eos_token_id": 2,
    "torch_dtype": "float32",
    "model_type": "llama",
}


def make_tiny_llama(path: str, config: dict | None = None, seed: int = 0) -> str:
    """Write a random-weight HF llama checkpoint (float32 safetensors)."""
    from safetensors.numpy import save_file

    cfg = dict(TINY_LLAMA_CONFIG)
    if config:
        cfg.update(config)
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(cfg, f, indent=1)

    rng = np.random.default_rng(seed)
    H = cfg["hidden_size"]
    I = cfg["intermediate_size"]
    hd = cfg["head_dim"]
    Hq = cfg["num_attention_heads"]
    Hkv = cfg["num_key_value_heads"]
    V = cfg["vocab_size"]

    def r(*shape, scale=0.05):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    t = {"model.embed_tokens.weight": r(V, H), "model.norm.weight": np.ones(H, np.float32)}
    for i in range(cfg["num_hidden_layers"]):
        p = f"model.layers.{i}."
        t[p + "input_layernorm.weight"] = np.ones(H, np.float32)
        t[p + "post_attention_layernorm.weight"] = np.ones(H, np.float32)
        t[p + "self_attn.q_proj.weight"] = r(Hq * hd, H)
        t[p + "self_attn.k_proj.weight"] = r(Hkv * hd, H)
        t[p + "self_attn.v_proj.weight"] = r(Hkv * hd, H)
        t[p + "self_attn.o_proj.weight"] = r(H, Hq * hd)
        t[p + "mlp.gate_proj.weight"] = r(I, H)
        t[p + "mlp.up_proj.weight"] = r(I, H)
        t[p + "mlp.down_proj.weight"] = r(H, I)
    if not cfg["tie_word_embeddings"]:
        t["lm_head.weight"] = r(V, H)
    save_file(t, os.path.join(path, "model.safetensors"))

    # minimal byte-level tokenizer (vocab 512 covers bytes + specials)
    _write_tiny_tokenizer(path, V)
    return path


def make_tiny_eagle3(path: str, target_config: dict, draft_vocab: int = 64,
                     seed: int = 3) -> str:
    """Write a random-weight EAGLE3 draft checkpoint in the HF layout
    (reference llama_eagle3.py key names: no ``model.`` prefix,
    ``midlayer.*`` single layer, ``fc`` [H, 3*Ht], reduced-vocab
    ``lm_head`` + ``d2t`` offsets)."""
    from safetensors.numpy import save_file

    cfg = dict(TINY_LLAMA_CONFIG)
    cfg.update({k: target_config[k] for k in (
        "hidden_size", "intermediate_size", "num_attention_heads",
        "num_key_value_heads", "head_dim", "vocab_size",
    ) if k in target_config})
    cfg["architectures"] = ["LlamaForCausalLMEagle3"]
    cfg["num_hidden_layers"] = 1
    cfg["draft_vocab_size"] = draft_vocab
    cfg["target_hidden_size"] = cfg["hidden_size"]
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(cfg, f, indent=1)

    rng = np.random.default_rng(seed)
    H, I = cfg["hidden_size"], cfg["intermediate_size"]
    hd, Hq, Hkv = cfg["head_dim"], cfg["num_attention_heads"], cfg["num_key_value_heads"]
    V, Vd = cfg["vocab_size"], draft_vocab

    def r(*shape, scale=0.05):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    # d2t: monotone draft->target id offsets (targets spread over [0, V))
    tgt_ids = np.sort(rng.choice(V, size=Vd, replace=False)).astype(np.int64)
    d2t = tgt_ids - np.arange(Vd, dtype=np.int64)
    t = {
        "embed_tokens.weight": r(V, H),
        "norm.weight": np.ones(H, np.float32),
        "fc.weight": r(H, 3 * H),
        "fc.bias": np.zeros(H, np.float32),
        "lm_head.weight": r(Vd, H),
        "d2t": d2t,
        "midlayer.input_layernorm.weight": np.ones(H, np.float32),
        "midlayer.hidden_norm.weight": np.ones(H, np.float32),
        "midlayer.post_attention_layernorm.weight": np.ones(H, np.float32),
        "midlayer.self_attn.q_proj.weight": r(Hq * hd, 2 * H),
        "midlayer.self_attn.k_proj.weight": r(Hkv * hd, 2 * H),
        "midlayer.self_attn.v_proj.weight": r(Hkv * hd, 2 * H),
        "midlayer.self_attn.o_proj.weight": r(H, Hq * hd),
        "midlayer.mlp.gate_proj.weight": r(I, H),
        "midlayer.mlp.up_proj.weight": r(I, H),
        "midlayer.mlp.down_proj.weight": r(H, I),
    }
    save_file(t, os.path.join(path, "model.safetensors"))
    _write_tiny_tokenizer(path, V)
    return path


def _write_tiny_tokenizer(path: str, vocab_size: int) -> None:
    """A minimal, valid HF `tokenizers` byte-level BPE tokenizer."""
    vocab = {"<unk>": 0, "<s>": 1, "</s>": 2}
    for b in range(256):
        vocab[f"<0x{b:02X}>"] = 3 + b
    i = len(vocab)
    while i < vocab_size:
        vocab[f"<extra_{i}>"] = i
        i += 1
    tok = {
        "version": "1.0",
        "truncation": None,
        "padding": None,
        "added_tokens": [
            {"id": 0, "content": "<unk>", "special": True,
             "single_word": False, "lstrip": False, "rstrip": False,
             "normalized": False},
            {"id": 1, "content": "<s>", "special": True,
             "single_word": False, "lstrip": False, "rstrip": False,
             "normalized": False},
            {"id": 2, "content": "</s>", "special": True,
             "single_word": False, "lstrip": False, "rstrip": False,
             "normalized": False},
        ],
        "normalizer": None,
        "pre_tokenizer": {"type": "ByteLevel", "add_prefix_space": False,
                          "trim_offsets": True, "use_regex": True},
        "post_processor": None,
        "decoder": {"type": "ByteLevel", "add_prefix_space": False,
                    "trim_offsets": True, "use_regex": True},
        "model": {
            "type": "BPE", "dropout": None, "unk_token": "<unk>",
            "continuing_subword_prefix": None, "end_of_word_suffix": None,
            "fuse_unk": False, "byte_fallback": False, "ignore_merges": False,
            "vocab": {
                **{f"<0x{b:02X}>": 3 + b for b in range(256)},
                "<unk>": 0, "<s>": 1, "</s>": 2,
            },
            "merges": [],
        },
    }
    # ByteLevel BPE needs the printable byte alphabet in vocab; simplest
    # robust option: use tokenizers library to build if available.
    try:
        from tokenizers import Tokenizer, models, pre_tokenizers, decoders

        tk = Tokenizer(models.BPE(unk_token="<unk>"))
        tk.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
        tk.decoder = decoders.ByteLevel()
        from tokenizers.trainers import BpeTrainer

        trainer = BpeTrainer(
            vocab_size=vocab_size,
            special_tokens=["<unk>", "<s>", "</s>"],
            show_progress=False,
            # full byte alphabet so every char (incl. \n, \t) is
            # encodable — grammar-constrained decoding dead-ends on
            # framing newlines otherwise
            initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
        )
        corpus = [
            "the quick brown fox jumps over the lazy dog",
            "hello world this is a tiny tokenizer for tests",
            "0123456789 abcdefghijklmnopqrstuvwxyz ABCDEFGHIJKLMNOPQRSTUVWXYZ",
            "The capital of France is Paris. The capital of Italy is Rome.",
            '{"ok": true, "count": 42, "items": ["a", "b"], "x": null}',
            "yes no maybe (parens) [brackets] {braces} <angle> - _ = + * / \\",
            'false true null {"name": "bob", "age": 7}, 3.14 -2e10 !? ; : \'',
        ]
        tk.train_from_iterator(corpus * 50, trainer)
        tk.save(os.path.join(path, "tokenizer.json"))
    except Exception:
        with open(os.path.join(path, "tokenizer.json"), "w") as f:
            json.dump(tok, f)
    with open(os.path.join(path, "tokenizer_config.json"), "w") as f:
        json.dump(
            {
                "tokenizer_class": "PreTrainedTokenizerFast",
                "bos_token": "<s>",
                "eos_token": "</s>",
                "unk_token": "<unk>",
                "model_max_length": 2048,
            },
            f,
        )


TINY_MIXTRAL_CONFIG = {
    "architectures": ["MixtralForCausalLM"],
    "hidden_size": 128,
    "intermediate_size": 256,
    "num_hidden_layers": 2,
    "num_attention_heads": 4,
    "num_key_value_heads": 2,
    "head_dim": 32,
    "vocab_size": 512,
    "rms_norm_eps": 1e-5,
    "rope_theta": 10000.0,
    "max_position_embeddings": 2048,
    "tie_word_embeddings": False,
    "num_local_experts": 4,
    "num_experts_per_tok": 2,
    "bos_token_id": 1,
    "eos_token_id": 2,
    "torch_dtype": "float32",
    "model_type": "mixtral",
}


def make_tiny_mixtral(path: str, config: dict | None = None, seed: int = 0) -> str:
    from safetensors.numpy import save_file

    cfg = dict(TINY_MIXTRAL_CONFIG)
    if config:
        cfg.update(config)
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(cfg, f, indent=1)
    rng = np.random.default_rng(seed)
    H, I = cfg["hidden_size"], cfg["intermediate_size"]
    hd, Hq, Hkv = cfg["head_dim"], cfg["num_attention_heads"], cfg["num_key_value_heads"]
    V, E = cfg["vocab_size"], cfg["num_local_experts"]

    def r(*shape, scale=0.05):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    t = {"model.embed_tokens.weight": r(V, H),
         "model.norm.weight": np.ones(H, np.float32),
         "lm_head.weight": r(V, H)}
    for i in range(cfg["num_hidden_layers"]):
        p = f"model.layers.{i}."
        t[p + "input_layernorm.weight"] = np.ones(H, np.float32)
        t[p + "post_attention_layernorm.weight"] = np.ones(H, np.float32)
        t[p + "self_attn.q_proj.weight"] = r(Hq * hd, H)
        t[p + "self_attn.k_proj.weight"] = r(Hkv * hd, H)
        t[p + "self_attn.v_proj.weight"] = r(Hkv * hd, H)
        t[p + "self_attn.o_proj.weight"] = r(H, Hq * hd)
        m = p + "block_sparse_moe."
        t[m + "gate.weight"] = r(E, H)
        for e in range(E):
            t[m + f"experts.{e}.w1.weight"] = r(I, H)
            t[m + f"experts.{e}.w2.weight"] = r(H, I)
            t[m + f"experts.{e}.w3.weight"] = r(I, H)
    save_file(t, os.path.join(path, "model.safetensors"))
    _write_tiny_tokenizer(path, V)
    return path


TINY_DEEPSEEK_CONFIG = {
    "architectures": ["DeepseekV2ForCausalLM"],
    "model_type": "deepseek_v2",
    "hidden_size": 128,
    "intermediate_size": 256,
    "moe_intermediate_size": 64,
    "num_hidden_layers": 3,
    "num_attention_heads": 4,
    "num_key_value_heads": 4,
    "vocab_size": 512,
    "rms_norm_eps": 1e-5,
    "rope_theta": 10000.0,
    "max_position_embeddings": 2048,
    "tie_word_embeddings": False,
    "q_lora_rank": None,
    "kv_lora_rank": 64,
    "qk_nope_head_dim": 32,
    "qk_rope_head_dim": 16,
    "v_head_dim": 32,
    "qk_head_dim": 48,
    "n_routed_experts": 4,
    "num_experts_per_tok": 2,
    "n_shared_experts": 1,
    "first_k_dense_replace": 1,
    "moe_layer_freq": 1,
    "routed_scaling_factor": 1.0,
    "norm_topk_prob": False,
    "scoring_func": "softmax",
    "topk_method": "greedy",
    "n_group": 1,
    "topk_group": 1,
    "aux_loss_alpha": 0.0,
    "seq_aux": False,
    "bos_token_id": 1,
    "eos_token_id": 2,
    "torch_dtype": "float32",
    "attention_bias": False,
}


def make_tiny_deepseek(path: str, config: dict | None = None, seed: int = 0,
                       nextn: bool = False) -> str:
    """``nextn``: additionally write a DeepSeek-V3 MTP module at
    checkpoint layer index num_hidden_layers (enorm/hnorm/eh_proj/
    shared_head.norm + one full MoE decoder layer), the layout
    ``models/deepseek_nextn.py`` loads."""
    from safetensors.numpy import save_file

    cfg = dict(TINY_DEEPSEEK_CONFIG)
    if config:
        cfg.update(config)
    if nextn:
        cfg["num_nextn_predict_layers"] = 1
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(cfg, f, indent=1)
    rng = np.random.default_rng(seed)
    H = cfg["hidden_size"]
    Hq = cfg["num_attention_heads"]
    nope, rope = cfg["qk_nope_head_dim"], cfg["qk_rope_head_dim"]
    c, vdim = cfg["kv_lora_rank"], cfg["v_head_dim"]
    V, E = cfg["vocab_size"], cfg["n_routed_experts"]
    I, Im = cfg["intermediate_size"], cfg["moe_intermediate_size"]

    def r(*shape, scale=0.05):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    t = {"model.embed_tokens.weight": r(V, H),
         "model.norm.weight": np.ones(H, np.float32),
         "lm_head.weight": r(V, H)}

    def write_layer(p, dense):
        a = p + "self_attn."
        t[p + "input_layernorm.weight"] = np.ones(H, np.float32)
        t[p + "post_attention_layernorm.weight"] = np.ones(H, np.float32)
        t[a + "q_proj.weight"] = r(Hq * (nope + rope), H)
        t[a + "kv_a_proj_with_mqa.weight"] = r(c + rope, H)
        t[a + "kv_a_layernorm.weight"] = np.ones(c, np.float32)
        t[a + "kv_b_proj.weight"] = r(Hq * (nope + vdim), c)
        t[a + "o_proj.weight"] = r(H, Hq * vdim)
        m = p + "mlp."
        if dense:
            t[m + "gate_proj.weight"] = r(I, H)
            t[m + "up_proj.weight"] = r(I, H)
            t[m + "down_proj.weight"] = r(H, I)
        else:
            t[m + "gate.weight"] = r(E, H)
            for e in range(E):
                ep = m + f"experts.{e}."
                t[ep + "gate_proj.weight"] = r(Im, H)
                t[ep + "up_proj.weight"] = r(Im, H)
                t[ep + "down_proj.weight"] = r(H, Im)
            sp = m + "shared_experts."
            Is = Im * cfg["n_shared_experts"]
            t[sp + "gate_proj.weight"] = r(Is, H)
            t[sp + "up_proj.weight"] = r(Is, H)
            t[sp + "down_proj.weight"] = r(H, Is)

    for i in range(cfg["num_hidden_layers"]):
        write_layer(f"model.layers.{i}.", i < cfg["first_k_dense_replace"])
    if nextn:
        L = cfg["num_hidden_layers"]
        p = f"model.layers.{L}."
        write_layer(p, dense=False)
        t[p + "enorm.weight"] = np.ones(H, np.float32)
        t[p + "hnorm.weight"] = np.ones(H, np.float32)
        t[p + "eh_proj.weight"] = r(H, 2 * H)
        t[p + "shared_head.norm.weight"] = np.ones(H, np.float32)
        # embed/head shared with the target (absent, as in real V3)
    save_file(t, os.path.join(path, "model.safetensors"))
    _write_tiny_tokenizer(path, V)
    return path


TINY_LLAVA_CONFIG = {
    "architectures": ["LlavaForConditionalGeneration"],
    "model_type": "llava",
    "image_token_index": 500,
    "vision_feature_layer": -2,
    "vision_feature_select_strategy": "default",
    "projector_hidden_act": "gelu",
    "image_seq_length": 4,
    "text_config": {
        "model_type": "llama",
        "hidden_size": 128,
        "intermediate_size": 256,
        "num_hidden_layers": 2,
        "num_attention_heads": 4,
        "num_key_value_heads": 2,
        "head_dim": 32,
        "vocab_size": 512,
        "rms_norm_eps": 1e-5,
        "rope_theta": 10000.0,
        "max_position_embeddings": 2048,
        "tie_word_embeddings": False,
        "bos_token_id": 1,
        "eos_token_id": 2,
    },
    "vision_config": {
        "model_type": "clip_vision_model",
        "hidden_size": 64,
        "intermediate_size": 128,
        "num_hidden_layers": 2,
        "num_attention_heads": 4,
        "image_size": 28,
        "patch_size": 14,
        "projection_dim": 64,
        "hidden_act": "quick_gelu",
        "layer_norm_eps": 1e-5,
    },
    "torch_dtype": "float32",
}


def make_tiny_llava(path: str, config: dict | None = None, seed: int = 0) -> str:
    """Random-weight HF LLaVA checkpoint in the modern (transformers>=4.52)
    layout: model.language_model.* / model.vision_tower.* /
    model.multi_modal_projector.* / lm_head.weight."""
    from safetensors.numpy import save_file

    cfg = json.loads(json.dumps(TINY_LLAVA_CONFIG))
    if config:
        cfg.update(config)
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(cfg, f, indent=1)

    rng = np.random.default_rng(seed)
    tc, vc = cfg["text_config"], cfg["vision_config"]
    H, I = tc["hidden_size"], tc["intermediate_size"]
    hd, Hq, Hkv = tc["head_dim"], tc["num_attention_heads"], tc["num_key_value_heads"]
    V = tc["vocab_size"]
    D, Dv = vc["hidden_size"], vc["intermediate_size"]
    p_sz = vc["patch_size"]
    n_pos = (vc["image_size"] // p_sz) ** 2 + 1

    def r(*shape, scale=0.05):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    lm = "model.language_model."
    t = {lm + "embed_tokens.weight": r(V, H),
         lm + "norm.weight": np.ones(H, np.float32),
         "lm_head.weight": r(V, H)}
    for i in range(tc["num_hidden_layers"]):
        p = f"{lm}layers.{i}."
        t[p + "input_layernorm.weight"] = np.ones(H, np.float32)
        t[p + "post_attention_layernorm.weight"] = np.ones(H, np.float32)
        t[p + "self_attn.q_proj.weight"] = r(Hq * hd, H)
        t[p + "self_attn.k_proj.weight"] = r(Hkv * hd, H)
        t[p + "self_attn.v_proj.weight"] = r(Hkv * hd, H)
        t[p + "self_attn.o_proj.weight"] = r(H, Hq * hd)
        t[p + "mlp.gate_proj.weight"] = r(I, H)
        t[p + "mlp.up_proj.weight"] = r(I, H)
        t[p + "mlp.down_proj.weight"] = r(H, I)

    vt = "model.vision_tower.vision_model."
    t[vt + "embeddings.class_embedding"] = r(D)
    t[vt + "embeddings.patch_embedding.weight"] = r(D, 3, p_sz, p_sz)
    t[vt + "embeddings.position_embedding.weight"] = r(n_pos, D)
    t[vt + "pre_layrnorm.weight"] = np.ones(D, np.float32)
    t[vt + "pre_layrnorm.bias"] = np.zeros(D, np.float32)
    t[vt + "post_layernorm.weight"] = np.ones(D, np.float32)
    t[vt + "post_layernorm.bias"] = np.zeros(D, np.float32)
    for i in range(vc["num_hidden_layers"]):
        p = f"{vt}encoder.layers.{i}."
        for ln in ("layer_norm1", "layer_norm2"):
            t[p + ln + ".weight"] = np.ones(D, np.float32)
            t[p + ln + ".bias"] = r(D, scale=0.01)
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            t[p + f"self_attn.{proj}.weight"] = r(D, D)
            t[p + f"self_attn.{proj}.bias"] = r(D, scale=0.01)
        t[p + "mlp.fc1.weight"] = r(Dv, D)
        t[p + "mlp.fc1.bias"] = r(Dv, scale=0.01)
        t[p + "mlp.fc2.weight"] = r(D, Dv)
        t[p + "mlp.fc2.bias"] = r(D, scale=0.01)

    pj = "model.multi_modal_projector."
    t[pj + "linear_1.weight"] = r(H, D)
    t[pj + "linear_1.bias"] = r(H, scale=0.01)
    t[pj + "linear_2.weight"] = r(H, H)
    t[pj + "linear_2.bias"] = r(H, scale=0.01)

    save_file(t, os.path.join(path, "model.safetensors"))
    _write_tiny_tokenizer(path, V)
    return path


TINY_QWEN2VL_CONFIG = {
    "architectures": ["Qwen2VLForConditionalGeneration"],
    "model_type": "qwen2_vl",
    "image_token_id": 490,
    "video_token_id": 491,
    "vision_start_token_id": 492,
    "vision_end_token_id": 493,
    "text_config": {
        "model_type": "qwen2_vl_text",
        "hidden_size": 64,
        "intermediate_size": 128,
        "num_hidden_layers": 2,
        "num_attention_heads": 4,
        "num_key_value_heads": 2,
        "head_dim": 16,
        "vocab_size": 512,
        "rms_norm_eps": 1e-6,
        "rope_theta": 10000.0,
        "max_position_embeddings": 2048,
        "tie_word_embeddings": False,
        "bos_token_id": 1,
        "eos_token_id": 2,
        "hidden_act": "silu",
        "rope_scaling": {"type": "mrope", "mrope_section": [2, 3, 3]},
    },
    "vision_config": {
        "model_type": "qwen2_vl",
        "depth": 2,
        "embed_dim": 32,
        "hidden_size": 64,
        "num_heads": 2,
        "mlp_ratio": 4,
        "patch_size": 2,
        "temporal_patch_size": 2,
        "spatial_merge_size": 2,
        "in_channels": 3,
        "hidden_act": "quick_gelu",
        # engine-processor pixel budget (tiny test images)
        "min_pixels": 16,
        "max_pixels": 16384,
    },
    "torch_dtype": "float32",
}

TINY_QWEN25VL_VISION = {
    "model_type": "qwen2_5_vl",
    "depth": 2,
    "hidden_size": 32,
    "out_hidden_size": 64,
    "intermediate_size": 48,
    "num_heads": 2,
    "patch_size": 2,
    "temporal_patch_size": 2,
    "spatial_merge_size": 2,
    "in_channels": 3,
    "hidden_act": "silu",
    "window_size": 8,
    "fullatt_block_indexes": [1],
    "tokens_per_second": 4,
    "min_pixels": 16,
    "max_pixels": 16384,
}


def make_tiny_qwen2vl(path: str, v25: bool = False, seed: int = 0) -> str:
    """Random-weight HF Qwen2-VL / Qwen2.5-VL checkpoint (modern
    transformers layout: model.language_model.* / model.visual.* /
    lm_head.weight)."""
    from safetensors.numpy import save_file

    cfg = json.loads(json.dumps(TINY_QWEN2VL_CONFIG))
    if v25:
        cfg["architectures"] = ["Qwen2_5_VLForConditionalGeneration"]
        cfg["model_type"] = "qwen2_5_vl"
        cfg["text_config"]["model_type"] = "qwen2_5_vl_text"
        cfg["vision_config"] = json.loads(json.dumps(TINY_QWEN25VL_VISION))
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(cfg, f, indent=1)

    rng = np.random.default_rng(seed)
    tc, vc = cfg["text_config"], cfg["vision_config"]
    H, I = tc["hidden_size"], tc["intermediate_size"]
    hd, Hq, Hkv = tc["head_dim"], tc["num_attention_heads"], tc["num_key_value_heads"]
    V = tc["vocab_size"]
    E = vc.get("embed_dim") or vc["hidden_size"]
    M = (vc["intermediate_size"] if v25
         else int(E * vc["mlp_ratio"]))
    p_sz, tp = vc["patch_size"], vc["temporal_patch_size"]
    mu = vc["spatial_merge_size"] ** 2
    out_h = vc["out_hidden_size"] if v25 else vc["hidden_size"]

    def r(*shape, scale=0.05):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    lm = "model.language_model."
    t = {lm + "embed_tokens.weight": r(V, H),
         lm + "norm.weight": np.ones(H, np.float32),
         "lm_head.weight": r(V, H)}
    for i in range(tc["num_hidden_layers"]):
        p = f"{lm}layers.{i}."
        t[p + "input_layernorm.weight"] = np.ones(H, np.float32)
        t[p + "post_attention_layernorm.weight"] = np.ones(H, np.float32)
        t[p + "self_attn.q_proj.weight"] = r(Hq * hd, H)
        t[p + "self_attn.q_proj.bias"] = r(Hq * hd, scale=0.01)
        t[p + "self_attn.k_proj.weight"] = r(Hkv * hd, H)
        t[p + "self_attn.k_proj.bias"] = r(Hkv * hd, scale=0.01)
        t[p + "self_attn.v_proj.weight"] = r(Hkv * hd, H)
        t[p + "self_attn.v_proj.bias"] = r(Hkv * hd, scale=0.01)
        t[p + "self_attn.o_proj.weight"] = r(H, Hq * hd)
        t[p + "mlp.gate_proj.weight"] = r(I, H)
        t[p + "mlp.up_proj.weight"] = r(I, H)
        t[p + "mlp.down_proj.weight"] = r(H, I)

    vt = "model.visual."
    t[vt + "patch_embed.proj.weight"] = r(E, 3, tp, p_sz, p_sz)
    for i in range(vc["depth"]):
        p = f"{vt}blocks.{i}."
        t[p + "attn.qkv.weight"] = r(3 * E, E)
        t[p + "attn.qkv.bias"] = r(3 * E, scale=0.01)
        t[p + "attn.proj.weight"] = r(E, E)
        t[p + "attn.proj.bias"] = r(E, scale=0.01)
        if v25:
            t[p + "norm1.weight"] = np.ones(E, np.float32)
            t[p + "norm2.weight"] = np.ones(E, np.float32)
            t[p + "mlp.gate_proj.weight"] = r(M, E)
            t[p + "mlp.gate_proj.bias"] = r(M, scale=0.01)
            t[p + "mlp.up_proj.weight"] = r(M, E)
            t[p + "mlp.up_proj.bias"] = r(M, scale=0.01)
            t[p + "mlp.down_proj.weight"] = r(E, M)
            t[p + "mlp.down_proj.bias"] = r(E, scale=0.01)
        else:
            t[p + "norm1.weight"] = np.ones(E, np.float32)
            t[p + "norm1.bias"] = r(E, scale=0.01)
            t[p + "norm2.weight"] = np.ones(E, np.float32)
            t[p + "norm2.bias"] = r(E, scale=0.01)
            t[p + "mlp.fc1.weight"] = r(M, E)
            t[p + "mlp.fc1.bias"] = r(M, scale=0.01)
            t[p + "mlp.fc2.weight"] = r(E, M)
            t[p + "mlp.fc2.bias"] = r(E, scale=0.01)
    mg = vt + "merger."
    t[mg + "ln_q.weight"] = np.ones(E, np.float32)
    if not v25:
        t[mg + "ln_q.bias"] = r(E, scale=0.01)
    t[mg + "mlp.0.weight"] = r(mu * E, mu * E)
    t[mg + "mlp.0.bias"] = r(mu * E, scale=0.01)
    t[mg + "mlp.2.weight"] = r(out_h, mu * E)
    t[mg + "mlp.2.bias"] = r(out_h, scale=0.01)

    save_file(t, os.path.join(path, "model.safetensors"))
    _write_tiny_tokenizer(path, V)
    return path


TINY_MLLAMA_TEXT = {
    "model_type": "mllama_text_model",
    "hidden_size": 64,
    "intermediate_size": 128,
    "num_hidden_layers": 4,
    "num_attention_heads": 4,
    "num_key_value_heads": 2,
    "cross_attention_layers": [1, 3],
    "vocab_size": 128,
    "rms_norm_eps": 1e-5,
    "rope_theta": 10000.0,
    "max_position_embeddings": 512,
    "tie_word_embeddings": False,
    "hidden_act": "silu",
    "bos_token_id": 1,
    "eos_token_id": 2,
    "pad_token_id": 0,  # HF default 128004 overflows the tiny vocab
    "rope_scaling": {"rope_type": "default"},
}

TINY_MLLAMA_VISION = {
    "model_type": "mllama_vision_model",
    "hidden_size": 32,
    "intermediate_size": 64,
    "num_hidden_layers": 2,
    "num_global_layers": 1,
    "attention_heads": 2,
    "image_size": 28,
    "patch_size": 14,
    "max_num_tiles": 4,
    "intermediate_layers_indices": [0, 1],
    "vision_output_dim": 96,  # (1 + 2 intermediates) * hidden
    "norm_eps": 1e-5,
    "supported_aspect_ratios": [
        [1, 1], [1, 2], [1, 3], [1, 4], [2, 1], [2, 2], [3, 1], [4, 1]
    ],
}


def make_tiny_mllama(path: str, seed: int = 0) -> str:
    """Random-weight HF Llama-3.2-Vision checkpoint via the HF model
    class (guarantees an HF-loadable layout for the parity tests).  The
    zero-initialized gates (cross-attn, vision positional) are bumped to
    0.5 so the gated paths actually contribute — with HF's default zero
    gates, cross-attention parity would hold vacuously."""
    import torch
    from transformers import MllamaConfig
    from transformers import MllamaForConditionalGeneration as HFM

    cfg = MllamaConfig(
        vision_config=dict(TINY_MLLAMA_VISION),
        text_config=dict(TINY_MLLAMA_TEXT),
        image_token_index=128,
    )
    torch.manual_seed(seed)
    m = HFM(cfg).to(torch.float32)
    with torch.no_grad():
        for name, p in m.named_parameters():
            if "gate" in name and p.ndim <= 1:
                p.fill_(0.5)
    m.save_pretrained(path, safe_serialization=True)
    _write_tiny_tokenizer(path, 128)
    return path


def make_tiny_idefics2(path: str, seed: int = 0) -> str:
    """Random-weight HF Idefics2 checkpoint via the HF class (SigLIP
    vision + perceiver resampler + Mistral text)."""
    import torch
    from transformers import Idefics2Config
    from transformers import Idefics2ForConditionalGeneration as HFM

    cfg = Idefics2Config(
        vision_config={
            "hidden_size": 32, "intermediate_size": 64,
            "num_hidden_layers": 2, "num_attention_heads": 2,
            "image_size": 28, "patch_size": 14,
            "hidden_act": "gelu_pytorch_tanh", "layer_norm_eps": 1e-6,
        },
        perceiver_config={
            "hidden_size": 64, "resampler_n_latents": 4,
            "resampler_depth": 2, "resampler_n_heads": 4,
            "resampler_head_dim": 16, "num_key_value_heads": 2,
            "rms_norm_eps": 1e-6, "hidden_act": "silu",
        },
        text_config={
            "model_type": "mistral", "hidden_size": 64,
            "intermediate_size": 128, "num_hidden_layers": 2,
            "num_attention_heads": 4, "num_key_value_heads": 2,
            "vocab_size": 128, "rms_norm_eps": 1e-5,
            "rope_theta": 10000.0, "max_position_embeddings": 512,
            "sliding_window": None, "tie_word_embeddings": False,
            "hidden_act": "silu", "bos_token_id": 1, "eos_token_id": 2,
            "pad_token_id": 0,
        },
        image_token_id=100,
        tie_word_embeddings=False,
    )
    torch.manual_seed(seed)
    m = HFM(cfg).to(torch.float32)
    m.save_pretrained(path, safe_serialization=True)
    _write_tiny_tokenizer(path, 128)
    return path


def make_tiny_idefics3(path: str, seed: int = 0) -> str:
    """Random-weight HF Idefics3 (SmolVLM-style) checkpoint."""
    import torch
    from transformers import Idefics3Config
    from transformers import Idefics3ForConditionalGeneration as HFM

    cfg = Idefics3Config(
        vision_config={
            "hidden_size": 32, "intermediate_size": 64,
            "num_hidden_layers": 2, "num_attention_heads": 2,
            "image_size": 28, "patch_size": 14,
            "hidden_act": "gelu_pytorch_tanh", "layer_norm_eps": 1e-6,
        },
        text_config={
            "model_type": "llama", "hidden_size": 64,
            "intermediate_size": 128, "num_hidden_layers": 2,
            "num_attention_heads": 4, "num_key_value_heads": 2,
            "vocab_size": 128, "rms_norm_eps": 1e-5,
            "rope_theta": 10000.0, "max_position_embeddings": 512,
            "tie_word_embeddings": False, "hidden_act": "silu",
            "bos_token_id": 1, "eos_token_id": 2, "pad_token_id": 0,
        },
        scale_factor=2,
        image_token_id=100,
        tie_word_embeddings=False,
    )
    torch.manual_seed(seed)
    m = HFM(cfg).to(torch.float32)
    m.save_pretrained(path, safe_serialization=True)
    _write_tiny_tokenizer(path, 128)
    return path


def main():
    if len(sys.argv) >= 3 and sys.argv[1] == "make-tiny-llama":
        p = make_tiny_llama(sys.argv[2])
        print(f"wrote tiny llama checkpoint to {p}")
    else:
        print("usage: python -m sglang_security_tpu.test_utils make-tiny-llama <dir>")


if __name__ == "__main__":
    main()
