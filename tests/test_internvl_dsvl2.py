"""InternVL and DeepSeek-VL2 model tests (tiny random checkpoints).

Reference coverage: ``srt/models/internvl.py`` (InternViT + pixel
shuffle + mlp1, qwen2/internlm2 bodies) and ``srt/models/deepseek_vl2.py``
(timm-SigLIP + downsample_mlp_gelu projector + MLA body, 2D tile tag).
"""

import json
import os

import numpy as np
import pytest

from sglang_security_tpu.entrypoints.engine import Engine
from sglang_security_tpu.server_args import ServerArgs
from sglang_security_tpu.test_utils import (
    make_tiny_deepseek,
    make_tiny_llama,
)

SP = {"temperature": 0.0, "max_new_tokens": 5, "ignore_eos": True}


def _image(seed=0, size=28):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (size, size, 3), dtype=np.uint8)


def _engine(path, **kw):
    args = dict(
        model_path=path, dtype="float32", max_total_tokens=2048,
        page_size=8, prefill_token_buckets=[128], decode_bs_buckets=[1, 4],
        max_seq_pages_buckets=[8, 16], random_seed=0, enable_warmup=False,
        log_level="warning",
    )
    args.update(kw)
    return Engine(ServerArgs(**args))


def _vis_weights(t, rng, prefix, D=64, I=128, L=2, p_sz=14, n_pos=5,
                 cls=True, qk_norm=True, ls=True, timm=False):
    def r(*shape, scale=0.05):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    if timm:
        t[prefix + "patch_embed.proj.weight"] = r(D, 3, p_sz, p_sz)
        t[prefix + "patch_embed.proj.bias"] = np.zeros(D, np.float32)
        t[prefix + "pos_embed"] = r(1, n_pos, D)
        t[prefix + "norm.weight"] = np.ones(D, np.float32)
        t[prefix + "norm.bias"] = np.zeros(D, np.float32)
        blocks = prefix + "blocks."
    else:
        e = prefix + "embeddings."
        t[e + "class_embedding"] = r(1, 1, D)
        t[e + "patch_embedding.weight"] = r(D, 3, p_sz, p_sz)
        t[e + "patch_embedding.bias"] = np.zeros(D, np.float32)
        t[e + "position_embedding"] = r(1, n_pos, D)
        blocks = prefix + "encoder.layers."
    for i in range(L):
        a = f"{blocks}{i}."
        t[a + "norm1.weight"] = np.ones(D, np.float32)
        t[a + "norm2.weight"] = np.ones(D, np.float32)
        if timm:
            t[a + "norm1.bias"] = np.zeros(D, np.float32)
            t[a + "norm2.bias"] = np.zeros(D, np.float32)
        t[a + "attn.qkv.weight"] = r(3 * D, D)
        t[a + "attn.qkv.bias"] = np.zeros(3 * D, np.float32)
        t[a + "attn.proj.weight"] = r(D, D)
        t[a + "attn.proj.bias"] = np.zeros(D, np.float32)
        t[a + "mlp.fc1.weight"] = r(I, D)
        t[a + "mlp.fc1.bias"] = np.zeros(I, np.float32)
        t[a + "mlp.fc2.weight"] = r(D, I)
        t[a + "mlp.fc2.bias"] = np.zeros(D, np.float32)
        if qk_norm and not timm:
            t[a + "attn.q_norm.weight"] = np.ones(D, np.float32)
            t[a + "attn.k_norm.weight"] = np.ones(D, np.float32)
        if ls and not timm:
            t[a + "ls1"] = np.full(D, 0.1, np.float32)
            t[a + "ls2"] = np.full(D, 0.1, np.float32)


# ---------------------------------------------------------------- InternVL
@pytest.fixture(scope="module", params=["qwen2", "internlm2"])
def tiny_internvl(tmp_path_factory, request):
    from safetensors.numpy import load_file, save_file

    body = request.param
    path = str(tmp_path_factory.mktemp("ivl") / body)
    make_tiny_llama(path)
    f = os.path.join(path, "model.safetensors")
    t0 = load_file(f)
    llm_cfg = json.load(open(os.path.join(path, "config.json")))
    H = llm_cfg["hidden_size"]
    rng = np.random.default_rng(3)

    t = {}
    if body == "qwen2":
        llm_cfg["architectures"] = ["Qwen2ForCausalLM"]
        for k, v in t0.items():
            t["language_model." + k] = v
    else:
        llm_cfg["architectures"] = ["InternLM2ForCausalLM"]
        hd = llm_cfg["head_dim"]
        Hq, Hkv = (llm_cfg["num_attention_heads"],
                   llm_cfg["num_key_value_heads"])
        g = Hq // Hkv
        for k, v in t0.items():
            if ".self_attn.q_proj.weight" in k:
                base = k.rsplit(".self_attn.", 1)[0]
                q = t0[base + ".self_attn.q_proj.weight"].reshape(
                    Hkv, g, hd, H
                )
                kk = t0[base + ".self_attn.k_proj.weight"].reshape(
                    Hkv, 1, hd, H
                )
                vv = t0[base + ".self_attn.v_proj.weight"].reshape(
                    Hkv, 1, hd, H
                )
                wqkv = np.concatenate([q, kk, vv], axis=1).reshape(-1, H)
                t["language_model." + base + ".attention.wqkv.weight"] = wqkv
                continue
            if ".self_attn.k_proj" in k or ".self_attn.v_proj" in k:
                continue
            k2 = (k.replace(".self_attn.o_proj.", ".attention.wo.")
                   .replace(".mlp.gate_proj.", ".feed_forward.w1.")
                   .replace(".mlp.up_proj.", ".feed_forward.w3.")
                   .replace(".mlp.down_proj.", ".feed_forward.w2.")
                   .replace("input_layernorm", "attention_norm")
                   .replace("post_attention_layernorm", "ffn_norm")
                   .replace("model.embed_tokens", "model.tok_embeddings")
                   .replace("lm_head", "output"))
            t["language_model." + k2] = v

    D = 64
    _vis_weights(t, rng, "vision_model.", D=D, n_pos=5)
    # mlp1: LN(4*D) -> Linear(4D, H) -> GELU -> Linear(H, H)
    t["mlp1.0.weight"] = np.ones(4 * D, np.float32)
    t["mlp1.0.bias"] = np.zeros(4 * D, np.float32)
    t["mlp1.1.weight"] = (rng.standard_normal((H, 4 * D)) * 0.02).astype(
        np.float32
    )
    t["mlp1.1.bias"] = np.zeros(H, np.float32)
    t["mlp1.3.weight"] = (rng.standard_normal((H, H)) * 0.02).astype(
        np.float32
    )
    t["mlp1.3.bias"] = np.zeros(H, np.float32)
    save_file(t, f)

    cfg = {
        "architectures": ["InternVLChatModel"],
        "model_type": "internvl_chat",
        "llm_config": llm_cfg,
        "vision_config": {
            "hidden_size": D, "intermediate_size": 128,
            "num_hidden_layers": 2, "num_attention_heads": 4,
            "image_size": 28, "patch_size": 14,
            "qk_normalization": True, "norm_type": "rms_norm",
        },
        "select_layer": -1,
        "downsample_ratio": 0.5,
        "ps_version": "v2",
        "img_context_token_id": 500,
    }
    json.dump(cfg, open(os.path.join(path, "config.json"), "w"))
    return path


def test_internvl_tokens_per_image(tiny_internvl):
    from sglang_security_tpu.managers.multimodal_processor import (
        get_mm_processor,
    )
    from sglang_security_tpu.models.config import ModelConfig
    from sglang_security_tpu.models.registry import get_model_class

    cfg = ModelConfig.from_pretrained(tiny_internvl)
    model = get_model_class(cfg)(cfg)
    # grid 2x2, downsample 0.5 -> 1 token
    assert model.tokens_per_image == 1
    assert get_mm_processor(cfg).tokens_per_image == 1


def test_internvl_engine_generates(tiny_internvl):
    eng = _engine(tiny_internvl)
    try:
        out = eng.generate(
            input_ids=[[1, 500, 9]], image_data=[[_image(0)]],
            sampling_params=SP,
        )[0]
        assert len(out["output_ids"]) == 5
    finally:
        eng.shutdown()


# ------------------------------------------------------------ DeepSeek-VL2
@pytest.fixture(scope="module")
def tiny_dsvl2(tmp_path_factory):
    from safetensors.numpy import load_file, save_file

    path = str(tmp_path_factory.mktemp("dsvl2") / "vl2")
    make_tiny_deepseek(path)
    f = os.path.join(path, "model.safetensors")
    t0 = load_file(f)
    lang_cfg = json.load(open(os.path.join(path, "config.json")))
    H = lang_cfg["hidden_size"]
    rng = np.random.default_rng(9)
    t = {"language." + k: v for k, v in t0.items()}
    D = 64
    _vis_weights(t, rng, "vision.", D=D, n_pos=4, timm=True)
    t["projector.layers.0.weight"] = (
        rng.standard_normal((H, 4 * D)) * 0.02
    ).astype(np.float32)
    t["projector.layers.0.bias"] = np.zeros(H, np.float32)
    t["projector.layers.2.weight"] = (
        rng.standard_normal((H, H)) * 0.02
    ).astype(np.float32)
    t["projector.layers.2.bias"] = np.zeros(H, np.float32)
    t["image_newline"] = (rng.standard_normal(H) * 0.02).astype(np.float32)
    t["view_seperator"] = (rng.standard_normal(H) * 0.02).astype(np.float32)
    save_file(t, f)

    cfg = {
        "architectures": ["DeepseekVL2ForCausalLM"],
        "model_type": "deepseek_vl_v2",
        "language_config": lang_cfg,
        "vision_config": {
            "width": D, "layers": 2, "heads": 4,
            "intermediate_size": 128,
            "image_size": 28, "patch_size": 14,
        },
        "projector_config": {
            "projector_type": "downsample_mlp_gelu",
            "input_dim": D, "n_embed": H, "depth": 2, "mlp_ratio": 1,
            "downsample_ratio": 2,
        },
        "tile_tag": "2D",
        "global_view_pos": "head",
        "image_token_id": 500,
    }
    json.dump(cfg, open(os.path.join(path, "config.json"), "w"))
    return path


def test_dsvl2_tokens_per_image(tiny_dsvl2):
    from sglang_security_tpu.managers.multimodal_processor import (
        get_mm_processor,
    )
    from sglang_security_tpu.models.config import ModelConfig
    from sglang_security_tpu.models.registry import get_model_class

    cfg = ModelConfig.from_pretrained(tiny_dsvl2)
    model = get_model_class(cfg)(cfg)
    # grid 2, ds 2 -> h=1 -> 1*(1+1)+1 = 3 tokens
    assert model.tokens_per_image == 3
    assert get_mm_processor(cfg).tokens_per_image == 3


def test_dsvl2_engine_generates(tiny_dsvl2):
    eng = _engine(tiny_dsvl2)
    try:
        out = eng.generate(
            input_ids=[[1, 500, 9]], image_data=[[_image(1)]],
            sampling_params=SP,
        )[0]
        assert len(out["output_ids"]) == 5
    finally:
        eng.shutdown()


# --------------------------------------------------------------- Kimi-VL
@pytest.fixture(scope="module")
def tiny_kimivl(tmp_path_factory):
    from safetensors.numpy import load_file, save_file

    path = str(tmp_path_factory.mktemp("kimivl") / "kvl")
    make_tiny_deepseek(path)
    f = os.path.join(path, "model.safetensors")
    t0 = load_file(f)
    text_cfg = json.load(open(os.path.join(path, "config.json")))
    H = text_cfg["hidden_size"]
    rng = np.random.default_rng(12)
    t = {"language_model." + k: v for k, v in t0.items()}
    D, I = 64, 128

    def r(*shape, scale=0.05):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    vt = "vision_tower."
    t[vt + "patch_embed.proj.weight"] = r(D, 3, 14, 14)
    t[vt + "patch_embed.proj.bias"] = np.zeros(D, np.float32)
    t[vt + "patch_embed.pos_emb.weight"] = r(4, 4, D)
    t[vt + "encoder.final_layernorm.weight"] = np.ones(D, np.float32)
    t[vt + "encoder.final_layernorm.bias"] = np.zeros(D, np.float32)
    for i in range(2):
        a = f"{vt}encoder.blocks.{i}."
        for nm in ("norm0", "norm1"):
            t[a + nm + ".weight"] = np.ones(D, np.float32)
            t[a + nm + ".bias"] = np.zeros(D, np.float32)
        t[a + "wqkv.weight"] = r(3 * D, D)
        t[a + "wqkv.bias"] = np.zeros(3 * D, np.float32)
        t[a + "wo.weight"] = r(D, D)
        t[a + "wo.bias"] = np.zeros(D, np.float32)
        t[a + "mlp.fc0.weight"] = r(I, D)
        t[a + "mlp.fc0.bias"] = np.zeros(I, np.float32)
        t[a + "mlp.fc1.weight"] = r(D, I)
        t[a + "mlp.fc1.bias"] = np.zeros(D, np.float32)
    hidden = D * 4
    pj = "multi_modal_projector."
    t[pj + "pre_norm.weight"] = np.ones(D, np.float32)
    t[pj + "pre_norm.bias"] = np.zeros(D, np.float32)
    t[pj + "linear_1.weight"] = r(hidden, hidden)
    t[pj + "linear_1.bias"] = np.zeros(hidden, np.float32)
    t[pj + "linear_2.weight"] = r(H, hidden)
    t[pj + "linear_2.bias"] = np.zeros(H, np.float32)
    save_file(t, f)

    cfg = {
        "architectures": ["KimiVLForConditionalGeneration"],
        "model_type": "kimi_vl",
        "text_config": text_cfg,
        "vision_config": {
            "hidden_size": D, "intermediate_size": I,
            "num_hidden_layers": 2, "num_attention_heads": 4,
            "patch_size": 14, "image_size": 28,
            "init_pos_emb_height": 4, "init_pos_emb_width": 4,
            "merge_kernel_size": [2, 2],
        },
        "media_placeholder_token_id": 500,
    }
    json.dump(cfg, open(os.path.join(path, "config.json"), "w"))
    return path


def test_kimivl_tokens_per_image(tiny_kimivl):
    from sglang_security_tpu.managers.multimodal_processor import (
        get_mm_processor,
    )
    from sglang_security_tpu.models.config import ModelConfig
    from sglang_security_tpu.models.registry import get_model_class

    cfg = ModelConfig.from_pretrained(tiny_kimivl)
    assert cfg.use_mla
    model = get_model_class(cfg)(cfg)
    # grid 2, merge 2x2 -> 1 token; pos table 4x4 interpolates to 2x2
    assert model.tokens_per_image == 1
    assert get_mm_processor(cfg).tokens_per_image == 1


def test_kimivl_engine_generates(tiny_kimivl):
    eng = _engine(tiny_kimivl)
    try:
        out = eng.generate(
            input_ids=[[1, 500, 9]], image_data=[[_image(2)]],
            sampling_params=SP,
        )[0]
        assert len(out["output_ids"]) == 5
    finally:
        eng.shutdown()
