"""Llama-4 multimodal tests: vision tower parity vs HF transformers
``Llama4VisionModel`` on random weights, plus engine e2e.

Reference coverage: ``srt/models/mllama4.py``
(Llama4ForConditionalGeneration).
"""

import json
import os

import numpy as np
import pytest

from sglang_security_tpu.entrypoints.engine import Engine
from sglang_security_tpu.server_args import ServerArgs

VIS_CFG = {
    "hidden_size": 64,
    # constraint of Llama4VisionMLP2: adapter fc1 input = pixel-shuffle
    # channels = hidden/(ratio^2), and HF reuses intermediate_size for it
    "intermediate_size": 256,
    "num_hidden_layers": 2,
    "num_attention_heads": 4,
    "image_size": 28,
    "patch_size": 14,
    "rope_theta": 10000,
    "pixel_shuffle_ratio": 0.5,
    "projector_input_dim": 64,
    "projector_output_dim": 64,
    "vision_output_dim": 64,
    "norm_eps": 1e-5,
    "num_channels": 3,
    "attention_dropout": 0.0,
    "projector_dropout": 0.0,
    "initializer_range": 0.02,
    "vision_feature_layer": -1,
    "vision_feature_select_strategy": "default",
    "hidden_act": "gelu",
    "multi_modal_projector_bias": False,
}

TEXT_CFG = {
    "architectures": ["Llama4ForCausalLM"], "model_type": "llama4_text",
    "hidden_size": 64, "intermediate_size": 64,
    "intermediate_size_mlp": 96, "num_hidden_layers": 2,
    "num_attention_heads": 4, "num_key_value_heads": 2,
    "head_dim": 16, "vocab_size": 512, "rms_norm_eps": 1e-5,
    "rope_theta": 10000.0, "max_position_embeddings": 256,
    "num_local_experts": 4, "num_experts_per_tok": 1,
    "interleave_moe_layer_step": 2, "use_qk_norm": True,
    "attn_temperature_tuning": True, "floor_scale": 8.0,
    "attn_scale": 0.1, "attention_chunk_size": 256,
    "hidden_act": "silu", "tie_word_embeddings": False,
    "bos_token_id": 1, "eos_token_id": 2,
}


def test_vision_tower_hf_parity():
    """Our functional tower == transformers Llama4VisionModel (random
    weights, fp32): unfold embed, CLS-last, 2D vision rope, adapter."""
    torch = pytest.importorskip("torch")
    from transformers.models.llama4.configuration_llama4 import (
        Llama4VisionConfig,
    )
    from transformers.models.llama4.modeling_llama4 import Llama4VisionModel

    import jax.numpy as jnp

    from sglang_security_tpu.models.mllama4 import (
        Llama4VisionConfigT,
        Llama4VisionTower,
    )

    hf_cfg = Llama4VisionConfig(**{
        k: v for k, v in VIS_CFG.items()
        if k not in ("vision_feature_layer", "vision_feature_select_strategy",
                     "multi_modal_projector_bias", "hidden_act")
    })
    torch.manual_seed(0)
    hf = Llama4VisionModel(hf_cfg).float().eval()

    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}

    def t(name):
        if name in sd:
            return sd[name]
        raise KeyError(name)

    tower = Llama4VisionTower(Llama4VisionConfigT(VIS_CFG))
    params = tower.load_weights(
        lambda n: t(n), prefix="", dtype=jnp.float32
    )
    rng = np.random.default_rng(0)
    px = rng.standard_normal((2, 3, 28, 28)).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(px)).last_hidden_state.numpy()
    got = np.asarray(tower.forward(params, jnp.asarray(px)))
    assert got.shape == ref.shape  # [2, 1, 64] (2x2 grid, ratio 0.5)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


@pytest.fixture(scope="module")
def tiny_mllama4(tmp_path_factory):
    from safetensors.numpy import save_file

    from sglang_security_tpu.test_utils import _write_tiny_tokenizer

    path = str(tmp_path_factory.mktemp("mllama4") / "m")
    os.makedirs(path, exist_ok=True)
    rng = np.random.default_rng(21)
    H, Ie, Im, hd, Hq, Hkv, V = 64, 64, 96, 16, 4, 2, 512
    E = 4

    def r(*shape, scale=0.05):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    lm = "language_model."
    t = {lm + "model.embed_tokens.weight": r(V, H),
         lm + "model.norm.weight": np.ones(H, np.float32),
         lm + "lm_head.weight": r(V, H)}
    for i in range(2):
        p = f"{lm}model.layers.{i}."
        t[p + "input_layernorm.weight"] = np.ones(H, np.float32)
        t[p + "post_attention_layernorm.weight"] = np.ones(H, np.float32)
        t[p + "self_attn.q_proj.weight"] = r(Hq * hd, H)
        t[p + "self_attn.k_proj.weight"] = r(Hkv * hd, H)
        t[p + "self_attn.v_proj.weight"] = r(Hkv * hd, H)
        t[p + "self_attn.o_proj.weight"] = r(H, Hq * hd)
        f = p + "feed_forward."
        if i % 2 == 0:
            t[f + "gate_proj.weight"] = r(Im, H)
            t[f + "up_proj.weight"] = r(Im, H)
            t[f + "down_proj.weight"] = r(H, Im)
        else:
            t[f + "router.weight"] = r(E, H)
            t[f + "experts.gate_up_proj"] = r(E, H, 2 * Ie)
            t[f + "experts.down_proj"] = r(E, Ie, H)
            t[f + "shared_expert.gate_proj.weight"] = r(Ie, H)
            t[f + "shared_expert.up_proj.weight"] = r(Ie, H)
            t[f + "shared_expert.down_proj.weight"] = r(H, Ie)
    # vision tower + projector
    vt = "vision_model."
    D, I, p_sz = 64, 256, 14
    t[vt + "patch_embedding.linear.weight"] = r(D, 3 * p_sz * p_sz)
    t[vt + "class_embedding"] = r(D)
    t[vt + "positional_embedding_vlm"] = r(5, D)
    for nm in ("layernorm_pre", "layernorm_post"):
        t[vt + nm + ".weight"] = np.ones(D, np.float32)
        t[vt + nm + ".bias"] = np.zeros(D, np.float32)
    for i in range(2):
        a = f"{vt}model.layers.{i}."
        for nm in ("input_layernorm", "post_attention_layernorm"):
            t[a + nm + ".weight"] = np.ones(D, np.float32)
            t[a + nm + ".bias"] = np.zeros(D, np.float32)
        for proj in ("q", "k", "v", "o"):
            t[a + f"self_attn.{proj}_proj.weight"] = r(D, D)
            t[a + f"self_attn.{proj}_proj.bias"] = np.zeros(D, np.float32)
        t[a + "mlp.fc1.weight"] = r(I, D)
        t[a + "mlp.fc1.bias"] = np.zeros(I, np.float32)
        t[a + "mlp.fc2.weight"] = r(D, I)
        t[a + "mlp.fc2.bias"] = np.zeros(D, np.float32)
    t[vt + "vision_adapter.mlp.fc1.weight"] = r(64, I)
    t[vt + "vision_adapter.mlp.fc2.weight"] = r(64, 64)
    t["multi_modal_projector.linear_1.weight"] = r(H, 64)
    save_file(t, os.path.join(path, "model.safetensors"))

    cfg = {
        "architectures": ["Llama4ForConditionalGeneration"],
        "model_type": "llama4",
        "text_config": TEXT_CFG,
        "vision_config": VIS_CFG,
        "image_token_index": 500,
    }
    json.dump(cfg, open(os.path.join(path, "config.json"), "w"))
    _write_tiny_tokenizer(path, V)
    return path


def test_mllama4_engine_generates(tiny_mllama4):
    eng = Engine(ServerArgs(
        model_path=tiny_mllama4, dtype="float32", max_total_tokens=2048,
        page_size=8, prefill_token_buckets=[128], decode_bs_buckets=[1, 4],
        max_seq_pages_buckets=[8, 16], random_seed=0, enable_warmup=False,
        log_level="warning",
    ))
    try:
        out = eng.generate(
            input_ids=[[1, 500, 9]],
            image_data=[[np.random.default_rng(0).integers(
                0, 256, (28, 28, 3), dtype=np.uint8)]],
            sampling_params={"temperature": 0.0, "max_new_tokens": 5,
                             "ignore_eos": True},
        )[0]
        assert len(out["output_ids"]) == 5
    finally:
        eng.shutdown()
