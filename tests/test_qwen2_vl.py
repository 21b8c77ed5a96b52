"""Qwen2-VL / Qwen2.5-VL: dynamic-resolution processor, vision-tower
parity vs HF, M-RoPE position parity vs HF get_rope_index, and
end-to-end engine generation (greedy == HF generate).

Reference coverage: ``srt/models/qwen2_vl.py`` / ``qwen2_5_vl.py`` and
``test/srt/test_vision_openai_server.py``, on tiny random checkpoints.
"""

import numpy as np
import pytest

from sglang_security_tpu.entrypoints.engine import Engine
from sglang_security_tpu.managers.multimodal_processor import (
    compute_mrope_positions,
    get_mm_processor,
)
from sglang_security_tpu.models.config import ModelConfig
from sglang_security_tpu.server_args import ServerArgs
from sglang_security_tpu.test_utils import make_tiny_qwen2vl

IMTOK, VS, VE = 490, 492, 493  # test_utils.TINY_QWEN2VL_CONFIG ids


@pytest.fixture(scope="module", params=[False, True], ids=["v20", "v25"])
def tiny_qwen2vl(request, tmp_path_factory):
    v25 = request.param
    path = tmp_path_factory.mktemp("tiny_qvl") / ("q25" if v25 else "q20")
    make_tiny_qwen2vl(str(path), v25=v25)
    return str(path), v25


def _image(seed=0, h=16, w=8):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


def _hf(path, v25):
    import torch

    if v25:
        from transformers import (
            Qwen2_5_VLForConditionalGeneration as HFM,
        )
    else:
        from transformers import Qwen2VLForConditionalGeneration as HFM

    m = HFM.from_pretrained(path, torch_dtype=torch.float32)
    m.eval()
    return m


# --------------------------------------------------------------- processor
def test_processor_dynamic_resolution(tiny_qwen2vl):
    path, _ = tiny_qwen2vl
    proc = get_mm_processor(ModelConfig.from_pretrained(path))
    # 16x8 image, factor 4 (patch 2 * merge 2): grid (1, 8, 4), 8 tokens
    item = proc.process_one(_image(0, 16, 8))
    assert item.grid_thw == (1, 8, 4)
    assert item.num_tokens == 8
    assert item.pixel_values.shape == (32, 3 * 2 * 2 * 2)
    # different aspect ratio -> different grid
    item2 = proc.process_one(_image(0, 8, 16))
    assert item2.grid_thw == (1, 4, 8) and item2.hash != item.hash
    # over-budget image is scaled down within max_pixels
    big = proc.process_one(_image(1, 500, 400))
    t, h, w = big.grid_thw
    assert h * w * proc.vcfg.patch_size ** 2 <= proc.max_pixels


# ------------------------------------------------------------- HF parity
def test_vision_features_match_hf(tiny_qwen2vl):
    """Tower + merger vs HF get_image_features (window permutation,
    segment masking, 2D rope, merger all covered)."""
    import jax.numpy as jnp
    import torch

    from sglang_security_tpu.model_loader import load_model

    path, v25 = tiny_qwen2vl
    proc = get_mm_processor(ModelConfig.from_pretrained(path))
    # big enough that 2.5 gets ragged edge windows (llm grid 5x3)
    item = proc.process_one(_image(3, 20, 12))
    model, params, _ = load_model(path, dtype="float32")

    meta = item.vis_meta
    n = item.pixel_values.shape[0]
    Sp = 1 << max(6, (n - 1).bit_length())
    patches = np.zeros((Sp, item.pixel_values.shape[1]), np.float32)
    patches[:n] = item.pixel_values[meta["perm"]]
    rot = np.zeros((Sp, meta["rot_freqs"].shape[1]), np.float32)
    rot[:n] = meta["rot_freqs"]
    win = np.full(Sp, -1, np.int32)
    win[:n] = meta["win_seg"]
    full = np.full(Sp, -1, np.int32)
    full[:n] = meta["full_seg"]
    ours = np.asarray(
        model.encode_image(
            params, jnp.asarray(patches), jnp.asarray(rot),
            jnp.asarray(win), jnp.asarray(full),
        )
    )[np.asarray(meta["inv_perm"])]

    hf = _hf(path, v25)
    with torch.no_grad():
        ref = hf.model.get_image_features(
            torch.tensor(item.pixel_values),
            image_grid_thw=torch.tensor([list(item.grid_thw)]),
        )
    if isinstance(ref, (list, tuple)):
        ref = torch.cat(list(ref), dim=0)
    ref = ref.numpy()
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=2e-3)


def test_mrope_positions_match_hf(tiny_qwen2vl):
    import torch

    path, v25 = tiny_qwen2vl
    proc = get_mm_processor(ModelConfig.from_pretrained(path))
    it1 = proc.process_one(_image(4, 16, 8))
    it2 = proc.process_one(_image(5, 8, 8))
    ids = [1, 7, 9, VS] + [IMTOK] * it1.num_tokens + [VE, 5, VS] + (
        [IMTOK] * it2.num_tokens) + [VE, 6]
    it1.offset = 4
    it2.offset = 4 + it1.num_tokens + 3
    pos3, delta = compute_mrope_positions(len(ids), [it1, it2])

    hf = _hf(path, v25)
    grid = torch.tensor([list(it1.grid_thw), list(it2.grid_thw)])
    ref_pos, ref_delta = hf.model.get_rope_index(
        torch.tensor([ids]), image_grid_thw=grid
    )
    assert np.array_equal(pos3, ref_pos[:, 0].numpy())
    assert delta == int(ref_delta[0, 0])


# ----------------------------------------------------------------- engine
@pytest.fixture(scope="module")
def engine(tiny_qwen2vl):
    path, _ = tiny_qwen2vl
    eng = Engine(
        ServerArgs(
            model_path=path,
            dtype="float32",
            max_total_tokens=4096,
            page_size=8,
            prefill_token_buckets=[128, 256],
            decode_bs_buckets=[1, 4],
            max_seq_pages_buckets=[8, 16],
            random_seed=0,
        )
    )
    yield eng
    eng.shutdown()


def test_greedy_matches_hf(engine, tiny_qwen2vl):
    import torch

    path, v25 = tiny_qwen2vl
    img = _image(9, 16, 8)
    item = engine.tokenizer_manager.mm_processor.process_one(img)
    ids = [1, 7, 9, VS, IMTOK, VE, 5, 6]  # engine: one placeholder
    out = engine.generate(
        input_ids=ids, image_data=img,
        sampling_params={"temperature": 0.0, "max_new_tokens": 8,
                         "ignore_eos": True},
    )
    hf = _hf(path, v25)
    hf_ids = [1, 7, 9, VS] + [IMTOK] * item.num_tokens + [VE, 5, 6]
    with torch.no_grad():
        ref = hf.generate(
            input_ids=torch.tensor([hf_ids]),
            pixel_values=torch.tensor(item.pixel_values),
            image_grid_thw=torch.tensor([list(item.grid_thw)]),
            max_new_tokens=8, do_sample=False, num_beams=1, pad_token_id=0,
        )
    assert out["output_ids"] == ref[0, len(hf_ids):].tolist()


def test_text_only_matches_hf(engine, tiny_qwen2vl):
    """No images: the M-RoPE model must reduce exactly to 1D rope
    (delta-0 decode path)."""
    import torch

    path, v25 = tiny_qwen2vl
    ids = [1, 7, 9, 5, 6, 11, 13]
    out = engine.generate(
        input_ids=ids,
        sampling_params={"temperature": 0.0, "max_new_tokens": 6,
                         "ignore_eos": True},
    )
    hf = _hf(path, v25)
    with torch.no_grad():
        ref = hf.generate(
            input_ids=torch.tensor([ids]), max_new_tokens=6,
            do_sample=False, num_beams=1, pad_token_id=0,
        )
    assert out["output_ids"] == ref[0, len(ids):].tolist()


def test_image_prefix_cache_hit(engine):
    img = _image(12, 16, 8)
    sp = {"temperature": 0.0, "max_new_tokens": 4, "ignore_eos": True}
    ids = [1, 7, VS, IMTOK, VE] + list(range(20, 32))
    out1 = engine.generate(input_ids=ids, image_data=img, sampling_params=sp)
    out2 = engine.generate(input_ids=ids, image_data=img, sampling_params=sp)
    assert out2["meta_info"]["cached_tokens"] > 0
    assert out1["output_ids"] == out2["output_ids"]
