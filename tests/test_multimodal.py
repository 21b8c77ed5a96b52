"""Multimodal (LLaVA) stack: vision tower parity vs HF, processor unit
tests, and end-to-end engine generation with images.

Mirrors the reference's VLM coverage (``test/srt/test_vision_openai_server.py``,
``srt/managers/multimodal_processor.py``) on a tiny random checkpoint.
"""

import numpy as np
import pytest

from sglang_security_tpu.entrypoints.engine import Engine
from sglang_security_tpu.managers.multimodal_processor import (
    IM_TOKEN_BASE,
    ImageProcessor,
    get_mm_processor,
)
from sglang_security_tpu.server_args import ServerArgs
from sglang_security_tpu.test_utils import make_tiny_llava


@pytest.fixture(scope="module")
def tiny_llava(tmp_path_factory):
    path = tmp_path_factory.mktemp("tiny_vlm") / "llava"
    make_tiny_llava(str(path))
    return str(path)


@pytest.fixture(scope="module")
def engine(tiny_llava):
    eng = Engine(
        ServerArgs(
            model_path=tiny_llava,
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


def _image(seed=0, size=28):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (size, size, 3), dtype=np.uint8)


# --------------------------------------------------------------- processor
def test_processor_expand_prompt(tiny_llava):
    from sglang_security_tpu.models.config import ModelConfig

    proc = get_mm_processor(ModelConfig.from_pretrained(tiny_llava))
    assert proc is not None and proc.tokens_per_image == 4
    ids, mm = proc.expand_prompt([1, 7, 500, 9], [_image(0)])
    assert len(ids) == 4 - 1 + 4  # placeholder replaced by 4 pseudo ids
    assert ids[0] == 1 and ids[1] == 7 and ids[-1] == 9
    assert all(t >= IM_TOKEN_BASE for t in ids[2:6])
    assert len(mm.items) == 1 and mm.items[0].offset == 2

    # identical images -> identical pseudo ids (prefix-cacheable);
    # different images -> different ids
    ids2, _ = proc.expand_prompt([1, 7, 500, 9], [_image(0)])
    assert ids2 == ids
    ids3, _ = proc.expand_prompt([1, 7, 500, 9], [_image(1)])
    assert ids3 != ids


def test_processor_no_placeholder_prepends(tiny_llava):
    from sglang_security_tpu.models.config import ModelConfig

    proc = get_mm_processor(ModelConfig.from_pretrained(tiny_llava))
    ids, mm = proc.expand_prompt([1, 7, 9], [_image(0)])
    assert len(ids) == 7 and mm.items[0].offset == 0
    assert all(t >= IM_TOKEN_BASE for t in ids[:4])


def test_resize_normalize():
    proc = ImageProcessor(28, 14, [0.5, 0.5, 0.5], [0.5, 0.5, 0.5], 500)
    item = proc.process_one(_image(0, size=56))  # downscale 2x
    assert item.pixel_values.shape == (3, 28, 28)
    assert np.isfinite(item.pixel_values).all()
    # same content -> same hash
    assert proc.process_one(_image(0, size=56)).hash == item.hash


# ------------------------------------------------------------- HF parity
def _hf_llava(tiny_llava):
    import torch
    from transformers import LlavaForConditionalGeneration

    m = LlavaForConditionalGeneration.from_pretrained(
        tiny_llava, torch_dtype=torch.float32
    )
    m.eval()
    return m


def test_vision_features_match_hf(tiny_llava):
    """Our encode_images (tower + projector) vs HF get_image_features."""
    import jax.numpy as jnp
    import torch

    from sglang_security_tpu.model_loader import load_model
    from sglang_security_tpu.models.config import ModelConfig

    model, params, config = load_model(tiny_llava, dtype="float32")
    proc = get_mm_processor(ModelConfig.from_pretrained(tiny_llava))
    px = proc.process_one(_image(3)).pixel_values[None]  # [1, 3, 28, 28]

    ours = np.asarray(model.encode_images(params, jnp.asarray(px)))[0]

    hf = _hf_llava(tiny_llava)
    with torch.no_grad():
        ref = hf.get_image_features(
            torch.tensor(px),
            vision_feature_layer=-2,
            vision_feature_select_strategy="default",
        )
    if isinstance(ref, (list, tuple)):
        ref = ref[0]
    ref = ref.reshape(-1, ref.shape[-1]).numpy()
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=2e-3)


def test_llava_greedy_matches_hf(engine, tiny_llava):
    import torch

    img = _image(5)
    prompt_ids = [1, 7, 500, 9, 42]  # 500 = image placeholder
    n = 8
    out = engine.generate(
        input_ids=prompt_ids,
        image_data=img,
        sampling_params={"temperature": 0.0, "max_new_tokens": n,
                         "ignore_eos": True},
    )

    hf = _hf_llava(tiny_llava)
    # HF wants the placeholder pre-expanded to tokens_per_image positions
    hf_ids = [1, 7, 500, 500, 500, 500, 9, 42]
    px = engine.tokenizer_manager.mm_processor.process_one(img).pixel_values
    with torch.no_grad():
        ref = hf.generate(
            input_ids=torch.tensor([hf_ids]),
            pixel_values=torch.tensor(px[None]),
            max_new_tokens=n, do_sample=False, num_beams=1,
            pad_token_id=0,
        )
    ref_ids = ref[0, len(hf_ids):].tolist()
    assert out["output_ids"] == ref_ids, (out["output_ids"], ref_ids)


# ----------------------------------------------------------------- engine
def test_image_prefix_cache_hit(engine):
    img = _image(11)
    sp = {"temperature": 0.0, "max_new_tokens": 4, "ignore_eos": True}
    # 16 expanded tokens -> at least one full page is cacheable (page=8)
    ids = [1, 7, 500, 9, 42, 6, 8, 3, 11, 13, 17, 19, 23]
    out1 = engine.generate(input_ids=ids, image_data=img, sampling_params=sp)
    out2 = engine.generate(input_ids=ids, image_data=img, sampling_params=sp)
    # identical image -> identical pseudo ids -> radix prefix hit
    assert out2["meta_info"]["cached_tokens"] > 0
    assert out1["output_ids"] == out2["output_ids"]
    # a different image diverges at token 2 -> no page-aligned reuse
    out3 = engine.generate(input_ids=ids, image_data=_image(12),
                           sampling_params=sp)
    assert out3["meta_info"]["cached_tokens"] == 0


def test_two_images_one_prompt(engine):
    sp = {"temperature": 0.0, "max_new_tokens": 4, "ignore_eos": True}
    out = engine.generate(
        input_ids=[1, 500, 7, 500, 9],
        image_data=[_image(21), _image(22)],
        sampling_params=sp,
    )
    assert len(out["output_ids"]) == 4
    # order matters: swapped images give a different prefix
    out_sw = engine.generate(
        input_ids=[1, 500, 7, 500, 9],
        image_data=[_image(22), _image(21)],
        sampling_params=sp,
    )
    assert isinstance(out_sw["text"], str)


def test_text_only_on_vlm(engine):
    out = engine.generate(
        input_ids=[1, 7, 9, 42],
        sampling_params={"temperature": 0.0, "max_new_tokens": 4,
                         "ignore_eos": True},
    )
    assert len(out["output_ids"]) == 4


def test_image_on_text_model_raises(tmp_path):
    from sglang_security_tpu.managers.tokenizer_manager import TokenizerManager
    from sglang_security_tpu.managers.io_struct import GenerateReqInput
    from sglang_security_tpu.server_args import ServerArgs as SA
    from sglang_security_tpu.test_utils import make_tiny_llama

    path = str(tmp_path / "llama")
    make_tiny_llama(path)
    tm = TokenizerManager(SA(model_path=path))
    with pytest.raises(ValueError, match="not multimodal"):
        tm.make_reqs(
            GenerateReqInput(input_ids=[1, 2, 3], image_data=_image(0))
        )
