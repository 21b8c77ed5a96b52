"""Idefics2/Idefics3(SmolVLM) VLMs: SigLIP tower + perceiver resampler
(v2) / pixel-shuffle connector (v3) + Mistral/Llama LM.

Reference coverage: ``srt/models/idefics2.py`` (VERDICT r3 missing #3):
connector feature parity vs HF and end-to-end greedy parity (each
image = fixed-count LM tokens through mm_embeds).
"""

import numpy as np
import pytest

from sglang_security_tpu.entrypoints.engine import Engine
from sglang_security_tpu.server_args import ServerArgs
from sglang_security_tpu.test_utils import (
    make_tiny_idefics2,
    make_tiny_idefics3,
)

IMTOK = 100


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    return make_tiny_idefics2(
        str(tmp_path_factory.mktemp("idefics2") / "m")
    )


def _image(seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (28, 28, 3), dtype=np.uint8)


def _hf(path):
    import torch
    from transformers import Idefics2ForConditionalGeneration as HFM

    m = HFM.from_pretrained(path, torch_dtype=torch.float32)
    m.eval()
    return m


def test_image_features_match_hf(tiny):
    import jax.numpy as jnp
    import torch

    from sglang_security_tpu.managers.multimodal_processor import (
        get_mm_processor,
    )
    from sglang_security_tpu.model_loader import load_model
    from sglang_security_tpu.models.config import ModelConfig

    proc = get_mm_processor(ModelConfig.from_pretrained(tiny))
    item = proc.process_one(_image(3))
    model, params, _ = load_model(tiny, dtype="float32")
    ours = np.asarray(
        model.encode_images(params, jnp.asarray(item.pixel_values[None]))
    )[0]

    hf = _hf(tiny)
    px = torch.tensor(item.pixel_values[None])
    with torch.no_grad():
        vis = hf.model.vision_model(pixel_values=px).last_hidden_state
        ref = hf.model.connector(
            vis, attention_mask=torch.ones(vis.shape[:2], dtype=torch.long)
        )
    ref = ref[0].numpy()
    assert ours.shape == ref.shape  # [n_latents, H]
    np.testing.assert_allclose(ours, ref, atol=3e-4, rtol=3e-3)


def test_greedy_matches_hf(tiny):
    import torch

    eng = Engine(ServerArgs(
        model_path=tiny, dtype="float32", max_total_tokens=1024,
        page_size=8, prefill_token_buckets=[128], decode_bs_buckets=[1, 4],
        max_seq_pages_buckets=[8], max_running_requests=4, random_seed=0,
    ))
    try:
        img = _image(9)
        item = eng.tokenizer_manager.mm_processor.process_one(img)
        ids = [1, 7, IMTOK, 5, 6]
        out = eng.generate(
            input_ids=ids, image_data=img,
            sampling_params={"temperature": 0.0, "max_new_tokens": 8,
                             "ignore_eos": True},
        )
        hf = _hf(tiny)
        hf.generation_config.eos_token_id = None
        hf_ids = [1, 7] + [IMTOK] * item.num_tokens + [5, 6]
        with torch.no_grad():
            ref = hf.generate(
                input_ids=torch.tensor([hf_ids]),
                pixel_values=torch.tensor(item.pixel_values[None, None]),
                max_new_tokens=8, do_sample=False, num_beams=1,
                pad_token_id=0,
            )
        assert out["output_ids"] == ref[0, len(hf_ids):].tolist()
    finally:
        eng.shutdown()


def test_idefics3_greedy_matches_hf(tmp_path):
    import torch
    from transformers import Idefics3ForConditionalGeneration as HFM

    path = make_tiny_idefics3(str(tmp_path / "i3"))
    eng = Engine(ServerArgs(
        model_path=path, dtype="float32", max_total_tokens=1024,
        page_size=8, prefill_token_buckets=[128], decode_bs_buckets=[1, 4],
        max_seq_pages_buckets=[8], max_running_requests=4, random_seed=0,
    ))
    try:
        img = _image(11)
        item = eng.tokenizer_manager.mm_processor.process_one(img)
        assert item.num_tokens == 1  # 2x2 grid / scale 2 -> 1 token
        ids = [1, 7, IMTOK, 5, 6]
        out = eng.generate(
            input_ids=ids, image_data=img,
            sampling_params={"temperature": 0.0, "max_new_tokens": 8,
                             "ignore_eos": True},
        )
        hf = HFM.from_pretrained(path, torch_dtype=torch.float32).eval()
        hf.generation_config.eos_token_id = None
        hf_ids = [1, 7] + [IMTOK] * item.num_tokens + [5, 6]
        with torch.no_grad():
            ref = hf.generate(
                input_ids=torch.tensor([hf_ids]),
                pixel_values=torch.tensor(item.pixel_values[None, None]),
                max_new_tokens=8, do_sample=False, num_beams=1,
                pad_token_id=0,
            )
        assert out["output_ids"] == ref[0, len(hf_ids):].tolist()
    finally:
        eng.shutdown()
