"""Engine.encode / /v1/embeddings tests (VERDICT round-1 missing #6:
no embeddings API)."""

import numpy as np
import pytest

from sglang_security_tpu.entrypoints.engine import Engine
from sglang_security_tpu.server_args import ServerArgs
from sglang_security_tpu.test_utils import make_tiny_llama


@pytest.fixture(scope="module")
def eng(tmp_path_factory):
    tiny = make_tiny_llama(str(tmp_path_factory.mktemp("emb") / "m"))
    e = Engine(ServerArgs(
        model_path=tiny, dtype="float32", max_total_tokens=2048, page_size=8,
        prefill_token_buckets=[128], decode_bs_buckets=[1, 4],
        max_seq_pages_buckets=[8], random_seed=0, enable_warmup=False,
        log_level="warning",
    ))
    yield e
    e.shutdown()


def test_encode_single(eng):
    out = eng.encode(prompt="hello embedding world")
    v = np.asarray(out["embedding"])
    assert v.shape == (128,)
    np.testing.assert_allclose(np.linalg.norm(v), 1.0, rtol=1e-3)


def test_encode_batch_and_determinism(eng):
    outs = eng.encode(prompt=["alpha beta", "gamma delta", "alpha beta"])
    assert len(outs) == 3
    a, b, c = (np.asarray(o["embedding"]) for o in outs)
    np.testing.assert_allclose(a, c, atol=1e-5)  # same text -> same vector
    assert not np.allclose(a, b)


def test_encode_interleaves_with_generate(eng):
    gen = eng.generate(prompt="story:", sampling_params={
        "temperature": 0.0, "max_new_tokens": 4, "ignore_eos": True})
    emb = eng.encode(prompt="vector me")
    assert gen["meta_info"]["completion_tokens"] == 4
    assert len(emb["embedding"]) == 128


# -------------------------------------------------------------------- CLIP
def test_clip_text_hf_parity(tmp_path):
    """Our CLIP text path == transformers CLIPModel.get_text_features
    (causal pre-LN blocks, quick-GELU, final LN, text_projection),
    normalized (reference srt/models/clip.py Pooler LAST+normalize)."""
    import pytest
    torch = pytest.importorskip("torch")
    from transformers import CLIPConfig, CLIPModel as HFCLIPModel

    import jax.numpy as jnp

    from sglang_security_tpu.models.clip import CLIPModel
    from sglang_security_tpu.models.config import ModelConfig

    cfg_d = {
        "architectures": ["CLIPModel"],
        "model_type": "clip",
        "projection_dim": 32,
        "text_config": {
            "hidden_size": 64, "intermediate_size": 128,
            "num_hidden_layers": 2, "num_attention_heads": 4,
            "vocab_size": 99, "max_position_embeddings": 77,
            "eos_token_id": 2,  # HF pools at the eos position
            "layer_norm_eps": 1e-5, "hidden_act": "quick_gelu",
        },
        "vision_config": {
            "hidden_size": 64, "intermediate_size": 128,
            "num_hidden_layers": 2, "num_attention_heads": 4,
            "image_size": 28, "patch_size": 14,
        },
    }
    hf_cfg = CLIPConfig(**{k: v for k, v in cfg_d.items()
                           if k in ("projection_dim", "text_config",
                                    "vision_config")})
    torch.manual_seed(0)
    hf = HFCLIPModel(hf_cfg).float().eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}

    cfg = ModelConfig.from_hf_dict(cfg_d)
    model = CLIPModel(cfg)
    params = model.load_weights(lambda n: sd[n], dtype=jnp.float32)

    # HF legacy pooling (eos_token_id==2) takes the argmax-id position;
    # make the last token the max id so it means LAST-token pooling
    ids = [3, 17, 42, 7, 98]
    with torch.no_grad():
        ref = hf.get_text_features(
            input_ids=torch.tensor([ids]),
        ).numpy()[0]
    ref = ref / np.linalg.norm(ref)

    from sglang_security_tpu.model_executor.forward_batch import ForwardBatch

    T = len(ids)
    fb = ForwardBatch(
        token_ids=jnp.asarray(ids, jnp.int32),
        positions=jnp.arange(T, dtype=jnp.int32),
        slots=jnp.full(T, -1, jnp.int32),
        q_starts=jnp.asarray([0], jnp.int32),
        q_lens=jnp.asarray([T], jnp.int32),
        kv_lens=jnp.asarray([T], jnp.int32),
        page_indices=jnp.zeros((1, 1), jnp.int32),
        out_rows=jnp.asarray([T - 1], jnp.int32),
    )
    hidden, _, _ = model.forward(params, None, None, fb, block_q=8)
    got = np.asarray(model.pool(params, hidden))[0]
    # HF pools at the eos position == last real token here (argmax of
    # eos mask); pad-free single sequence -> identical row
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_clip_engine_encode(tmp_path):
    """CLIPModel end-to-end on the encode route."""
    import json

    import jax.numpy as jnp  # noqa: F401
    from safetensors.numpy import save_file

    from sglang_security_tpu.entrypoints.engine import Engine
    from sglang_security_tpu.server_args import ServerArgs
    from sglang_security_tpu.test_utils import _write_tiny_tokenizer

    import pytest
    torch = pytest.importorskip("torch")
    from transformers import CLIPConfig, CLIPModel as HFCLIPModel

    d = tmp_path / "clip"
    d.mkdir()
    cfg_d = {
        "architectures": ["CLIPModel"],
        "model_type": "clip",
        "projection_dim": 32,
        "text_config": {
            "hidden_size": 64, "intermediate_size": 128,
            "num_hidden_layers": 2, "num_attention_heads": 4,
            "vocab_size": 512, "max_position_embeddings": 77,
            "layer_norm_eps": 1e-5, "hidden_act": "quick_gelu",
        },
        "vision_config": {
            "hidden_size": 64, "intermediate_size": 128,
            "num_hidden_layers": 2, "num_attention_heads": 4,
            "image_size": 28, "patch_size": 14,
        },
    }
    torch.manual_seed(1)
    hf = HFCLIPModel(CLIPConfig(**{
        k: v for k, v in cfg_d.items()
        if k in ("projection_dim", "text_config", "vision_config")
    })).float()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()
          if "position_ids" not in k}
    save_file(sd, str(d / "model.safetensors"))
    json.dump(cfg_d, open(d / "config.json", "w"))
    _write_tiny_tokenizer(str(d), 512)

    eng = Engine(ServerArgs(
        model_path=str(d), dtype="float32", max_total_tokens=1024,
        page_size=8, prefill_token_buckets=[128], decode_bs_buckets=[1],
        max_seq_pages_buckets=[8], random_seed=0, enable_warmup=False,
        log_level="warning", is_embedding=True,
    ))
    try:
        out = eng.encode(prompt="clip embed test")
        v = np.asarray(out["embedding"])
        assert v.shape == (32,)
        np.testing.assert_allclose(np.linalg.norm(v), 1.0, rtol=1e-4)
    finally:
        eng.shutdown()
