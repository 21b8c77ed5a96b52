"""GGUF loader tests: format parsing, block dequantization (vs scalar
spec references), name mapping + rope unpermutation, and end-to-end
load_model parity against the safetensors path.

Reference analog: ``srt/model_loader/loader.py:1173-1242``
(GGUFModelLoader) — which delegates to the gguf pip package; ours parses
natively, so the bit-level layouts are verified here."""

import json
import os
import struct

import numpy as np
import pytest

from sglang_security_tpu.model_loader.gguf import (
    GGUFAccessor,
    GGUFReader,
    config_from_gguf,
    gguf_to_hf_name,
)

# ---------------------------------------------------------------- writer


def _pack_string(s: str) -> bytes:
    b = s.encode()
    return struct.pack("<Q", len(b)) + b


def _pack_kv(key: str, vtype: int, value) -> bytes:
    out = _pack_string(key) + struct.pack("<I", vtype)
    if vtype == 4:
        out += struct.pack("<I", value)
    elif vtype == 6:
        out += struct.pack("<f", value)
    elif vtype == 8:
        out += _pack_string(value)
    elif vtype == 10:
        out += struct.pack("<Q", value)
    else:
        raise NotImplementedError(vtype)
    return out


def write_gguf(path, tensors, metadata=None, align=32):
    """tensors: {gguf_name: (numpy_shape_dims_reversed_ok_raw_bytes,
    ggml_type, numpy_shape)} — we take (raw bytes, ttype, np_shape)."""
    metadata = metadata or {}
    blob = struct.pack("<II", 0x46554747, 3)
    blob += struct.pack("<QQ", len(tensors), len(metadata))
    for key, (vtype, value) in metadata.items():
        blob += _pack_kv(key, vtype, value)
    infos = b""
    data = b""
    offset = 0
    for name, (raw, ttype, np_shape) in tensors.items():
        dims = list(reversed(np_shape))  # gguf dims are fastest-first
        infos += _pack_string(name)
        infos += struct.pack("<I", len(dims))
        infos += struct.pack(f"<{len(dims)}Q", *dims)
        infos += struct.pack("<IQ", ttype, offset)
        pad = (-len(raw)) % align
        data += raw + b"\x00" * pad
        offset += len(raw) + pad
    blob += infos
    blob += b"\x00" * ((-len(blob)) % align)
    with open(path, "wb") as f:
        f.write(blob + data)


# ------------------------------------------- scalar spec dequant refs


def deq_q8_0_scalar(raw: bytes, n: int) -> np.ndarray:
    out = []
    for i in range(n // 32):
        blk = raw[i * 34 : (i + 1) * 34]
        d = np.frombuffer(blk[:2], np.float16)[0].astype(np.float32)
        q = np.frombuffer(blk[2:], np.int8)
        out.extend(float(d) * q.astype(np.float32))
    return np.array(out, np.float32)


def deq_q4_k_scalar(raw: bytes, n: int) -> np.ndarray:
    out = []
    for i in range(n // 256):
        blk = raw[i * 144 : (i + 1) * 144]
        d = float(np.frombuffer(blk[:2], np.float16)[0])
        dmin = float(np.frombuffer(blk[2:4], np.float16)[0])
        sc = np.frombuffer(blk[4:16], np.uint8)
        qs = np.frombuffer(blk[16:], np.uint8)

        def scale_min(j):
            if j < 4:
                return sc[j] & 63, sc[j + 4] & 63
            return (
                (sc[j + 4] & 0xF) | ((sc[j - 4] >> 6) << 4),
                (sc[j + 4] >> 4) | ((sc[j] >> 6) << 4),
            )

        ys = np.zeros(256, np.float32)
        q = 0
        for j, base in enumerate(range(0, 256, 64)):
            s1, m1 = scale_min(2 * j)
            s2, m2 = scale_min(2 * j + 1)
            for l in range(32):
                ys[base + l] = d * s1 * (qs[q + l] & 0xF) - dmin * m1
                ys[base + 32 + l] = d * s2 * (qs[q + l] >> 4) - dmin * m2
            q += 32
        out.append(ys)
    return np.concatenate(out)


def deq_q6_k_scalar(raw: bytes, n: int) -> np.ndarray:
    out = []
    for i in range(n // 256):
        blk = raw[i * 210 : (i + 1) * 210]
        ql = np.frombuffer(blk[:128], np.uint8)
        qh = np.frombuffer(blk[128:192], np.uint8)
        sc = np.frombuffer(blk[192:208], np.int8)
        d = float(np.frombuffer(blk[208:210], np.float16)[0])
        ys = np.zeros(256, np.float32)
        for half in range(2):
            lo = ql[half * 64 : half * 64 + 64]
            hi = qh[half * 32 : half * 32 + 32]
            s = sc[half * 8 : half * 8 + 8]
            for l in range(32):
                is_ = l // 16
                q1 = (int(lo[l]) & 0xF | ((int(hi[l]) & 3) << 4)) - 32
                q2 = (int(lo[l + 32]) & 0xF
                      | ((int(hi[l]) >> 2 & 3) << 4)) - 32
                q3 = (int(lo[l]) >> 4 | ((int(hi[l]) >> 4 & 3) << 4)) - 32
                q4 = (int(lo[l + 32]) >> 4
                      | ((int(hi[l]) >> 6 & 3) << 4)) - 32
                base = half * 128
                ys[base + l] = d * s[is_] * q1
                ys[base + l + 32] = d * s[is_ + 2] * q2
                ys[base + l + 64] = d * s[is_ + 4] * q3
                ys[base + l + 96] = d * s[is_ + 6] * q4
        out.append(ys)
    return np.concatenate(out)


def quantize_q8_0(x: np.ndarray) -> bytes:
    """Simple valid Q8_0 encoder for round-trip tests."""
    x = x.reshape(-1, 32)
    out = b""
    for row in x:
        d = max(np.abs(row).max() / 127.0, 1e-12)
        q = np.clip(np.round(row / d), -127, 127).astype(np.int8)
        out += np.float16(d).tobytes() + q.tobytes()
    return out


# ----------------------------------------------------------------- tests


def test_dequant_matches_scalar_spec(tmp_path):
    rng = np.random.default_rng(0)
    n = 512
    cases = [
        (8, 34, deq_q8_0_scalar),  # Q8_0
        (12, 144, deq_q4_k_scalar),  # Q4_K
        (14, 210, deq_q6_k_scalar),  # Q6_K
    ]
    for ttype, blk_bytes, ref in cases:
        blocks = n // (32 if ttype == 8 else 256)
        raw = rng.integers(0, 256, blocks * blk_bytes, dtype=np.uint8)
        # keep f16 scale fields finite: zero their exponent high bits
        raw = raw.copy()
        path = str(tmp_path / f"t{ttype}.gguf")
        write_gguf(path, {"t.weight": (raw.tobytes(), ttype, (n,))})
        got = GGUFReader(path).get("t.weight")
        want = ref(raw.tobytes(), n)
        finite = np.isfinite(want)
        assert np.allclose(got[finite], want[finite], rtol=1e-6, atol=1e-6), (
            ttype,
            np.abs(got[finite] - want[finite]).max(),
        )


def test_q8_0_roundtrip_and_f32(tmp_path):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((64, 32)).astype(np.float32)
    path = str(tmp_path / "rt.gguf")
    write_gguf(
        path,
        {
            "a.weight": (quantize_q8_0(x), 8, x.shape),
            "b.weight": (x.tobytes(), 0, x.shape),
        },
    )
    r = GGUFReader(path)
    assert np.abs(r.get("a.weight") - x).max() < 0.02
    np.testing.assert_array_equal(r.get("b.weight"), x)


def test_name_mapping():
    assert (
        gguf_to_hf_name("blk.3.attn_q.weight")
        == "model.layers.3.self_attn.q_proj.weight"
    )
    assert gguf_to_hf_name("token_embd.weight") == "model.embed_tokens.weight"
    assert gguf_to_hf_name("output_norm.weight") == "model.norm.weight"
    assert gguf_to_hf_name("output.weight") == "lm_head.weight"
    assert (
        gguf_to_hf_name("blk.0.ffn_gate.weight")
        == "model.layers.0.mlp.gate_proj.weight"
    )
    assert gguf_to_hf_name("rope_freqs.weight") is None


def _llamacpp_permute(w: np.ndarray, n_head: int) -> np.ndarray:
    """The convert_hf_to_gguf.py Q/K permutation (public llama.cpp)."""
    return (
        w.reshape(n_head, 2, w.shape[0] // n_head // 2, *w.shape[1:])
        .swapaxes(1, 2)
        .reshape(w.shape)
    )


def _tiny_gguf_model(tmp_path, rng):
    """Write a 2-layer tiny llama as GGUF (F32 tensors, converter-style
    Q/K permutation) + the same weights as an HF state dict."""
    H, I, L, V, NH, NKV = 64, 128, 2, 256, 4, 2
    hd = H // NH
    hf = {}
    tensors = {}

    def add(gname, hfname, shape, permute_heads=0):
        w = rng.standard_normal(shape).astype(np.float32) * 0.05
        hf[hfname] = w
        stored = _llamacpp_permute(w, permute_heads) if permute_heads else w
        tensors[gname] = (stored.tobytes(), 0, stored.shape)

    add("token_embd.weight", "model.embed_tokens.weight", (V, H))
    for i in range(L):
        p, hp = f"blk.{i}.", f"model.layers.{i}."
        add(p + "attn_q.weight", hp + "self_attn.q_proj.weight",
            (NH * hd, H), permute_heads=NH)
        add(p + "attn_k.weight", hp + "self_attn.k_proj.weight",
            (NKV * hd, H), permute_heads=NKV)
        add(p + "attn_v.weight", hp + "self_attn.v_proj.weight",
            (NKV * hd, H))
        add(p + "attn_output.weight", hp + "self_attn.o_proj.weight",
            (H, NH * hd))
        add(p + "ffn_gate.weight", hp + "mlp.gate_proj.weight", (I, H))
        add(p + "ffn_up.weight", hp + "mlp.up_proj.weight", (I, H))
        add(p + "ffn_down.weight", hp + "mlp.down_proj.weight", (H, I))
        add(p + "attn_norm.weight", hp + "input_layernorm.weight", (H,))
        add(p + "ffn_norm.weight", hp + "post_attention_layernorm.weight",
            (H,))
    add("output_norm.weight", "model.norm.weight", (H,))
    add("output.weight", "lm_head.weight", (V, H))
    md = {
        "general.architecture": (8, "llama"),
        "llama.embedding_length": (4, H),
        "llama.block_count": (4, L),
        "llama.feed_forward_length": (4, I),
        "llama.attention.head_count": (4, NH),
        "llama.attention.head_count_kv": (4, NKV),
        "llama.attention.layer_norm_rms_epsilon": (6, 1e-5),
        "llama.rope.freq_base": (6, 10000.0),
        "llama.context_length": (4, 512),
        "llama.vocab_size": (4, V),
        "tokenizer.ggml.bos_token_id": (4, 1),
        "tokenizer.ggml.eos_token_id": (4, 2),
    }
    path = str(tmp_path / "tiny.gguf")
    write_gguf(path, tensors, metadata=md)
    return path, hf


def test_accessor_unpermutes_and_config(tmp_path):
    rng = np.random.default_rng(2)
    path, hf = _tiny_gguf_model(tmp_path, rng)
    acc = GGUFAccessor(path)
    for name, want in hf.items():
        got = np.asarray(acc(name))
        np.testing.assert_allclose(got, want, rtol=0, atol=0, err_msg=name)
    cfg = config_from_gguf(path)
    assert cfg["architectures"] == ["LlamaForCausalLM"]
    assert cfg["hidden_size"] == 64
    assert cfg["num_key_value_heads"] == 2
    assert cfg["vocab_size"] == 256
    assert cfg["tie_word_embeddings"] is False


def test_load_model_gguf_parity_with_safetensors(tmp_path):
    """load_model on the .gguf produces the same logits as the identical
    weights through the safetensors path."""
    import jax.numpy as jnp
    from safetensors.numpy import save_file

    from sglang_security_tpu.model_loader.loader import load_model

    rng = np.random.default_rng(3)
    gguf_path, hf = _tiny_gguf_model(tmp_path, rng)
    st_dir = tmp_path / "st"
    st_dir.mkdir()
    save_file(hf, str(st_dir / "model.safetensors"))
    cfg = config_from_gguf(gguf_path)
    with open(st_dir / "config.json", "w") as f:
        json.dump(cfg, f)

    model_g, params_g, cfg_g = load_model(gguf_path, dtype="float32")
    model_s, params_s, cfg_s = load_model(str(st_dir), dtype="float32")
    assert cfg_g.num_kv_heads == cfg_s.num_kv_heads == 2

    import jax

    def cmp(a, b):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6
        )

    jax.tree.map(cmp, params_g, params_s)


# ---------------------------------------------------------------- BnB NF4

NF4 = np.array([
    -1.0, -0.6961928009986877, -0.5250730514526367, -0.39491748809814453,
    -0.28444138169288635, -0.18477343022823334, -0.09105003625154495, 0.0,
    0.07958029955625534, 0.16093020141124725, 0.24611230194568634,
    0.33791524171829224, 0.44070982933044434, 0.5626170039176941,
    0.7229568362236023, 1.0], np.float32)


def encode_nf4(x: np.ndarray, blocksize=64):
    """Valid BnB NF4 double-quant encoder for round-trip tests."""
    flat = x.reshape(-1).astype(np.float32)
    pad = (-len(flat)) % blocksize
    flat = np.pad(flat, (0, pad))
    blocks = flat.reshape(-1, blocksize)
    absmax = np.abs(blocks).max(axis=1)
    absmax = np.maximum(absmax, 1e-8)
    normed = blocks / absmax[:, None]
    idx = np.abs(normed[..., None] - NF4[None, None, :]).argmin(-1)
    idx = idx.reshape(-1).astype(np.uint8)
    packed = (idx[0::2] << 4) | idx[1::2]
    # nested 8-bit quant of absmax with a linear 256-entry map
    offset = float(absmax.mean())
    shifted = absmax - offset
    nblocks = -(-len(shifted) // 256)
    shifted = np.pad(shifted, (0, nblocks * 256 - len(shifted)))
    nested_absmax = np.maximum(
        np.abs(shifted.reshape(nblocks, 256)).max(axis=1), 1e-8
    ).astype(np.float32)
    nested_map = np.linspace(-1, 1, 256).astype(np.float32)
    normed2 = shifted.reshape(nblocks, 256) / nested_absmax[:, None]
    u8 = np.abs(normed2[..., None] - nested_map[None, None, :]).argmin(-1)
    u8 = u8.reshape(-1)[: len(absmax)].astype(np.uint8)
    meta = {"blocksize": blocksize, "quant_type": "nf4",
            "shape": list(x.shape), "nested_blocksize": 256,
            "nested_offset": offset, "dtype": "float32"}
    return {
        "": packed.reshape(-1, 1),
        ".absmax": u8,
        ".quant_map": NF4,
        ".nested_quant_map": nested_map,
        ".nested_absmax": nested_absmax,
        ".quant_state.bitsandbytes__nf4": np.frombuffer(
            json.dumps(meta).encode(), np.uint8
        ).copy(),
    }


def test_bnb_nf4_dequant(tmp_path):
    from sglang_security_tpu.model_loader.bnb import (
        BnbDequantAccessor, dequantize_bnb_weight, is_bnb_weight,
    )

    rng = np.random.default_rng(11)
    w = rng.standard_normal((48, 96)).astype(np.float32) * 0.1
    tensors = {"x.weight" + k: v for k, v in encode_nf4(w).items()}
    tensors["plain.weight"] = w

    def get(name):
        if name not in tensors:
            raise KeyError(name)
        return tensors[name]

    assert is_bnb_weight(get, "x.weight")
    assert not is_bnb_weight(get, "plain.weight")
    deq = dequantize_bnb_weight(get, "x.weight")
    assert deq.shape == w.shape
    # NF4 worst-case codebook gap is ~0.28*absmax -> half-gap ~0.14
    err = np.abs(deq - w)
    assert err.max() / np.abs(w).max() < 0.15, err.max()
    assert err.mean() / np.abs(w).mean() < 0.10, err.mean()
    acc = BnbDequantAccessor(get)
    np.testing.assert_array_equal(acc("x.weight"), deq)
    np.testing.assert_array_equal(acc("plain.weight"), w)


def test_bnb_checkpoint_load_model(tmp_path):
    """Tiny llama stored in BnB 4-bit serves through the int4 path."""
    from safetensors.numpy import save_file

    from sglang_security_tpu.model_loader.loader import load_model

    rng = np.random.default_rng(12)
    H, I, V, L = 64, 128, 256, 2
    t = {"model.embed_tokens.weight":
             rng.standard_normal((V, H)).astype(np.float32) * 0.05,
         "model.norm.weight": np.ones(H, np.float32)}
    lm = rng.standard_normal((V, H)).astype(np.float32) * 0.05
    t["lm_head.weight"] = lm
    for i in range(L):
        p = f"model.layers.{i}."
        t[p + "input_layernorm.weight"] = np.ones(H, np.float32)
        t[p + "post_attention_layernorm.weight"] = np.ones(H, np.float32)
        for nm, shape in (("self_attn.q_proj", (H, H)),
                          ("self_attn.k_proj", (H // 2, H)),
                          ("self_attn.v_proj", (H // 2, H)),
                          ("self_attn.o_proj", (H, H)),
                          ("mlp.gate_proj", (I, H)),
                          ("mlp.up_proj", (I, H)),
                          ("mlp.down_proj", (H, I))):
            w = rng.standard_normal(shape).astype(np.float32) * 0.05
            for k, v in encode_nf4(w).items():
                t[p + nm + ".weight" + k] = v
    cfg = {
        "architectures": ["LlamaForCausalLM"], "model_type": "llama",
        "hidden_size": H, "intermediate_size": I, "num_hidden_layers": L,
        "num_attention_heads": 4, "num_key_value_heads": 2,
        "vocab_size": V, "rms_norm_eps": 1e-5, "rope_theta": 10000.0,
        "max_position_embeddings": 512, "tie_word_embeddings": False,
        "bos_token_id": 1, "eos_token_id": 2,
        "quantization_config": {"quant_method": "bitsandbytes",
                                "load_in_4bit": True},
    }
    d = tmp_path / "bnb"
    d.mkdir()
    with open(d / "config.json", "w") as f:
        json.dump(cfg, f)
    save_file(t, str(d / "model.safetensors"))
    model, params, config = load_model(str(d), dtype="bfloat16")
    assert model.quantization == "int4"
    lp0 = __import__("jax").tree.map(lambda a: a, params["layers"])
    assert "packed" in lp0["qkv"]  # int4-served


# ------------------------------------------------------- remote connectors


def test_file_connector_serves_model(tmp_path):
    """file:// URI pulls the checkpoint into the cache dir and serves
    (the test double for redis:// and s3://; reference RemoteModelLoader,
    loader.py:1271)."""
    import shutil
    import tempfile

    from sglang_security_tpu.model_loader.connector import (
        create_remote_connector, is_remote_url,
    )
    from sglang_security_tpu.model_loader.loader import load_model
    from sglang_security_tpu.test_utils import make_tiny_llama

    src = str(tmp_path / "src")
    make_tiny_llama(src)
    url = "file://" + src
    assert is_remote_url(url)
    assert not is_remote_url(src)

    conn = create_remote_connector(url)
    shutil.rmtree(conn.local_dir, ignore_errors=True)
    model, params, cfg = load_model(url, dtype="float32")
    assert cfg.architecture == "LlamaForCausalLM"
    # second load hits the local cache (no re-fetch errors)
    model2, params2, _ = load_model(url, dtype="float32")
    import numpy as np

    np.testing.assert_array_equal(
        np.asarray(params["embed"]), np.asarray(params2["embed"])
    )


def test_remote_scheme_errors():
    from sglang_security_tpu.model_loader.connector import (
        create_remote_connector,
    )

    with pytest.raises(ValueError, match="unsupported remote scheme"):
        create_remote_connector("ftp://nope/model")
    for url in ("redis://localhost:6379/m", "s3://bucket/m"):
        with pytest.raises(ImportError, match="pip install"):
            create_remote_connector(url)
