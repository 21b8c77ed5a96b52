"""Native GGUF checkpoint reader: parser, dequantization, HF name mapping.

Capability parity with the reference's ``GGUFModelLoader``
(``srt/model_loader/loader.py:1173-1242``), which delegates to the
``gguf`` pip package; that package is not available here, so the format
is parsed natively with numpy (spec:
https://github.com/ggerganov/ggml/blob/master/docs/gguf.md).

Supported tensor encodings: F32, F16, BF16, Q8_0, Q4_0, Q4_1, Q4_K,
Q6_K — the common llama.cpp inference quants.  Dequantization is
vectorized numpy; weights arrive as float32 and flow into the normal
quantize-at-load path (int4/int8 Pallas kernels), so a GGUF checkpoint
serves exactly like a safetensors one.

The loader also synthesizes a ``config.json``-equivalent dict from GGUF
metadata (``llama.*`` keys) so a bare ``.gguf`` file is servable without
a sibling HF config.
"""

from __future__ import annotations

import struct
from typing import Any, BinaryIO, Dict, List, Optional, Tuple

import numpy as np

GGUF_MAGIC = 0x46554747  # "GGUF" little-endian

# -- metadata value types (spec table) --------------------------------------
_SCALAR_FMT = {
    0: ("B", 1),  # uint8
    1: ("b", 1),  # int8
    2: ("<H", 2),  # uint16
    3: ("<h", 2),  # int16
    4: ("<I", 4),  # uint32
    5: ("<i", 4),  # int32
    6: ("<f", 4),  # float32
    7: ("?", 1),  # bool
    10: ("<Q", 8),  # uint64
    11: ("<q", 8),  # int64
    12: ("<d", 8),  # float64
}
_TYPE_STRING = 8
_TYPE_ARRAY = 9

# -- ggml tensor encodings: type id -> (block_elems, block_bytes) ------------
GGML_F32 = 0
GGML_F16 = 1
GGML_Q4_0 = 2
GGML_Q4_1 = 3
GGML_Q8_0 = 8
GGML_Q4_K = 12
GGML_Q6_K = 14
GGML_BF16 = 30

_BLOCK_LAYOUT = {
    GGML_F32: (1, 4),
    GGML_F16: (1, 2),
    GGML_BF16: (1, 2),
    GGML_Q8_0: (32, 2 + 32),
    GGML_Q4_0: (32, 2 + 16),
    GGML_Q4_1: (32, 4 + 16),
    GGML_Q4_K: (256, 2 + 2 + 12 + 128),
    GGML_Q6_K: (256, 128 + 64 + 16 + 2),
}


def _read_string(f: BinaryIO) -> str:
    (n,) = struct.unpack("<Q", f.read(8))
    return f.read(n).decode("utf-8")


def _read_value(f: BinaryIO, vtype: int) -> Any:
    if vtype in _SCALAR_FMT:
        fmt, size = _SCALAR_FMT[vtype]
        return struct.unpack(fmt, f.read(size))[0]
    if vtype == _TYPE_STRING:
        return _read_string(f)
    if vtype == _TYPE_ARRAY:
        (etype,) = struct.unpack("<I", f.read(4))
        (count,) = struct.unpack("<Q", f.read(8))
        if etype in _SCALAR_FMT:
            fmt, size = _SCALAR_FMT[etype]
            raw = f.read(size * count)
            return list(struct.unpack(f"<{count}{fmt[-1]}", raw))
        return [_read_value(f, etype) for _ in range(count)]
    raise ValueError(f"unknown gguf metadata value type {vtype}")


# --------------------------------------------------------------------------
# dequantization (all operate on raw block bytes, return float32 rows)
# --------------------------------------------------------------------------


def _deq_q8_0(raw: np.ndarray, n_blocks: int) -> np.ndarray:
    b = raw.reshape(n_blocks, 34)
    d = b[:, :2].copy().view(np.float16).astype(np.float32)  # [B,1]
    q = b[:, 2:].view(np.int8).astype(np.float32)  # [B,32]
    return d * q


def _deq_q4_0(raw: np.ndarray, n_blocks: int) -> np.ndarray:
    b = raw.reshape(n_blocks, 18)
    d = b[:, :2].copy().view(np.float16).astype(np.float32)
    qs = b[:, 2:]  # [B,16] nibble pairs
    lo = (qs & 0x0F).astype(np.int8) - 8
    hi = (qs >> 4).astype(np.int8) - 8
    q = np.concatenate([lo, hi], axis=1).astype(np.float32)  # [B,32]
    return d * q


def _deq_q4_1(raw: np.ndarray, n_blocks: int) -> np.ndarray:
    b = raw.reshape(n_blocks, 20)
    d = b[:, :2].copy().view(np.float16).astype(np.float32)
    m = b[:, 2:4].copy().view(np.float16).astype(np.float32)
    qs = b[:, 4:]
    lo = (qs & 0x0F).astype(np.float32)
    hi = (qs >> 4).astype(np.float32)
    q = np.concatenate([lo, hi], axis=1)
    return d * q + m


def _q4k_scales(sc: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Unpack the 12-byte 6-bit scale/min table of a Q4_K super-block.

    Layout (ggml get_scale_min_k4): for sub-block j<4 scale=sc[j]&63,
    min=sc[j+4]&63; for j>=4 scale=(sc[j+4]&0xF)|((sc[j-4]>>6)<<4),
    min=(sc[j+4]>>4)|((sc[j]>>6)<<4).  Returns ([B,8] scales, [B,8] mins).
    """
    sc = sc.astype(np.uint8)
    j = np.arange(4)
    s_lo = sc[:, j] & 63
    m_lo = sc[:, j + 4] & 63
    s_hi = (sc[:, j + 8] & 0x0F) | ((sc[:, j] >> 6) << 4)
    m_hi = (sc[:, j + 8] >> 4) | ((sc[:, j + 4] >> 6) << 4)
    scales = np.concatenate([s_lo, s_hi], axis=1)
    mins = np.concatenate([m_lo, m_hi], axis=1)
    return scales.astype(np.float32), mins.astype(np.float32)


def _deq_q4_k(raw: np.ndarray, n_blocks: int) -> np.ndarray:
    b = raw.reshape(n_blocks, 144)
    d = b[:, :2].copy().view(np.float16).astype(np.float32)  # [B,1]
    dmin = b[:, 2:4].copy().view(np.float16).astype(np.float32)
    scales, mins = _q4k_scales(b[:, 4:16])  # [B,8] each
    qs = b[:, 16:]  # [B,128]
    # 4 chunks of 32 bytes; each yields 64 values: 32 low nibbles then
    # 32 high nibbles (sub-blocks 2c and 2c+1)
    qs = qs.reshape(n_blocks, 4, 32)
    lo = (qs & 0x0F).astype(np.float32)
    hi = (qs >> 4).astype(np.float32)
    q = np.stack([lo, hi], axis=2).reshape(n_blocks, 8, 32)
    out = d[:, :, None] * scales[:, :, None] * q - dmin[:, :, None] * mins[
        :, :, None
    ]
    return out.reshape(n_blocks, 256)


def _deq_q6_k(raw: np.ndarray, n_blocks: int) -> np.ndarray:
    b = raw.reshape(n_blocks, 210)
    ql = b[:, :128]
    qh = b[:, 128:192]
    sc = b[:, 192:208].view(np.int8).astype(np.float32)  # [B,16]
    d = b[:, 208:210].copy().view(np.float16).astype(np.float32)  # [B,1]
    # ggml dequantize_row_q6_K: two 128-value halves per super-block;
    # within a half: l in [0,32) ->
    #   q1 = (ql[l] & 0xF) | ((qh[l] >> 0 & 3) << 4)  at offset l
    #   q2 = (ql[l+32] & 0xF) | ((qh[l] >> 2 & 3) << 4) at l+32
    #   q3 = (ql[l] >> 4) | ((qh[l] >> 4 & 3) << 4)   at l+64
    #   q4 = (ql[l+32] >> 4) | ((qh[l] >> 6 & 3) << 4) at l+96
    ql = ql.reshape(n_blocks, 2, 64)
    qh = qh.reshape(n_blocks, 2, 32)
    ql_lo, ql_hi = ql[:, :, :32], ql[:, :, 32:]
    q1 = (ql_lo & 0x0F) | ((qh & 0x03) << 4)
    q2 = (ql_hi & 0x0F) | (((qh >> 2) & 0x03) << 4)
    q3 = (ql_lo >> 4) | (((qh >> 4) & 0x03) << 4)
    q4 = (ql_hi >> 4) | (((qh >> 6) & 0x03) << 4)
    q = np.concatenate([q1, q2, q3, q4], axis=2).astype(np.int8) - 32
    q = q.reshape(n_blocks, 256).astype(np.float32)
    # scales: one int8 per 16 values
    s = np.repeat(sc, 16, axis=1)  # [B,256]
    return d * s * q


_DEQUANT = {
    GGML_Q8_0: _deq_q8_0,
    GGML_Q4_0: _deq_q4_0,
    GGML_Q4_1: _deq_q4_1,
    GGML_Q4_K: _deq_q4_k,
    GGML_Q6_K: _deq_q6_k,
}


class GGUFReader:
    """Parses one .gguf file: metadata dict + lazy dequantized tensors."""

    def __init__(self, path: str):
        self.path = path
        self.metadata: Dict[str, Any] = {}
        self.tensors: Dict[str, Tuple[List[int], int, int]] = {}
        with open(path, "rb") as f:
            magic, version = struct.unpack("<II", f.read(8))
            if magic != GGUF_MAGIC:
                raise ValueError(f"{path}: not a GGUF file")
            if version < 2:
                raise ValueError(f"{path}: unsupported GGUF version {version}")
            n_tensors, n_kv = struct.unpack("<QQ", f.read(16))
            for _ in range(n_kv):
                key = _read_string(f)
                (vtype,) = struct.unpack("<I", f.read(4))
                self.metadata[key] = _read_value(f, vtype)
            for _ in range(n_tensors):
                name = _read_string(f)
                (n_dims,) = struct.unpack("<I", f.read(4))
                dims = list(struct.unpack(f"<{n_dims}Q", f.read(8 * n_dims)))
                ttype, offset = struct.unpack("<IQ", f.read(12))
                self.tensors[name] = (dims, ttype, offset)
            align = int(self.metadata.get("general.alignment", 32))
            pos = f.tell()
            self._data_start = (pos + align - 1) // align * align

    def keys(self):
        return self.tensors.keys()

    def get(self, name: str) -> np.ndarray:
        """Dequantized tensor as float32 (or raw dtype for F32/F16/BF16),
        in numpy (row-major) shape — GGUF dims are fastest-first, so the
        numpy shape is the reverse."""
        dims, ttype, offset = self.tensors[name]
        if ttype not in _BLOCK_LAYOUT:
            raise ValueError(
                f"{name}: unsupported ggml tensor type {ttype}; supported: "
                f"{sorted(_BLOCK_LAYOUT)}"
            )
        n_elems = int(np.prod(dims))
        blk_elems, blk_bytes = _BLOCK_LAYOUT[ttype]
        n_blocks = n_elems // blk_elems
        nbytes = n_blocks * blk_bytes
        shape = tuple(reversed(dims))
        raw = np.fromfile(
            self.path, dtype=np.uint8, count=nbytes,
            offset=self._data_start + offset,
        )
        if ttype == GGML_F32:
            return raw.view(np.float32).reshape(shape)
        if ttype == GGML_F16:
            return raw.view(np.float16).reshape(shape)
        if ttype == GGML_BF16:
            import ml_dtypes

            return raw.view(ml_dtypes.bfloat16).reshape(shape)
        return _DEQUANT[ttype](raw, n_blocks).reshape(shape)


# --------------------------------------------------------------------------
# GGUF -> HF adaptation (name map, rope permutation, config synthesis)
# --------------------------------------------------------------------------

# gguf suffix -> HF suffix inside a layer block
_LAYER_MAP = {
    "attn_q": "self_attn.q_proj",
    "attn_k": "self_attn.k_proj",
    "attn_v": "self_attn.v_proj",
    "attn_output": "self_attn.o_proj",
    "attn_norm": "input_layernorm",
    "ffn_norm": "post_attention_layernorm",
    "ffn_gate": "mlp.gate_proj",
    "ffn_up": "mlp.up_proj",
    "ffn_down": "mlp.down_proj",
    "attn_q_norm": "self_attn.q_norm",
    "attn_k_norm": "self_attn.k_norm",
}
_TOP_MAP = {
    "token_embd": "model.embed_tokens",
    "output_norm": "model.norm",
    "output": "lm_head",
}


def gguf_to_hf_name(name: str) -> Optional[str]:
    """blk.N.attn_q.weight -> model.layers.N.self_attn.q_proj.weight."""
    if not name.endswith((".weight", ".bias")):
        return None
    base, suffix = name.rsplit(".", 1)
    if base.startswith("blk."):
        _, layer, rest = base.split(".", 2)
        mapped = _LAYER_MAP.get(rest)
        if mapped is None:
            return None
        return f"model.layers.{layer}.{mapped}.{suffix}"
    mapped = _TOP_MAP.get(base)
    if mapped is None:
        return None
    return f"{mapped}.{suffix}"


def _unpermute_rope(w: np.ndarray, n_head: int) -> np.ndarray:
    """Invert llama.cpp's convert-time Q/K permutation.

    convert_hf_to_gguf permutes [out, in] rows as
    reshape(h, 2, out//h//2, in).swapaxes(1, 2) so its interleaved rotary
    matches HF's half-rotation; we store HF layout, so invert it.
    """
    out_dim = w.shape[0]
    return (
        w.reshape(n_head, out_dim // n_head // 2, 2, *w.shape[1:])
        .swapaxes(1, 2)
        .reshape(w.shape)
    )


class GGUFAccessor:
    """Name -> tensor accessor with the SafetensorsAccessor interface:
    HF tensor names in, HF-layout float arrays out."""

    def __init__(self, path: str):
        self.reader = GGUFReader(path)
        md = self.reader.metadata
        arch = md.get("general.architecture", "llama")
        self._n_head = int(md.get(f"{arch}.attention.head_count", 0))
        self._n_head_kv = int(
            md.get(f"{arch}.attention.head_count_kv", self._n_head)
        )
        self._index: Dict[str, str] = {}
        for gname in self.reader.keys():
            hf = gguf_to_hf_name(gname)
            if hf is not None:
                self._index[hf] = gname

    def keys(self):
        return self._index.keys()

    def __call__(self, name: str) -> np.ndarray:
        if name not in self._index:
            # tied lm_head: fall back to the embedding table
            if name == "lm_head.weight":
                return self(
                    "model.embed_tokens.weight"
                )
            raise KeyError(name)
        t = self.reader.get(self._index[name])
        if self._n_head and name.endswith("q_proj.weight"):
            t = _unpermute_rope(t, self._n_head)
        elif self._n_head_kv and name.endswith("k_proj.weight"):
            t = _unpermute_rope(t, self._n_head_kv)
        return t


def config_from_gguf(path: str) -> dict:
    """Synthesize an HF config.json-equivalent dict from GGUF metadata so
    a bare .gguf file is servable (the reference requires the HF config
    alongside; `loader.py:1194` builds only the name map from it)."""
    md = GGUFReader(path).metadata
    arch = md.get("general.architecture", "llama")
    g = lambda k, d=None: md.get(f"{arch}.{k}", d)
    n_head = int(g("attention.head_count", 32))
    hidden = int(g("embedding_length", 4096))
    cfg = {
        "architectures": ["LlamaForCausalLM"],
        "model_type": "llama",
        "hidden_size": hidden,
        "intermediate_size": int(g("feed_forward_length", 4 * hidden)),
        "num_hidden_layers": int(g("block_count", 32)),
        "num_attention_heads": n_head,
        "num_key_value_heads": int(g("attention.head_count_kv", n_head)),
        "rms_norm_eps": float(
            g("attention.layer_norm_rms_epsilon", 1e-5)
        ),
        "rope_theta": float(g("rope.freq_base", 10000.0)),
        "max_position_embeddings": int(g("context_length", 4096)),
        "vocab_size": int(g("vocab_size", 32000)),
        "bos_token_id": int(md.get("tokenizer.ggml.bos_token_id", 1)),
        "eos_token_id": int(md.get("tokenizer.ggml.eos_token_id", 2)),
        "tie_word_embeddings": "output.weight"
        not in GGUFReader(path).tensors,
    }
    if arch in ("qwen2", "qwen3"):
        cfg["architectures"] = ["Qwen2ForCausalLM"]
        cfg["model_type"] = arch
    elif arch == "mistral":
        cfg["architectures"] = ["MistralForCausalLM"]
        cfg["model_type"] = "mistral"
    return cfg
