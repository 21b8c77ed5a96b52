"""Native bitsandbytes (NF4/FP4) prequantized-checkpoint ingestion.

Capability parity with the reference's ``BitsAndBytesModelLoader``
(``srt/model_loader/loader.py:697``), which delegates to the
bitsandbytes package; that package is not available here, so the
4-bit blockwise format is dequantized natively with numpy.

BnB-serialized safetensors store, per linear ``X``:
  ``X.weight``                       uint8 [ceil(out*in/2), 1] packed
                                     nibbles (first value = high nibble)
  ``X.weight.quant_map``             f32 [16] codebook (nf4/fp4)
  ``X.weight.absmax``                u8 [nblocks] (double-quantized) or
                                     f32 [nblocks]
  ``X.weight.nested_quant_map``      f32 [256]   (double quant only)
  ``X.weight.nested_absmax``         f32 [ceil(nblocks/256)]
  ``X.weight.quant_state.bitsandbytes__nf4`` (or __fp4)
                                     uint8 tensor of JSON metadata
                                     (blocksize, shape, nested_offset)

Dequantized weights flow into the normal quantize-at-load path, so a
BnB checkpoint serves through the int4 Pallas kernels.
"""

from __future__ import annotations

import json
from typing import Optional

import numpy as np


def _meta(get_tensor, prefix: str) -> Optional[dict]:
    for suffix in ("quant_state.bitsandbytes__nf4",
                   "quant_state.bitsandbytes__fp4"):
        try:
            raw = np.asarray(get_tensor(f"{prefix}.{suffix}"))
            return json.loads(bytes(raw.astype(np.uint8).tolist()).decode())
        except KeyError:
            continue
    return None


def is_bnb_weight(get_tensor, name: str) -> bool:
    if not name.endswith(".weight"):
        return False
    try:
        get_tensor(name + ".quant_map")
        return True
    except KeyError:
        return False


def dequantize_bnb_weight(get_tensor, name: str) -> np.ndarray:
    """``name`` is ``X.weight``; returns the dequantized f32 [out, in]."""
    meta = _meta(get_tensor, name) or {}
    blocksize = int(meta.get("blocksize", 64))
    packed = np.asarray(get_tensor(name)).reshape(-1).astype(np.uint8)
    quant_map = np.asarray(get_tensor(name + ".quant_map"), np.float32)
    absmax = np.asarray(get_tensor(name + ".absmax"))
    if absmax.dtype == np.uint8:  # double (nested) quantization
        nested_map = np.asarray(
            get_tensor(name + ".nested_quant_map"), np.float32
        )
        nested_absmax = np.asarray(
            get_tensor(name + ".nested_absmax"), np.float32
        )
        nblocksize = int(meta.get("nested_blocksize", 256))
        offset = float(meta.get("nested_offset", 0.0))
        idx = np.arange(absmax.shape[0]) // nblocksize
        absmax = nested_map[absmax] * nested_absmax[idx] + offset
    absmax = absmax.astype(np.float32)

    hi = quant_map[packed >> 4]
    lo = quant_map[packed & 0x0F]
    flat = np.stack([hi, lo], axis=1).reshape(-1)  # first value = high
    nblocks = absmax.shape[0]
    scales = np.repeat(absmax, blocksize)[: flat.shape[0]]
    flat = flat * scales
    shape = meta.get("shape")
    if shape is None:
        raise ValueError(f"{name}: bnb quant_state metadata missing shape")
    n = int(np.prod(shape))
    return flat[:n].reshape(shape).astype(np.float32)


class BnbDequantAccessor:
    """Accessor wrapper: fetching ``X.weight`` transparently dequantizes
    BnB 4-bit tensors; everything else passes through."""

    def __init__(self, get_tensor):
        self._get = get_tensor

    def __call__(self, name: str):
        if is_bnb_weight(self._get, name):
            return dequantize_bnb_weight(self._get, name)
        return self._get(name)

    def keys(self):
        return getattr(self._get, "keys", lambda: [])()
