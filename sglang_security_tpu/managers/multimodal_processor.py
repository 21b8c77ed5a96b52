"""Multimodal (image) input processing.

TPU-native redesign of the reference's processor registry
(``srt/managers/multimodal_processor.py`` +
``multimodal_processors/*.py``) and ``MultimodalInputs`` /
``MultimodalDataItem`` (``srt/managers/schedule_batch.py:170-420``):

- images are decoded + resized + normalized on the host (numpy/PIL),
  producing fixed-shape ``pixel_values`` [3, S, S] per image — static
  shapes are what lets the vision encoder be one bucketed jit;
- each ``<image>`` placeholder in the prompt is expanded into the
  image's token span using **hash-derived pseudo token ids** (reference
  ``pad_input_ids``), so the radix cache distinguishes different images
  and prefix caching of image prompts works unchanged;
- features are identified by a content hash, enabling the runner's
  encoder-output cache (reference ``mem_cache/multimodal_cache.py``).
"""

from __future__ import annotations

import base64
import hashlib
import io
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

# Pseudo token ids for image positions: above any real vocab, below 2^30
# so int32 numpy arrays are safe. The span for one image is
# IM_TOKEN_BASE + (hash<<log2(max_tokens_per_image)) + offset, folded
# into a 2^24 window.
IM_TOKEN_BASE = 1 << 28
_IM_HASH_WINDOW = 1 << 24


@dataclass
class MultimodalDataItem:
    """One processed image (reference MultimodalDataItem)."""

    pixel_values: np.ndarray  # [3, S, S] float32, normalized
    hash: int  # content hash (feature-cache key)
    num_tokens: int  # language-model tokens this image expands to
    offset: int = -1  # first token index in the expanded prompt

    def pad_ids(self) -> List[int]:
        h = IM_TOKEN_BASE + (self.hash % _IM_HASH_WINDOW)
        return [h] * self.num_tokens


@dataclass
class MultimodalInputs:
    """All mm data of one request (reference MultimodalInputs)."""

    items: List[MultimodalDataItem] = field(default_factory=list)

    def item_for_token(self, pos: int) -> Optional[tuple]:
        """(item, row_within_item) covering absolute prompt index pos."""
        for it in self.items:
            if it.offset <= pos < it.offset + it.num_tokens:
                return it, pos - it.offset
        return None


def _decode_image(image) -> np.ndarray:
    """Accept ndarray [H,W,3], nested lists, base64 data, or a file
    path; return uint8/float [H, W, 3]."""
    if isinstance(image, np.ndarray):
        arr = image
    elif isinstance(image, (list, tuple)):
        arr = np.asarray(image)
    elif isinstance(image, (str, bytes)):
        from PIL import Image

        if isinstance(image, bytes):
            data = image
        elif image.startswith("data:"):
            data = base64.b64decode(image.split(",", 1)[1])
        elif len(image) > 512 or not ("/" in image or "." in image):
            data = base64.b64decode(image)
        else:
            with open(image, "rb") as f:
                data = f.read()
        arr = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    else:
        raise TypeError(f"unsupported image type {type(image)}")
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    if arr.shape[-1] != 3:
        raise ValueError(f"expected HWC RGB image, got shape {arr.shape}")
    return arr


def _resize_bilinear(img: np.ndarray, size: int) -> np.ndarray:
    """[H, W, 3] float -> [size, size, 3] bilinear (numpy, no deps)."""
    H, W, _ = img.shape
    if H == size and W == size:
        return img
    ys = (np.arange(size) + 0.5) * H / size - 0.5
    xs = (np.arange(size) + 0.5) * W / size - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, H - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, W - 1)
    y1 = np.minimum(y0 + 1, H - 1)
    x1 = np.minimum(x0 + 1, W - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :, None]
    a = img[y0][:, x0]
    b = img[y0][:, x1]
    c = img[y1][:, x0]
    d = img[y1][:, x1]
    return (a * (1 - wy) * (1 - wx) + b * (1 - wy) * wx
            + c * wy * (1 - wx) + d * wy * wx)


class ImageProcessor:
    """CLIP-style square resize + normalize; one per served VLM."""

    def __init__(self, image_size: int, patch_size: int,
                 mean, std, image_token_id: int,
                 tokens_per_image: Optional[int] = None):
        self.image_size = image_size
        self.patch_size = patch_size
        self.mean = np.asarray(mean, np.float32).reshape(1, 1, 3)
        self.std = np.asarray(std, np.float32).reshape(1, 1, 3)
        self.image_token_id = image_token_id
        grid = image_size // patch_size
        self.tokens_per_image = tokens_per_image or grid * grid

    def process_one(self, image) -> MultimodalDataItem:
        arr = _decode_image(image).astype(np.float32)
        if arr.max() > 1.5:  # uint8 range
            arr = arr / 255.0
        arr = _resize_bilinear(arr, self.image_size)
        arr = (arr - self.mean) / self.std
        chw = np.ascontiguousarray(arr.transpose(2, 0, 1))
        h = int.from_bytes(
            hashlib.sha1(chw.tobytes()).digest()[:8], "little"
        )
        return MultimodalDataItem(
            pixel_values=chw, hash=h, num_tokens=self.tokens_per_image
        )

    def expand_prompt(
        self, input_ids: List[int], images: List
    ) -> tuple:
        """Replace each image_token_id in input_ids with the image's
        pseudo-token span; returns (new_ids, MultimodalInputs)."""
        items = [self.process_one(im) for im in images]
        out: List[int] = []
        mm = MultimodalInputs()
        idx = 0
        for tok in input_ids:
            if tok == self.image_token_id and idx < len(items):
                it = items[idx]
                it.offset = len(out)
                out.extend(it.pad_ids())
                mm.items.append(it)
                idx += 1
            else:
                out.append(tok)
        # images without a placeholder: prepend (reference behavior for
        # plain /generate calls with image_data)
        for it in items[idx:]:
            span = it.pad_ids()
            for existing in mm.items:
                existing.offset += len(span)
            it.offset = 0
            out = span + out
            mm.items.insert(0, it)
        return out, mm


def get_mm_processor(config) -> Optional[ImageProcessor]:
    """Build the processor for a served model config (None = text-only).

    Reference: ``get_mm_processor`` (multimodal_processor.py); dispatch
    is by architecture, parameters come from config.json.
    """
    raw = config.raw if hasattr(config, "raw") else config
    arch = (raw.get("architectures") or [""])[0]
    vis = raw.get("vision_config")
    if vis is None:
        return None
    if arch == "LlavaForConditionalGeneration":
        return ImageProcessor(
            image_size=vis.get("image_size", 336),
            patch_size=vis.get("patch_size", 14),
            mean=vis.get("image_mean") or [0.48145466, 0.4578275, 0.40821073],
            std=vis.get("image_std") or [0.26862954, 0.26130258, 0.27577711],
            image_token_id=raw.get("image_token_index", 32000),
        )
    return None
