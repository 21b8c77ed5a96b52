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
    """One processed media item (reference MultimodalDataItem)."""

    pixel_values: np.ndarray  # [3, S, S] f32, [n_patches, pd] (Qwen-VL),
    # or [n_mels, frames] log-mel features (modality == "audio")
    hash: int  # content hash (feature-cache key)
    num_tokens: int  # language-model tokens this image expands to
    offset: int = -1  # first token index in the expanded prompt
    grid_thw: Optional[tuple] = None  # (t, h, w) patch grid (Qwen-VL)
    vis_meta: Optional[dict] = None  # qwen_vision_metadata (Qwen-VL)
    modality: str = "image"  # "image" | "audio"
    audio_len: int = 0  # post-conv valid length (attention mask)

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


def _decode_audio(audio) -> np.ndarray:
    """Accept a float waveform (ndarray/list, 16 kHz mono), a .wav path,
    raw WAV bytes, or base64 WAV data; return [n_samples] f32."""
    if isinstance(audio, np.ndarray):
        return audio.astype(np.float32).reshape(-1)
    if isinstance(audio, (list, tuple)):
        return np.asarray(audio, np.float32).reshape(-1)
    if isinstance(audio, dict):  # {"array": ..., "sampling_rate": ...}
        return np.asarray(audio["array"], np.float32).reshape(-1)
    if isinstance(audio, (str, bytes)):
        if isinstance(audio, bytes):
            data = audio
        elif audio.startswith("data:"):
            data = base64.b64decode(audio.split(",", 1)[1])
        elif len(audio) > 512 or not ("/" in audio or "." in audio):
            data = base64.b64decode(audio)
        else:
            with open(audio, "rb") as f:
                data = f.read()
        import wave

        with wave.open(io.BytesIO(data)) as w:
            n = w.getnframes()
            width = w.getsampwidth()
            ch = w.getnchannels()
            raw = w.readframes(n)
        dt = {1: np.uint8, 2: np.int16, 4: np.int32}[width]
        pcm = np.frombuffer(raw, dt).astype(np.float32)
        if width == 1:
            pcm = (pcm - 128.0) / 128.0
        else:
            pcm = pcm / float(2 ** (8 * width - 1))
        if ch > 1:
            pcm = pcm.reshape(-1, ch).mean(axis=1)
        return pcm
    raise TypeError(f"unsupported audio type {type(audio)}")


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
                 tokens_per_image: Optional[int] = None,
                 audio_token_id: Optional[int] = None,
                 audio_pool_step: int = 0):
        self.image_size = image_size
        self.patch_size = patch_size
        self.mean = np.asarray(mean, np.float32).reshape(1, 1, 3)
        self.std = np.asarray(std, np.float32).reshape(1, 1, 3)
        self.image_token_id = image_token_id
        grid = image_size // patch_size
        self.tokens_per_image = tokens_per_image or grid * grid
        # audio input (MiniCPM-O): >0 pool step enables the modality
        self.audio_token_id = audio_token_id
        self.audio_pool_step = audio_pool_step

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

    def process_one_audio(self, audio) -> MultimodalDataItem:
        """One audio clip -> log-mel item (MiniCPM-O apm path; token
        count per reference ``_get_feat_extract_output_lengths``)."""
        from sglang_security_tpu.layers.audio import log_mel_spectrogram

        wav = _decode_audio(audio)
        mel = log_mel_spectrogram(wav)  # [80, frames]
        frames = mel.shape[1]
        after_cnn = (frames - 1) // 2 + 1
        p = self.audio_pool_step
        n_tok = max(1, (after_cnn - p) // p + 1)
        h = int.from_bytes(
            hashlib.sha1(mel.tobytes()).digest()[:8], "little"
        )
        return MultimodalDataItem(
            pixel_values=mel, hash=h, num_tokens=n_tok,
            modality="audio", audio_len=after_cnn,
        )

    def expand_prompt(
        self, input_ids: List[int], images: List, audios: List = ()
    ) -> tuple:
        """Replace each image_token_id / audio_token_id in input_ids
        with that item's pseudo-token span; returns
        (new_ids, MultimodalInputs)."""
        items = [self.process_one(im) for im in images]
        audio_items = [self.process_one_audio(a) for a in audios]
        # subclass processors (Qwen-VL, Mllama) define their own
        # __init__ without the audio fields
        audio_token_id = getattr(self, "audio_token_id", None)
        out: List[int] = []
        mm = MultimodalInputs()
        idx = aidx = 0
        for tok in input_ids:
            if tok == self.image_token_id and idx < len(items):
                it = items[idx]
                it.offset = len(out)
                out.extend(it.pad_ids())
                mm.items.append(it)
                idx += 1
            elif (
                audio_token_id is not None
                and tok == audio_token_id
                and aidx < len(audio_items)
            ):
                it = audio_items[aidx]
                it.offset = len(out)
                out.extend(it.pad_ids())
                mm.items.append(it)
                aidx += 1
            else:
                out.append(tok)
        # items without a placeholder: prepend (reference behavior for
        # plain /generate calls with image_data/audio_data)
        for it in list(items[idx:]) + list(audio_items[aidx:]):
            span = it.pad_ids()
            for existing in mm.items:
                existing.offset += len(span)
            it.offset = 0
            out = span + out
            mm.items.insert(0, it)
        return out, mm


class Qwen2VLImageProcessor(ImageProcessor):
    """Qwen2-VL / Qwen2.5-VL dynamic-resolution processing (HF
    ``Qwen2VLImageProcessor``): smart-resize to multiples of
    patch*merge keeping total pixels within [min_pixels, max_pixels],
    flatten to conv3d patches in merged-block order, and emit the
    (t, h, w) grid the vision tower and M-RoPE need.  Resampling is
    numpy bilinear (the HF default is PIL bicubic — an image-decode
    detail, not architecture).  tokens per image = t*h*w / merge^2."""

    def __init__(self, vision_config: dict, image_token_id: int,
                 mean=None, std=None, min_pixels: int = 56 * 56,
                 max_pixels: int = 28 * 28 * 1280, v25: bool = False):
        from sglang_security_tpu.layers.qwen_vision import QwenVisionConfig

        self.vcfg = QwenVisionConfig(vision_config, v25=v25)
        self.image_token_id = image_token_id
        self.mean = np.asarray(
            mean or [0.48145466, 0.4578275, 0.40821073], np.float32
        ).reshape(1, 1, 3)
        self.std = np.asarray(
            std or [0.26862954, 0.26130258, 0.27577711], np.float32
        ).reshape(1, 1, 3)
        self.min_pixels = min_pixels
        self.max_pixels = max_pixels
        self._meta_cache: dict = {}

    @staticmethod
    def smart_resize(height, width, factor, min_pixels, max_pixels):
        """HF smart_resize (image_processing_qwen2_vl.py:54)."""
        import math

        if max(height, width) / min(height, width) > 200:
            raise ValueError("aspect ratio must be < 200")
        h = round(height / factor) * factor
        w = round(width / factor) * factor
        if h * w > max_pixels:
            beta = math.sqrt((height * width) / max_pixels)
            h = max(factor, math.floor(height / beta / factor) * factor)
            w = max(factor, math.floor(width / beta / factor) * factor)
        elif h * w < min_pixels:
            beta = math.sqrt(min_pixels / (height * width))
            h = math.ceil(height * beta / factor) * factor
            w = math.ceil(width * beta / factor) * factor
        return h, w

    def vision_meta(self, grid_thw: tuple) -> dict:
        from sglang_security_tpu.layers.qwen_vision import (
            qwen_vision_metadata,
        )

        meta = self._meta_cache.get(grid_thw)
        if meta is None:
            meta = qwen_vision_metadata(self.vcfg, grid_thw)
            self._meta_cache[grid_thw] = meta
        return meta

    def process_one(self, image) -> MultimodalDataItem:
        cfg = self.vcfg
        p, m, tp = cfg.patch_size, cfg.spatial_merge_size, cfg.temporal_patch_size
        arr = _decode_image(image).astype(np.float32)
        if arr.max() > 1.5:
            arr = arr / 255.0
        H, W, _ = arr.shape
        rh, rw = self.smart_resize(
            H, W, p * m, self.min_pixels, self.max_pixels
        )
        arr = _resize_bilinear_hw(arr, rh, rw)
        arr = (arr - self.mean) / self.std
        chw = arr.transpose(2, 0, 1)  # [3, rh, rw]
        gh, gw = rh // p, rw // p
        # temporal duplicate then flatten in merged-block order
        # (HF _preprocess reshape/transpose, image_processing_qwen2_vl.py)
        pt = np.broadcast_to(chw[None], (tp, 3, rh, rw))
        pt = pt.reshape(1, tp, 3, gh // m, m, p, gw // m, m, p)
        pt = pt.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
        flat = np.ascontiguousarray(
            pt.reshape(gh * gw, 3 * tp * p * p)
        )
        grid = (1, gh, gw)
        h = int.from_bytes(
            hashlib.sha1(flat.tobytes() + bytes(str(grid), "ascii"))
            .digest()[:8], "little"
        )
        return MultimodalDataItem(
            pixel_values=flat, hash=h,
            num_tokens=(gh // m) * (gw // m),
            grid_thw=grid, vis_meta=self.vision_meta(grid),
        )


class MllamaImageProcessor(ImageProcessor):
    """Llama-3.2-Vision tiled processing (HF ``MllamaImageProcessor``):
    pick the optimal tile canvas for the image's aspect ratio, resize to
    fit (preserving aspect), pad to the canvas, split into tiles, and
    normalize.  The ``<|image|>`` placeholder stays a single LM token
    (mllama feeds vision through cross-attention, not token rows); its
    id is still replaced by a content-hash pseudo id so the radix cache
    distinguishes prompts by image."""

    def __init__(self, vision_config: dict, image_token_id: int):
        from sglang_security_tpu.layers.mllama_vision import (
            MllamaVisionConfig,
        )

        self.vcfg = MllamaVisionConfig(vision_config)
        self.image_token_id = image_token_id
        self.mean = np.asarray(self.vcfg.image_mean, np.float32).reshape(
            1, 1, 3
        )
        self.std = np.asarray(self.vcfg.image_std, np.float32).reshape(
            1, 1, 3
        )

    def _optimal_canvas(self, h: int, w: int):
        """HF get_optimal_tiled_canvas (image_processing_mllama.py:134):
        among supported (tiles_h, tiles_w) grids pick the min upscale
        (or min downscale), tie-broken by smallest canvas area.
        Returns (tiles_h, tiles_w)."""
        ts = self.vcfg.image_size
        best = None
        arrs = self.vcfg.supported_aspect_ratios
        scales = []
        for th, tw in arrs:
            ch, cw = th * ts, tw * ts
            scales.append(min(ch / h, cw / w))
        sc = np.asarray(scales)
        up = sc[sc >= 1]
        selected = up.min() if len(up) else sc[sc < 1].max()
        best_area = None
        for (th, tw), s in zip(arrs, scales):
            if s == selected:
                area = th * tw
                if best_area is None or area < best_area:
                    best_area = area
                    best = (th, tw)
        return best

    def process_one(self, image) -> MultimodalDataItem:
        import math

        cfg = self.vcfg
        ts = cfg.image_size
        arr = _decode_image(image).astype(np.float32)
        H, W, _ = arr.shape
        th, tw = self._optimal_canvas(H, W)
        ch, cw = th * ts, tw * ts
        # fit-to-canvas preserving aspect (HF get_image_size_fit_to_canvas)
        target_w = int(np.clip(W, ts, cw))
        target_h = int(np.clip(H, ts, ch))
        scale_h, scale_w = target_h / H, target_w / W
        if scale_w < scale_h:
            nw = target_w
            nh = min(math.floor(H * scale_w) or 1, target_h)
        else:
            nh = target_h
            nw = min(math.floor(W * scale_h) or 1, target_w)
        arr = _resize_bilinear_hw(arr, nh, nw)
        if arr.max() > 1.5:
            arr = arr / 255.0
        arr = (arr - self.mean) / self.std
        canvas = np.zeros((ch, cw, 3), np.float32)
        # HF normalizes after padding with 0-pixels; padding regions end
        # up at (0 - mean)/std — replicate by padding with that constant
        canvas[:, :] = (0.0 - self.mean) / self.std
        canvas[:nh, :nw] = arr
        chw = canvas.transpose(2, 0, 1)  # [3, ch, cw]
        # split to tiles [th*tw, 3, ts, ts]
        tiles = (
            chw.reshape(3, th, ts, tw, ts)
            .transpose(1, 3, 0, 2, 4)
            .reshape(th * tw, 3, ts, ts)
        )
        mt = cfg.max_num_tiles
        padded = np.zeros((mt, 3, ts, ts), np.float32)
        padded[: th * tw] = tiles
        ar_id = cfg.supported_aspect_ratios.index((th, tw)) + 1
        h = int.from_bytes(
            hashlib.sha1(padded.tobytes()).digest()[:8], "little"
        )
        return MultimodalDataItem(
            pixel_values=padded, hash=h, num_tokens=1,
            vis_meta={
                "aspect_ratio_id": ar_id,
                "num_tiles": th * tw,
                "cross_len": th * tw * cfg.num_patches,
            },
        )


def compute_mrope_positions(num_tokens: int, items):
    """3D rope positions for one expanded prompt (host numpy).

    Mirrors HF ``Qwen2VLModel.get_rope_index``
    (modeling_qwen2_vl.py:925): text runs advance all three components
    together; each image block places t/h/w grid indices offset by the
    running position; the next text token resumes at max+1.  Returns
    (pos3 [3, num_tokens] i64, delta) where decode positions are
    ``seq_len - 1 + delta`` on all three components.
    """
    pos3 = np.zeros((3, num_tokens), np.int64)
    cur = 0  # next position value
    idx = 0  # next token index
    for it in sorted(items, key=lambda x: x.offset):
        text_len = it.offset - idx
        if text_len > 0:
            pos3[:, idx:it.offset] = cur + np.arange(text_len)
            cur += text_len
            idx = it.offset
        t, lh, lw = it.vis_meta["llm_grid"]
        n = t * lh * lw
        ti = np.repeat(np.arange(t), lh * lw)
        hi = np.tile(np.repeat(np.arange(lh), lw), t)
        wi = np.tile(np.arange(lw), t * lh)
        pos3[0, idx:idx + n] = cur + ti
        pos3[1, idx:idx + n] = cur + hi
        pos3[2, idx:idx + n] = cur + wi
        cur += max(t, lh, lw)
        idx += n
    if idx < num_tokens:
        pos3[:, idx:] = cur + np.arange(num_tokens - idx)
    delta = int(pos3.max()) + 1 - num_tokens
    return pos3, delta


def _resize_bilinear_hw(img: np.ndarray, rh: int, rw: int) -> np.ndarray:
    """[H, W, 3] float -> [rh, rw, 3] bilinear (non-square variant of
    _resize_bilinear)."""
    H, W, _ = img.shape
    if H == rh and W == rw:
        return img
    ys = (np.arange(rh) + 0.5) * H / rh - 0.5
    xs = (np.arange(rw) + 0.5) * W / rw - 0.5
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


def get_mm_processor(config) -> Optional[ImageProcessor]:
    """Build the processor for a served model config (None = text-only).

    Reference: ``get_mm_processor`` (multimodal_processor.py); dispatch
    is by architecture, parameters come from config.json.
    """
    raw = config.raw if hasattr(config, "raw") else config
    arch = (raw.get("architectures") or [""])[0]
    vis = raw.get("vision_config") or raw.get("_outer", {}).get(
        "vision_config"
    )
    if vis is None:
        if arch == "Phi4MMForCausalLM":
            vis = {}  # navit siglip-448 defaults (models/phi4mm.py)
        elif arch == "MiniCPMO":
            vis = {}  # audio-only MiniCPM-O config (apm still served)
        else:
            return None
    if arch in ("LlavaForConditionalGeneration", "LlavaLlamaForCausalLM",
                "YiVLForCausalLM"):
        return ImageProcessor(
            image_size=vis.get("image_size", 336),
            patch_size=vis.get("patch_size", 14),
            mean=vis.get("image_mean") or [0.48145466, 0.4578275, 0.40821073],
            std=vis.get("image_std") or [0.26862954, 0.26130258, 0.27577711],
            image_token_id=raw.get("image_token_index", 32000),
        )
    if arch == "LlavaVidForCausalLM":
        g = vis.get("image_size", 336) // vis.get("patch_size", 14)
        stride = raw.get("mm_spatial_pool_stride", 2)
        return ImageProcessor(
            image_size=vis.get("image_size", 336),
            patch_size=vis.get("patch_size", 14),
            mean=vis.get("image_mean") or [0.48145466, 0.4578275, 0.40821073],
            std=vis.get("image_std") or [0.26862954, 0.26130258, 0.27577711],
            image_token_id=raw.get("image_token_index", 32000),
            # per FRAME; videos arrive as a list of frame images
            tokens_per_image=(g // stride) ** 2,
        )
    if arch == "Gemma3ForConditionalGeneration":
        return ImageProcessor(
            image_size=vis.get("image_size", 896),
            patch_size=vis.get("patch_size", 14),
            mean=vis.get("image_mean") or [0.5, 0.5, 0.5],
            std=vis.get("image_std") or [0.5, 0.5, 0.5],
            image_token_id=raw.get("image_token_index", 262144),
            tokens_per_image=raw.get("mm_tokens_per_image", 256),
        )
    if arch == "Idefics2ForConditionalGeneration":
        outer = raw.get("_outer") or raw
        perc = outer.get("perceiver_config") or {}
        return ImageProcessor(
            image_size=vis.get("image_size", 980),
            patch_size=vis.get("patch_size", 14),
            # HF Idefics2ImageProcessor defaults: imagenet mean/std
            mean=vis.get("image_mean") or [0.485, 0.456, 0.406],
            std=vis.get("image_std") or [0.229, 0.224, 0.225],
            image_token_id=outer.get("image_token_id", 32001),
            tokens_per_image=perc.get("resampler_n_latents", 64),
        )
    if arch in ("Idefics3ForConditionalGeneration",
                "SmolVLMForConditionalGeneration"):
        outer = raw.get("_outer") or raw
        g = vis.get("image_size", 364) // vis.get("patch_size", 14)
        sf = outer.get("scale_factor", 2)
        return ImageProcessor(
            image_size=vis.get("image_size", 364),
            patch_size=vis.get("patch_size", 14),
            mean=vis.get("image_mean") or [0.5, 0.5, 0.5],
            std=vis.get("image_std") or [0.5, 0.5, 0.5],
            image_token_id=outer.get("image_token_id", 49153),
            tokens_per_image=(g * g) // (sf * sf),
        )
    if arch == "Phi4MMForCausalLM":
        embd = (raw.get("embd_layer") or {}).get("image_embd_layer", {})
        size = vis.get("image_size", 448)
        g = size // vis.get("patch_size", 14)
        h = g // embd.get("base_feat_height_reduction", 2)
        return ImageProcessor(
            image_size=size,
            patch_size=vis.get("patch_size", 14),
            mean=vis.get("image_mean") or [0.5, 0.5, 0.5],
            std=vis.get("image_std") or [0.5, 0.5, 0.5],
            # <|image_1|> expands host-side; config carries the id
            image_token_id=raw.get("image_token_id", 200010),
            tokens_per_image=h * (h + 1) + 1,
        )
    if arch in ("MultiModalityCausalLM", "JanusForConditionalGeneration"):
        vp = vis.get("params", vis)
        size = vp.get("image_size", 384)
        g = size // vp.get("patch_size", 16)
        return ImageProcessor(
            image_size=size,
            patch_size=vp.get("patch_size", 16),
            mean=vp.get("image_mean") or [0.5, 0.5, 0.5],
            std=vp.get("image_std") or [0.5, 0.5, 0.5],
            image_token_id=raw.get("image_token_id", 100581),
            tokens_per_image=g * g,
        )
    if arch == "KimiVLForConditionalGeneration":
        outer = raw.get("_outer") or raw
        g = vis.get("image_size", 392) // vis.get("patch_size", 14)
        kh, kw = tuple(vis.get("merge_kernel_size", (2, 2)))
        return ImageProcessor(
            image_size=vis.get("image_size", 392),
            patch_size=vis.get("patch_size", 14),
            mean=vis.get("image_mean") or [0.5, 0.5, 0.5],
            std=vis.get("image_std") or [0.5, 0.5, 0.5],
            image_token_id=outer.get(
                "media_placeholder_token_id", 163605
            ),
            tokens_per_image=(g // kh) * (g // kw),
        )
    if arch == "Llama4ForConditionalGeneration":
        g = vis.get("image_size", 336) // vis.get("patch_size", 14)
        r = vis.get("pixel_shuffle_ratio", 0.5)
        return ImageProcessor(
            image_size=vis.get("image_size", 336),
            patch_size=vis.get("patch_size", 14),
            mean=vis.get("image_mean") or [0.5, 0.5, 0.5],
            std=vis.get("image_std") or [0.5, 0.5, 0.5],
            image_token_id=(raw.get("_outer") or raw).get(
                "image_token_index", 200092
            ),
            tokens_per_image=int((g * r) ** 2),
        )
    if arch in ("MiniCPMV", "MiniCPMO"):
        kw = {}
        if arch == "MiniCPMO":
            # speech input (reference minicpmo.py get_audio_embedding)
            kw = dict(
                audio_token_id=raw.get("audio_token_id"),
                audio_pool_step=raw.get("audio_pool_step", 2),
            )
        return ImageProcessor(
            image_size=vis.get("image_size", 448),
            patch_size=vis.get("patch_size", 14),
            mean=vis.get("image_mean") or [0.5, 0.5, 0.5],
            std=vis.get("image_std") or [0.5, 0.5, 0.5],
            image_token_id=raw.get("image_token_id", 32000),
            # resampler emits query_num tokens regardless of grid
            tokens_per_image=raw.get("query_num", 64),
            **kw,
        )
    if arch == "InternVLChatModel":
        outer = raw.get("_outer") or raw
        size = outer.get("force_image_size") or vis.get("image_size", 448)
        g = size // vis.get("patch_size", 14)
        ds = outer.get("downsample_ratio", 0.5)
        return ImageProcessor(
            image_size=size,
            patch_size=vis.get("patch_size", 14),
            # InternVL normalizes with imagenet stats
            mean=vis.get("image_mean") or [0.485, 0.456, 0.406],
            std=vis.get("image_std") or [0.229, 0.224, 0.225],
            image_token_id=outer.get(
                "img_context_token_id",
                outer.get("image_token_index", 32000),
            ),
            tokens_per_image=int(g * g * ds * ds),
        )
    if arch == "DeepseekVL2ForCausalLM":
        outer = raw.get("_outer") or raw
        pc = outer.get("projector_config") or {}
        size = vis.get("image_size", 384)
        g = size // vis.get("patch_size", 14)
        h = g // pc.get("downsample_ratio", 2)
        return ImageProcessor(
            image_size=size,
            patch_size=vis.get("patch_size", 14),
            # timm siglip-webli normalize
            mean=vis.get("image_mean") or [0.5, 0.5, 0.5],
            std=vis.get("image_std") or [0.5, 0.5, 0.5],
            image_token_id=outer.get("image_token_id", 100015),
            # rows get a newline embed; +1 view separator
            # (models/deepseek_vl2.py tokens_per_image)
            tokens_per_image=h * (h + 1) + 1,
        )
    if arch == "MllamaForConditionalGeneration":
        return MllamaImageProcessor(
            vis,
            image_token_id=(raw.get("_outer") or raw).get(
                "image_token_index", 128256
            ),
        )
    if arch in ("Qwen2VLForConditionalGeneration",
                "Qwen2_5_VLForConditionalGeneration"):
        return Qwen2VLImageProcessor(
            vis,
            image_token_id=raw.get("image_token_id", 151655),
            mean=vis.get("image_mean"),
            std=vis.get("image_std"),
            min_pixels=vis.get("min_pixels", 56 * 56),
            max_pixels=vis.get("max_pixels", 28 * 28 * 1280),
            v25=arch.startswith("Qwen2_5"),
        )
    return None
