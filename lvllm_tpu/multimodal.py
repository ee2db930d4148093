"""Multimodal input preprocessing (image → pixel_values).

Counterpart of the reference's multimodal input mapper
(``vllm/multimodal/`` + the HF image processors it delegates to): decode
API-side image payloads (base64 data URLs) and produce CLIP-normalized
``pixel_values`` for the vision tower. Mean/std follow
``CLIPImageProcessor`` (OpenAI CLIP constants).
"""

import base64
import io
from typing import List

import numpy as np

CLIP_MEAN = np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32)


def pixels_from_image(img, image_size: int) -> np.ndarray:
    """PIL image → [1, 3, S, S] float32, CLIP-normalized."""
    from PIL import Image

    img = img.convert("RGB").resize((image_size, image_size),
                                    Image.BICUBIC)
    arr = np.asarray(img, np.float32) / 255.0            # [S, S, 3]
    arr = (arr - CLIP_MEAN) / CLIP_STD
    return np.transpose(arr, (2, 0, 1))[None]            # [1, 3, S, S]


def pixels_from_data_url(url: str, image_size: int) -> np.ndarray:
    """``data:image/...;base64,...`` → pixel_values."""
    from PIL import Image

    if not url.startswith("data:"):
        raise ValueError("only data: image URLs are supported "
                         "(no egress from the serving host)")
    _, _, b64 = url.partition("base64,")
    img = Image.open(io.BytesIO(base64.b64decode(b64)))
    return pixels_from_image(img, image_size)


def stack_images(pixel_list: List[np.ndarray]) -> np.ndarray:
    return np.concatenate(pixel_list, axis=0)


# ---------------------------------------------------------------------------
# Qwen2-VL dynamic-resolution preprocessing (HF Qwen2VLImageProcessor)
# ---------------------------------------------------------------------------

def smart_resize(height: int, width: int, factor: int = 28,
                 min_pixels: int = 56 * 56,
                 max_pixels: int = 14 * 14 * 4 * 1280) -> tuple:
    """Snap (h, w) to multiples of ``factor`` within the pixel budget,
    keeping aspect ratio (HF ``smart_resize``)."""
    import math
    if max(height, width) / min(height, width) > 200:
        raise ValueError("aspect ratio must be < 200")
    h_bar = round(height / factor) * factor
    w_bar = round(width / factor) * factor
    if h_bar * w_bar > max_pixels:
        beta = math.sqrt((height * width) / max_pixels)
        h_bar = max(factor, math.floor(height / beta / factor) * factor)
        w_bar = max(factor, math.floor(width / beta / factor) * factor)
    elif h_bar * w_bar < min_pixels:
        beta = math.sqrt(min_pixels / (height * width))
        h_bar = math.ceil(height * beta / factor) * factor
        w_bar = math.ceil(width * beta / factor) * factor
    return h_bar, w_bar


def qwen_vl_patches(img, patch_size: int = 14, merge_size: int = 2,
                    temporal_patch_size: int = 2,
                    min_pixels: int = 56 * 56,
                    max_pixels: int = 14 * 14 * 4 * 1280):
    """PIL image → (flat patches [t*h*w, C*Tp*P*P], grid_thw (t, h, w)) in
    the HF processor's merged-block patch order."""
    from PIL import Image

    factor = patch_size * merge_size
    w0, h0 = img.size
    h1, w1 = smart_resize(h0, w0, factor, min_pixels, max_pixels)
    img = img.convert("RGB").resize((w1, h1), Image.BICUBIC)
    arr = np.asarray(img, np.float32) / 255.0              # [H, W, 3]
    arr = (arr - CLIP_MEAN) / CLIP_STD
    arr = np.transpose(arr, (2, 0, 1))[None]               # [1, 3, H, W]
    # Single image: repeat on the temporal axis to fill one Tp-frame.
    patches = np.repeat(arr, temporal_patch_size, axis=0)  # [Tp, 3, H, W]
    C = patches.shape[1]
    grid_t = patches.shape[0] // temporal_patch_size
    grid_h, grid_w = h1 // patch_size, w1 // patch_size
    m, P = merge_size, patch_size
    patches = patches.reshape(grid_t, temporal_patch_size, C,
                              grid_h // m, m, P, grid_w // m, m, P)
    patches = patches.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
    flat = patches.reshape(grid_t * grid_h * grid_w,
                           C * temporal_patch_size * P * P)
    return flat, (grid_t, grid_h, grid_w)
