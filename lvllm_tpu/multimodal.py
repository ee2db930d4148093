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
