"""LLaVA-NeXT-Video: CLIP tower + spatial-pool video resampler + LLM.

Behavioral reference: ``/root/reference/vllm/model_executor/models/
llava_next_video.py`` / HF ``modeling_llava_next_video.py``
(LlavaNextVideoPooler:107): video frames go through the CLIP tower
(penultimate layer, class token dropped), each frame's patch grid is
average-pooled by ``spatial_pool_stride`` (2), projected by the shared
LLaVA MLP projector, and the per-frame tokens concatenate in frame
order. Images keep the LlavaNext path.
"""

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from lvllm_tpu.config import ModelConfig
from lvllm_tpu.models.llava import LlavaModel
from lvllm_tpu.models.registry import register_model
from lvllm_tpu.models.vision import (clip_vision_encode,
                                     project_image_features)


@register_model("LlavaNextVideoForConditionalGeneration")
class LlavaNextVideoModel(LlavaModel):

    mm_dynamic = True

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        vc = config.vision_config or {}
        self.pool_stride = int(vc.get("spatial_pool_stride", 2))
        self.pool_mode = vc.get("spatial_pool_mode", "average")

    def encode_mm(self, params, mm_data: dict) -> np.ndarray:
        outs = []
        if "pixel_values" in mm_data:
            feats = self.encode_images(
                params, jnp.asarray(np.asarray(mm_data["pixel_values"],
                                               np.float32)))
            outs.append(np.asarray(feats, np.float32).reshape(
                -1, self.config.hidden_size))
        if "pixel_values_videos" in mm_data:
            frames = jnp.asarray(np.asarray(
                mm_data["pixel_values_videos"], np.float32))
            if frames.ndim == 5:          # [1, F, 3, S, S]
                frames = frames.reshape((-1,) + frames.shape[-3:])
            feats = clip_vision_encode(
                params["vision"], frames, self.patch_size, self.v_heads,
                self.feature_layer)       # [F, g*g, D] (CLS dropped)
            F_, N, D = feats.shape
            g = int(round(N ** 0.5))
            st = self.pool_stride
            f = feats.reshape(F_, g // st, st, g // st, st, D)
            if self.pool_mode == "max":
                f = f.max(axis=(2, 4))
            else:
                f = f.mean(axis=(2, 4))   # AvgPool2d(stride)
            f = f.reshape(F_, (g // st) ** 2, D)
            proj = project_image_features(params["vision"]["projector"], f)
            outs.append(np.asarray(proj, np.float32).reshape(
                -1, self.config.hidden_size))
        return np.concatenate(outs, axis=0)

    def load_weights(self, weights):
        def filter_stream():
            for name, w in weights:
                # vision_resampler has no parameters in average/max mode.
                if "vision_resampler" in name and "pool" in name:
                    continue
                yield name, w
        return super().load_weights(filter_stream())
