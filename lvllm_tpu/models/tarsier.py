"""Tarsier (ByteDance video-LLM family).

Behavioral reference: ``/root/reference/vllm/model_executor/models/
tarsier.py`` (TarsierForConditionalGeneration._add_tarsier_split_tokens
:475 — llava layout plus a text-embedding "newline" row appended to
every patch-grid row and one "new" row per image) and ``qwen2_vl.py``
Tarsier2ForConditionalGeneration:1537 (a Qwen2-VL whose checkpoint
prefixes the tower ``vision_tower.`` instead of ``visual.``).
"""

from typing import Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lvllm_tpu.config import ModelConfig
from lvllm_tpu.models.llava import LlavaModel
from lvllm_tpu.models.qwen2_vl import Qwen2VLModel
from lvllm_tpu.models.registry import register_model


@register_model("TarsierForConditionalGeneration")
class TarsierModel(LlavaModel):

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        vc = config.vision_config or {}
        self.image_newline_idx = vc.get("image_newline_idx", 32001)
        self.image_new_idx = vc.get("image_new_idx", 32002)

    @property
    def num_image_tokens(self) -> int:
        g = self.image_size // self.patch_size
        return g * g + g + 1

    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        feats = super().encode_images(params, pixel_values)
        B, N, H = feats.shape
        g = int(np.sqrt(N))
        emb = params["embed"]["weight"]
        newline = emb[self.image_newline_idx].astype(feats.dtype)
        new = emb[self.image_new_idx].astype(feats.dtype)
        grid = feats.reshape(B, g, g, H)
        grid = jnp.concatenate(
            [grid, jnp.broadcast_to(newline, (B, g, 1, H))], axis=2)
        flat = grid.reshape(B, g * (g + 1), H)
        return jnp.concatenate(
            [flat, jnp.broadcast_to(new, (B, 1, H))], axis=1)


@register_model("Tarsier2ForConditionalGeneration")
class Tarsier2Model(Qwen2VLModel):

    def load_weights(self, weights: Iterable[Tuple[str, np.ndarray]]):
        def remap():
            for name, w in weights:
                if name.startswith("vision_tower."):
                    name = "visual." + name.removeprefix("vision_tower.")
                yield name, w
        return super().load_weights(remap())
