"""Cohere2 Vision (Command A Vision): SigLIP2 tower + pixel-shuffle
SwiGLU projector + Cohere2 decoder.

Behavioral reference: ``/root/reference/vllm/model_executor/models/
cohere2_vision.py`` / HF ``modeling_cohere2_vision.py``: features are the
tower's ``last_hidden_state`` (post layernorm applied — unlike AyaVision's
layer -1 tap), pixel-shuffled by ``downsample_factor``, then
linear_1 → SwiGLU → linear_2 with NO adapter layernorm. The decoder is
the existing Cohere2 config-driven path.
"""

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from lvllm_tpu.config import ModelConfig
from lvllm_tpu.models.aya_vision import AyaVisionModel
from lvllm_tpu.models.registry import register_model
from lvllm_tpu.models.vision import siglip_vision_encode


@register_model("Cohere2VisionForConditionalGeneration")
class Cohere2VisionModel(AyaVisionModel):

    def init_params(self, rng) -> Dict[str, Any]:
        params = super().init_params(rng)
        # No adapter layernorm in this family.
        params["vision"]["projector"].pop("ln", None)
        return params

    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        vc = self.config.vision_config or {}
        if vc.get("model_type", "siglip2").startswith("siglip2"):
            # SigLIP2 naflex: linear patch embedding over patchified
            # pixels + grid-resized position embeddings.
            from lvllm_tpu.models.vision import (patchify_chw,
                                                 siglip2_vision_encode)
            patches, grid = patchify_chw(pixel_values, self.patch_size)
            vis = dict(params["vision"])
            pe = vis["patch_embedding"]
            if pe.ndim == 4:               # dummy-init conv layout
                vis["patch_embedding"] = pe.reshape(pe.shape[0], -1)
            feats = siglip2_vision_encode(
                vis, jnp.asarray(patches), grid, self.v_heads, self.v_eps,
                post_layernorm=True)
        else:
            feats = siglip_vision_encode(
                params["vision"], pixel_values, self.patch_size,
                self.v_heads, self.v_eps,
                post_layernorm=True)       # last_hidden_state
        x = self._pixel_shuffle(feats).astype(jnp.float32)
        proj = params["vision"]["projector"]
        h = x @ proj["linear_1"]["kernel"] + proj["linear_1"]["bias"]
        half = h.shape[-1] // 2
        xg, gate = h[..., :half], h[..., half:]
        h = jax.nn.silu(gate) * xg
        return h @ proj["linear_2"]["kernel"] + proj["linear_2"]["bias"]
