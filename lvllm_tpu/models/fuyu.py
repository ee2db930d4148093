"""Fuyu-8B: linear patch embedding straight into a Persimmon decoder.

Behavioral reference: ``vllm/model_executor/models/fuyu.py``
(FuyuForCausalLM); HF numerics: ``modeling_fuyu.py`` — there is NO
vision tower: raw image patches project through one Linear
(``vision_embed_tokens``) into the text embedding space and splice at
placeholder positions. The decoder is Persimmon (fused qkv, biased q/k
layernorm, relu² MLP, partial rotary) served by the unified model's
config knobs.
"""

from typing import Any, Dict, Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lvllm_tpu.config import ModelConfig
from lvllm_tpu.models.qwen3 import Qwen3Model
from lvllm_tpu.models.registry import register_model


@register_model("FuyuForCausalLM")
class FuyuModel(Qwen3Model):

    is_multimodal = True
    dcp_compatible = False

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        vc = config.vision_config or {}
        self.patch_size = vc.get("patch_size", 30)
        self.num_channels = vc.get("num_channels", 3)
        self.patch_in = self.num_channels * self.patch_size ** 2

    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        """image patches [N, C*P*P] (HF processor flattened layout) →
        [1, N, H] projected embeddings."""
        p = params["vision_embed"]
        feats = pixel_values.astype(jnp.float32) @ p["kernel"] + p["bias"]
        return feats[None]

    def init_params(self, rng) -> Dict[str, Any]:
        params = super().init_params(rng)
        nprng = np.random.default_rng(909 + self.config.seed)
        params["vision_embed"] = {
            "kernel": jnp.asarray(
                nprng.standard_normal((self.patch_in,
                                       self.config.hidden_size)) * 0.02,
                jnp.float32),
            "bias": jnp.zeros((self.config.hidden_size,), jnp.float32),
        }
        return params

    def load_weights(self, weights: Iterable[Tuple[str, np.ndarray]]):
        vision: Dict[str, Any] = {}

        def filter_stream():
            for name, w in weights:
                if name.startswith("vision_embed_tokens."):
                    kind = name.rsplit(".", 1)[1]
                    vision["kernel" if kind == "weight" else "bias"] = \
                        jnp.asarray(
                            np.ascontiguousarray(w.T) if kind == "weight"
                            else w, jnp.float32)
                elif name.startswith("language_model."):
                    yield name.removeprefix("language_model."), w
                else:
                    yield name, w

        params = super().load_weights(filter_stream())
        params["vision_embed"] = vision
        return params
