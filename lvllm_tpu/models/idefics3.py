"""Idefics3 / SmolVLM: SigLIP-style tower + pixel-shuffle connector +
Llama LM.

Behavioral reference: ``vllm/model_executor/models/idefics3.py`` /
``smolvlm.py`` (Idefics3ForConditionalGeneration); numerics follow HF
``modeling_idefics3.py`` (Idefics3Connector.pixel_shuffle:396 + a single
modality-projection Linear) and ``modeling_smolvlm.py`` (same family).

TPU-native shape: the tower is the shared SigLIP encoder
(``models/vision.py``) jitted over the processor's fixed per-tile pixel
shape; the connector's pixel shuffle is a static reshape/transpose.
Features splice at image placeholder positions through the runner's
standard mm path (identical to LLaVA), so prefill/decode need nothing
model-specific.
"""

import re
from typing import Any, Dict, Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lvllm_tpu.config import ModelConfig
from lvllm_tpu.models.qwen3 import Qwen3Model
from lvllm_tpu.models.registry import register_model
from lvllm_tpu.models.vision import (init_siglip_params,
                                     load_siglip_weights,
                                     siglip_vision_encode)


@register_model("Idefics3ForConditionalGeneration")
@register_model("SmolVLMForConditionalGeneration")
class Idefics3Model(Qwen3Model):

    is_multimodal = True
    dcp_compatible = False

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        vc = config.vision_config or {}
        self.v_hidden = vc.get("hidden_size", 1152)
        self.v_intermediate = vc.get("intermediate_size", 3072)
        self.v_layers = vc.get("num_hidden_layers", 12)
        self.v_heads = vc.get("num_attention_heads", 16)
        self.patch_size = vc.get("patch_size", 32)
        self.image_size = vc.get("image_size", 224)
        self.scale_factor = vc.get("scale_factor", 2)
        self.v_eps = vc.get("layer_norm_eps", 1e-6)

    def num_image_tokens(self) -> int:
        g = self.image_size // self.patch_size
        return (g * g) // (self.scale_factor ** 2)

    # ---- vision -------------------------------------------------------------

    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        """pixel_values [B, C, S, S] → [B, N/(sf²), H_text] projected
        features (tower → pixel shuffle → modality projection)."""
        feats = siglip_vision_encode(
            params["vision"], pixel_values, self.patch_size, self.v_heads,
            eps=self.v_eps)                           # [B, N, Dv]
        B, N, Dv = feats.shape
        sf = self.scale_factor
        g = int(round(N ** 0.5))
        # HF Idefics3Connector.pixel_shuffle (modeling_idefics3.py:396).
        x = feats.reshape(B, g, g // sf, Dv * sf)
        x = jnp.transpose(x, (0, 2, 1, 3))
        x = x.reshape(B, g // sf, g // sf, Dv * sf * sf)
        x = jnp.transpose(x, (0, 2, 1, 3))
        x = x.reshape(B, N // (sf * sf), Dv * sf * sf)
        return x @ params["connector"]["kernel"]

    # ---- params -------------------------------------------------------------

    def init_params(self, rng) -> Dict[str, Any]:
        params = super().init_params(rng)
        nprng = np.random.default_rng(4321 + self.config.seed)
        params["vision"] = init_siglip_params(
            nprng, self.v_hidden, self.v_intermediate, self.v_layers,
            self.image_size, self.patch_size)
        sf2 = self.scale_factor ** 2
        params["connector"] = {"kernel": jnp.asarray(
            nprng.standard_normal((self.v_hidden * sf2,
                                   self.config.hidden_size)) * 0.02,
            jnp.float32)}
        return params

    # ---- weights ------------------------------------------------------------

    def load_weights(self, weights: Iterable[Tuple[str, np.ndarray]]):
        vision: Dict[str, Any] = {
            "layers": [{} for _ in range(self.v_layers)]}
        connector: Dict[str, Any] = {}

        def filter_stream():
            for name, w in weights:
                name = name.removeprefix("model.")
                if name.startswith("vision_model."):
                    load_siglip_weights(
                        vision, name.removeprefix("vision_model."), w)
                elif name.startswith("connector."):
                    # modality_projection.proj.weight → kernel.
                    if name.endswith("weight"):
                        connector["kernel"] = jnp.asarray(
                            np.ascontiguousarray(w.T), jnp.float32)
                elif name.startswith("text_model."):
                    yield name.removeprefix("text_model."), w
                else:
                    yield name, w

        params = super().load_weights(filter_stream())
        params["vision"] = vision
        params["connector"] = connector
        return params
