"""Gemma 3 multimodal: SigLIP vision tower + avg-pool projector + Gemma3 LM.

Counterpart of the reference's ``vllm/model_executor/models/gemma3_mm.py``
(Gemma3ForConditionalGeneration): SigLIP patch features are average-pooled
down to ``mm_tokens_per_image`` soft tokens, RMS-normed (Gemma zero-centered
``1 + w`` convention) and projected into the text embedding space with a
single matmul (``Gemma3MultiModalProjector``), then spliced at the
``<image_soft_token>`` placeholder positions. HF numerics reference:
transformers ``Gemma3ForConditionalGeneration``.

The text side is the existing Gemma3 sandwich-norm model (models/gemma.py).
"""

from typing import Any, Dict, Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lvllm_tpu.config import ModelConfig
from lvllm_tpu.models.gemma import GemmaModel
from lvllm_tpu.models.registry import register_model
from lvllm_tpu.models.vision import (init_siglip_params, load_siglip_weights,
                                     siglip_vision_encode)


@register_model("Gemma3ForConditionalGeneration")
class Gemma3MMModel(GemmaModel):

    is_multimodal = True

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        vc = config.vision_config or {}
        self.v_hidden = vc.get("hidden_size", 1152)
        self.v_intermediate = vc.get("intermediate_size", 4304)
        self.v_layers = vc.get("num_hidden_layers", 27)
        self.v_heads = vc.get("num_attention_heads", 16)
        self.image_size = vc.get("image_size", 896)
        self.patch_size = vc.get("patch_size", 14)
        self.v_eps = vc.get("layer_norm_eps", 1e-6)
        self.mm_tokens_per_image = vc.get("mm_tokens_per_image", 256)
        patches_per_side = self.image_size // self.patch_size
        tokens_per_side = int(self.mm_tokens_per_image ** 0.5)
        self.pool_kernel = patches_per_side // tokens_per_side

    @property
    def num_image_tokens(self) -> int:
        return self.mm_tokens_per_image

    # ---- params ------------------------------------------------------------

    def init_params(self, rng) -> Dict[str, Any]:
        params = super().init_params(rng)
        nprng = np.random.default_rng(777 + self.config.seed)
        vision = init_siglip_params(
            nprng, self.v_hidden, self.v_intermediate, self.v_layers,
            self.image_size, self.patch_size, dtype=jnp.float32)
        vision["projector"] = {
            "mm_input_projection_weight": jnp.asarray(
                nprng.standard_normal(
                    (self.v_hidden, self.config.hidden_size)) * 0.02,
                jnp.float32),
            "mm_soft_emb_norm": jnp.zeros((self.v_hidden,), jnp.float32),
        }
        params["vision"] = vision
        return params

    # ---- vision ------------------------------------------------------------

    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        """[B, 3, S, S] → [B, mm_tokens_per_image, text_hidden]."""
        feats = siglip_vision_encode(
            params["vision"], pixel_values, self.patch_size, self.v_heads,
            self.v_eps)                                  # [B, G*G, Dv]
        B, N, Dv = feats.shape
        G = self.image_size // self.patch_size
        K = self.pool_kernel
        tps = G // K
        # AvgPool2d over the patch grid (HF Gemma3MultiModalProjector).
        x = feats.reshape(B, G, G, Dv)
        x = x.reshape(B, tps, K, tps, K, Dv).mean(axis=(2, 4))
        x = x.reshape(B, tps * tps, Dv).astype(jnp.float32)
        # Gemma RMSNorm: x_normed * (1 + w).
        var = jnp.mean(x * x, axis=-1, keepdims=True)
        x = x * jax.lax.rsqrt(var + self.v_eps)
        x = x * (1.0 + params["vision"]["projector"]["mm_soft_emb_norm"])
        return x @ params["vision"]["projector"][
            "mm_input_projection_weight"]

    # ---- weight loading ----------------------------------------------------

    def load_weights(self, weights: Iterable[Tuple[str, np.ndarray]]):
        vision: Dict[str, Any] = {"layers": [
            {} for _ in range(self.v_layers)], "projector": {}}

        def filter_stream():
            for name, w in weights:
                name = name.removeprefix("model.")
                if name.startswith("vision_tower.vision_model."):
                    load_siglip_weights(
                        vision,
                        name.removeprefix("vision_tower.vision_model."), w)
                elif name == ("multi_modal_projector."
                              "mm_input_projection_weight"):
                    vision["projector"]["mm_input_projection_weight"] = \
                        jnp.asarray(w, jnp.float32)
                elif name == "multi_modal_projector.mm_soft_emb_norm.weight":
                    vision["projector"]["mm_soft_emb_norm"] = \
                        jnp.asarray(w, jnp.float32)
                elif name.startswith("language_model."):
                    yield name.removeprefix("language_model."), w
                else:
                    yield name, w

        params = super().load_weights(filter_stream())
        params["vision"] = vision
        return params
