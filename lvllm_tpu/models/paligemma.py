"""PaliGemma: SigLIP tower + linear projector + Gemma LM with PREFIX-LM
attention.

Behavioral reference: ``/root/reference/vllm/model_executor/models/
paligemma.py`` / HF ``modeling_paligemma.py``: image patch features
project through one biased linear into the text space and splice at the
``<image>`` placeholders; the image+prompt prefix attends
BIDIRECTIONALLY (completion stays causal) — served through the ragged
kernel's explicit visible-key-count mode via
``AttentionMetadata.prefix_lens`` (ops/attention.py).

Numerics note: HF divides image features by sqrt(text_hidden) before the
language model re-scales all embeddings by sqrt(text_hidden) — net
identity, and our splice happens after the embed normalizer, so
``encode_images`` returns the raw projector output.
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


@register_model("PaliGemmaForConditionalGeneration")
class PaliGemmaModel(GemmaModel):

    is_multimodal = True
    prefix_lm = True

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        # GemmaModel keys the Gemma2 sandwich (four_norms) off the arch
        # name; here the arch is the MM wrapper, so distinguish the text
        # family by query_pre_attn_scalar (present in Gemma2 configs —
        # PaliGemma-2 — absent in Gemma-1 — PaliGemma-1).
        self.four_norms = bool(config.query_pre_attn_scalar)
        vc = config.vision_config or {}
        self.v_hidden = vc.get("hidden_size", 1152)
        self.v_intermediate = vc.get("intermediate_size", 4304)
        self.v_layers = vc.get("num_hidden_layers", 27)
        self.v_heads = vc.get("num_attention_heads", 16)
        self.image_size = vc.get("image_size", 224)
        self.patch_size = vc.get("patch_size", 14)
        self.v_eps = vc.get("layer_norm_eps", 1e-6)

    @property
    def num_image_tokens(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    def init_params(self, rng) -> Dict[str, Any]:
        params = super().init_params(rng)
        nprng = np.random.default_rng(778 + self.config.seed)
        vision = init_siglip_params(
            nprng, self.v_hidden, self.v_intermediate, self.v_layers,
            self.image_size, self.patch_size, dtype=jnp.float32)
        vision["projector"] = {
            "kernel": jnp.asarray(
                nprng.standard_normal(
                    (self.v_hidden, self.config.hidden_size)) * 0.02,
                jnp.float32),
            "bias": jnp.zeros((self.config.hidden_size,), jnp.float32),
        }
        params["vision"] = vision
        return params

    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        """[B, 3, S, S] → [B, patches, text_hidden]."""
        feats = siglip_vision_encode(
            params["vision"], pixel_values, self.patch_size, self.v_heads,
            self.v_eps)                                  # [B, P, Dv]
        proj = params["vision"]["projector"]
        return feats @ proj["kernel"] + proj["bias"]

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
                elif name == "multi_modal_projector.linear.weight":
                    vision["projector"]["kernel"] = jnp.asarray(
                        np.ascontiguousarray(w.T), jnp.float32)
                elif name == "multi_modal_projector.linear.bias":
                    vision["projector"]["bias"] = jnp.asarray(
                        w, jnp.float32)
                elif name.startswith("language_model."):
                    yield name.removeprefix("language_model."), w
                else:
                    yield name, w

        params = super().load_weights(filter_stream())
        params["vision"] = vision
        return params
