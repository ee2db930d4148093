"""Aya Vision (Cohere): SigLIP tower + pixel-shuffle SwiGLU projector +
Cohere/Cohere2 decoder.

Behavioral reference: ``/root/reference/vllm/model_executor/models/
aya_vision.py`` / HF ``modeling_aya_vision.py``: patch features from the
LAST encoder layer (vision_feature_layer = -1, BEFORE the tower's post
layernorm), pixel-shuffled by ``downsample_factor`` (4x fewer tokens, 4x
wider), LayerNorm → linear_1 → SwiGLU (act(gate) · x) → linear_2 into
the text space, spliced at the image placeholders. Text side is the
existing Cohere parallel-block decoder (models/qwen3.py config-driven).
"""

from typing import Any, Dict, Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lvllm_tpu.config import ModelConfig
from lvllm_tpu.models.qwen3 import Qwen3Model
from lvllm_tpu.models.registry import register_model
from lvllm_tpu.models.vision import (init_siglip_params, load_siglip_weights,
                                     siglip_vision_encode)


@register_model("AyaVisionForConditionalGeneration")
class AyaVisionModel(Qwen3Model):

    is_multimodal = True

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        vc = config.vision_config or {}
        self.v_hidden = vc.get("hidden_size", 1152)
        self.v_intermediate = vc.get("intermediate_size", 4304)
        self.v_layers = vc.get("num_hidden_layers", 27)
        self.v_heads = vc.get("num_attention_heads", 16)
        self.image_size = vc.get("image_size", 364)
        self.patch_size = vc.get("patch_size", 14)
        self.v_eps = vc.get("layer_norm_eps", 1e-6)
        self.downsample = int(vc.get("downsample_factor", 2))
        self.adapter_eps = vc.get("adapter_layer_norm_eps", 1e-6)
        self.align_inner = vc.get("alignment_intermediate_size",
                                  2 * config.hidden_size)

    @property
    def num_image_tokens(self) -> int:
        g = self.image_size // self.patch_size
        return (g // self.downsample) ** 2

    def init_params(self, rng) -> Dict[str, Any]:
        params = super().init_params(rng)
        nprng = np.random.default_rng(779 + self.config.seed)
        vision = init_siglip_params(
            nprng, self.v_hidden, self.v_intermediate, self.v_layers,
            self.image_size, self.patch_size, dtype=jnp.float32)
        din = self.v_hidden * self.downsample ** 2
        H = self.config.hidden_size

        def dense(shape, scale=0.02):
            return jnp.asarray(
                nprng.standard_normal(size=shape) * scale, jnp.float32)

        vision["projector"] = {
            "ln": {"weight": jnp.ones((din,), jnp.float32),
                   "bias": jnp.zeros((din,), jnp.float32)},
            "linear_1": {"kernel": dense((din, self.align_inner)),
                         "bias": jnp.zeros((self.align_inner,),
                                           jnp.float32)},
            "linear_2": {"kernel": dense((self.align_inner // 2, H)),
                         "bias": jnp.zeros((H,), jnp.float32)},
        }
        params["vision"] = vision
        return params

    def _pixel_shuffle(self, feats: jax.Array) -> jax.Array:
        """[B, S, D] → [B, S/f², D·f²] (HF AyaVision pixel_shuffle)."""
        B, S, D = feats.shape
        g = int(S ** 0.5)
        f = self.downsample
        x = feats.reshape(B, g, g, D)
        x = x.reshape(B, g, g // f, D * f)
        x = jnp.transpose(x, (0, 2, 1, 3))
        x = x.reshape(B, g // f, g // f, D * f * f)
        x = jnp.transpose(x, (0, 2, 1, 3))
        return x.reshape(B, (g // f) * (g // f), D * f * f)

    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        feats = siglip_vision_encode(
            params["vision"], pixel_values, self.patch_size, self.v_heads,
            self.v_eps, post_layernorm=False)        # feature layer -1
        x = self._pixel_shuffle(feats).astype(jnp.float32)
        proj = params["vision"]["projector"]
        mu = x.mean(-1, keepdims=True)
        var = jnp.square(x - mu).mean(-1, keepdims=True)
        x = (x - mu) * jax.lax.rsqrt(var + self.adapter_eps)
        x = x * proj["ln"]["weight"] + proj["ln"]["bias"]
        h = x @ proj["linear_1"]["kernel"] + proj["linear_1"]["bias"]
        half = h.shape[-1] // 2
        xg, gate = h[..., :half], h[..., half:]
        h = jax.nn.silu(gate) * xg
        return h @ proj["linear_2"]["kernel"] + proj["linear_2"]["bias"]

    def load_weights(self, weights: Iterable[Tuple[str, np.ndarray]]):
        vision: Dict[str, Any] = {"layers": [
            {} for _ in range(self.v_layers)], "projector": {}}
        t = lambda a: jnp.asarray(np.ascontiguousarray(a.T), jnp.float32)  # noqa: E731
        v = lambda a: jnp.asarray(a, jnp.float32)  # noqa: E731

        def filter_stream():
            for name, w in weights:
                name = name.removeprefix("model.")
                if name.startswith("vision_tower.vision_model."):
                    load_siglip_weights(
                        vision,
                        name.removeprefix("vision_tower.vision_model."), w)
                elif name.startswith("multi_modal_projector."):
                    rest = name.removeprefix("multi_modal_projector.")
                    if rest == "layernorm.weight":
                        vision["projector"].setdefault("ln", {})[
                            "weight"] = v(w)
                    elif rest == "layernorm.bias":
                        vision["projector"].setdefault("ln", {})[
                            "bias"] = v(w)
                    elif rest.startswith("linear_"):
                        lin, leaf = rest.split(".")
                        node = vision["projector"].setdefault(lin, {})
                        node["kernel" if leaf == "weight" else "bias"] = \
                            t(w) if leaf == "weight" else v(w)
                elif name.startswith("language_model."):
                    yield name.removeprefix("language_model."), w
                else:
                    yield name, w

        params = super().load_weights(filter_stream())
        params["vision"] = vision
        return params
