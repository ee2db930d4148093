"""Eagle 2.5-VL: SigLIP tower + InternVL-style pixel shuffle + mlp1.

Reference: vllm ``models/eagle2_5_vl.py`` — SiglipVisionModel tower
(``vision_model.``), pixel shuffle at ``downsample_ratio`` (:240-260),
mlp1 LayerNorm → Linear → GELU → Linear (:225), Qwen2 language model
under ``language_model.``.
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


def _ln(x, node, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    return (x32 - mu) * jax.lax.rsqrt(
        x32.var(-1, keepdims=True) + eps) * node["weight"] + node["bias"]


@register_model("Eagle2_5_VLForConditionalGeneration")
class Eagle25VLModel(Qwen3Model):

    is_multimodal = True

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        vc = config.vision_config or {}
        self.v_hidden = vc.get("hidden_size", 1152)
        self.v_intermediate = vc.get("intermediate_size", 4304)
        self.v_layers = vc.get("num_hidden_layers", 27)
        self.v_heads = vc.get("num_attention_heads", 16)
        self.image_size = vc.get("image_size", 448)
        self.patch_size = vc.get("patch_size", 14)
        self.v_eps = vc.get("layer_norm_eps", 1e-6)
        self.downsample_ratio = vc.get("downsample_ratio", 0.5)

    @property
    def num_image_tokens(self) -> int:
        n = (self.image_size // self.patch_size) ** 2
        return int(n * self.downsample_ratio ** 2)

    def init_params(self, rng) -> Dict[str, Any]:
        params = super().init_params(rng)
        nprng = np.random.default_rng(778 + self.config.seed)
        vision = init_siglip_params(
            nprng, self.v_hidden, self.v_intermediate, self.v_layers,
            self.image_size, self.patch_size)
        C4 = int(self.v_hidden * (1 / self.downsample_ratio) ** 2)
        Ht = self.config.hidden_size

        def dense(shape, scale=0.02):
            return jnp.asarray(nprng.standard_normal(size=shape) * scale,
                               jnp.float32)

        vision["projector"] = {
            "layer_norm": {"weight": jnp.ones((C4,), jnp.float32),
                           "bias": jnp.zeros((C4,), jnp.float32)},
            "linear_1": {"kernel": dense((C4, Ht)),
                         "bias": jnp.zeros((Ht,), jnp.float32)},
            "linear_2": {"kernel": dense((Ht, Ht)),
                         "bias": jnp.zeros((Ht,), jnp.float32)},
        }
        params["vision"] = vision
        return params

    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        vp = params["vision"]
        h = siglip_vision_encode(vp, pixel_values, self.patch_size,
                                 self.v_heads, self.v_eps)
        B, N, C = h.shape
        fs = int(round(N ** 0.5))
        sf = self.downsample_ratio
        x = h.reshape(B, fs, fs, C)
        x = x.reshape(B, fs, int(fs * sf), int(C / sf))
        x = jnp.transpose(x, (0, 2, 1, 3))
        x = x.reshape(B, int(fs * sf), int(fs * sf), int(C / sf ** 2))
        x = jnp.transpose(x, (0, 2, 1, 3))
        x = x.reshape(B, int(N * sf * sf), int(C / sf ** 2))
        pj = vp["projector"]
        x = _ln(x, pj["layer_norm"])
        x = jax.nn.gelu(
            x @ pj["linear_1"]["kernel"] + pj["linear_1"]["bias"],
            approximate=False)
        return x @ pj["linear_2"]["kernel"] + pj["linear_2"]["bias"]

    def load_weights(self, weights: Iterable[Tuple[str, np.ndarray]]):
        vision: Dict[str, Any] = {"layers": [
            {} for _ in range(self.v_layers)], "projector": {}}

        def filter_stream():
            for name, w in weights:
                if name.startswith("vision_model."):
                    load_siglip_weights(
                        vision, name.removeprefix("vision_model."), w)
                elif m := re.match(r"mlp1\.([013])\.(weight|bias)", name):
                    slot = {"0": "layer_norm", "1": "linear_1",
                            "3": "linear_2"}[m.group(1)]
                    kind = m.group(2)
                    node = vision["projector"].setdefault(slot, {})
                    if slot == "layer_norm":
                        node[kind] = jnp.asarray(w, jnp.float32)
                    else:
                        node["kernel" if kind == "weight" else "bias"] = \
                            jnp.asarray(w.T if kind == "weight" else w,
                                        jnp.float32)
                elif name.startswith("language_model."):
                    yield name.removeprefix("language_model."), w
                else:
                    yield name, w

        params = super().load_weights(filter_stream())
        params["vision"] = vision
        return params
