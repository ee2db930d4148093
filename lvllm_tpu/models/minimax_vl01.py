"""MiniMax-VL-01: CLIP tower + 2-layer projector + MiniMax-Text-01 LM.

Reference: vllm ``models/minimax_vl_01.py`` — llava-shaped composite
(vision_tower / multi_modal_projector.linear_1+linear_2 with act /
image_newline) over the lightning-attention MiniMaxText01 language
model (:181-237).
"""

import re
from typing import Any, Dict, Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lvllm_tpu.config import ModelConfig
from lvllm_tpu.models.minimax_text01 import MiniMaxText01Model
from lvllm_tpu.models.registry import register_model
from lvllm_tpu.models.vision import clip_vision_encode, init_vision_params

Params = Dict[str, Any]


@register_model("MiniMaxVL01ForConditionalGeneration")
class MiniMaxVL01Model(MiniMaxText01Model):

    is_multimodal = True

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        vc = config.vision_config or {}
        self.v_hidden = vc.get("hidden_size", 1024)
        self.v_intermediate = vc.get("intermediate_size", 4096)
        self.v_layers = vc.get("num_hidden_layers", 24)
        self.v_heads = vc.get("num_attention_heads", 16)
        self.image_size = vc.get("image_size", 336)
        self.patch_size = vc.get("patch_size", 14)
        self.feature_layer = vc.get("vision_feature_layer", -2)

    @property
    def num_image_tokens(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    def init_params(self, rng) -> Params:
        params = super().init_params(rng)
        nprng = np.random.default_rng(788 + self.config.seed)
        vision = init_vision_params(
            nprng, self.v_hidden, self.v_intermediate, self.v_layers,
            self.image_size, self.patch_size,
            text_hidden=self.config.hidden_size)
        vision["image_newline"] = jnp.asarray(
            nprng.standard_normal(self.config.hidden_size) * 0.02,
            jnp.float32)
        params["vision"] = vision
        return params

    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        vp = params["vision"]
        feats = clip_vision_encode(vp, pixel_values, self.patch_size,
                                   self.v_heads, self.feature_layer)
        pj = vp["projector"]
        h = feats @ pj["linear_1"]["kernel"] + pj["linear_1"]["bias"]
        h = jax.nn.gelu(h, approximate=False)
        return h @ pj["linear_2"]["kernel"] + pj["linear_2"]["bias"]

    def load_weights(self, weights: Iterable[Tuple[str, np.ndarray]]):
        vision: Dict[str, Any] = {"layers": [
            {} for _ in range(self.v_layers)], "projector": {}}

        def _vis_put(rest: str, w: np.ndarray):
            m = re.match(r"encoder\.layers\.(\d+)\.(.+)", rest)
            if m:
                i, leaf = int(m.group(1)), m.group(2)
                if i >= len(vision["layers"]):
                    return
                lp = vision["layers"][i]
                for hfn, ours in (("self_attn.q_proj", "q_proj"),
                                  ("self_attn.k_proj", "k_proj"),
                                  ("self_attn.v_proj", "v_proj"),
                                  ("self_attn.out_proj", "out_proj"),
                                  ("mlp.fc1", "fc1"), ("mlp.fc2", "fc2"),
                                  ("layer_norm1", "layer_norm1"),
                                  ("layer_norm2", "layer_norm2")):
                    if leaf == hfn + ".weight":
                        key = "kernel" if "norm" not in ours else "weight"
                        lp.setdefault(ours, {})[key] = jnp.asarray(
                            w.T if key == "kernel" else w, jnp.float32)
                        return
                    if leaf == hfn + ".bias":
                        lp.setdefault(ours, {})["bias"] = jnp.asarray(
                            w, jnp.float32)
                        return
                return
            if rest == "embeddings.class_embedding":
                vision["class_embedding"] = jnp.asarray(w, jnp.float32)
            elif rest == "embeddings.patch_embedding.weight":
                vision["patch_embedding"] = jnp.asarray(w, jnp.float32)
            elif rest == "embeddings.position_embedding.weight":
                vision["position_embedding"] = jnp.asarray(w, jnp.float32)
            elif rest.split(".")[0] in ("pre_layrnorm", "pre_layernorm"):
                vision.setdefault("pre_layernorm", {})[
                    rest.split(".")[-1]] = jnp.asarray(w, jnp.float32)

        def filter_stream():
            for name, w in weights:
                name = name.removeprefix("model.")
                if name.startswith("vision_tower.vision_model."):
                    _vis_put(
                        name.removeprefix("vision_tower.vision_model."),
                        np.asarray(w))
                elif m := re.match(
                        r"multi_modal_projector\.linear_([12])"
                        r"\.(weight|bias)", name):
                    node = vision["projector"].setdefault(
                        f"linear_{m.group(1)}", {})
                    kind = m.group(2)
                    node["kernel" if kind == "weight" else "bias"] = \
                        jnp.asarray(np.ascontiguousarray(
                            np.asarray(w).T) if kind == "weight"
                            else np.asarray(w), jnp.float32)
                elif name == "image_newline":
                    vision["image_newline"] = jnp.asarray(
                        np.asarray(w), jnp.float32)
                elif name.startswith("language_model."):
                    yield name.removeprefix("language_model."), w
                else:
                    yield name, w

        params = super().load_weights(filter_stream())
        params["vision"] = vision
        return params
