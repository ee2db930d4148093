"""LLaVA-family multimodal model: CLIP ViT tower + projector + LLM.

Counterpart of the reference's ``vllm/model_executor/models/llava.py``
(LlavaForConditionalGeneration): image pixel values are encoded once per
request by the vision tower, projected into the text embedding space, and
spliced into the input embedding stream at the ``<image>`` placeholder
positions (reference: merge_multimodal_embeddings). HF numerics
reference: transformers ``LlavaForConditionalGeneration``.

The text side reuses the unified llama-family implementation; the splice
happens via the ``mm_embeds``/``mm_mask`` hook on the base ``__call__``.
"""

import re
from typing import Any, Dict, Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lvllm_tpu.config import ModelConfig
from lvllm_tpu.models.qwen3 import Qwen3Model
from lvllm_tpu.models.vision import (clip_vision_encode, init_vision_params,
                                     project_image_features)
from lvllm_tpu.logger import init_logger

logger = init_logger(__name__)


class LlavaModel(Qwen3Model):

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
        # Pixtral checkpoints ship as LlavaForConditionalGeneration with a
        # PixtralVisionModel tower (reference: models/pixtral.py) — RMS
        # norms, bias-free projections, 2D rope, gated MLP, full-sequence
        # feature select.
        self.is_pixtral = vc.get("model_type") == "pixtral"
        self.v_head_dim = vc.get("head_dim", self.v_hidden // self.v_heads)
        self.v_act = vc.get("hidden_act", "silu")
        self.v_rope_theta = vc.get("rope_theta", 10000.0)

    @property
    def num_image_tokens(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    # ---- params ------------------------------------------------------------

    def init_params(self, rng) -> Dict[str, Any]:
        params = super().init_params(rng)
        nprng = np.random.default_rng(777 + self.config.seed)
        if self.is_pixtral:
            params["vision"] = self._init_pixtral(nprng)
            return params
        params["vision"] = init_vision_params(
            nprng, self.v_hidden, self.v_intermediate, self.v_layers,
            self.image_size, self.patch_size, self.config.hidden_size,
            dtype=jnp.float32)
        return params

    def _init_pixtral(self, nprng) -> Dict[str, Any]:
        D, I = self.v_hidden, self.v_intermediate
        H = self.config.hidden_size

        def dense(shape, scale=0.02):
            return jnp.asarray(nprng.standard_normal(size=shape) * scale,
                               jnp.float32)

        layers = []
        for _ in range(self.v_layers):
            layers.append({
                "attention_norm": {"weight": jnp.ones((D,), jnp.float32)},
                "ffn_norm": {"weight": jnp.ones((D,), jnp.float32)},
                "q_proj": {"kernel": dense((D, D))},
                "k_proj": {"kernel": dense((D, D))},
                "v_proj": {"kernel": dense((D, D))},
                "o_proj": {"kernel": dense((D, D))},
                "gate_proj": {"kernel": dense((D, I))},
                "up_proj": {"kernel": dense((D, I))},
                "down_proj": {"kernel": dense((I, D))},
            })
        return {
            "patch_conv": dense((D, 3, self.patch_size, self.patch_size)),
            "ln_pre": {"weight": jnp.ones((D,), jnp.float32)},
            "layers": layers,
            "projector": {
                "linear_1": {"kernel": dense((D, H)),
                             "bias": jnp.zeros((H,), jnp.float32)},
                "linear_2": {"kernel": dense((H, H)),
                             "bias": jnp.zeros((H,), jnp.float32)},
            },
        }

    # ---- vision ------------------------------------------------------------

    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        """[B, 3, S, S] → projected features [B, N_patches, text_hidden]."""
        if self.is_pixtral:
            from lvllm_tpu.models.vision import pixtral_vision_encode
            feats = pixtral_vision_encode(
                params["vision"], pixel_values, self.patch_size,
                self.v_heads, hidden_act=self.v_act,
                rope_theta=self.v_rope_theta)
            return project_image_features(params["vision"]["projector"],
                                          feats)
        feats = clip_vision_encode(
            params["vision"], pixel_values, self.patch_size, self.v_heads,
            self.feature_layer)
        return project_image_features(params["vision"]["projector"], feats)

    # ---- weight loading ----------------------------------------------------

    def load_weights(self, weights: Iterable[Tuple[str, np.ndarray]]):
        vision: Dict[str, Any] = {"layers": [
            {} for _ in range(self.v_layers)], "projector": {}}

        def _vis_put_pixtral(rest: str, w: np.ndarray):
            if rest == "patch_conv.weight":
                vision["patch_conv"] = jnp.asarray(w, jnp.float32)
                return
            if rest == "ln_pre.weight":
                vision["ln_pre"] = {"weight": jnp.asarray(w, jnp.float32)}
                return
            m = re.match(r"transformer\.layers\.(\d+)\.(.+)", rest)
            if not m:
                return
            lp = vision["layers"][int(m.group(1))]
            leaf = m.group(2)
            for hf, ours in (("attention.q_proj", "q_proj"),
                             ("attention.k_proj", "k_proj"),
                             ("attention.v_proj", "v_proj"),
                             ("attention.o_proj", "o_proj"),
                             ("feed_forward.gate_proj", "gate_proj"),
                             ("feed_forward.up_proj", "up_proj"),
                             ("feed_forward.down_proj", "down_proj")):
                if leaf == hf + ".weight":
                    lp.setdefault(ours, {})["kernel"] = jnp.asarray(
                        np.ascontiguousarray(w.T), jnp.float32)
                    return
            if leaf in ("attention_norm.weight", "ffn_norm.weight"):
                lp.setdefault(leaf.split(".")[0], {})["weight"] = \
                    jnp.asarray(w, jnp.float32)

        def _vis_put(rest: str, w: np.ndarray):
            m = re.match(r"encoder\.layers\.(\d+)\.(.+)", rest)
            if m:
                i, leaf = int(m.group(1)), m.group(2)
                lp = vision["layers"][i]
                for hf, ours in (("self_attn.q_proj", "q_proj"),
                                 ("self_attn.k_proj", "k_proj"),
                                 ("self_attn.v_proj", "v_proj"),
                                 ("self_attn.out_proj", "out_proj"),
                                 ("mlp.fc1", "fc1"), ("mlp.fc2", "fc2"),
                                 ("layer_norm1", "layer_norm1"),
                                 ("layer_norm2", "layer_norm2")):
                    if leaf == hf + ".weight":
                        key = "kernel" if "norm" not in ours else "weight"
                        lp.setdefault(ours, {})[key] = jnp.asarray(
                            w.T if key == "kernel" else w, jnp.float32)
                        return
                    if leaf == hf + ".bias":
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
            elif rest in ("pre_layrnorm.weight", "pre_layernorm.weight"):
                vision.setdefault("pre_layernorm", {})["weight"] = \
                    jnp.asarray(w, jnp.float32)
            elif rest in ("pre_layrnorm.bias", "pre_layernorm.bias"):
                vision.setdefault("pre_layernorm", {})["bias"] = \
                    jnp.asarray(w, jnp.float32)
            # post_layernorm unused (feature_layer = -2 taps pre-final).

        _NATIVE_VIS = (("attention.wq.", "attention.q_proj."),
                       ("attention.wk.", "attention.k_proj."),
                       ("attention.wv.", "attention.v_proj."),
                       ("attention.wo.", "attention.o_proj."),
                       ("feed_forward.w1.", "feed_forward.gate_proj."),
                       ("feed_forward.w3.", "feed_forward.up_proj."),
                       ("feed_forward.w2.", "feed_forward.down_proj."))

        def _native_text(name, w):
            # Mistral-native consolidated text naming (reference
            # pixtral.py hf_to_vllm_mapper + mistral format): translate
            # onto the llama names the base loader consumes.
            if m := re.match(r"layers\.(\d+)\.(.+)", name):
                i, rest = m.group(1), m.group(2)
                for old, newp in (("attention.wq.", "self_attn.q_proj."),
                                  ("attention.wk.", "self_attn.k_proj."),
                                  ("attention.wv.", "self_attn.v_proj."),
                                  ("attention.wo.", "self_attn.o_proj."),
                                  ("feed_forward.w1.", "mlp.gate_proj."),
                                  ("feed_forward.w3.", "mlp.up_proj."),
                                  ("feed_forward.w2.", "mlp.down_proj."),
                                  ("attention_norm.",
                                   "input_layernorm."),
                                  ("ffn_norm.",
                                   "post_attention_layernorm.")):
                    if rest.startswith(old):
                        return (f"model.layers.{i}."
                                f"{newp}{rest[len(old):]}"), w
                return f"model.layers.{i}.{rest}", w
            if name == "tok_embeddings.weight":
                return "model.embed_tokens.weight", w
            if name == "output.weight":
                return "lm_head.weight", w
            if name == "norm.weight":
                return "model.norm.weight", w
            return name, w

        def filter_stream():
            for name, w in weights:
                name = name.removeprefix("model.")
                if name.startswith("vision_encoder."):
                    # Mistral-native pixtral tower names.
                    rest = name.removeprefix("vision_encoder.")
                    for old, newp in _NATIVE_VIS:
                        rest = rest.replace(old, newp)
                    _vis_put_pixtral(rest, w)
                    continue
                if m := re.match(
                        r"vision_language_adapter\.w_(in|out)\.(.+)",
                        name):
                    lin = ("linear_1" if m.group(1) == "in"
                           else "linear_2")
                    kind = m.group(2)
                    vision["projector"].setdefault(lin, {})[
                        "kernel" if kind == "weight" else "bias"] = \
                        jnp.asarray(np.ascontiguousarray(w.T)
                                    if kind == "weight" else w,
                                    jnp.float32)
                    continue
                if self.config.architecture == \
                        "PixtralForConditionalGeneration" and \
                        not name.startswith(
                            ("vision_tower.", "multi_modal_projector.",
                             "language_model.")):
                    name, w = _native_text(name, w)
                if self.is_pixtral and name.startswith("vision_tower."):
                    _vis_put_pixtral(name.removeprefix("vision_tower."), w)
                elif name.startswith("vision_tower.vision_model."):
                    _vis_put(name.removeprefix("vision_tower.vision_model."),
                             w)
                elif name.startswith("multi_modal_projector."):
                    leaf = name.removeprefix("multi_modal_projector.")
                    lin, kind = leaf.rsplit(".", 1)
                    vision["projector"].setdefault(lin, {})[
                        "kernel" if kind == "weight" else "bias"] = \
                        jnp.asarray(w.T if kind == "weight" else w,
                                    jnp.float32)
                elif name.startswith("language_model."):
                    yield name.removeprefix("language_model."), w
                else:
                    yield name, w

        params = super().load_weights(filter_stream())
        params["vision"] = vision
        return params
