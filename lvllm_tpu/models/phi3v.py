"""Phi-3-Vision: CLIP-L/336 tower + HD 2x2-merge transform + Phi-3 LM.

Reference: vllm ``models/phi3v.py`` — CLIP ViT-L/14-336 truncated at
feature layer -2 (:100-110), Phi3HDImageEmbedding (:164):
reshape_hd_patches_2x2merge (24x24 patches → 12x12 tokens of 4*1024
channels), per-row ``sub_GN`` newline columns, ``glb_GN`` separator
between sub-crop and global features (hd_transform_order="sub_glb"),
then img_projection Linear → GELU → Linear into the text width. Weights
live under ``model.vision_embed_tokens.*``.
"""

import re
from typing import Any, Dict, Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lvllm_tpu.config import ModelConfig
from lvllm_tpu.models.phi3 import Phi3Model
from lvllm_tpu.models.registry import register_model
from lvllm_tpu.models.vision import clip_vision_encode, init_vision_params

Params = Dict[str, Any]


@register_model("Phi3VForCausalLM")
class Phi3VModel(Phi3Model):

    is_multimodal = True
    mm_dynamic = True

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        vc = config.vision_config or {}
        # CLIP ViT-L/14-336 constants (reference phi3v.py:82-97).
        self.v_hidden = vc.get("hidden_size", 1024)
        self.v_intermediate = vc.get("intermediate_size", 4096)
        self.v_heads = vc.get("num_attention_heads", 16)
        self.image_size = vc.get("image_size", 336)
        self.patch_size = vc.get("patch_size", 14)
        self.feature_layer = vc.get("layer_idx", -2)
        # clip_vision_encode applies feature_layer itself; keep the full
        # stack so the truncation happens exactly once.
        self.v_layers = vc.get("num_hidden_layers", 24)
        self.grid = self.image_size // self.patch_size       # 24
        self.hd_grid = self.grid // 2                        # 12

    def num_image_tokens_for(self, h_crop: int, w_crop: int) -> int:
        g = self.hd_grid
        sub = h_crop * g * (w_crop * g + 1)
        glb = g * (g + 1)
        return sub + 1 + glb

    @property
    def num_image_tokens(self) -> int:
        # Single-crop base policy (global + one 336x336 sub crop).
        return self.num_image_tokens_for(1, 1)

    def init_params(self, rng) -> Params:
        params = super().init_params(rng)
        nprng = np.random.default_rng(786 + self.config.seed)
        vision = init_vision_params(
            nprng, self.v_hidden, self.v_intermediate, self.v_layers,
            self.image_size, self.patch_size,
            text_hidden=self.config.hidden_size)
        D4 = 4 * self.v_hidden
        H = self.config.hidden_size

        def dense(shape, scale=0.02):
            return jnp.asarray(nprng.standard_normal(size=shape) * scale,
                               jnp.float32)

        vision["glb_GN"] = dense((1, D4))
        vision["sub_GN"] = dense((1, 1, D4))
        vision["proj_1"] = {"kernel": dense((D4, H)),
                            "bias": jnp.zeros((H,), jnp.float32)}
        vision["proj_2"] = {"kernel": dense((H, H)),
                            "bias": jnp.zeros((H,), jnp.float32)}
        params["vision"] = vision
        return params

    # ---- HD transform ------------------------------------------------------

    def _merge_2x2(self, feats: jax.Array, h_crop: int,
                   w_crop: int) -> jax.Array:
        """[N, 24*24, C] → [h_crop*12, w_crop*12, 4C] (reference
        reshape_hd_patches_2x2merge)."""
        N, _, C = feats.shape
        g = self.grid
        x = feats.reshape(N, g, g, C)
        x = x.reshape(N, g // 2, 2, g // 2, 2, C)
        x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(
            N, g // 2, g // 2, 4 * C)
        x = x.reshape(h_crop, w_crop, g // 2, g // 2, 4 * C)
        x = jnp.transpose(x, (0, 2, 1, 3, 4)).reshape(
            h_crop * (g // 2), w_crop * (g // 2), 4 * C)
        return x

    def _newline(self, x: jax.Array, sub_gn: jax.Array) -> jax.Array:
        """Append the sub_GN column after each row and flatten."""
        Hh = x.shape[0]
        nl = jnp.broadcast_to(sub_gn, (Hh, 1, x.shape[-1]))
        return jnp.concatenate([x, nl], axis=1).reshape(-1, x.shape[-1])

    def encode_images(self, params, pixel_values: jax.Array,
                      image_sizes=None) -> jax.Array:
        """pixel_values [B, P, 3, S, S] (crop 0 = global, rest = HD sub
        crops) or [B, 3, S, S] (global-only)."""
        vp = params["vision"]
        pix = jnp.asarray(pixel_values)
        if pix.ndim == 4:
            pix = pix[:, None]
        B, P = pix.shape[:2]
        feats = clip_vision_encode(
            vp, pix.reshape(B * P, *pix.shape[2:]), self.patch_size,
            self.v_heads, self.feature_layer)
        C = feats.shape[-1]
        feats = feats.reshape(B, P, -1, C)
        out = []
        for i in range(B):
            if image_sizes is not None:
                h, w = (int(image_sizes[i][0]), int(image_sizes[i][1]))
                h_crop, w_crop = h // self.image_size, w // self.image_size
            else:
                h_crop = w_crop = (1 if P > 1 else 0)
            glb = self._newline(self._merge_2x2(feats[i, :1], 1, 1)[...],
                                vp["sub_GN"][0])
            if h_crop * w_crop > 0:
                sub = self._merge_2x2(feats[i, 1:1 + h_crop * w_crop],
                                      h_crop, w_crop)
                sub = self._newline(sub, vp["sub_GN"][0])
                emb = jnp.concatenate([sub, vp["glb_GN"], glb], axis=0)
            else:
                emb = glb
            h1 = emb @ vp["proj_1"]["kernel"] + vp["proj_1"]["bias"]
            h1 = jax.nn.gelu(h1, approximate=False)
            out.append(h1 @ vp["proj_2"]["kernel"] + vp["proj_2"]["bias"])
        return jnp.concatenate(out, axis=0)

    def encode_mm(self, params, mm_data: dict) -> np.ndarray:
        return np.asarray(self.encode_images(
            params, jnp.asarray(np.asarray(mm_data["pixel_values"],
                                           np.float32)),
            image_sizes=mm_data.get("image_sizes")))

    # ---- loading -----------------------------------------------------------

    def load_weights(self, weights: Iterable[Tuple[str, np.ndarray]]):
        vis: Dict[str, np.ndarray] = {}

        def filter_stream():
            for name, w in weights:
                if name.startswith("model.vision_embed_tokens."):
                    vis[name.removeprefix("model.vision_embed_tokens.")] \
                        = np.asarray(w)
                else:
                    yield name, w

        params = super().load_weights(filter_stream())
        vp = params["vision"]
        j = lambda a: jnp.asarray(a, jnp.float32)  # noqa: E731
        t = lambda a: jnp.asarray(np.ascontiguousarray(a.T), jnp.float32)  # noqa: E731
        for key, w in vis.items():
            if key == "glb_GN":
                vp["glb_GN"] = j(w.reshape(1, -1))
            elif key == "sub_GN":
                vp["sub_GN"] = j(w.reshape(1, 1, -1))
            elif m := re.match(r"img_projection\.0\.(weight|bias)", key):
                kind = m.group(1)
                vp["proj_1"]["kernel" if kind == "weight" else "bias"] = \
                    t(w) if kind == "weight" else j(w)
            elif m := re.match(r"img_projection\.2\.(weight|bias)", key):
                kind = m.group(1)
                vp["proj_2"]["kernel" if kind == "weight" else "bias"] = \
                    t(w) if kind == "weight" else j(w)
            elif key.startswith("img_processor.vision_model."):
                rest = key.removeprefix("img_processor.vision_model.")
                if m := re.match(r"encoder\.layers\.(\d+)\.(.+)", rest):
                    i = int(m.group(1))
                    if i >= len(vp["layers"]):
                        continue
                    lp = vp["layers"][i]
                    leaf = m.group(2)
                    for hfn, ours in (("self_attn.q_proj", "q_proj"),
                                      ("self_attn.k_proj", "k_proj"),
                                      ("self_attn.v_proj", "v_proj"),
                                      ("self_attn.out_proj", "out_proj"),
                                      ("mlp.fc1", "fc1"),
                                      ("mlp.fc2", "fc2"),
                                      ("layer_norm1", "layer_norm1"),
                                      ("layer_norm2", "layer_norm2")):
                        if leaf == hfn + ".weight":
                            key2 = ("kernel" if "norm" not in ours
                                    else "weight")
                            lp.setdefault(ours, {})[key2] = \
                                t(w) if key2 == "kernel" else j(w)
                            break
                        if leaf == hfn + ".bias":
                            lp.setdefault(ours, {})["bias"] = j(w)
                            break
                elif rest == "embeddings.class_embedding":
                    vp["class_embedding"] = j(w)
                elif rest == "embeddings.patch_embedding.weight":
                    vp["patch_embedding"] = j(w)
                elif rest == "embeddings.position_embedding.weight":
                    vp["position_embedding"] = j(w)
                elif rest.startswith("pre_layrnorm.") or \
                        rest.startswith("pre_layernorm."):
                    vp.setdefault("pre_layernorm", {})[
                        rest.split(".")[-1]] = j(w)
        return params
