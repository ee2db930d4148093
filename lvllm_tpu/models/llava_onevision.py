"""LLaVA-OneVision: SigLIP tower + GELU MLP projector + Qwen2 decoder.

Behavioral reference: ``/root/reference/vllm/model_executor/models/
llava_onevision.py`` (registry.py:465) / HF
``modeling_llava_onevision.py``: patch features from the LAST encoder
layer before the tower's post layernorm (vision_feature_layer = -1,
"full" select — SigLIP has no class token), projected by
linear_1 → GELU → linear_2, then packed per image: the single-patch
(base-resolution) path appends the learned ``image_newline`` embedding
after the patch grid (``pack_image_features``, single-patch branch);
anyres multi-patch grids are resolved to the base resolution by the
processor in this serving stack (same policy as LlavaNext here).
"""

from typing import Any, Dict, Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lvllm_tpu.config import ModelConfig
from lvllm_tpu.models.qwen3 import Qwen3Model
from lvllm_tpu.models.registry import register_model
from lvllm_tpu.models.vision import (init_siglip_params, load_siglip_weights,
                                     project_image_features,
                                     siglip_vision_encode)


@register_model("LlavaOnevisionForConditionalGeneration")
class LlavaOnevisionModel(Qwen3Model):

    is_multimodal = True

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        vc = config.vision_config or {}
        self.v_hidden = vc.get("hidden_size", 1152)
        self.v_intermediate = vc.get("intermediate_size", 4304)
        self.v_layers = vc.get("num_hidden_layers", 26)
        self.v_heads = vc.get("num_attention_heads", 14)
        self.image_size = vc.get("image_size", 384)
        self.patch_size = vc.get("patch_size", 14)
        self.v_eps = vc.get("layer_norm_eps", 1e-6)

    mm_dynamic = True

    def init_params(self, rng) -> Dict[str, Any]:
        params = super().init_params(rng)
        nprng = np.random.default_rng(781 + self.config.seed)
        vision = init_siglip_params(
            nprng, self.v_hidden, self.v_intermediate, self.v_layers,
            self.image_size, self.patch_size, dtype=jnp.float32)
        H = self.config.hidden_size

        def dense(shape, scale=0.02):
            return jnp.asarray(
                nprng.standard_normal(size=shape) * scale, jnp.float32)

        mid = getattr(self, "projector_mid", None) or H
        vision["projector"] = {
            "linear_1": {"kernel": dense((self.v_hidden, mid)),
                         "bias": jnp.zeros((mid,), jnp.float32)},
            "linear_2": {"kernel": dense((mid, H)),
                         "bias": jnp.zeros((H,), jnp.float32)},
        }
        if getattr(self, "projector_pre_norm", False):
            vision["projector"]["pre_norm"] = {
                "weight": jnp.ones((self.v_hidden,), jnp.float32),
                "bias": jnp.zeros((self.v_hidden,), jnp.float32)}
        vision["image_newline"] = dense((H,))
        params["vision"] = vision
        return params

    def encode_mm(self, params, mm_data: dict) -> np.ndarray:
        """mm_data: pixel_values [n_images, n_patches, 3, S, S] (HF
        anyres layout: patch 0 = resized base image, rest = grid tiles) +
        image_sizes [n_images, 2]. Returns packed features
        [total_placeholder_tokens, H] mirroring HF pack_image_features:
        base grid + unpadded anyres grid with image_newline columns."""
        pix = np.asarray(mm_data["pixel_values"], np.float32)
        if pix.ndim == 4:
            pix = pix[None]
        sizes = np.asarray(mm_data.get(
            "image_sizes", [[self.image_size, self.image_size]]
            * pix.shape[0]))
        g = self.image_size // self.patch_size
        n_img, n_patch = pix.shape[:2]
        feats = siglip_vision_encode(
            params["vision"], jnp.asarray(pix.reshape(
                n_img * n_patch, *pix.shape[2:])),
            self.patch_size, self.v_heads, self.v_eps,
            post_layernorm=False)                  # feature layer -1
        proj = np.asarray(project_image_features(
            params["vision"]["projector"], feats), np.float32)
        proj = proj.reshape(n_img, n_patch, g * g, -1)
        newline = np.asarray(params["vision"]["image_newline"], np.float32)
        out = []
        for i in range(n_img):
            if n_patch > 1:
                base = proj[i, 0]
                ph, pw = self._grid_shape(sizes[i])
                f = proj[i, 1:1 + ph * pw].reshape(ph, pw, g, g, -1)
                f = np.transpose(f, (4, 0, 2, 1, 3)).reshape(
                    -1, ph * g, pw * g)
                f = self._unpad(f, sizes[i])
                f = self._maybe_downscale(f, g)
                nl = np.broadcast_to(newline[:, None, None],
                                     (f.shape[0], f.shape[1], 1))
                f = np.concatenate([f, nl], axis=-1)
                f = f.reshape(f.shape[0], -1).T
                out.append(np.concatenate([base, f], axis=0))
            else:
                out.append(np.concatenate([proj[i, 0], newline[None]],
                                          axis=0))
        return np.concatenate(out, axis=0)

    def _grid_shape(self, size):
        """HF get_anyres_image_grid_shape: best-fit pinpoint / tower
        size."""
        pins = (self.config.vision_config or {}).get(
            "image_grid_pinpoints") or [[self.image_size, self.image_size]]
        best, best_fit = None, None
        oh, ow = int(size[0]), int(size[1])
        for (h, w) in pins:
            scale = min(w / ow, h / oh)
            dw, dh = int(ow * scale), int(oh * scale)
            eff = min(dw * dh, ow * oh)
            waste = h * w - eff
            fit = (-eff, waste)
            if best_fit is None or fit < best_fit:
                best_fit, best = fit, (h, w)
        return best[0] // self.image_size, best[1] // self.image_size

    @staticmethod
    def _unpad(f: np.ndarray, size) -> np.ndarray:
        """HF unpad_image on [D, H, W]."""
        oh, ow = int(size[0]), int(size[1])
        ch, cw = f.shape[1], f.shape[2]
        if ow / oh > cw / ch:
            nh = int(round(oh * (cw / ow), 7))
            pad = (ch - nh) // 2
            return f[:, pad:ch - pad, :]
        nw = int(round(ow * (ch / oh), 7))
        pad = (cw - nw) // 2
        return f[:, :, pad:cw - pad]

    def _maybe_downscale(self, f: np.ndarray, g: int) -> np.ndarray:
        """anyres_max_9 cap: bilinear downscale when the unpadded grid
        exceeds 9 base grids (HF pack_image_features ratio > 1.1)."""
        max_patches = 9
        ratio = (f.shape[1] * f.shape[2] / (max_patches * g * g)) ** 0.5
        if ratio <= 1.1:
            return f
        new_hw = (int(f.shape[1] // ratio), int(f.shape[2] // ratio))
        return np.asarray(jax.image.resize(
            jnp.asarray(f), (f.shape[0],) + new_hw, method="bilinear"),
            np.float32)

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
                elif name.startswith("multi_modal_projector."):
                    rest = name.removeprefix("multi_modal_projector.")
                    lin, kind = rest.rsplit(".", 1)
                    vision["projector"].setdefault(lin, {})[
                        "kernel" if kind == "weight" else "bias"] = \
                        jnp.asarray(
                            np.ascontiguousarray(w.T)
                            if kind == "weight" else w, jnp.float32)
                elif name == "image_newline":
                    vision["image_newline"] = jnp.asarray(w, jnp.float32)
                elif name.startswith("language_model."):
                    yield name.removeprefix("language_model."), w
                else:
                    yield name, w

        params = super().load_weights(filter_stream())
        params["vision"] = vision
        return params


@register_model("BeeForConditionalGeneration")
class BeeModel(LlavaOnevisionModel):
    """Bee-8B (reference bee.py:141): LLaVA-OneVision with a widened
    projector — LayerNorm pre-norm, linear to 4x text hidden, GELU,
    linear back (bee.py:111-133)."""

    projector_pre_norm = True

    @property
    def projector_mid(self):
        return 4 * self.config.hidden_size
