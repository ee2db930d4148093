"""Step3-VL: Step3 vision tower + conv downsamplers + Step-3 text.

Reference: vllm ``models/step3_vl.py`` — biased CLIP-style conv patch
embed with a CLS token whose row is REPEATED pad_tp_size-1 times in
front (:237-288), post-norm blocks (h += ln(sublayer(h)), :394-423),
fused biased ``qkv_proj``; the tower output drops the 4 leading rows,
then vit_downsampler (k2, stride understand_projector_stride) →
vit_downsampler2 (k3 s2 p1) → vit_large_projector into the text width
(:535-560, :592-610).
"""

import re
from typing import Any, Dict, Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lvllm_tpu.config import ModelConfig
from lvllm_tpu.models.registry import register_model
from lvllm_tpu.models.step3_text import Step3TextModel

Params = Dict[str, Any]


def _ln(x, node, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    return (x32 - mu) * jax.lax.rsqrt(
        x32.var(-1, keepdims=True) + eps) * node["weight"] + node["bias"]


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


@register_model("Step3VLForConditionalGeneration")
class Step3VLModel(Step3TextModel):

    is_multimodal = True
    mm_dynamic = True

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        vc = config.vision_config or {}
        self.v_hidden = vc.get("hidden_size", 1792)
        self.v_intermediate = vc.get("intermediate_size", 15360)
        self.v_layers = vc.get("num_hidden_layers", 63)
        self.v_heads = vc.get("num_attention_heads", 16)
        self.v_out = vc.get("output_hidden_size", 4096)
        self.image_size = vc.get("image_size", 728)
        self.patch_size = vc.get("patch_size", 28)
        self.v_eps = vc.get("layer_norm_eps", 1e-5)
        self.v_act = vc.get("hidden_act", "quick_gelu")
        self.ds_stride = config.vision_config.get(
            "understand_projector_stride", 2) if config.vision_config \
            else 2

    def init_params(self, rng) -> Params:
        params = super().init_params(rng)
        nprng = np.random.default_rng(793 + self.config.seed)
        W = self.v_hidden

        def dense(shape, scale=0.02):
            return jnp.asarray(nprng.standard_normal(size=shape) * scale,
                               jnp.float32)

        def ln(n=W):
            return {"weight": jnp.ones((n,), jnp.float32),
                    "bias": jnp.zeros((n,), jnp.float32)}

        n_pos = (self.image_size // self.patch_size) ** 2 + 1
        layers = []
        for _ in range(self.v_layers):
            layers.append({
                "layer_norm1": ln(), "layer_norm2": ln(),
                "qkv": {"kernel": dense((W, 3 * W)),
                        "bias": jnp.zeros((3 * W,), jnp.float32)},
                "out_proj": {"kernel": dense((W, W)),
                             "bias": jnp.zeros((W,), jnp.float32)},
                "fc1": {"kernel": dense((W, self.v_intermediate)),
                        "bias": jnp.zeros((self.v_intermediate,),
                                          jnp.float32)},
                "fc2": {"kernel": dense((self.v_intermediate, W)),
                        "bias": jnp.zeros((W,), jnp.float32)},
            })
        params["vision"] = {
            "class_embedding": dense((W,)),
            "patch_embedding": dense((W, 3, self.patch_size,
                                      self.patch_size)),
            "patch_bias": jnp.zeros((W,), jnp.float32),
            "position_embedding": dense((n_pos, W)),
            "layers": layers,
            "downsampler1": {"kernel": dense((self.v_out, W, 2, 2)),
                             "bias": jnp.zeros((self.v_out,),
                                               jnp.float32)},
            "downsampler2": {"kernel": dense((2 * self.v_out, self.v_out,
                                              3, 3)),
                             "bias": jnp.zeros((2 * self.v_out,),
                                               jnp.float32)},
            "projector": {"kernel": dense((2 * self.v_out,
                                           self.config.hidden_size))},
        }
        return params

    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        vp = params["vision"]
        B, C, S, _ = pixel_values.shape
        P = self.patch_size
        G = S // P
        x = pixel_values.astype(jnp.float32)
        x = x.reshape(B, C, G, P, G, P)
        x = jnp.transpose(x, (0, 2, 4, 1, 3, 5)).reshape(B, G * G,
                                                         C * P * P)
        h = x @ vp["patch_embedding"].reshape(
            vp["patch_embedding"].shape[0], -1).T + vp["patch_bias"]
        W = h.shape[-1]
        cls = jnp.broadcast_to(vp["class_embedding"], (B, 1, W))
        h = jnp.concatenate([cls, h], axis=1)
        h = h + vp["position_embedding"][None]     # matched-size path
        # pad: prepend pad_tp_size-1 = 3 copies of the CLS row.
        h = jnp.concatenate(
            [jnp.broadcast_to(h[:, :1], (B, 3, W)), h], axis=1)
        T = h.shape[1]
        Hh = self.v_heads
        Hd = W // Hh
        act = _quick_gelu if self.v_act == "quick_gelu" else (
            lambda v: jax.nn.gelu(v, approximate=False))
        for lp in vp["layers"]:
            qkv = h @ lp["qkv"]["kernel"] + lp["qkv"]["bias"]
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(B, T, Hh, Hd)
            k = k.reshape(B, T, Hh, Hd)
            v = v.reshape(B, T, Hh, Hd)
            s = jnp.einsum("bthd,bshd->bhts", q, k) * Hd ** -0.5
            p = jax.nn.softmax(s, axis=-1)
            o = jnp.einsum("bhts,bshd->bthd", p, v).reshape(B, T, W)
            o = o @ lp["out_proj"]["kernel"] + lp["out_proj"]["bias"]
            h = h + _ln(o, lp["layer_norm1"], self.v_eps)
            m = act(h @ lp["fc1"]["kernel"] + lp["fc1"]["bias"])
            m = m @ lp["fc2"]["kernel"] + lp["fc2"]["bias"]
            h = h + _ln(m, lp["layer_norm2"], self.v_eps)
        feats = h[:, 4:]                          # drop pad+CLS rows
        HW = int(round(feats.shape[1] ** 0.5))
        grid = feats.reshape(B, HW, HW, W)
        grid = jax.lax.conv_general_dilated(
            grid, jnp.transpose(vp["downsampler1"]["kernel"],
                                (2, 3, 1, 0)),
            window_strides=(self.ds_stride, self.ds_stride),
            padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        grid = grid + vp["downsampler1"]["bias"]
        grid = jax.lax.conv_general_dilated(
            grid, jnp.transpose(vp["downsampler2"]["kernel"],
                                (2, 3, 1, 0)),
            window_strides=(2, 2), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        grid = grid + vp["downsampler2"]["bias"]
        out = grid.reshape(B, -1, grid.shape[-1])
        out = out @ vp["projector"]["kernel"]
        if "bias" in vp["projector"]:
            out = out + vp["projector"]["bias"]
        return out

    def encode_mm(self, params, mm_data: dict) -> np.ndarray:
        return np.asarray(self.encode_images(
            params, jnp.asarray(np.asarray(mm_data["pixel_values"],
                                           np.float32))))

    def load_weights(self, weights: Iterable[Tuple[str, np.ndarray]]):
        vis: Dict[str, np.ndarray] = {}

        def filter_stream():
            for name, w in weights:
                if name.startswith(("vision_model.", "vit_downsampler",
                                    "vit_large_projector.")):
                    vis[name] = np.asarray(w)
                else:
                    yield name, w

        params = super().load_weights(filter_stream())
        vp = params["vision"]
        j = lambda a: jnp.asarray(a, jnp.float32)  # noqa: E731
        t = lambda a: jnp.asarray(np.ascontiguousarray(a.T), jnp.float32)  # noqa: E731
        for key, w in vis.items():
            if key == "vision_model.embeddings.class_embedding":
                vp["class_embedding"] = j(w.reshape(-1))
            elif key == "vision_model.embeddings.patch_embedding.weight":
                vp["patch_embedding"] = j(w)
            elif key == "vision_model.embeddings.patch_embedding.bias":
                vp["patch_bias"] = j(w)
            elif key == \
                    "vision_model.embeddings.position_embedding.weight":
                vp["position_embedding"] = j(w)
            elif m := re.match(
                    r"vision_model\.transformer\.layers\.(\d+)\.(.+)",
                    key):
                lp = vp["layers"][int(m.group(1))]
                rest = m.group(2)
                for hfn, ours in (("self_attn.qkv_proj", "qkv"),
                                  ("self_attn.out_proj", "out_proj"),
                                  ("mlp.fc1", "fc1"), ("mlp.fc2", "fc2"),
                                  ("layer_norm1", "layer_norm1"),
                                  ("layer_norm2", "layer_norm2")):
                    if rest == hfn + ".weight":
                        kk = "kernel" if "norm" not in ours else "weight"
                        lp[ours][kk] = t(w) if kk == "kernel" else j(w)
                        break
                    if rest == hfn + ".bias":
                        lp[ours]["bias"] = j(w)
                        break
            elif key == "vit_downsampler.weight":
                vp["downsampler1"]["kernel"] = j(w)
            elif key == "vit_downsampler.bias":
                vp["downsampler1"]["bias"] = j(w)
            elif key == "vit_downsampler2.weight":
                vp["downsampler2"]["kernel"] = j(w)
            elif key == "vit_downsampler2.bias":
                vp["downsampler2"]["bias"] = j(w)
            elif key == "vit_large_projector.weight":
                vp.setdefault("projector", {})["kernel"] = t(w)
            elif key == "vit_large_projector.bias":
                vp.setdefault("projector", {})["bias"] = j(w)
        return params
