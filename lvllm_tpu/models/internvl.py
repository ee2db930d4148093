"""InternVL multimodal: InternViT tower + pixel-shuffle + MLP projector.

Counterpart of the reference's ``vllm/model_executor/models/internvl.py``
(InternVLChatModel) / ``intern_vit.py``: CLS-token ViT with per-layer
layer-scale (lambda_1/lambda_2), optional full-width qk RMS-norm, pixel
shuffle downsampling (downsample_ratio, ps_version v2), and an
mlp1-style projector (LayerNorm → linear → GELU → linear). HF numerics
reference: transformers ``InternVLForConditionalGeneration``.

The text side is the unified llama/qwen2 implementation (config-driven).
"""

import re
from typing import Any, Dict, Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lvllm_tpu.config import ModelConfig
from lvllm_tpu.models.qwen3 import Qwen3Model
from lvllm_tpu.models.registry import register_model


def _ln(x, node, eps):
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    return (x32 - mu) * jax.lax.rsqrt(var + eps) * node["weight"] + \
        node["bias"]


@register_model("InternVLForConditionalGeneration")
@register_model("InternVLChatModel")
# InternVL-derived chat models (reference nvlm_d.py:158, h2ovl.py:154,
# skyworkr1v.py:153, interns1.py): same InternViT + pixel-shuffle + mlp1
# math; NVLM widens mlp1 (projector_mid fixup), the rest differ only in
# processor-side tiling.
@register_model("NVLM_D")
@register_model("H2OVLChatModel")
@register_model("SkyworkR1VChatModel")
@register_model("InternS1ForConditionalGeneration")
@register_model("InternS1ProForConditionalGeneration")
class InternVLModel(Qwen3Model):

    is_multimodal = True

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        vc = config.vision_config or {}
        self.v_hidden = vc.get("hidden_size", 1024)
        self.v_intermediate = vc.get("intermediate_size", 4096)
        self.v_layers = vc.get("num_hidden_layers", 24)
        self.v_heads = vc.get("num_attention_heads", 16)
        img = vc.get("image_size", 448)
        self.image_size = img[0] if isinstance(img, (list, tuple)) else img
        ps = vc.get("patch_size", 14)
        self.patch_size = ps[0] if isinstance(ps, (list, tuple)) else ps
        self.v_eps = vc.get("layer_norm_eps", 1e-6)
        self.v_qk_norm = vc.get("use_qk_norm", False)
        self.downsample_ratio = vc.get("downsample_ratio", 0.5)
        self.v_attn_bias = vc.get("attention_bias", False)
        # NVLM widens mlp1's middle layer to llm_intermediate (bias-free;
        # missing biases stay zero — exact; reference nvlm_d.py:158).
        self.projector_mid = vc.get("projector_mid") or config.hidden_size
        # Original InternViT checkpoints (qkv_bias=True default).
        self.v_qkv_bias = vc.get("qkv_bias", self.v_attn_bias)

    @property
    def num_image_tokens(self) -> int:
        n = (self.image_size // self.patch_size) ** 2
        return int(n * self.downsample_ratio ** 2)

    # ---- params ------------------------------------------------------------

    def init_params(self, rng) -> Dict[str, Any]:
        params = super().init_params(rng)
        nprng = np.random.default_rng(777 + self.config.seed)
        H, I = self.v_hidden, self.v_intermediate
        n_pos = (self.image_size // self.patch_size) ** 2 + 1

        def dense(shape, scale=0.02):
            return jnp.asarray(nprng.standard_normal(size=shape) * scale,
                               jnp.float32)

        def ln(n=H):
            return {"weight": jnp.ones((n,), jnp.float32),
                    "bias": jnp.zeros((n,), jnp.float32)}

        layers = []
        for _ in range(self.v_layers):
            lp = {
                "layernorm_before": ln(), "layernorm_after": ln(),
                "lambda_1": jnp.full((H,), 0.1, jnp.float32),
                "lambda_2": jnp.full((H,), 0.1, jnp.float32),
                "q_proj": {"kernel": dense((H, H))},
                "k_proj": {"kernel": dense((H, H))},
                "v_proj": {"kernel": dense((H, H))},
                "projection_layer": {"kernel": dense((H, H)),
                                     "bias": jnp.zeros((H,), jnp.float32)},
                "fc1": {"kernel": dense((H, I)),
                        "bias": jnp.zeros((I,), jnp.float32)},
                "fc2": {"kernel": dense((I, H)),
                        "bias": jnp.zeros((H,), jnp.float32)},
            }
            if self.v_attn_bias:
                for k in ("q_proj", "k_proj", "v_proj"):
                    lp[k]["bias"] = jnp.zeros((H,), jnp.float32)
            if self.v_qk_norm:
                lp["q_norm"] = jnp.ones((H,), jnp.float32)
                lp["k_norm"] = jnp.ones((H,), jnp.float32)
            layers.append(lp)

        C4 = int(H * (1 / self.downsample_ratio) ** 2)
        params["vision"] = {
            "cls_token": dense((1, 1, H)),
            "patch_embedding": dense((H, 3, self.patch_size,
                                      self.patch_size)),
            "patch_bias": jnp.zeros((H,), jnp.float32),
            "position_embedding": dense((1, n_pos, H)),
            "layers": layers,
            "projector": {
                "layer_norm": ln(C4),
                "linear_1": {"kernel": dense((C4, self.projector_mid)),
                             "bias": jnp.zeros((self.projector_mid,),
                                               jnp.float32)},
                "linear_2": {"kernel": dense((self.projector_mid,
                                              self.config.hidden_size)),
                             "bias": jnp.zeros((self.config.hidden_size,),
                                               jnp.float32)},
            },
        }
        return params

    # ---- vision ------------------------------------------------------------

    def _vit(self, vp, pixel_values: jax.Array) -> jax.Array:
        """InternViT forward → last hidden state [B, 1+N, D]."""
        B, C, S, _ = pixel_values.shape
        P = self.patch_size
        G = S // P
        x = pixel_values.astype(jnp.float32)
        x = x.reshape(B, C, G, P, G, P)
        x = jnp.transpose(x, (0, 2, 4, 1, 3, 5)).reshape(B, G * G,
                                                         C * P * P)
        h = x @ vp["patch_embedding"].reshape(
            vp["patch_embedding"].shape[0], -1).T + vp["patch_bias"]
        D = h.shape[-1]
        cls = jnp.broadcast_to(vp["cls_token"], (B, 1, D))
        h = jnp.concatenate([cls, h], axis=1)
        h = h + vp["position_embedding"]

        T = h.shape[1]
        Hd = D // self.v_heads
        scale = Hd ** -0.5
        eps = self.v_eps

        def rms(x, w):
            var = jnp.mean(x * x, axis=-1, keepdims=True)
            return x * jax.lax.rsqrt(var + eps) * w

        for lp in vp["layers"]:
            hn = _ln(h, lp["layernorm_before"], eps)
            q = hn @ lp["q_proj"]["kernel"] + lp["q_proj"].get("bias", 0.0)
            k = hn @ lp["k_proj"]["kernel"] + lp["k_proj"].get("bias", 0.0)
            v = hn @ lp["v_proj"]["kernel"] + lp["v_proj"].get("bias", 0.0)
            if self.v_qk_norm:
                # Full-width RMS over the concatenated heads (HF
                # InternVLVisionAttention applies q_norm pre-reshape).
                q = rms(q, lp["q_norm"])
                k = rms(k, lp["k_norm"])
            q = q.reshape(B, T, self.v_heads, Hd) * scale
            k = k.reshape(B, T, self.v_heads, Hd)
            v = v.reshape(B, T, self.v_heads, Hd)
            s = jnp.einsum("bthd,bshd->bhts", q, k)
            p = jax.nn.softmax(s, axis=-1)
            o = jnp.einsum("bhts,bshd->bthd", p, v).reshape(B, T, D)
            o = o @ lp["projection_layer"]["kernel"] + \
                lp["projection_layer"]["bias"]
            h = h + lp["lambda_1"] * o
            hn = _ln(h, lp["layernorm_after"], eps)
            hn = jax.nn.gelu(hn @ lp["fc1"]["kernel"] + lp["fc1"]["bias"],
                             approximate=False)
            hn = hn @ lp["fc2"]["kernel"] + lp["fc2"]["bias"]
            h = h + lp["lambda_2"] * hn
        return h

    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        """[B, 3, S, S] → [B, N*ratio², text_hidden] (HF
        InternVLModel.get_image_features: drop CLS → pixel shuffle →
        mlp projector)."""
        vp = params["vision"]
        h = self._vit(vp, pixel_values)[:, 1:, :]        # drop CLS
        B, N, C = h.shape
        fs = int(round(N ** 0.5))
        sf = self.downsample_ratio
        # HF pixel_shuffle (ps_version v2) on [B, fs, fs, C].
        x = h.reshape(B, fs, fs, C)
        x = x.reshape(B, fs, int(fs * sf), int(C / sf))
        x = jnp.transpose(x, (0, 2, 1, 3))
        x = x.reshape(B, int(fs * sf), int(fs * sf), int(C / sf ** 2))
        x = jnp.transpose(x, (0, 2, 1, 3))
        x = x.reshape(B, int(N * sf * sf), int(C / sf ** 2))
        pj = vp["projector"]
        x = _ln(x, pj["layer_norm"], 1e-5)
        x = jax.nn.gelu(
            x @ pj["linear_1"]["kernel"] + pj["linear_1"].get("bias", 0.0),
            approximate=False)
        return x @ pj["linear_2"]["kernel"] + pj["linear_2"].get("bias",
                                                                 0.0)

    # ---- weight loading ----------------------------------------------------

    def load_weights(self, weights: Iterable[Tuple[str, np.ndarray]]):
        vision: Dict[str, Any] = {"layers": [
            {} for _ in range(self.v_layers)], "projector": {}}

        def _vis_put(rest: str, w: np.ndarray):
            m = re.match(r"encoder\.layer\.(\d+)\.(.+)", rest)
            if m:
                i, leaf = int(m.group(1)), m.group(2)
                lp = vision["layers"][i]
                if leaf in ("lambda_1", "lambda_2"):
                    lp[leaf] = jnp.asarray(w, jnp.float32)
                    return
                for hf, ours in (("attention.q_proj", "q_proj"),
                                 ("attention.k_proj", "k_proj"),
                                 ("attention.v_proj", "v_proj"),
                                 ("attention.projection_layer",
                                  "projection_layer"),
                                 ("mlp.fc1", "fc1"), ("mlp.fc2", "fc2"),
                                 ("layernorm_before", "layernorm_before"),
                                 ("layernorm_after", "layernorm_after")):
                    if leaf == hf + ".weight":
                        key = "kernel" if "norm" not in ours else "weight"
                        lp.setdefault(ours, {})[key] = jnp.asarray(
                            w.T if key == "kernel" else w, jnp.float32)
                        return
                    if leaf == hf + ".bias":
                        lp.setdefault(ours, {})["bias"] = jnp.asarray(
                            w, jnp.float32)
                        return
                if leaf == "attention.q_norm.weight":
                    lp["q_norm"] = jnp.asarray(w, jnp.float32)
                elif leaf == "attention.k_norm.weight":
                    lp["k_norm"] = jnp.asarray(w, jnp.float32)
                return
            if rest == "embeddings.cls_token":
                vision["cls_token"] = jnp.asarray(w, jnp.float32)
            elif rest == "embeddings.patch_embeddings.projection.weight":
                vision["patch_embedding"] = jnp.asarray(w, jnp.float32)
            elif rest == "embeddings.patch_embeddings.projection.bias":
                vision["patch_bias"] = jnp.asarray(w, jnp.float32)
            elif rest == "embeddings.position_embeddings":
                vision["position_embedding"] = jnp.asarray(w, jnp.float32)

        H = self.v_hidden

        def _vis_put_orig(rest: str, w: np.ndarray):
            # Original trust-remote InternViT naming (NVLM / H2OVL /
            # SkyworkR1V / InternVL-Chat; reference intern_vit.py):
            # encoder.layers.N.{attn.qkv, attn.proj, attn.q_norm, ls1,
            # norm1, mlp.fc1, ...} with a fused qkv projection.
            m = re.match(r"encoder\.layers\.(\d+)\.(.+)", rest)
            if m:
                i, leaf = int(m.group(1)), m.group(2)
                lp = vision["layers"][i]
                if m2 := re.match(r"attn\.qkv\.(weight|bias)", leaf):
                    kind = m2.group(1)
                    parts = np.split(np.asarray(w), 3, axis=0)
                    for j, which in enumerate(("q_proj", "k_proj",
                                               "v_proj")):
                        part = parts[j]
                        if kind == "weight":
                            lp.setdefault(which, {})["kernel"] = \
                                jnp.asarray(part.T, jnp.float32)
                        else:
                            lp.setdefault(which, {})["bias"] = \
                                jnp.asarray(part, jnp.float32)
                    return
                ren = {"attn.proj": ("projection_layer", "kernel"),
                       "mlp.fc1": ("fc1", "kernel"),
                       "mlp.fc2": ("fc2", "kernel"),
                       "norm1": ("layernorm_before", "weight"),
                       "norm2": ("layernorm_after", "weight")}
                for hfname, (ours, kkey) in ren.items():
                    if leaf == hfname + ".weight":
                        lp.setdefault(ours, {})[kkey] = jnp.asarray(
                            w.T if kkey == "kernel" else w, jnp.float32)
                        return
                    if leaf == hfname + ".bias":
                        lp.setdefault(ours, {})["bias"] = jnp.asarray(
                            w, jnp.float32)
                        return
                if leaf == "ls1":
                    lp["lambda_1"] = jnp.asarray(w, jnp.float32)
                elif leaf == "ls2":
                    lp["lambda_2"] = jnp.asarray(w, jnp.float32)
                elif leaf == "attn.q_norm.weight":
                    lp["q_norm"] = jnp.asarray(w, jnp.float32)
                elif leaf == "attn.k_norm.weight":
                    lp["k_norm"] = jnp.asarray(w, jnp.float32)
                return
            if rest == "embeddings.class_embedding":
                vision["cls_token"] = jnp.asarray(w, jnp.float32)
            elif rest == "embeddings.patch_embedding.weight":
                vision["patch_embedding"] = jnp.asarray(w, jnp.float32)
            elif rest == "embeddings.patch_embedding.bias":
                vision["patch_bias"] = jnp.asarray(w, jnp.float32)
            elif rest == "embeddings.position_embedding":
                vision["position_embedding"] = jnp.asarray(w, jnp.float32)

        def filter_stream():
            for name, w in weights:
                if name.startswith("vision_model."):
                    _vis_put_orig(name.removeprefix("vision_model."), w)
                    continue
                if m := re.match(r"mlp1\.([013])\.(weight|bias)", name):
                    idx, kind = m.group(1), m.group(2)
                    slot = {"0": "layer_norm", "1": "linear_1",
                            "3": "linear_2"}[idx]
                    node = vision["projector"].setdefault(slot, {})
                    if slot == "layer_norm":
                        node[kind] = jnp.asarray(w, jnp.float32)
                    else:
                        node["kernel" if kind == "weight" else "bias"] = \
                            jnp.asarray(w.T if kind == "weight" else w,
                                        jnp.float32)
                    continue
                name = name.removeprefix("model.")
                if name.startswith("vision_tower."):
                    _vis_put(name.removeprefix("vision_tower."), w)
                elif name.startswith("multi_modal_projector."):
                    leaf = name.removeprefix("multi_modal_projector.")
                    lin, kind = leaf.rsplit(".", 1)
                    node = vision["projector"].setdefault(lin, {})
                    if lin == "layer_norm":
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
