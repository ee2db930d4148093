"""Ovis2 (Alibaba AIDC): AIMv2-style ViT + probabilistic visual
tokenizer + visual embedding table + Qwen2 decoder.

Behavioral reference: ``/root/reference/vllm/model_executor/models/
ovis.py`` / HF ``modeling_ovis2.py``: the tower (conv patch embed →
RMSNorm → learned positions → pre-RMSNorm blocks with SwiGLU MLPs →
final RMSNorm) feeds a 2x2 ``hidden_stride`` merge, a bias-free
``head_linear`` + LayerNorm producing logits over a VISUAL VOCABULARY,
softmaxed into token probabilities (``tokenize_function``), zero-padded
for the indicator ids, and matmul'd with ``visual_embeddings_table`` —
a soft-VQ embedding lookup (Ovis2VisualEmbeddingTable:410).
"""

import re
from typing import Any, Dict, Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lvllm_tpu.config import ModelConfig
from lvllm_tpu.layers.common import rms_norm
from lvllm_tpu.models.qwen3 import Qwen3Model
from lvllm_tpu.models.registry import register_model


def _ln(x, node, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = jnp.square(xf - mu).mean(-1, keepdims=True)
    return (xf - mu) * jax.lax.rsqrt(var + eps) * node["weight"] \
        + node["bias"]


@register_model("Ovis2ForConditionalGeneration")
@register_model("Ovis")
@register_model("Ovis2")
class Ovis2Model(Qwen3Model):

    is_multimodal = True

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        vc = config.vision_config or {}
        self.v_hidden = vc.get("hidden_size", 1152)
        self.v_intermediate = vc.get("intermediate_size", 4304)
        self.v_layers = vc.get("num_hidden_layers", 24)
        self.v_heads = vc.get("num_attention_heads", 16)
        self.image_size = vc.get("image_size", 448)
        self.patch_size = vc.get("patch_size", 14)
        self.v_eps = vc.get("rms_norm_eps", 1e-5)
        self.v_qkv_bias = vc.get("qkv_bias", False)
        self.hidden_stride = vc.get("hidden_stride", 2)
        self.visual_vocab = vc.get("vocab_size", 65536)
        self.num_indicator = vc.get("num_visual_indicator_tokens", 5)

    @property
    def num_image_tokens(self) -> int:
        g = self.image_size // self.patch_size
        hs = self.hidden_stride
        return ((g + hs - 1) // hs) ** 2

    def init_params(self, rng) -> Dict[str, Any]:
        params = super().init_params(rng)
        nprng = np.random.default_rng(799 + self.config.seed)
        D, I = self.v_hidden, self.v_intermediate
        P = self.patch_size
        g = self.image_size // P
        hs = self.hidden_stride
        vv = self.visual_vocab
        H = self.config.hidden_size

        def dense(shape, scale=0.02):
            return jnp.asarray(nprng.standard_normal(size=shape) * scale,
                               jnp.float32)

        def rn():
            return {"weight": jnp.ones((D,), jnp.float32)}

        def lin(i, o, bias=True):
            node = {"kernel": dense((i, o))}
            if bias:
                node["bias"] = jnp.zeros((o,), jnp.float32)
            return node

        layers = []
        for _ in range(self.v_layers):
            layers.append({
                "rms_norm1": rn(), "rms_norm2": rn(),
                "q_proj": lin(D, D, self.v_qkv_bias),
                "k_proj": lin(D, D, self.v_qkv_bias),
                "v_proj": lin(D, D, self.v_qkv_bias),
                "out_proj": lin(D, D, self.v_qkv_bias),
                "gate_proj": lin(D, I, False),
                "up_proj": lin(D, I, False),
                "down_proj": lin(I, D, False),
            })
        head_out = vv - self.num_indicator
        params["vision"] = {
            "patch_conv": {"kernel": dense((D, 3, P, P)),
                           "bias": jnp.zeros((D,), jnp.float32)},
            "embed_norm": rn(),
            "position_embedding": dense((g * g, D)),
            "layers": layers,
            "final_norm": rn(),
            "head_linear": {"kernel": dense((hs * hs * D, head_out))},
            "head_norm": {"weight": jnp.ones((head_out,), jnp.float32),
                          "bias": jnp.zeros((head_out,), jnp.float32)},
            "vte": dense((vv, H)),
        }
        return params

    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        vp = params["vision"]
        B, C, S, _ = pixel_values.shape
        P = self.patch_size
        g = S // P
        D = self.v_hidden
        x = pixel_values.astype(jnp.float32)
        x = x.reshape(B, C, g, P, g, P)
        x = jnp.transpose(x, (0, 2, 4, 1, 3, 5)).reshape(
            B, g * g, C * P * P)
        w = vp["patch_conv"]["kernel"].reshape(D, -1).T
        h = x @ w + vp["patch_conv"]["bias"]
        h = rms_norm(h, vp["embed_norm"]["weight"], self.v_eps)
        h = h + vp["position_embedding"][None]

        Hh = self.v_heads
        Dh = D // Hh
        for lp in vp["layers"]:
            hn = rms_norm(h, lp["rms_norm1"]["weight"], self.v_eps)

            def proj(node, t):
                y = t @ node["kernel"]
                if "bias" in node:
                    y = y + node["bias"]
                return y
            q = proj(lp["q_proj"], hn).reshape(B, -1, Hh, Dh)
            k = proj(lp["k_proj"], hn).reshape(B, -1, Hh, Dh)
            v = proj(lp["v_proj"], hn).reshape(B, -1, Hh, Dh)
            s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (Dh ** -0.5)
            p = jax.nn.softmax(s, axis=-1)
            o = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(B, -1, D)
            h = h + proj(lp["out_proj"], o)
            hn = rms_norm(h, lp["rms_norm2"]["weight"], self.v_eps)
            gate = hn @ lp["gate_proj"]["kernel"]
            up = hn @ lp["up_proj"]["kernel"]
            h = h + (jax.nn.silu(gate) * up) @ lp["down_proj"]["kernel"]
        h = rms_norm(h, vp["final_norm"]["weight"], self.v_eps)

        hs = self.hidden_stride
        nh = g // hs
        h = h.reshape(B, nh, hs, nh, hs, D)
        h = jnp.transpose(h, (0, 1, 3, 2, 4, 5)).reshape(
            B, nh * nh, hs * hs * D)
        logits = h @ vp["head_linear"]["kernel"]
        logits = _ln(logits, vp["head_norm"])
        probs = jax.nn.softmax(logits, axis=-1)    # tokenize "softmax"
        probs = jnp.concatenate(
            [probs, jnp.zeros(probs.shape[:-1] + (self.num_indicator,),
                              probs.dtype)], axis=-1)
        return probs @ vp["vte"]

    def load_weights(self, weights: Iterable[Tuple[str, np.ndarray]]):
        vision: Dict[str, Any] = {"layers": [
            {} for _ in range(self.v_layers)]}
        t = lambda a: jnp.asarray(np.ascontiguousarray(a.T), jnp.float32)  # noqa: E731
        v = lambda a: jnp.asarray(a, jnp.float32)  # noqa: E731

        def vis_put(rest, w):
            rest = rest.removeprefix("transformer.")
            if rest == "embeddings.patch_embedding.weight":
                vision.setdefault("patch_conv", {})["kernel"] = v(w)
            elif rest == "embeddings.patch_embedding.bias":
                vision.setdefault("patch_conv", {})["bias"] = v(w)
            elif rest == "embeddings.rms_norm.weight":
                vision["embed_norm"] = {"weight": v(w)}
            elif rest == "embeddings.position_embedding.weight":
                vision["position_embedding"] = v(w)
            elif rest == "rms_norm.weight":
                vision["final_norm"] = {"weight": v(w)}
            elif rest == "head_linear.weight":
                vision["head_linear"] = {"kernel": t(w)}
            elif m := re.match(r"head_norm\.(weight|bias)", rest):
                vision.setdefault("head_norm", {})[m.group(1)] = v(w)
            elif m := re.match(r"encoder\.layers\.(\d+)\.(.+)\."
                               r"(weight|bias)", rest):
                i, name, kind = int(m.group(1)), m.group(2), m.group(3)
                name = name.replace("attention.", "").replace("ffn.", "")
                lp = vision["layers"][i]
                if "norm" in name:
                    lp.setdefault(name, {})[kind] = v(w)
                else:
                    lp.setdefault(name, {})[
                        "kernel" if kind == "weight" else "bias"] = \
                        t(w) if kind == "weight" else v(w)

        def filter_stream():
            for name, w in weights:
                name = name.removeprefix("model.")
                if name.startswith("vision_tower."):
                    vis_put(name.removeprefix("vision_tower."), w)
                elif name == "visual_embeddings_table.weight":
                    vision["vte"] = v(w)
                elif name.startswith("language_model."):
                    yield name.removeprefix("language_model."), w
                else:
                    yield name, w

        params = super().load_weights(filter_stream())
        params["vision"] = vision
        return params
