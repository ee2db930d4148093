"""Molmo (AllenAI): CLIP-style ViT (two-layer feature concat) + 2x2
attention pooling + SwiGLU projector + OLMo-style decoder.

Behavioral reference: ``/root/reference/vllm/model_executor/models/
molmo.py`` (no transformers class in this image — trust-remote family):
- ViT (VisionTransformer:325): linear bias-free patch embed over
  flattened 14x14 patches, class token, resizable positional embedding,
  pre_ln, pre-LN blocks with quick-gelu MLP (ViTMLP:139); features are
  the CONCAT of hidden states at VIT_LAYERS [-2, -9] with the class
  token dropped (encode_image:729).
- Pooling (forward:747): features reshaped to the patch grid, each 2x2
  group cross-attended by its mean (MultiHeadDotProductAttention with
  2*D-wide inputs), then the SwiGLU image projector (MulAndSilu order:
  first half x, second half gate) into the text width.
- Decoder (MolmoAttention:407): fused att_proj qkv (optional bias),
  optional FULL-WIDTH q/k RMS norms (attention_layer_norm), swiglu
  ff_proj in [x | gate] order, RMS norms, embedding = concat(wte
  embedding, new_embedding). Mapped onto the unified decoder by
  load-time renames (hf_to_vllm_mapper:1313 documents the layout).
"""

import re
from typing import Any, Dict, Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lvllm_tpu.config import ModelConfig
from lvllm_tpu.models.qwen3 import Qwen3Model
from lvllm_tpu.models.registry import register_model

VIT_LAYERS = (-2, -9)
POOLING_SIZE = 2


def _ln(x, node, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = jnp.square(xf - mu).mean(-1, keepdims=True)
    return (xf - mu) * jax.lax.rsqrt(var + eps) * node["weight"] \
        + node["bias"]


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


@register_model("MolmoForCausalLM")
class MolmoModel(Qwen3Model):

    is_multimodal = True

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        vc = config.vision_config or {}
        self.v_dim = vc.get("image_emb_dim", 1024)
        self.v_heads = vc.get("image_num_heads", 16)
        self.v_kv_heads = vc.get("image_num_key_value_heads", self.v_heads)
        self.v_layers_n = vc.get("image_num_layers", 23)
        self.v_mlp = vc.get("image_mlp_dim", 4096)
        self.v_eps = vc.get("image_norm_eps", 1e-5)
        self.patch_size = vc.get("image_patch_size", 14)
        size = vc.get("image_default_input_size", (336, 336))
        self.image_size = int(size[0] if isinstance(size, (list, tuple))
                              else size)
        self.vit_layers = tuple(vc.get("vit_layers", VIT_LAYERS))

    @property
    def num_image_tokens(self) -> int:
        g = self.image_size // self.patch_size
        return ((g + 1) // POOLING_SIZE) ** 2

    # ---- params -----------------------------------------------------------

    def init_params(self, rng) -> Dict[str, Any]:
        params = super().init_params(rng)
        nprng = np.random.default_rng(795 + self.config.seed)
        D, M = self.v_dim, self.v_mlp
        P = self.patch_size
        g = self.image_size // P
        H = self.config.hidden_size
        inner = self.config.intermediate_size

        def dense(shape, scale=0.02):
            return jnp.asarray(nprng.standard_normal(size=shape) * scale,
                               jnp.float32)

        def ln(n=D):
            return {"weight": jnp.ones((n,), jnp.float32),
                    "bias": jnp.zeros((n,), jnp.float32)}

        layers = []
        for _ in range(self.v_layers_n):
            layers.append({
                "attention_norm": ln(), "ffn_norm": ln(),
                "wq": {"kernel": dense((D, D)),
                       "bias": jnp.zeros((D,), jnp.float32)},
                "wk": {"kernel": dense((D, D)),
                       "bias": jnp.zeros((D,), jnp.float32)},
                "wv": {"kernel": dense((D, D)),
                       "bias": jnp.zeros((D,), jnp.float32)},
                "wo": {"kernel": dense((D, D)),
                       "bias": jnp.zeros((D,), jnp.float32)},
                "w1": {"kernel": dense((D, M)),
                       "bias": jnp.zeros((M,), jnp.float32)},
                "w2": {"kernel": dense((M, D)),
                       "bias": jnp.zeros((D,), jnp.float32)},
            })
        D2 = D * len(self.vit_layers)
        params["vision"] = {
            "patch_embedding": {"kernel": dense((3 * P * P, D))},
            "class_embedding": dense((D,)),
            "positional_embedding": dense((g * g + 1, D)),
            "pre_ln": ln(),
            "layers": layers,
            "pooling": {
                "wq": {"kernel": dense((D2, D)),
                       "bias": jnp.zeros((D,), jnp.float32)},
                "wk": {"kernel": dense((D2, D)),
                       "bias": jnp.zeros((D,), jnp.float32)},
                "wv": {"kernel": dense((D2, D)),
                       "bias": jnp.zeros((D,), jnp.float32)},
                "wo": {"kernel": dense((D, D)),
                       "bias": jnp.zeros((D,), jnp.float32)},
            },
            "projector": {
                "gate": {"kernel": dense((D, inner // 2))},
                "up": {"kernel": dense((D, inner // 2))},
                "down": {"kernel": dense((inner // 2, H))},
            },
        }
        return params

    # ---- vision -----------------------------------------------------------

    def _vit(self, vp, patches: jax.Array) -> list:
        """patches [B, N, 3*P*P] -> list of per-layer hidden states
        [B, N+1, D] (class token first)."""
        B, N, _ = patches.shape
        D = self.v_dim
        h = patches.astype(jnp.float32) @ vp["patch_embedding"]["kernel"]
        cls = jnp.broadcast_to(vp["class_embedding"], (B, 1, D))
        h = jnp.concatenate([cls, h], axis=1)
        pos = vp["positional_embedding"]
        g = int(round((pos.shape[0] - 1) ** 0.5))
        gn = int(round(N ** 0.5))
        grid = pos[1:].reshape(g, g, D)
        if gn != g:
            grid = jax.image.resize(grid, (gn, gn, D), method="bicubic")
        h = h + jnp.concatenate([pos[:1], grid.reshape(-1, D)])[None]
        h = _ln(h, vp["pre_ln"], self.v_eps)

        Hh = self.v_heads
        Dh = D // Hh
        outs = []
        for lp in vp["layers"]:
            hn = _ln(h, lp["attention_norm"], self.v_eps)
            q = (hn @ lp["wq"]["kernel"] + lp["wq"]["bias"]).reshape(
                B, -1, Hh, Dh)
            k = (hn @ lp["wk"]["kernel"] + lp["wk"]["bias"]).reshape(
                B, -1, Hh, Dh)
            v = (hn @ lp["wv"]["kernel"] + lp["wv"]["bias"]).reshape(
                B, -1, Hh, Dh)
            s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (Dh ** -0.5)
            p = jax.nn.softmax(s, axis=-1)
            o = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(B, -1, D)
            h = h + (o @ lp["wo"]["kernel"] + lp["wo"]["bias"])
            hn = _ln(h, lp["ffn_norm"], self.v_eps)
            hn = _quick_gelu(hn @ lp["w1"]["kernel"] + lp["w1"]["bias"])
            h = h + (hn @ lp["w2"]["kernel"] + lp["w2"]["bias"])
            outs.append(h)
        return outs

    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        """[B, 3, S, S] -> [B, num_image_tokens, text_hidden]."""
        vp = params["vision"]
        B, C, S, _ = pixel_values.shape
        P = self.patch_size
        g = S // P
        x = pixel_values.astype(jnp.float32)
        x = x.reshape(B, C, g, P, g, P)
        x = jnp.transpose(x, (0, 2, 4, 1, 3, 5)).reshape(
            B, g * g, C * P * P)
        hiddens = self._vit(vp, x)
        feats = jnp.concatenate([hiddens[i] for i in self.vit_layers],
                                axis=-1)[:, 1:]          # drop class token
        D2 = feats.shape[-1]

        # 2x2 attention pooling: query = mean of each group.
        m = POOLING_SIZE
        gh = g // m
        f = feats.reshape(B, gh, m, gh, m, D2)
        f = jnp.transpose(f, (0, 1, 3, 2, 4, 5)).reshape(
            B * gh * gh, m * m, D2)
        q_in = f.mean(axis=1, keepdims=True)
        pool = vp["pooling"]
        D = self.v_dim
        Hh = self.v_heads
        Dh = D // Hh
        q = (q_in @ pool["wq"]["kernel"] + pool["wq"]["bias"]).reshape(
            -1, 1, Hh, Dh)
        k = (f @ pool["wk"]["kernel"] + pool["wk"]["bias"]).reshape(
            -1, m * m, Hh, Dh)
        v = (f @ pool["wv"]["kernel"] + pool["wv"]["bias"]).reshape(
            -1, m * m, Hh, Dh)
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (Dh ** -0.5)
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(-1, 1, D)
        o = (o @ pool["wo"]["kernel"] + pool["wo"]["bias"]).reshape(
            B, gh * gh, D)

        proj = vp["projector"]
        gate = o @ proj["gate"]["kernel"]
        up = o @ proj["up"]["kernel"]
        h = jax.nn.silu(gate) * up
        return h @ proj["down"]["kernel"]

    # ---- weights ----------------------------------------------------------

    def load_weights(self, weights: Iterable[Tuple[str, np.ndarray]]):
        c = self.config
        vision: Dict[str, Any] = {"layers": [
            {} for _ in range(self.v_layers_n)],
            "pooling": {}, "projector": {}}
        t = lambda a: jnp.asarray(np.ascontiguousarray(a.T), jnp.float32)  # noqa: E731
        v = lambda a: jnp.asarray(a, jnp.float32)  # noqa: E731
        wte: Dict[str, np.ndarray] = {}
        D = c.head_dim
        q_w = c.num_attention_heads * D
        kv_w = c.num_key_value_heads * D
        inner = c.intermediate_size

        def vis_put(rest, w):
            if m := re.match(r"image_vit\.transformer\.resblocks\.(\d+)"
                             r"\.(.+)\.(weight|bias)", rest):
                i, name, kind = int(m.group(1)), m.group(2), m.group(3)
                name = name.replace("attention.", "") \
                    .replace("feed_forward.", "")
                lp = vision["layers"][i]
                if "norm" in name:
                    lp.setdefault(name, {})[kind] = v(w)
                else:
                    lp.setdefault(name, {})[
                        "kernel" if kind == "weight" else "bias"] = \
                        t(w) if kind == "weight" else v(w)
            elif rest == "image_vit.patch_embedding.weight":
                vision["patch_embedding"] = {"kernel": t(w)}
            elif rest == "image_vit.class_embedding":
                vision["class_embedding"] = v(w)
            elif rest == "image_vit.positional_embedding":
                vision["positional_embedding"] = v(w)
            elif rest.startswith("image_vit.pre_ln."):
                vision.setdefault("pre_ln", {})[rest.split(".")[-1]] = v(w)
            elif m := re.match(r"image_pooling_2d\.(w[qkvo])\."
                               r"(weight|bias)", rest):
                vision["pooling"].setdefault(m.group(1), {})[
                    "kernel" if m.group(2) == "weight" else "bias"] = \
                    t(w) if m.group(2) == "weight" else v(w)
            elif m := re.match(r"image_projector\.(w[123])\.weight", rest):
                key = {"w1": "gate", "w3": "up", "w2": "down"}[m.group(1)]
                vision["projector"][key] = {"kernel": t(w)}

        def filter_stream():
            for name, w in weights:
                if name.startswith("model.vision_backbone.") or \
                        name.startswith("vision_backbone."):
                    vis_put(name.split("vision_backbone.", 1)[1], w)
                    continue
                name = name.removeprefix("model.")
                if name.startswith("transformer.wte."):
                    wte[name.split(".")[-1]] = np.asarray(w)
                    continue
                if name.startswith("transformer.ln_f."):
                    yield "model.norm." + name.split(".")[-1], w
                    continue
                if name == "transformer.ff_out.weight":
                    yield "lm_head.weight", w
                    continue
                if m := re.match(r"transformer\.blocks\.(\d+)\.(.+)", name):
                    i, rest = m.group(1), m.group(2)
                    p = f"model.layers.{i}."
                    if m2 := re.match(r"att_proj\.(weight|bias)", rest):
                        kind = m2.group(1)
                        wa = np.asarray(w)
                        qs = wa[:q_w] if kind == "weight" else wa[:q_w]
                        ks = wa[q_w:q_w + kv_w]
                        vs = wa[q_w + kv_w:]
                        yield p + f"self_attn.q_proj.{kind}", qs
                        yield p + f"self_attn.k_proj.{kind}", ks
                        yield p + f"self_attn.v_proj.{kind}", vs
                    elif rest == "attn_out.weight":
                        yield p + "self_attn.o_proj.weight", w
                    elif rest == "q_norm.weight":
                        yield p + "self_attn.q_norm.weight", w
                    elif rest == "k_norm.weight":
                        yield p + "self_attn.k_norm.weight", w
                    elif rest == "attn_norm.weight":
                        yield p + "input_layernorm.weight", w
                    elif rest == "ff_norm.weight":
                        yield p + "post_attention_layernorm.weight", w
                    elif rest == "ff_proj.weight":
                        # MulAndSilu order [x | gate] -> our [gate | up].
                        wa = np.asarray(w)
                        half = inner
                        yield (p + "mlp.gate_proj.weight", wa[half:])
                        yield (p + "mlp.up_proj.weight", wa[:half])
                    elif rest == "ff_out.weight":
                        yield p + "mlp.down_proj.weight", w
                    continue
                yield name, w

        params = super().load_weights(filter_stream())
        if "embedding" in wte:
            emb = wte["embedding"]
            if "new_embedding" in wte:
                emb = np.concatenate([emb, wte["new_embedding"]], axis=0)
            params["embed"]["weight"] = jnp.asarray(emb, self.dtype)
            if c.tie_word_embeddings:
                pass
        params["vision"] = vision
        return params
