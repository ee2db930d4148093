"""BLIP-2: EVA-style ViT + Q-Former (learned queries with interleaved
cross-attention) + language projection + OPT decoder.

Behavioral reference: ``/root/reference/vllm/model_executor/models/
blip2.py`` / HF ``modeling_blip_2.py``:
- vision (Blip2VisionEmbeddings:168, Blip2Attention:266): conv patch
  embed + class token + position params, pre-LN blocks whose fused qkv
  has NO weight bias but learned q/v biases (k zero), gelu MLP, final
  post_layernorm;
- Q-Former (Blip2QFormerLayer:747): ``num_query_tokens`` learned
  queries, BERT-style self-attention (dense + LayerNorm-residual
  SelfOutput), cross-attention over the image states every
  ``cross_attention_frequency`` layers, gelu FFN via the *_query
  branch; input LayerNorm on the query embeds;
- ``language_projection`` into the text width; OPT text stack.
"""

import re
from typing import Any, Dict, Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lvllm_tpu.config import ModelConfig
from lvllm_tpu.models.qwen3 import Qwen3Model
from lvllm_tpu.models.registry import register_model


def _ln(x, node, eps=1e-12):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = jnp.square(xf - mu).mean(-1, keepdims=True)
    return (xf - mu) * jax.lax.rsqrt(var + eps) * node["weight"] \
        + node["bias"]


def qformer_forward(qlayers, hq, enc, heads, eps):
    """BLIP-2 Q-Former stack (shared with GraniteSpeech's projector):
    BERT-style post-norm self-attention every layer, cross-attention to
    ``enc`` on layers carrying a "cross" node, gelu query FFN."""
    B = hq.shape[0]
    hd = hq.shape[-1] // heads

    def mha(att, x_q, x_kv):
        q = (x_q @ att["query"]["kernel"] + att["query"]["bias"]
             ).reshape(B, -1, heads, hd)
        k = (x_kv @ att["key"]["kernel"] + att["key"]["bias"]
             ).reshape(B, -1, heads, hd)
        v = (x_kv @ att["value"]["kernel"] + att["value"]["bias"]
             ).reshape(B, -1, heads, hd)
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (hd ** -0.5)
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(
            B, -1, heads * hd)
        o = o @ att["out"]["kernel"] + att["out"]["bias"]
        return _ln(o + x_q, att["out_ln"], eps)

    for lp in qlayers:
        hq = mha(lp["att"], hq, hq)
        if "cross" in lp:
            hq = mha(lp["cross"], hq, enc)
        inter = jax.nn.gelu(
            hq @ lp["intermediate_query"]["kernel"]
            + lp["intermediate_query"]["bias"], approximate=False)
        out = inter @ lp["output_query"]["kernel"] \
            + lp["output_query"]["bias"]
        hq = _ln(out + hq, lp["output_query_ln"], eps)
    return hq


def route_qformer_weight(dest, rest, w, t, v):
    """Map a HF Blip2QFormerModel checkpoint leaf (``layernorm.*`` /
    ``encoder.layer.N.*``) into dest ({"q_layernorm", "qlayers"})."""
    if m := re.match(r"layernorm\.(weight|bias)", rest):
        dest.setdefault("q_layernorm", {})[m.group(1)] = v(w)
    elif m := re.match(r"encoder\.layer\.(\d+)\.(.+)", rest):
        i, leaf = int(m.group(1)), m.group(2)
        lp = dest["qlayers"][i]
        for pref, key in (("attention.", "att"),
                          ("crossattention.", "cross")):
            if leaf.startswith(pref):
                node = lp.setdefault(key, {})
                sub = leaf.removeprefix(pref)
                if m2 := re.match(r"attention\.(query|key|value)\."
                                  r"(weight|bias)", sub):
                    node.setdefault(m2.group(1), {})[
                        "kernel" if m2.group(2) == "weight" else
                        "bias"] = t(w) if m2.group(2) == "weight" \
                        else v(w)
                elif m2 := re.match(r"output\.dense\.(weight|bias)",
                                    sub):
                    node.setdefault("out", {})[
                        "kernel" if m2.group(1) == "weight" else
                        "bias"] = t(w) if m2.group(1) == "weight" \
                        else v(w)
                elif m2 := re.match(r"output\.LayerNorm\.(weight|bias)",
                                    sub):
                    node.setdefault("out_ln", {})[m2.group(1)] = v(w)
                return
        if m2 := re.match(r"intermediate_query\.dense\.(weight|bias)",
                          leaf):
            lp.setdefault("intermediate_query", {})[
                "kernel" if m2.group(1) == "weight" else "bias"] = \
                t(w) if m2.group(1) == "weight" else v(w)
        elif m2 := re.match(r"output_query\.dense\.(weight|bias)", leaf):
            lp.setdefault("output_query", {})[
                "kernel" if m2.group(1) == "weight" else "bias"] = \
                t(w) if m2.group(1) == "weight" else v(w)
        elif m2 := re.match(r"output_query\.LayerNorm\.(weight|bias)",
                            leaf):
            lp.setdefault("output_query_ln", {})[m2.group(1)] = v(w)


@register_model("Blip2ForConditionalGeneration")
class Blip2Model(Qwen3Model):

    is_multimodal = True

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        vc = config.vision_config or {}
        self.v_hidden = vc.get("hidden_size", 1408)
        self.v_intermediate = vc.get("intermediate_size", 6144)
        self.v_layers = vc.get("num_hidden_layers", 39)
        self.v_heads = vc.get("num_attention_heads", 16)
        self.image_size = vc.get("image_size", 224)
        self.patch_size = vc.get("patch_size", 14)
        self.v_eps = vc.get("layer_norm_eps", 1e-6)
        qf = vc.get("qformer") or {}
        self.q_hidden = qf.get("hidden_size", 768)
        self.q_intermediate = qf.get("intermediate_size", 3072)
        self.q_layers = qf.get("num_hidden_layers", 12)
        self.q_heads = qf.get("num_attention_heads", 12)
        self.q_eps = qf.get("layer_norm_eps", 1e-12)
        self.cross_freq = qf.get("cross_attention_frequency", 2)
        self.num_query_tokens = vc.get("num_query_tokens", 32)

    @property
    def num_image_tokens(self) -> int:
        return self.num_query_tokens

    def init_params(self, rng) -> Dict[str, Any]:
        params = super().init_params(rng)
        nprng = np.random.default_rng(803 + self.config.seed)
        D, I = self.v_hidden, self.v_intermediate
        Dq, Iq = self.q_hidden, self.q_intermediate
        P = self.patch_size
        g = self.image_size // P
        H = self.config.hidden_size

        def dense(shape, scale=0.02):
            return jnp.asarray(nprng.standard_normal(size=shape) * scale,
                               jnp.float32)

        def ln(n):
            return {"weight": jnp.ones((n,), jnp.float32),
                    "bias": jnp.zeros((n,), jnp.float32)}

        def lin(i, o):
            return {"kernel": dense((i, o)),
                    "bias": jnp.zeros((o,), jnp.float32)}

        vlayers = []
        for _ in range(self.v_layers):
            vlayers.append({
                "layer_norm1": ln(D), "layer_norm2": ln(D),
                "qkv": {"kernel": dense((D, 3 * D)),
                        "bias": jnp.zeros((3 * D,), jnp.float32)},
                "projection": lin(D, D),
                "fc1": lin(D, I), "fc2": lin(I, D),
            })
        qlayers = []
        for i in range(self.q_layers):
            layer = {
                "att": {"query": lin(Dq, Dq), "key": lin(Dq, Dq),
                        "value": lin(Dq, Dq), "out": lin(Dq, Dq),
                        "out_ln": ln(Dq)},
                "intermediate_query": lin(Dq, Iq),
                "output_query": lin(Iq, Dq),
                "output_query_ln": ln(Dq),
            }
            if i % self.cross_freq == 0:
                layer["cross"] = {"query": lin(Dq, Dq),
                                  "key": lin(D, Dq), "value": lin(D, Dq),
                                  "out": lin(Dq, Dq), "out_ln": ln(Dq)}
            qlayers.append(layer)
        params["vision"] = {
            "patch_conv": {"kernel": dense((D, 3, P, P)),
                           "bias": jnp.zeros((D,), jnp.float32)},
            "class_embedding": dense((D,)),
            "position_embedding": dense((g * g + 1, D)),
            "layers": vlayers,
            "post_layernorm": ln(D),
            "query_tokens": dense((self.num_query_tokens, Dq)),
            "q_layernorm": ln(Dq),
            "qlayers": qlayers,
            "language_projection": lin(Dq, H),
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
        cls = jnp.broadcast_to(vp["class_embedding"], (B, 1, D))
        h = jnp.concatenate([cls, h], axis=1)
        h = h + vp["position_embedding"][None]

        Hh = self.v_heads
        Dh = D // Hh
        for lp in vp["layers"]:
            hn = _ln(h, lp["layer_norm1"], self.v_eps)
            qkv = hn @ lp["qkv"]["kernel"]
            q, k, v = jnp.split(qkv, 3, axis=-1)
            if "bias" in lp["qkv"]:
                # Modern HF materializes [q_bias | 0 | v_bias] into a
                # plain qkv bias; legacy checkpoints ship the halves.
                bq, _, bv = jnp.split(lp["qkv"]["bias"], 3)
                q = q + bq
                v = v + bv
            else:
                q = q + lp["qkv"]["q_bias"]
                v = v + lp["qkv"]["v_bias"]
            q = q.reshape(B, -1, Hh, Dh)
            k = k.reshape(B, -1, Hh, Dh)
            v = v.reshape(B, -1, Hh, Dh)
            s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (Dh ** -0.5)
            p = jax.nn.softmax(s, axis=-1)
            o = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(B, -1, D)
            h = h + (o @ lp["projection"]["kernel"]
                     + lp["projection"]["bias"])
            hn = _ln(h, lp["layer_norm2"], self.v_eps)
            hn = jax.nn.gelu(hn @ lp["fc1"]["kernel"] + lp["fc1"]["bias"],
                             approximate=False)
            h = h + (hn @ lp["fc2"]["kernel"] + lp["fc2"]["bias"])
        img = _ln(h, vp["post_layernorm"], self.v_eps)   # [B, N+1, D]

        # ---- Q-Former --------------------------------------------------
        Dq = self.q_hidden
        Qh = self.q_heads
        Qd = Dq // Qh
        q_emb = jnp.broadcast_to(vp["query_tokens"][None],
                                 (B, self.num_query_tokens, Dq))
        hq = _ln(q_emb, vp["q_layernorm"], self.q_eps)
        hq = qformer_forward(vp["qlayers"], hq, img, Qh, self.q_eps)
        return hq @ vp["language_projection"]["kernel"] \
            + vp["language_projection"]["bias"]

    def load_weights(self, weights: Iterable[Tuple[str, np.ndarray]]):
        vision: Dict[str, Any] = {
            "layers": [{} for _ in range(self.v_layers)],
            "qlayers": [{} for _ in range(self.q_layers)]}
        t = lambda a: jnp.asarray(np.ascontiguousarray(a.T), jnp.float32)  # noqa: E731
        v = lambda a: jnp.asarray(a, jnp.float32)  # noqa: E731

        def lin_put(node, kind, w):
            node["kernel" if kind == "weight" else "bias"] = \
                t(w) if kind == "weight" else v(w)

        def vis_put(rest, w):
            if rest == "embeddings.patch_embedding.weight":
                vision.setdefault("patch_conv", {})["kernel"] = v(w)
            elif rest == "embeddings.patch_embedding.bias":
                vision.setdefault("patch_conv", {})["bias"] = v(w)
            elif rest == "embeddings.class_embedding":
                vision["class_embedding"] = v(np.asarray(w).reshape(-1))
            elif rest == "embeddings.position_embedding":
                vision["position_embedding"] = v(
                    np.asarray(w).reshape(np.asarray(w).shape[-2:]))
            elif m := re.match(r"post_layernorm\.(weight|bias)", rest):
                vision.setdefault("post_layernorm", {})[m.group(1)] = v(w)
            elif m := re.match(r"encoder\.layers\.(\d+)\.(.+)", rest):
                i, leaf = int(m.group(1)), m.group(2)
                lp = vision["layers"][i]
                if m2 := re.match(r"(layer_norm1|layer_norm2)\."
                                  r"(weight|bias)", leaf):
                    lp.setdefault(m2.group(1), {})[m2.group(2)] = v(w)
                elif leaf == "self_attn.qkv.weight":
                    lp.setdefault("qkv", {})["kernel"] = t(w)
                elif leaf == "self_attn.qkv.bias":
                    lp.setdefault("qkv", {})["bias"] = v(w)
                elif leaf == "self_attn.q_bias":
                    lp.setdefault("qkv", {})["q_bias"] = v(w)
                elif leaf == "self_attn.v_bias":
                    lp.setdefault("qkv", {})["v_bias"] = v(w)
                elif m2 := re.match(r"self_attn\.projection\."
                                    r"(weight|bias)", leaf):
                    lin_put(lp.setdefault("projection", {}),
                            m2.group(1), w)
                elif m2 := re.match(r"mlp\.(fc1|fc2)\.(weight|bias)",
                                    leaf):
                    lin_put(lp.setdefault(m2.group(1), {}),
                            m2.group(2), w)

        def qf_put(rest, w):
            route_qformer_weight(vision, rest, w, t, v)

        def filter_stream():
            for name, w in weights:
                name = name.removeprefix("model.")
                if name.startswith("vision_model."):
                    vis_put(name.removeprefix("vision_model."), w)
                elif name.startswith("qformer."):
                    qf_put(name.removeprefix("qformer."), w)
                elif name == "query_tokens":
                    vision["query_tokens"] = v(
                        np.asarray(w).reshape(np.asarray(w).shape[-2:]))
                elif m := re.match(r"language_projection\.(weight|bias)",
                                   name):
                    lin_put(vision.setdefault("language_projection", {}),
                            m.group(1), w)
                elif name.startswith("language_model."):
                    yield name.removeprefix("language_model."), w
                else:
                    yield name, w

        params = super().load_weights(filter_stream())
        params["vision"] = vision
        return params
