"""CLIP / SigLIP dual-encoder embedding models.

Behavioral reference: ``/root/reference/vllm/model_executor/models/
clip.py`` (CLIPEmbeddingModel, LAST pooling + text_projection) and
``siglip.py``; HF numerics reference: transformers ``modeling_clip`` /
``modeling_siglip``.

Text side serves the embeddings path (PoolingRunner, pooling="last",
projection applied post-pool via ``project_pooled``); the image side is
``encode_images`` → projected image features (CLIP: CLS + post-LN +
visual_projection; SigLIP: probe attention-pooling head).
"""

from typing import Any, Dict, Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lvllm_tpu.config import ModelConfig
from lvllm_tpu.models.model_base import AttentionMetadata, Params
from lvllm_tpu.models.registry import register_model


def _ln(x, node, eps):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = jnp.square(xf - mu).mean(-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * node["weight"]
            + node["bias"]).astype(x.dtype)


def _lin(x, node):
    y = x @ node["kernel"]
    if "bias" in node:
        y = y + node["bias"]
    return y


@register_model("CLIPModel")
class CLIPEmbeddingModel:
    """Dual-encoder CLIP: causal text transformer (quick-gelu) with EOS
    (last-token) pooling + text_projection; ViT + visual_projection."""

    is_encoder_only = True
    default_pooling = "last"
    dcp_compatible = False
    causal_text = True
    quick_gelu = True

    def __init__(self, config: ModelConfig):
        self.config = config
        self.mesh = None
        self.dtype = (jnp.bfloat16 if config.dtype == "bfloat16"
                      else jnp.float32)
        self.head_dim = config.head_dim
        self.scale = self.head_dim ** -0.5
        self.eps = config.rms_norm_eps
        vc = config.vision_config or {}
        self.v_hidden = vc.get("hidden_size", 768)
        self.v_intermediate = vc.get("intermediate_size", 3072)
        self.v_layers = vc.get("num_hidden_layers", 12)
        self.v_heads = vc.get("num_attention_heads", 12)
        self.image_size = vc.get("image_size", 224)
        self.patch_size = vc.get("patch_size", 32)
        self.v_eps = vc.get("layer_norm_eps", 1e-5)
        self.projection_dim = vc.get("projection_dim", 512)

    # ---- cache shims -------------------------------------------------------

    def kv_cache_spec(self, layer_idx: int, kv_dtype):
        from lvllm_tpu.core.kv_cache_spec import FullAttentionSpec
        c = self.config
        return FullAttentionSpec(c.num_key_value_heads, c.head_dim,
                                 kv_dtype)

    def kv_cache_specs(self, kv_dtype):
        return [self.kv_cache_spec(i, kv_dtype)
                for i in range(self.config.num_hidden_layers)]

    def make_layer_cache(self, layer_idx, num_blocks, block_size, dtype,
                         max_reqs):
        return self.kv_cache_spec(layer_idx, dtype).make(
            num_blocks, block_size, max_reqs)

    # ---- text encoder ------------------------------------------------------

    def _act(self, x):
        if self.quick_gelu:
            return x * jax.nn.sigmoid(1.702 * x)
        return jax.nn.gelu(x, approximate=True)

    def __call__(self, params, input_ids, positions, kv_caches,
                 attn_metadata: AttentionMetadata, **_):
        """Returns (hidden [T, H], kv_caches untouched)."""
        c = self.config
        md = attn_metadata
        T = input_ids.shape[0]
        x = params["embed"]["weight"][input_ids].astype(self.dtype)
        x = x + params["pos_embed"]["weight"][positions].astype(self.dtype)

        qsl = md.query_start_loc
        R = md.seq_lens.shape[0]
        tok = jnp.arange(T, dtype=jnp.int32)
        req = jnp.clip(jnp.searchsorted(qsl, tok, side="right") - 1,
                       0, R - 1)
        valid = tok < qsl[-1]
        same = (req[:, None] == req[None, :]) & valid[None, :] & \
            valid[:, None]
        if self.causal_text:
            same = same & (tok[None, :] <= tok[:, None])
        same = same | (tok[:, None] == tok[None, :])

        Hq, D = c.num_attention_heads, self.head_dim
        for lp in params["layers"]:
            attn = lp["self_attn"]
            h = _ln(x, lp["layer_norm1"], self.eps)
            q = _lin(h, attn["q_proj"]).reshape(T, Hq, D)
            k = _lin(h, attn["k_proj"]).reshape(T, Hq, D)
            v = _lin(h, attn["v_proj"]).reshape(T, Hq, D)
            scores = jnp.einsum("thd,shd->hts", q.astype(jnp.float32),
                                k.astype(jnp.float32)) * self.scale
            scores = jnp.where(same[None], scores, -jnp.inf)
            probs = jax.nn.softmax(scores, axis=-1)
            out = jnp.einsum("hts,shd->thd", probs,
                             v.astype(jnp.float32)).astype(self.dtype)
            x = x + _lin(out.reshape(T, Hq * D), attn["o_proj"])
            h = _ln(x, lp["layer_norm2"], self.eps)
            x = x + _lin(self._act(_lin(h, lp["fc1"])), lp["fc2"])
        x = _ln(x, params["final_layer_norm"], self.eps)
        return x, kv_caches

    def project_pooled(self, params, emb):
        """Post-pool projection (PoolingRunner hook): CLIP
        text_projection / SigLIP text head."""
        return _lin(emb.astype(self.dtype), params["text_projection"])

    # ---- image encoder -----------------------------------------------------

    def _vision_tower(self, params, pixel_values):
        vp = params["vision"]
        B, C, S, _ = pixel_values.shape
        P = self.patch_size
        g = S // P
        D = self.v_hidden
        x = np.asarray(pixel_values, np.float32).reshape(
            B, C, g, P, g, P)
        x = np.transpose(x, (0, 2, 4, 1, 3, 5)).reshape(B, g * g,
                                                        C * P * P)
        w = np.asarray(vp["patch_conv"]["kernel"], np.float32)
        h = x @ w.reshape(D, -1).T
        if "bias" in vp["patch_conv"]:
            h = h + np.asarray(vp["patch_conv"]["bias"])
        h = jnp.asarray(h)
        if "class_embedding" in vp:
            cls = jnp.broadcast_to(vp["class_embedding"], (B, 1, D))
            h = jnp.concatenate([cls, h], axis=1)
        h = h + vp["position_embedding"][None, :h.shape[1]]
        if "pre_layernorm" in vp:
            h = _ln(h, vp["pre_layernorm"], self.v_eps)
        Hh = self.v_heads
        Dh = D // Hh
        for lp in vp["layers"]:
            hn = _ln(h, lp["layer_norm1"], self.v_eps)
            q = _lin(hn, lp["q_proj"]).reshape(B, -1, Hh, Dh)
            k = _lin(hn, lp["k_proj"]).reshape(B, -1, Hh, Dh)
            v = _lin(hn, lp["v_proj"]).reshape(B, -1, Hh, Dh)
            s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (Dh ** -0.5)
            p = jax.nn.softmax(s, axis=-1)
            o = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(B, -1, D)
            h = h + _lin(o, lp["out_proj"])
            hn = _ln(h, lp["layer_norm2"], self.v_eps)
            h = h + _lin(self._act(_lin(hn, lp["fc1"])), lp["fc2"])
        return h

    def encode_images(self, params, pixel_values) -> jax.Array:
        """[B, 3, S, S] -> projected image features [B, proj_dim]."""
        vp = params["vision"]
        h = self._vision_tower(params, pixel_values)
        pooled = _ln(h[:, 0], vp["post_layernorm"], self.v_eps)
        return _lin(pooled, params["visual_projection"])

    # ---- params ------------------------------------------------------------

    def init_params(self, rng) -> Params:
        c = self.config
        seed = rng if isinstance(rng, int) else 0
        nprng = np.random.default_rng(837 + seed)

        def dense(shape, scale=0.02):
            return jnp.asarray(nprng.standard_normal(size=shape) * scale,
                               self.dtype)

        def ln(n):
            return {"weight": jnp.ones((n,), self.dtype),
                    "bias": jnp.zeros((n,), self.dtype)}

        def lin(i, o, bias=True):
            node = {"kernel": dense((i, o))}
            if bias:
                node["bias"] = jnp.zeros((o,), self.dtype)
            return node

        H = c.hidden_size
        D = self.head_dim
        P = self.projection_dim
        params: Params = {
            "embed": {"weight": dense((c.vocab_size, H))},
            "pos_embed": {"weight": dense(
                (c.max_position_embeddings, H))},
            "final_layer_norm": ln(H),
            "text_projection": lin(H, P, bias=self.text_head_bias),
        }
        params["layers"] = [{
            "layer_norm1": ln(H), "layer_norm2": ln(H),
            "self_attn": {
                "q_proj": lin(H, c.num_attention_heads * D),
                "k_proj": lin(H, c.num_attention_heads * D),
                "v_proj": lin(H, c.num_attention_heads * D),
                "o_proj": lin(c.num_attention_heads * D, H)},
            "fc1": lin(H, c.intermediate_size),
            "fc2": lin(c.intermediate_size, H),
        } for _ in range(c.num_hidden_layers)]
        Dv = self.v_hidden
        g = self.image_size // self.patch_size
        n_pos = g * g + (1 if self.vision_cls else 0)
        vision: Dict[str, Any] = {
            "patch_conv": {"kernel": dense(
                (Dv, 3, self.patch_size, self.patch_size))},
            "position_embedding": dense((n_pos, Dv)),
            "post_layernorm": ln(Dv),
            "layers": [{
                "layer_norm1": ln(Dv), "layer_norm2": ln(Dv),
                "q_proj": lin(Dv, Dv), "k_proj": lin(Dv, Dv),
                "v_proj": lin(Dv, Dv), "out_proj": lin(Dv, Dv),
                "fc1": lin(Dv, self.v_intermediate),
                "fc2": lin(self.v_intermediate, Dv),
            } for _ in range(self.v_layers)],
        }
        if self.vision_cls:
            vision["class_embedding"] = dense((Dv,))
            vision["pre_layernorm"] = ln(Dv)
        else:
            vision["patch_conv"]["bias"] = jnp.zeros((Dv,), self.dtype)
        params["vision"] = vision
        params["visual_projection"] = lin(Dv, P,
                                          bias=self.text_head_bias)
        self._init_extra(params, dense, ln, lin)
        return params

    vision_cls = True
    text_head_bias = False

    def _init_extra(self, params, dense, ln, lin):
        pass

    # ---- weights -----------------------------------------------------------

    def load_weights(self, weights: Iterable[Tuple[str, np.ndarray]]
                     ) -> Params:
        import re
        c = self.config
        params: Params = {"layers": [{"self_attn": {}}
                                     for _ in range(c.num_hidden_layers)],
                          "vision": {"layers": [
                              {} for _ in range(self.v_layers)]}}
        t = lambda a: jnp.asarray(np.ascontiguousarray(np.asarray(a).T),  # noqa: E731
                                  self.dtype)
        v = lambda a: jnp.asarray(a, self.dtype)  # noqa: E731

        def lin_put(node, key, kind, w):
            node.setdefault(key, {})[
                "kernel" if kind == "weight" else "bias"] = \
                t(w) if kind == "weight" else v(w)

        def layer_put(lp, leaf, w, attn_key="self_attn",
                      out_name="out_proj"):
            if m := re.match(r"(layer_norm1|layer_norm2)\.(weight|bias)",
                             leaf):
                lp.setdefault(m.group(1), {})[m.group(2)] = v(w)
            elif m := re.match(r"self_attn\.(q_proj|k_proj|v_proj)\."
                               r"(weight|bias)", leaf):
                node = lp.setdefault(attn_key, {}) if attn_key else lp
                lin_put(node, m.group(1), m.group(2), w)
            elif m := re.match(r"self_attn\.out_proj\.(weight|bias)",
                               leaf):
                node = lp.setdefault(attn_key, {}) if attn_key else lp
                lin_put(node, out_name, m.group(1), w)
            elif m := re.match(r"mlp\.(fc1|fc2)\.(weight|bias)", leaf):
                lin_put(lp, m.group(1), m.group(2), w)

        for name, w in weights:
            name = name.removeprefix("model.")
            if name.startswith("text_model."):
                rest = name.removeprefix("text_model.")
                if rest == "embeddings.token_embedding.weight":
                    params["embed"] = {"weight": v(w)}
                elif rest == "embeddings.position_embedding.weight":
                    params["pos_embed"] = {"weight": v(w)}
                elif m := re.match(r"final_layer_norm\.(weight|bias)",
                                   rest):
                    params.setdefault("final_layer_norm", {})[
                        m.group(1)] = v(w)
                elif m := re.match(r"head\.(weight|bias)", rest):
                    # SigLIP text head (acts as the text projection).
                    lin_put(params, "text_projection", m.group(1), w)
                elif m := re.match(r"encoder\.layers\.(\d+)\.(.+)", rest):
                    layer_put(params["layers"][int(m.group(1))],
                              m.group(2), w, attn_key="self_attn",
                              out_name="o_proj")
            elif name.startswith("vision_model."):
                rest = name.removeprefix("vision_model.")
                vp = params["vision"]
                if rest == "embeddings.patch_embedding.weight":
                    vp.setdefault("patch_conv", {})["kernel"] = v(w)
                elif rest == "embeddings.patch_embedding.bias":
                    vp.setdefault("patch_conv", {})["bias"] = v(w)
                elif rest == "embeddings.class_embedding":
                    vp["class_embedding"] = v(
                        np.asarray(w).reshape(-1))
                elif rest == "embeddings.position_embedding.weight":
                    vp["position_embedding"] = v(w)
                elif m := re.match(r"(pre_layrnorm|pre_layernorm)\."
                                   r"(weight|bias)", rest):
                    vp.setdefault("pre_layernorm", {})[m.group(2)] = v(w)
                elif m := re.match(r"post_layernorm\.(weight|bias)",
                                   rest):
                    vp.setdefault("post_layernorm", {})[m.group(1)] = v(w)
                elif m := re.match(r"encoder\.layers\.(\d+)\.(.+)", rest):
                    layer_put(vp["layers"][int(m.group(1))],
                              m.group(2), w, attn_key=None)
                elif rest.startswith("head."):
                    self._load_vision_head(
                        vp, rest.removeprefix("head."), w, t, v)
            elif m := re.match(r"(text_projection|visual_projection)\."
                               r"(weight|bias)", name):
                lin_put(params, m.group(1), m.group(2), w)
        return params

    def _load_vision_head(self, vp, rest, w, t, v):
        pass


@register_model("SiglipModel")
class SiglipEmbeddingModel(CLIPEmbeddingModel):
    """SigLIP: non-causal text tower with a biased head projection;
    vision pooled by a probe attention-pooling head + MLP."""

    causal_text = False
    quick_gelu = False
    vision_cls = False
    text_head_bias = True

    def _init_extra(self, params, dense, ln, lin):
        Dv = self.v_hidden
        params["vision"]["head"] = {
            "probe": dense((Dv,)),
            "in_proj": lin(Dv, 3 * Dv),
            "out_proj": lin(Dv, Dv),
            "layernorm": ln(Dv),
            "fc1": lin(Dv, self.v_intermediate),
            "fc2": lin(self.v_intermediate, Dv)}
        # SigLIP has no separate visual_projection — pooled head output
        # IS the image feature.
        params["visual_projection"] = {
            "kernel": jnp.eye(Dv, dtype=self.dtype)}
        # Text head [H, H] (projection_size defaults to hidden).
        params["text_projection"] = lin(self.config.hidden_size,
                                        self.config.hidden_size)

    def _load_vision_head(self, vp, rest, w, t, v):
        import re
        node = vp.setdefault("head", {})
        if rest == "probe":
            node["probe"] = v(np.asarray(w).reshape(-1))
        elif rest == "attention.in_proj_weight":
            node.setdefault("in_proj", {})["kernel"] = t(w)
        elif rest == "attention.in_proj_bias":
            node.setdefault("in_proj", {})["bias"] = v(w)
        elif m := re.match(r"attention\.out_proj\.(weight|bias)", rest):
            node.setdefault("out_proj", {})[
                "kernel" if m.group(1) == "weight" else "bias"] = \
                t(w) if m.group(1) == "weight" else v(w)
        elif m := re.match(r"layernorm\.(weight|bias)", rest):
            node.setdefault("layernorm", {})[m.group(1)] = v(w)
        elif m := re.match(r"mlp\.(fc1|fc2)\.(weight|bias)", rest):
            node.setdefault(m.group(1), {})[
                "kernel" if m.group(2) == "weight" else "bias"] = \
                t(w) if m.group(2) == "weight" else v(w)

    def load_weights(self, weights):
        params = super().load_weights(weights)
        # SigLIP: identity visual projection (head output is the
        # feature); keep explicit for the shared encode path.
        if "visual_projection" not in params:
            params["visual_projection"] = {
                "kernel": jnp.eye(self.v_hidden, dtype=self.dtype)}
        return params

    def encode_images(self, params, pixel_values) -> jax.Array:
        vp = params["vision"]
        h = self._vision_tower(params, pixel_values)   # [B, N, D]
        h = _ln(h, vp["post_layernorm"], self.v_eps)
        head = vp["head"]
        B = h.shape[0]
        D = self.v_hidden
        Hh = self.v_heads
        Dh = D // Hh
        probe = jnp.broadcast_to(head["probe"], (B, 1, D))
        # torch.nn.MultiheadAttention: fused in_proj [3D, D] over
        # (query=probe, key=value=h).
        wq, wk, wv = jnp.split(head["in_proj"]["kernel"], 3, axis=1)
        bq, bk, bv = jnp.split(head["in_proj"]["bias"], 3)
        q = (probe @ wq + bq).reshape(B, 1, Hh, Dh)
        k = (h @ wk + bk).reshape(B, -1, Hh, Dh)
        v = (h @ wv + bv).reshape(B, -1, Hh, Dh)
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (Dh ** -0.5)
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(B, 1, D)
        o = _lin(o, head["out_proj"])
        r = o
        o = _ln(o, head["layernorm"], self.v_eps)
        o = r + _lin(jax.nn.gelu(_lin(o, head["fc1"]),
                                 approximate=True), head["fc2"])
        return o[:, 0]
