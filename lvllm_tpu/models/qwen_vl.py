"""Original Qwen-VL: openclip-style ViT tower + Resampler2 + Qwen-1 LM.

Reference: vllm ``models/qwen_vl.py`` (VisionTransformer:330 — bias-free
conv1, 256-entry interpolated positional embedding, ln_pre, LayerNorm
pre-norm blocks with per-head-fused in_proj attention and gelu MLP,
Resampler2 cross-attention pool, ln_post, final ``proj`` matrix) +
``layers/resampler.py`` (BaseResampler:156, Resampler2, get_abs_pos,
2D sin-cos query positions). Weights live under ``transformer.visual.``
in the Qwen-1 checkpoint.
"""

import math
import re
from typing import Any, Dict, Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lvllm_tpu.config import ModelConfig
from lvllm_tpu.models.minicpmv import sincos_2d_pos_embed
from lvllm_tpu.models.qwen3 import Qwen3Model
from lvllm_tpu.models.registry import register_model

Params = Dict[str, Any]


def _ln(x, node, eps=1e-6):
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    return (x32 - mu) * jax.lax.rsqrt(
        x32.var(-1, keepdims=True) + eps) * node["weight"] + node["bias"]


def _abs_pos(table: jax.Array, tgt: int) -> jax.Array:
    """get_abs_pos: bicubic-resize the [L, C] grid table to tgt x tgt."""
    src = int(round(math.sqrt(table.shape[0])))
    if src == tgt:
        return table
    g = table.reshape(src, src, -1)
    g = jax.image.resize(g, (tgt, tgt, g.shape[-1]), method="cubic")
    return g.reshape(tgt * tgt, -1)


def _mha(q, k, v, wqkv, bqkv, wo, bo, heads):
    """torch nn.MultiheadAttention semantics: packed [q|k|v] in_proj."""
    D = q.shape[-1]
    wq, wk, wv = jnp.split(wqkv, 3, axis=0)
    bq, bk, bv = jnp.split(bqkv, 3, axis=0)
    Hd = D // heads
    qh = (q @ wq.T + bq).reshape(q.shape[0], heads, Hd)
    kh = (k @ wk.T + bk).reshape(k.shape[0], heads, Hd)
    vh = (v @ wv.T + bv).reshape(v.shape[0], heads, Hd)
    s = jnp.einsum("qhd,khd->hqk", qh, kh) * Hd ** -0.5
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("hqk,khd->qhd", p, vh).reshape(q.shape[0], D)
    return o @ wo.T + bo


@register_model("QWenVLForConditionalGeneration")
@register_model("QwenVLForConditionalGeneration")
class QwenVLModel(Qwen3Model):

    is_multimodal = True

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        vc = config.vision_config or {}
        self.v_width = vc.get("width", 1664)
        self.v_layers = vc.get("layers", 48)
        self.v_heads = vc.get("heads", 16)
        self.v_mlp = int(self.v_width * vc.get("mlp_ratio", 4.0))
        self.image_size = vc.get("image_size", 448)
        self.patch_size = vc.get("patch_size", 14)
        self.output_dim = vc.get("output_dim", 4096)
        self.n_queries = vc.get("n_queries", 256)
        self.pool_heads = max(self.output_dim // 128, 1)

    @property
    def num_image_tokens(self) -> int:
        return self.n_queries

    def init_params(self, rng) -> Params:
        params = super().init_params(rng)
        nprng = np.random.default_rng(784 + self.config.seed)
        W, D = self.v_width, self.output_dim

        def dense(shape, scale=0.02):
            return jnp.asarray(nprng.standard_normal(size=shape) * scale,
                               jnp.float32)

        def ln(n):
            return {"weight": jnp.ones((n,), jnp.float32),
                    "bias": jnp.zeros((n,), jnp.float32)}

        layers = []
        for _ in range(self.v_layers):
            layers.append({
                "ln_1": ln(W), "ln_2": ln(W),
                "in_proj_w": dense((3 * W, W)),
                "in_proj_b": jnp.zeros((3 * W,), jnp.float32),
                "out_proj_w": dense((W, W)),
                "out_proj_b": jnp.zeros((W,), jnp.float32),
                "c_fc_w": dense((self.v_mlp, W)),
                "c_fc_b": jnp.zeros((self.v_mlp,), jnp.float32),
                "c_proj_w": dense((W, self.v_mlp)),
                "c_proj_b": jnp.zeros((W,), jnp.float32),
            })
        gq = int(round(math.sqrt(self.n_queries)))
        params["vision"] = {
            "conv1": dense((W, 3, self.patch_size, self.patch_size)),
            "positional_embedding": dense((256, W)),
            "ln_pre": ln(W), "layers": layers,
            "pool": {
                "query": dense((self.n_queries, D)),
                "kv_proj_w": dense((D, W)),
                "in_proj_w": dense((3 * D, D)),
                "in_proj_b": jnp.zeros((3 * D,), jnp.float32),
                "out_proj_w": dense((D, D)),
                "out_proj_b": jnp.zeros((D,), jnp.float32),
                "ln_q": ln(D), "ln_kv": ln(D),
                "pos_embed": jnp.asarray(
                    sincos_2d_pos_embed(D, gq, gq).reshape(-1, D),
                    jnp.float32),
            },
            "ln_post": ln(D),
            "proj": dense((D, D)),
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
        h = x @ vp["conv1"].reshape(vp["conv1"].shape[0], -1).T
        h = h + _abs_pos(vp["positional_embedding"], G)[None]
        h = _ln(h, vp["ln_pre"])
        W = self.v_width
        Hh = self.v_heads
        Hd = W // Hh
        for lp in vp["layers"]:
            hn = _ln(h, lp["ln_1"])
            # VisualAttention (qwen_vl.py:145): in_proj rows group per
            # head as [head, 3, head_dim].
            qkv = hn @ lp["in_proj_w"].T + lp["in_proj_b"]
            qkv = qkv.reshape(B, -1, Hh, 3, Hd)
            q, k, v = qkv[..., 0, :], qkv[..., 1, :], qkv[..., 2, :]
            s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * Hd ** -0.5
            p = jax.nn.softmax(s, axis=-1)
            o = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(B, -1, W)
            h = h + (o @ lp["out_proj_w"].T + lp["out_proj_b"])
            hn = _ln(h, lp["ln_2"])
            hn = jax.nn.gelu(hn @ lp["c_fc_w"].T + lp["c_fc_b"],
                             approximate=False)
            h = h + (hn @ lp["c_proj_w"].T + lp["c_proj_b"])
        # Resampler2 (resampler.py:262-283): kv pos from the query table
        # interpolated to the tower grid; queries add it un-interpolated.
        pool = vp["pool"]
        kv = _ln(h @ pool["kv_proj_w"].T, pool["ln_kv"])
        qn = _ln(pool["query"], pool["ln_q"])
        kv_pos = _abs_pos(pool["pos_embed"], G)
        out = []
        for b in range(B):
            out.append(_mha(qn + pool["pos_embed"], kv[b] + kv_pos, kv[b],
                            pool["in_proj_w"], pool["in_proj_b"],
                            pool["out_proj_w"], pool["out_proj_b"],
                            self.pool_heads))
        o = jnp.stack(out)
        o = _ln(o, vp["ln_post"])
        return o @ vp["proj"]

    def load_weights(self, weights: Iterable[Tuple[str, np.ndarray]]):
        vis: Dict[Tuple, np.ndarray] = {}

        def filter_stream():
            for name, w in weights:
                if name.startswith("transformer.visual."):
                    vis[name.removeprefix("transformer.visual.")] = \
                        np.asarray(w)
                else:
                    yield name, w

        params = super().load_weights(filter_stream())
        vp = params["vision"]
        j = lambda a: jnp.asarray(a, jnp.float32)  # noqa: E731
        for key, w in vis.items():
            if key == "conv1.weight":
                vp["conv1"] = j(w)
            elif key == "positional_embedding":
                vp["positional_embedding"] = j(w)
            elif key == "proj":
                vp["proj"] = j(w)
            elif m := re.match(r"ln_(pre|post)\.(weight|bias)", key):
                vp["ln_" + m.group(1)][m.group(2)] = j(w)
            elif m := re.match(r"transformer\.resblocks\.(\d+)\.(.+)",
                               key):
                lp = vp["layers"][int(m.group(1))]
                rest = m.group(2)
                slot = {"attn.in_proj.weight": "in_proj_w",
                        "attn.in_proj.bias": "in_proj_b",
                        "attn.in_proj_weight": "in_proj_w",
                        "attn.in_proj_bias": "in_proj_b",
                        "attn.out_proj.weight": "out_proj_w",
                        "attn.out_proj.bias": "out_proj_b",
                        "mlp.c_fc.weight": "c_fc_w",
                        "mlp.c_fc.bias": "c_fc_b",
                        "mlp.c_proj.weight": "c_proj_w",
                        "mlp.c_proj.bias": "c_proj_b"}.get(rest)
                if slot is not None:
                    lp[slot] = j(w)
                elif m2 := re.match(r"ln_([12])\.(weight|bias)", rest):
                    lp["ln_" + m2.group(1)][m2.group(2)] = j(w)
            elif m := re.match(r"attn_pool\.(.+)", key):
                rest = m.group(1)
                pool = vp["pool"]
                slot = {"query": "query",
                        "kv_proj.weight": "kv_proj_w",
                        "attn.in_proj_weight": "in_proj_w",
                        "attn.in_proj_bias": "in_proj_b",
                        "attn.out_proj.weight": "out_proj_w",
                        "attn.out_proj.bias": "out_proj_b",
                        "pos_embed": "pos_embed"}.get(rest)
                if slot is not None:
                    pool[slot] = j(w)
                elif m2 := re.match(r"ln_(q|kv)\.(weight|bias)", rest):
                    pool["ln_" + m2.group(1)][m2.group(2)] = j(w)
        return params
