"""Kimi-VL (Moonshot): MoonViT tower + 2x2 patch merger + GELU MLP
projector + DeepSeek-V2/V3 decoder (MLA + MoE).

Behavioral reference: ``/root/reference/vllm/model_executor/models/
kimi_vl.py`` (KimiVLMultiModalProjector:94) and ``moonvit.py``:
- patch embed: 14x14 conv over packed patches + a learnable
  (init_pos_emb_height x width) position grid bicubic-interpolated to
  each image's patch grid (Learnable2DInterpPosEmb:99);
- encoder blocks: LN -> packed wqkv -> 2D rope (interleaved x/y complex
  pairs, Rope2DPosEmb:218) -> attention -> wo; LN -> fc0 -> GELU -> fc1;
- final layernorm, 2x2 spatial patch merge (patch_merger:504), then
  pre_norm LN -> linear_1(4D->4D) -> GELU -> linear_2(4D->text).
The text side reuses the DeepSeek MLA family (models/deepseek.py).
No transformers oracle exists in this image (trust-remote-code family);
tests pin the rope/merge math and engine-level generation.
"""

from typing import Any, Dict, Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lvllm_tpu.config import ModelConfig
from lvllm_tpu.models.deepseek import DeepseekModel
from lvllm_tpu.models.registry import register_model


def moonvit_rope_cos_sin(head_dim: int, gh: int, gw: int,
                         theta: float = 10000.0):
    """cos/sin [gh*gw, head_dim//2] with interleaved x/y frequency pairs
    (Rope2DPosEmb.precomputed_freqs_cis: even pair index = x axis, odd =
    y axis, freqs 1/theta^(4i/dim))."""
    n = np.arange(gh * gw)
    x_pos = (n % gw).astype(np.float64)
    y_pos = (n // gw).astype(np.float64)
    dim_range = np.arange(0, head_dim, 4, dtype=np.float64)[: head_dim // 4]
    freqs = 1.0 / theta ** (dim_range / head_dim)
    xf = np.outer(x_pos, freqs)               # [N, C/4]
    yf = np.outer(y_pos, freqs)
    ang = np.stack([xf, yf], axis=-1).reshape(gh * gw, -1)  # [N, C/2]
    return (np.cos(ang).astype(np.float32),
            np.sin(ang).astype(np.float32))


def _apply_rope_2d(x: jax.Array, cos: jax.Array, sin: jax.Array
                   ) -> jax.Array:
    """x [N, H, D] with complex pair rotation over the last dim."""
    xr = x[..., 0::2].astype(jnp.float32)
    xi = x[..., 1::2].astype(jnp.float32)
    c = cos[:, None]
    s = sin[:, None]
    out_r = xr * c - xi * s
    out_i = xr * s + xi * c
    return jnp.stack([out_r, out_i], axis=-1).reshape(x.shape).astype(
        x.dtype)


def _ln(x, node, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = jnp.square(xf - mu).mean(-1, keepdims=True)
    return (xf - mu) * jax.lax.rsqrt(var + eps) * node["weight"] \
        + node["bias"]


@register_model("KimiVLForConditionalGeneration")
class KimiVLModel(DeepseekModel):

    is_multimodal = True

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        vc = config.vision_config or {}
        self.v_hidden = vc.get("hidden_size", 1152)
        self.v_intermediate = vc.get("intermediate_size", 4304)
        self.v_layers = vc.get("num_hidden_layers", 27)
        self.v_heads = vc.get("num_attention_heads", 16)
        self.patch_size = vc.get("patch_size", 14)
        self.image_size = vc.get("image_size",
                                 self.patch_size * vc.get("grid", 28))
        self.pos_h = vc.get("init_pos_emb_height", 64)
        self.pos_w = vc.get("init_pos_emb_width", 64)
        mk = vc.get("merge_kernel_size") or (2, 2)
        self.merge = (int(mk[0]), int(mk[1]))

    @property
    def num_image_tokens(self) -> int:
        g = self.image_size // self.patch_size
        return (g // self.merge[0]) * (g // self.merge[1])

    def init_params(self, rng) -> Dict[str, Any]:
        params = super().init_params(rng)
        nprng = np.random.default_rng(793 + self.config.seed)
        D, I = self.v_hidden, self.v_intermediate
        P = self.patch_size
        H = self.config.hidden_size
        md = D * self.merge[0] * self.merge[1]

        def dense(shape, scale=0.02):
            return jnp.asarray(nprng.standard_normal(size=shape) * scale,
                               jnp.float32)

        def ln(n=D):
            return {"weight": jnp.ones((n,), jnp.float32),
                    "bias": jnp.zeros((n,), jnp.float32)}

        layers = []
        for _ in range(self.v_layers):
            layers.append({
                "norm0": ln(), "norm1": ln(),
                "wqkv": {"kernel": dense((D, 3 * D)),
                         "bias": jnp.zeros((3 * D,), jnp.float32)},
                "wo": {"kernel": dense((D, D)),
                       "bias": jnp.zeros((D,), jnp.float32)},
                "fc0": {"kernel": dense((D, I)),
                        "bias": jnp.zeros((I,), jnp.float32)},
                "fc1": {"kernel": dense((I, D)),
                        "bias": jnp.zeros((D,), jnp.float32)},
            })
        params["vision"] = {
            "patch_conv": {"kernel": dense((D, 3, P, P)),
                           "bias": jnp.zeros((D,), jnp.float32)},
            "pos_emb": dense((self.pos_h, self.pos_w, D)),
            "layers": layers,
            "final_layernorm": ln(),
            "projector": {
                "pre_norm": ln(),
                "linear_1": {"kernel": dense((md, md)),
                             "bias": jnp.zeros((md,), jnp.float32)},
                "linear_2": {"kernel": dense((md, H)),
                             "bias": jnp.zeros((H,), jnp.float32)},
            },
        }
        return params

    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        """[B, 3, S, S] -> [B, num_image_tokens, text_hidden]."""
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

        pos = vp["pos_emb"]
        if pos.shape[:2] != (g, g):
            # Learnable2DInterpPosEmb: bicubic interpolation to the grid.
            pos = jax.image.resize(pos, (g, g, D), method="bicubic")
        h = h + pos.reshape(1, g * g, D)

        Hh = self.v_heads
        Dh = D // Hh
        cos, sin = moonvit_rope_cos_sin(Dh, g, g)
        cos, sin = jnp.asarray(cos), jnp.asarray(sin)
        for lp in vp["layers"]:
            res = h
            hn = _ln(h, lp["norm0"])
            qkv = hn @ lp["wqkv"]["kernel"] + lp["wqkv"]["bias"]
            qkv = qkv.reshape(B, g * g, 3, Hh, Dh)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            q = jax.vmap(lambda t: _apply_rope_2d(t, cos, sin))(q)
            k = jax.vmap(lambda t: _apply_rope_2d(t, cos, sin))(k)
            s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (Dh ** -0.5)
            p = jax.nn.softmax(s, axis=-1)
            o = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(B, g * g, D)
            h = res + (o @ lp["wo"]["kernel"] + lp["wo"]["bias"])
            res = h
            hn = _ln(h, lp["norm1"])
            hn = jax.nn.gelu(hn @ lp["fc0"]["kernel"] + lp["fc0"]["bias"],
                             approximate=False)
            h = res + (hn @ lp["fc1"]["kernel"] + lp["fc1"]["bias"])
        h = _ln(h, vp["final_layernorm"])

        # patch_merger: 2x2 spatial merge, channel order (kh, kw, D).
        mh, mw = self.merge
        nh, nw = g // mh, g // mw
        h = h.reshape(B, nh, mh, nw, mw, D)
        h = jnp.transpose(h, (0, 1, 3, 2, 4, 5)).reshape(
            B, nh * nw, mh * mw * D)
        proj = vp["projector"]
        # pre_norm normalizes over the UNMERGED width D, then views as 4D
        # (KimiVLMultiModalProjector.forward:124).
        hp = _ln(h.reshape(B, nh * nw, mh * mw, D), proj["pre_norm"])
        hp = hp.reshape(B, nh * nw, mh * mw * D)
        hp = hp @ proj["linear_1"]["kernel"] + proj["linear_1"]["bias"]
        hp = jax.nn.gelu(hp, approximate=False)
        return hp @ proj["linear_2"]["kernel"] + proj["linear_2"]["bias"]

    def load_weights(self, weights: Iterable[Tuple[str, np.ndarray]]):
        vision: Dict[str, Any] = {"layers": [
            {} for _ in range(self.v_layers)], "projector": {}}
        t = lambda a: jnp.asarray(np.ascontiguousarray(a.T), jnp.float32)  # noqa: E731
        v = lambda a: jnp.asarray(a, jnp.float32)  # noqa: E731
        import re

        def vis_put(rest, w):
            if rest == "patch_embed.proj.weight":
                vision["patch_conv"] = {
                    **vision.get("patch_conv", {}), "kernel": v(w)}
            elif rest == "patch_embed.proj.bias":
                vision.setdefault("patch_conv", {})["bias"] = v(w)
            elif rest == "patch_embed.pos_emb.weight":
                vision["pos_emb"] = v(w)
            elif rest.startswith("encoder.final_layernorm."):
                vision.setdefault("final_layernorm", {})[
                    rest.split(".")[-1]] = v(w)
            elif m := re.match(r"encoder\.blocks\.(\d+)\.(.+)\."
                               r"(weight|bias)", rest):
                i, name, kind = int(m.group(1)), m.group(2), m.group(3)
                name = name.replace("mlp.", "")
                lp = vision["layers"][i]
                if name.startswith("norm"):
                    lp.setdefault(name, {})[kind] = v(w)
                else:
                    lp.setdefault(name, {})[
                        "kernel" if kind == "weight" else "bias"] = \
                        t(w) if kind == "weight" else v(w)

        def filter_stream():
            for name, w in weights:
                if name.startswith("vision_tower."):
                    vis_put(name.removeprefix("vision_tower."), w)
                elif name.startswith("multi_modal_projector."):
                    rest = name.removeprefix("multi_modal_projector.")
                    if rest.startswith("pre_norm."):
                        vision["projector"].setdefault("pre_norm", {})[
                            rest.split(".")[-1]] = v(w)
                    else:
                        lin, kind = rest.rsplit(".", 1)
                        vision["projector"].setdefault(lin, {})[
                            "kernel" if kind == "weight" else "bias"] = \
                            t(w) if kind == "weight" else v(w)
                elif name.startswith("language_model."):
                    yield name.removeprefix("language_model."), w
                else:
                    yield name, w

        params = super().load_weights(filter_stream())
        params["vision"] = vision
        return params
