"""MiniCPM-V (OpenBMB): SigLIP tower + perceiver resampler + LLM.

Behavioral reference: ``/root/reference/vllm/model_executor/models/
minicpmv.py`` (Resampler2_5:150, forward:198) + ``layers/resampler.py``
(BaseResampler:156, get_2d_sincos_pos_embed): the tower's patch features
are projected by ``kv_proj`` into the text width, layer-normed, and
cross-attended by ``query_num`` learnable queries (keys carry a 2D
sin-cos position embedding over the patch grid), then ln_post and a
final ``proj`` matmul. Version 2.6 pairs the SigLIP tower with a Qwen2
decoder; 2.5 uses Llama-3 (selected via config ``version`` in
hf_config.py). The processor's image slicing reduces to the square
single-crop path in this serving stack.
"""

from typing import Any, Dict, Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lvllm_tpu.config import ModelConfig
from lvllm_tpu.models.qwen3 import Qwen3Model
from lvllm_tpu.models.registry import register_model
from lvllm_tpu.models.vision import (init_siglip_params, load_siglip_weights,
                                     siglip_vision_encode)


def sincos_2d_pos_embed(dim: int, gh: int, gw: int) -> np.ndarray:
    """MAE-style 2D sin-cos grid [gh, gw, dim] (reference:
    get_2d_sincos_pos_embed version (2, 5))."""
    def one_dim(d, pos):                     # pos [N] -> [N, d]
        omega = 1.0 / 10000.0 ** (np.arange(d // 2, dtype=np.float64)
                                  / (d // 2))
        out = np.einsum("n,d->nd", pos.astype(np.float64), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    half = dim // 2
    emb_h = one_dim(half, np.arange(gh))                 # [gh, half]
    emb_w = one_dim(half, np.arange(gw))                 # [gw, half]
    grid = np.concatenate([
        np.broadcast_to(emb_h[:, None], (gh, gw, half)),
        np.broadcast_to(emb_w[None, :], (gh, gw, half)),
    ], axis=-1)
    return grid.astype(np.float32)


@register_model("MiniCPMV")
class MiniCPMVModel(Qwen3Model):

    is_multimodal = True

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        vc = config.vision_config or {}
        self.v_hidden = vc.get("hidden_size", 1152)
        self.v_intermediate = vc.get("intermediate_size", 4304)
        self.v_layers = vc.get("num_hidden_layers", 27)
        self.v_heads = vc.get("num_attention_heads", 16)
        self.image_size = vc.get("image_size", 448)
        self.patch_size = vc.get("patch_size", 14)
        self.v_eps = vc.get("layer_norm_eps", 1e-6)
        self.query_num = vc.get("query_num", 64)
        self.r_heads = max(config.hidden_size // 128, 1)

    @property
    def num_image_tokens(self) -> int:
        return self.query_num

    def init_params(self, rng) -> Dict[str, Any]:
        params = super().init_params(rng)
        nprng = np.random.default_rng(791 + self.config.seed)
        vision = init_siglip_params(
            nprng, self.v_hidden, self.v_intermediate, self.v_layers,
            self.image_size, self.patch_size, dtype=jnp.float32)
        D = self.config.hidden_size

        def dense(shape, scale=0.02):
            return jnp.asarray(nprng.standard_normal(size=shape) * scale,
                               jnp.float32)

        def ln():
            return {"weight": jnp.ones((D,), jnp.float32),
                    "bias": jnp.zeros((D,), jnp.float32)}

        vision["resampler"] = {
            "query": dense((self.query_num, D)),
            "kv_proj": {"kernel": dense((self.v_hidden, D))},
            "in_proj": {"kernel": dense((D, 3 * D)),
                        "bias": jnp.zeros((3 * D,), jnp.float32)},
            "out_proj": {"kernel": dense((D, D)),
                         "bias": jnp.zeros((D,), jnp.float32)},
            "ln_q": ln(), "ln_kv": ln(), "ln_post": ln(),
            "proj": dense((D, D)),
        }
        params["vision"] = vision
        return params

    @staticmethod
    def _ln(x, node, eps=1e-5):
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = jnp.square(xf - mu).mean(-1, keepdims=True)
        y = (xf - mu) * jax.lax.rsqrt(var + eps)
        return y * node["weight"] + node["bias"]

    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        feats = siglip_vision_encode(
            params["vision"], pixel_values, self.patch_size, self.v_heads,
            self.v_eps, post_layernorm=True)
        rs = params["vision"]["resampler"]
        D = self.config.hidden_size
        B, L, _ = feats.shape
        g = self.image_size // self.patch_size

        kv = feats.astype(jnp.float32) @ rs["kv_proj"]["kernel"]
        kv = self._ln(kv, rs["ln_kv"])                   # [B, L, D]
        pos = jnp.asarray(
            sincos_2d_pos_embed(D, g, g).reshape(1, g * g, D))
        q = self._ln(rs["query"], rs["ln_q"])            # [Q, D]

        wq, wk, wv = jnp.split(rs["in_proj"]["kernel"], 3, axis=1)
        bq, bk, bv = jnp.split(rs["in_proj"]["bias"], 3)
        H = self.r_heads
        Dh = D // H
        qh = (q @ wq + bq).reshape(1, self.query_num, H, Dh)
        kh = ((kv + pos) @ wk + bk).reshape(B, L, H, Dh)
        vh = (kv @ wv + bv).reshape(B, L, H, Dh)
        s = jnp.einsum("bqhd,blhd->bhql", jnp.broadcast_to(
            qh, (B,) + qh.shape[1:]), kh) * (Dh ** -0.5)
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bhql,blhd->bqhd", p, vh).reshape(
            B, self.query_num, D)
        o = o @ rs["out_proj"]["kernel"] + rs["out_proj"]["bias"]
        o = self._ln(o, rs["ln_post"])
        return o @ rs["proj"]

    def load_weights(self, weights: Iterable[Tuple[str, np.ndarray]]):
        vision: Dict[str, Any] = {"layers": [
            {} for _ in range(self.v_layers)], "resampler": {}}
        rs = vision["resampler"]
        t = lambda a: jnp.asarray(np.ascontiguousarray(a.T), jnp.float32)  # noqa: E731
        v = lambda a: jnp.asarray(a, jnp.float32)  # noqa: E731

        def filter_stream():
            for name, w in weights:
                if name.startswith("vpm."):
                    rest = name.removeprefix("vpm.")
                    rest = rest.removeprefix("vision_model.")
                    load_siglip_weights(vision, rest, w)
                elif name.startswith("resampler."):
                    rest = name.removeprefix("resampler.")
                    if rest in ("query", "proj"):
                        rs[rest] = v(w)
                    elif rest == "kv_proj.weight":
                        rs["kv_proj"] = {"kernel": t(w)}
                    elif rest == "attn.in_proj_weight":
                        rs.setdefault("in_proj", {})["kernel"] = t(w)
                    elif rest == "attn.in_proj_bias":
                        rs.setdefault("in_proj", {})["bias"] = v(w)
                    elif rest == "attn.out_proj.weight":
                        rs.setdefault("out_proj", {})["kernel"] = t(w)
                    elif rest == "attn.out_proj.bias":
                        rs.setdefault("out_proj", {})["bias"] = v(w)
                    elif m := rest.split("."):
                        if m[0] in ("ln_q", "ln_kv", "ln_post"):
                            rs.setdefault(m[0], {})[m[1]] = v(w)
                elif name.startswith("llm."):
                    yield name.removeprefix("llm."), w
                else:
                    yield name, w

        params = super().load_weights(filter_stream())
        params["vision"] = vision
        return params
