"""Aria (Rhymes AI): Idefics3-style SigLIP tower + learned-query
cross-attention projector + grouped-expert MoE Llama decoder.

Behavioral reference: ``/root/reference/vllm/model_executor/models/
aria.py`` / HF ``modeling_aria.py``:
- projector (AriaProjector:146 + AriaCrossAttention:91): learnable
  queries (first ``patch_to_query_dict[num_patches]`` rows) attend the
  tower features — q = q_proj(LN(queries)), k/v = k/v_proj(LN_kv(f)),
  then a FULL nn.MultiheadAttention (its own in/out projections) on
  top, a linear, LN, and a gelu_new MLP into the text width;
- text MoE (AriaTextMoELayer:346): top-k then softmax routing,
  grouped expert fc1 [E, H, 2I] (silu(first half) * second half) and
  fc2 [E, I, H] — exactly the unified MoE layout — plus always-on
  shared experts sized intermediate * moe_num_shared_experts.
"""

from typing import Any, Dict, Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lvllm_tpu.config import ModelConfig
from lvllm_tpu.models.idefics3 import Idefics3Model
from lvllm_tpu.models.registry import register_model
from lvllm_tpu.models.vision import siglip_vision_encode


def _ln(x, node, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = jnp.square(xf - mu).mean(-1, keepdims=True)
    return (xf - mu) * jax.lax.rsqrt(var + eps) * node["weight"] \
        + node["bias"]


@register_model("AriaForConditionalGeneration")
class AriaModel(Idefics3Model):

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        vc = config.vision_config or {}
        p2q = vc.get("projector_patch_to_query_dict") or {}
        self.patch_to_query = {int(k): int(v) for k, v in p2q.items()}
        self.max_queries = max(self.patch_to_query.values(), default=128)

    def num_image_tokens(self) -> int:
        n = (self.image_size // self.patch_size) ** 2
        return self.patch_to_query.get(n, self.max_queries)

    def init_params(self, rng) -> Dict[str, Any]:
        params = super().init_params(rng)
        params.pop("connector", None)
        nprng = np.random.default_rng(797 + self.config.seed)
        D = self.v_hidden
        H = self.config.hidden_size

        def dense(shape, scale=0.02):
            return jnp.asarray(nprng.standard_normal(size=shape) * scale,
                               jnp.float32)

        def ln(n=D):
            return {"weight": jnp.ones((n,), jnp.float32),
                    "bias": jnp.zeros((n,), jnp.float32)}

        params["vision"]["projector"] = {
            "query": dense((self.max_queries, D)),
            "q_proj": {"kernel": dense((D, D))},
            "k_proj": {"kernel": dense((D, D))},
            "v_proj": {"kernel": dense((D, D))},
            "in_proj": {"kernel": dense((D, 3 * D)),
                        "bias": jnp.zeros((3 * D,), jnp.float32)},
            "out_proj": {"kernel": dense((D, D)),
                         "bias": jnp.zeros((D,), jnp.float32)},
            "linear": {"kernel": dense((D, D)),
                       "bias": jnp.zeros((D,), jnp.float32)},
            "ca_ln": ln(), "ca_ln_kv": ln(), "ln": ln(),
            "linear_in": {"kernel": dense((D, H))},
            "linear_out": {"kernel": dense((H, H))},
        }
        return params

    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        feats = siglip_vision_encode(
            params["vision"], pixel_values, self.patch_size, self.v_heads,
            eps=self.v_eps)                        # [B, N, D]
        pr = params["vision"]["projector"]
        B, N, D = feats.shape
        Q = self.patch_to_query.get(N, self.max_queries)
        queries = pr["query"][:Q][None]

        q = _ln(queries, pr["ca_ln"]) @ pr["q_proj"]["kernel"]
        kv = _ln(feats, pr["ca_ln_kv"])
        k = kv @ pr["k_proj"]["kernel"]
        v = kv @ pr["v_proj"]["kernel"]
        # nn.MultiheadAttention on top: packed in-proj then MHA + out.
        wq, wk, wv = jnp.split(pr["in_proj"]["kernel"], 3, axis=1)
        bq, bk, bv = jnp.split(pr["in_proj"]["bias"], 3)
        Hh = self.v_heads
        Dh = D // Hh
        qh = (q @ wq + bq).reshape(1, Q, Hh, Dh)
        kh = (k @ wk + bk).reshape(B, N, Hh, Dh)
        vh = (v @ wv + bv).reshape(B, N, Hh, Dh)
        s = jnp.einsum("bqhd,bkhd->bhqk",
                       jnp.broadcast_to(qh, (B, Q, Hh, Dh)), kh) \
            * (Dh ** -0.5)
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bhqk,bkhd->bqhd", p, vh).reshape(B, Q, D)
        o = o @ pr["out_proj"]["kernel"] + pr["out_proj"]["bias"]
        o = o @ pr["linear"]["kernel"] + pr["linear"]["bias"]
        h = _ln(o, pr["ln"])
        h = jax.nn.gelu(h @ pr["linear_in"]["kernel"], approximate=True)
        return h @ pr["linear_out"]["kernel"]

    def load_weights(self, weights: Iterable[Tuple[str, np.ndarray]]):
        import re
        proj: Dict[str, Any] = {}
        t = lambda a: jnp.asarray(np.ascontiguousarray(a.T), jnp.float32)  # noqa: E731
        v = lambda a: jnp.asarray(a, jnp.float32)  # noqa: E731

        def proj_put(rest, w):
            if rest == "query":
                proj["query"] = v(w)
            elif m := re.match(r"cross_attn\.(q_proj|k_proj|v_proj|linear)"
                               r"\.(weight|bias)", rest):
                proj.setdefault(m.group(1), {})[
                    "kernel" if m.group(2) == "weight" else "bias"] = \
                    t(w) if m.group(2) == "weight" else v(w)
            elif rest == "cross_attn.multihead_attn.in_proj_weight":
                proj.setdefault("in_proj", {})["kernel"] = t(w)
            elif rest == "cross_attn.multihead_attn.in_proj_bias":
                proj.setdefault("in_proj", {})["bias"] = v(w)
            elif m := re.match(r"cross_attn\.multihead_attn\.out_proj\."
                               r"(weight|bias)", rest):
                proj.setdefault("out_proj", {})[
                    "kernel" if m.group(1) == "weight" else "bias"] = \
                    t(w) if m.group(1) == "weight" else v(w)
            elif m := re.match(r"cross_attn\.layer_norm_kv\.(weight|bias)",
                               rest):
                proj.setdefault("ca_ln_kv", {})[m.group(1)] = v(w)
            elif m := re.match(r"cross_attn\.layer_norm\.(weight|bias)",
                               rest):
                proj.setdefault("ca_ln", {})[m.group(1)] = v(w)
            elif m := re.match(r"layer_norm\.(weight|bias)", rest):
                proj.setdefault("ln", {})[m.group(1)] = v(w)
            elif m := re.match(r"feed_forward\.(linear_in|linear_out)\."
                               r"weight", rest):
                proj[m.group(1)] = {"kernel": t(w)}

        def filter_stream():
            E = self.config.num_experts
            for name, w in weights:
                name = name.removeprefix("model.")
                if name.startswith("multi_modal_projector."):
                    proj_put(name.removeprefix("multi_modal_projector."),
                             w)
                elif name.startswith("vision_tower."):
                    from lvllm_tpu.models.vision import load_siglip_weights
                    rest = name.removeprefix("vision_tower.")
                    rest = rest.removeprefix("vision_model.")
                    load_siglip_weights(self._vision_tmp, rest, w)
                elif m := re.match(
                        r"language_model\.(?:model\.)?layers\.(\d+)\.mlp"
                        r"\.(.+)", name):
                    i, rest = m.group(1), m.group(2)
                    p = f"model.layers.{i}.mlp."
                    if rest == "router.weight":
                        yield p + "gate.weight", w
                    elif rest == "experts.fc1.weight":
                        # [E, H, 2I] gate|up halves, silu on the first.
                        wa = np.asarray(w)
                        I2 = wa.shape[-1] // 2
                        for e in range(E):
                            yield (p + f"experts.{e}.gate_proj.weight",
                                   wa[e, :, :I2].T)
                            yield (p + f"experts.{e}.up_proj.weight",
                                   wa[e, :, I2:].T)
                    elif rest == "experts.fc2.weight":
                        wa = np.asarray(w)
                        for e in range(E):
                            yield (p + f"experts.{e}.down_proj.weight",
                                   wa[e].T)
                    else:
                        yield p + rest, w
                elif name.startswith("language_model."):
                    yield name.removeprefix("language_model."), w
                else:
                    yield name, w

        self._vision_tmp = {"layers": [{} for _ in range(self.v_layers)]}
        params = super(Idefics3Model, self).load_weights(filter_stream())
        vision = self._vision_tmp
        del self._vision_tmp
        vision["projector"] = proj
        params["vision"] = vision
        return params
