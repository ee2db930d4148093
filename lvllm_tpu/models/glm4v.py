"""GLM-4.1V / GLM-4V multimodal: EVA-style ViT tower + Glm4 text + M-RoPE.

Counterpart of the reference's ``vllm/model_executor/models/glm4_1v.py``
(Glm4vForConditionalGeneration): conv3d patch embed, RMS post-conv norm,
bicubically-interpolated learned position embeddings, per-frame full
attention with 2D rotary, spatial-merge downsample conv, and a gated-MLP
patch merger. The text decoder is the GLM-4 dense layer (sandwich output
norms, fused gate_up, qkv bias) with interleaved partial M-RoPE. HF
numerics reference: transformers ``Glm4vForConditionalGeneration``.

Video inputs use GLM's timestamped frame indexing; this port supports
images (the reference path exercised by GLM-4.1V image serving).
"""

import functools
import re
from typing import Any, Dict, Iterable, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lvllm_tpu.config import ModelConfig
from lvllm_tpu.models.qwen2_vl import (Qwen2VLModel, _rms, _rotate_half,
                                       mrope_positions, vision_cos_sin,
                                       vision_rot_pos_ids)
from lvllm_tpu.models.registry import register_model


def _cubic_weights(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Cubic-convolution weights for the 4 taps around fractional offset
    ``t`` in [0, 1) (torch grid_sample bicubic kernel). Returns [L, 4]."""
    d = np.stack([t + 1.0, t, 1.0 - t, 2.0 - t], axis=-1)  # distances >= 0
    d = np.abs(d)
    w_near = (a + 2.0) * d ** 3 - (a + 3.0) * d ** 2 + 1.0
    w_far = a * d ** 3 - 5.0 * a * d ** 2 + 8.0 * a * d - 4.0 * a
    return np.where(d <= 1.0, w_near, w_far)


def bicubic_pos_embed_taps(orig: int, target_h: np.ndarray,
                           target_w: np.ndarray, h_coords: np.ndarray,
                           w_coords: np.ndarray
                           ) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side bicubic grid-sample plan (HF Glm4vVisionEmbeddings:
    ``F.grid_sample(mode="bicubic", align_corners=False,
    padding_mode="border")``): for each patch, 16 flat indices into the
    [orig*orig] position table and their weights. Device side then does a
    gather + weighted sum — no multi-MB pos-embed pull to the host.

    Returns (idx [L, 16] int32, wgt [L, 16] f32)."""
    # Normalize to [-1, 1] then unnormalize to source pixel coordinates.
    norm_w = ((w_coords + 0.5) / target_w) * 2.0 - 1.0
    norm_h = ((h_coords + 0.5) / target_h) * 2.0 - 1.0
    ix = ((norm_w + 1.0) * orig - 1.0) / 2.0
    iy = ((norm_h + 1.0) * orig - 1.0) / 2.0
    bx = np.floor(ix)
    by = np.floor(iy)
    wx = _cubic_weights(ix - bx)                     # [L, 4]
    wy = _cubic_weights(iy - by)
    tx = np.clip(bx[:, None] + np.arange(-1, 3)[None], 0, orig - 1)
    ty = np.clip(by[:, None] + np.arange(-1, 3)[None], 0, orig - 1)
    idx = (ty[:, :, None] * orig + tx[:, None, :]).reshape(-1, 16)
    wgt = (wy[:, :, None] * wx[:, None, :]).reshape(-1, 16)
    return idx.astype(np.int32), wgt.astype(np.float32)


@functools.partial(jax.jit, static_argnames=("num_heads", "merge_unit"))
def _glm4v_tower(params, patches, cos, sin, frame_group, pos_idx, pos_wgt,
                 *, num_heads: int, merge_unit: int):
    """patches [L, C*Tp*P*P] f32 → merged features [L/merge_unit, text_H].

    HF Glm4vVisionModel.forward: patch embed → post_conv RMSNorm →
    + interpolated pos embed → blocks (RMS pre-norms, biasless qkv/proj,
    2D rope, per-frame attention, silu-gated MLP) → post RMSNorm →
    spatial-merge downsample conv → gated patch merger."""
    h = patches @ params["patch_embed"] + params["patch_bias"]   # [L, D]
    L, D = h.shape
    h = _rms(h, params["post_conv_layernorm"], 1e-5).astype(jnp.float32)
    # Adapted position embeddings: 16-tap bicubic gather.
    pe = params["pos_embed"][pos_idx]                # [L, 16, D]
    h = h + jnp.einsum("lt,ltd->ld", pos_wgt, pe)

    Hd = D // num_heads
    scale = Hd ** -0.5
    cos_ = cos[:, None, :]
    sin_ = sin[:, None, :]
    mask = frame_group[:, None] == frame_group[None, :]
    for bp in params["blocks"]:
        res = h
        x = _rms(h, bp["norm1"], 1e-5).astype(h.dtype)
        qkv = x @ bp["qkv"]["kernel"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(L, num_heads, Hd).astype(jnp.float32)
        k = k.reshape(L, num_heads, Hd).astype(jnp.float32)
        v = v.reshape(L, num_heads, Hd).astype(jnp.float32)
        q = q * cos_ + _rotate_half(q) * sin_
        k = k * cos_ + _rotate_half(k) * sin_
        s = jnp.einsum("thd,shd->hts", q, k) * scale
        s = jnp.where(mask[None], s, -jnp.inf)
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("hts,shd->thd", p, v).reshape(L, D)
        h = res + o.astype(h.dtype) @ bp["proj"]["kernel"]
        res = h
        x = _rms(h, bp["norm2"], 1e-5).astype(h.dtype)
        gate = x @ bp["gate_proj"]["kernel"]
        up = x @ bp["up_proj"]["kernel"]
        y = jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up
        h = res + y @ bp["down_proj"]["kernel"]
    h = _rms(h, params["post_layernorm"], 1e-5).astype(h.dtype)
    # Spatial merge: consecutive merge_unit rows form one (m, m) block;
    # the stride-m conv over it is a matmul on the (D, i, j) flattening.
    m2 = merge_unit
    x = h.reshape(L // m2, m2, D)
    x = jnp.transpose(x, (0, 2, 1)).reshape(L // m2, D * m2)
    x = x @ params["downsample"]["kernel"] + params["downsample"]["bias"]
    mg = params["merger"]
    x = x @ mg["proj"]["kernel"]
    xn = x.astype(jnp.float32)
    mu = xn.mean(-1, keepdims=True)
    var = xn.var(-1, keepdims=True)
    xn = (xn - mu) * jax.lax.rsqrt(var + 1e-5) * \
        mg["post_projection_norm"]["weight"] + \
        mg["post_projection_norm"]["bias"]
    x = jax.nn.gelu(xn, approximate=False).astype(x.dtype)
    gate = x @ mg["gate_proj"]["kernel"]
    up = x @ mg["up_proj"]["kernel"]
    y = jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up
    return y @ mg["down_proj"]["kernel"]


@register_model("Glm4vForConditionalGeneration")
@register_model("Glm4vMoeForConditionalGeneration")
class Glm4vModel(Qwen2VLModel):
    """GLM-4.1V / GLM-4.5V: Glm4 (dense) or Glm4Moe text decoder + the
    shared EVA-style tower. Reuses the Qwen2-VL dynamic-MM plumbing
    (encode_mm / mm_positions / M-RoPE deltas); the text-side differences
    (sandwich norms + interleaved rope for dense, sigmoid router MoE +
    standard rope for the MoE variant) are config-driven."""

    def __init__(self, config: ModelConfig):
        # Skip Qwen2VLModel.__init__'s vision-config parse; run the base
        # text model init then read GLM's vision fields.
        from lvllm_tpu.models.qwen3 import Qwen3Model
        Qwen3Model.__init__(self, config)
        vc = config.vision_config or {}
        self.v_hidden = vc.get("hidden_size", 1536)
        self.v_out = vc.get("out_hidden_size", config.hidden_size)
        self.v_intermediate = vc.get("intermediate_size", 13696)
        self.v_heads = vc.get("num_heads", 12)
        self.v_depth = vc.get("depth", 24)
        self.image_size = vc.get("image_size", 336)
        self.patch_size = vc.get("patch_size", 14)
        self.temporal_patch_size = vc.get("temporal_patch_size", 2)
        self.merge = vc.get("spatial_merge_size", 2)
        self.in_channels = vc.get("in_channels", 3)

    # ---- vision ------------------------------------------------------------

    def encode_mm(self, params, mm_data: dict) -> np.ndarray:
        pix = np.asarray(mm_data["pixel_values"], np.float32)
        grids = np.asarray(mm_data["image_grid_thw"],
                           np.int64).reshape(-1, 3)
        mu = self.merge * self.merge
        Hd = self.v_hidden // self.v_heads
        orig = self.image_size // self.patch_size
        feats: List[np.ndarray] = []
        off = 0
        for (t, h, w) in grids:
            t, h, w = int(t), int(h), int(w)
            L = t * h * w
            patches = pix[off:off + L]
            off += L
            pos_ids = vision_rot_pos_ids(t, h, w, self.merge)
            cos, sin = vision_cos_sin(pos_ids, Hd)
            frame_group = np.repeat(np.arange(t, dtype=np.int32), h * w)
            idx, wgt = bicubic_pos_embed_taps(
                orig, np.full(L, float(h)), np.full(L, float(w)),
                pos_ids[:, 0].astype(np.float32),
                pos_ids[:, 1].astype(np.float32))
            out = _glm4v_tower(
                params["vision"], jnp.asarray(patches), jnp.asarray(cos),
                jnp.asarray(sin), jnp.asarray(frame_group),
                jnp.asarray(idx), jnp.asarray(wgt),
                num_heads=self.v_heads, merge_unit=mu)
            feats.append(np.asarray(out, np.float32))
        return np.concatenate(feats, axis=0)

    def mm_positions(self, prompt_ids, mm_data: dict
                     ) -> Tuple[np.ndarray, int]:
        # Image rope index matches Qwen2-VL semantics (HF
        # Glm4vModel.get_rope_index image branch).
        grids = np.asarray(mm_data["image_grid_thw"],
                           np.int64).reshape(-1, 3)
        return mrope_positions(prompt_ids, grids,
                               self.config.image_token_id,
                               self.config.video_token_id, self.merge)

    # ---- params ------------------------------------------------------------

    def init_params(self, rng) -> Dict[str, Any]:
        from lvllm_tpu.models.qwen3 import Qwen3Model
        params = Qwen3Model.init_params(self, rng)
        nprng = np.random.default_rng(4321 + self.config.seed)
        D, O, I = self.v_hidden, self.v_out, self.v_intermediate
        patch_in = (self.in_channels * self.temporal_patch_size
                    * self.patch_size ** 2)
        n_pos = (self.image_size // self.patch_size) ** 2
        mu = self.merge * self.merge

        def dense(shape, scale=0.02):
            return jnp.asarray(nprng.standard_normal(size=shape) * scale,
                               jnp.float32)

        def rmsn(n=D):
            return {"weight": jnp.ones((n,), jnp.float32)}

        blocks = []
        for _ in range(self.v_depth):
            blocks.append({
                "norm1": rmsn(), "norm2": rmsn(),
                "qkv": {"kernel": dense((D, 3 * D))},
                "proj": {"kernel": dense((D, D))},
                "gate_proj": {"kernel": dense((D, O))},
                "up_proj": {"kernel": dense((D, O))},
                "down_proj": {"kernel": dense((O, D))},
            })
        params["vision"] = {
            "patch_embed": dense((patch_in, D)),
            "patch_bias": jnp.zeros((D,), jnp.float32),
            "pos_embed": dense((n_pos, D)),
            "post_conv_layernorm": rmsn(),
            "post_layernorm": rmsn(),
            "blocks": blocks,
            "downsample": {"kernel": dense((D * mu, O)),
                           "bias": jnp.zeros((O,), jnp.float32)},
            "merger": {
                "proj": {"kernel": dense((O, O))},
                "post_projection_norm": {
                    "weight": jnp.ones((O,), jnp.float32),
                    "bias": jnp.zeros((O,), jnp.float32)},
                "gate_proj": {"kernel": dense((O, I))},
                "up_proj": {"kernel": dense((O, I))},
                "down_proj": {"kernel": dense((I, O))},
            },
        }
        return params

    # ---- weight loading ----------------------------------------------------

    def load_weights(self, weights: Iterable[Tuple[str, np.ndarray]]):
        mu = self.merge * self.merge
        vision: Dict[str, Any] = {
            "blocks": [{} for _ in range(self.v_depth)], "merger": {}}

        def lin(node, kind, w):
            if kind == "weight":
                node["kernel"] = jnp.asarray(np.ascontiguousarray(w.T),
                                             jnp.float32)
            else:
                node["bias"] = jnp.asarray(w, jnp.float32)

        def _vis_put(rest: str, w: np.ndarray):
            if rest == "patch_embed.proj.weight":
                vision["patch_embed"] = jnp.asarray(
                    w.reshape(w.shape[0], -1).T, jnp.float32)
            elif rest == "patch_embed.proj.bias":
                vision["patch_bias"] = jnp.asarray(w, jnp.float32)
            elif rest == "embeddings.position_embedding.weight":
                vision["pos_embed"] = jnp.asarray(w, jnp.float32)
            elif rest in ("post_conv_layernorm.weight",
                          "post_layernorm.weight"):
                vision[rest.split(".")[0]] = {
                    "weight": jnp.asarray(w, jnp.float32)}
            elif rest == "downsample.weight":
                # Conv2d [O, D, m, m] → matmul kernel [(D, i, j), O].
                vision.setdefault("downsample", {})["kernel"] = jnp.asarray(
                    w.reshape(w.shape[0], -1).T, jnp.float32)
            elif rest == "downsample.bias":
                vision.setdefault("downsample", {})["bias"] = jnp.asarray(
                    w, jnp.float32)
            elif m := re.match(r"blocks\.(\d+)\.(.+)", rest):
                bp = vision["blocks"][int(m.group(1))]
                leaf = m.group(2)
                for hf, ours in (("attn.qkv", "qkv"), ("attn.proj", "proj"),
                                 ("mlp.gate_proj", "gate_proj"),
                                 ("mlp.up_proj", "up_proj"),
                                 ("mlp.down_proj", "down_proj")):
                    if leaf.startswith(hf + "."):
                        lin(bp.setdefault(ours, {}),
                            leaf.rsplit(".", 1)[1], w)
                        return
                if leaf in ("norm1.weight", "norm2.weight"):
                    bp[leaf.split(".")[0]] = {
                        "weight": jnp.asarray(w, jnp.float32)}
            elif m := re.match(r"merger\.(proj|gate_proj|up_proj|"
                               r"down_proj)\.(weight|bias)", rest):
                lin(vision["merger"].setdefault(m.group(1), {}),
                    m.group(2), w)
            elif rest.startswith("merger.post_projection_norm."):
                vision["merger"].setdefault("post_projection_norm", {})[
                    rest.rsplit(".", 1)[1]] = jnp.asarray(w, jnp.float32)

        def filter_stream():
            for name, w in weights:
                name = name.removeprefix("model.")
                if name.startswith("visual."):
                    _vis_put(name.removeprefix("visual."), w)
                elif name.startswith("language_model."):
                    yield name.removeprefix("language_model."), w
                else:
                    yield name, w

        from lvllm_tpu.models.qwen3 import Qwen3Model
        params = Qwen3Model.load_weights(self, filter_stream())
        params["vision"] = vision
        return params
