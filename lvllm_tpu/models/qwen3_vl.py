"""Qwen3-VL / Qwen3-VL-MoE: deepstack vision injection + interleaved
M-RoPE.

Behavioral reference: ``vllm/model_executor/models/qwen3_vl.py``
(Qwen3_VisionTransformer deepstack merger taps :534/:804-823,
Qwen3LLMModel per-layer ``deepstack_input_embeds`` add :1532-1537) and
``qwen3_vl_moe.py``; numerics follow transformers
``modeling_qwen3_vl.py`` (fast_pos_embed_interpolate :642, interleaved
mrope :299, timestamp-split video rope index :916).

Architecture notes (TPU-first):
- The language side is the unified Qwen3 decoder (qk-norm, RMSNorm,
  SwiGLU, optionally MoE) served by the base class; deepstack features
  enter as a dense [levels, T, H] tensor added to the residual stream
  after the first ``levels`` layers inside the same jitted step (the
  reference streams them through forward hooks; here they are just one
  more jit argument — zeros at non-image rows).
- The ViT keeps the Qwen2-VL design (mask-based same-frame attention, no
  dynamic shapes inside jit) plus Qwen3 specifics: learned pos-embed
  bilinearly interpolated host-side to the grid, non-gated tanh-GELU
  MLP, and per-level postshuffle-norm patch mergers whose outputs ride
  the feature channel dim: encode_mm returns [N, (1+levels)*out].
"""

import functools
import re
from typing import Any, Dict, Iterable, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lvllm_tpu.config import ModelConfig
from lvllm_tpu.models.qwen2_vl import (Qwen2VLModel, _ln, mrope_positions,
                                       vision_cos_sin, vision_rot_pos_ids)
from lvllm_tpu.logger import init_logger

logger = init_logger(__name__)


def pos_embed_interpolate(table: np.ndarray, t: int, h: int, w: int,
                          merge: int) -> np.ndarray:
    """Bilinear interpolation of the learned [S*S, D] pos-embed grid onto
    an (h, w) patch grid, then block-permute into the processor's merged
    patch order and tile over t frames (HF fast_pos_embed_interpolate).
    Returns [t*h*w, D] f32."""
    side = int(round(len(table) ** 0.5))
    D = table.shape[1]
    h_idx = np.linspace(0, side - 1, h, dtype=np.float32)
    w_idx = np.linspace(0, side - 1, w, dtype=np.float32)
    h0 = h_idx.astype(np.int32)
    w0 = w_idx.astype(np.int32)
    h1 = np.clip(h0 + 1, None, side - 1)
    w1 = np.clip(w0 + 1, None, side - 1)
    dh = (h_idx - h0)[:, None]
    dw = (w_idx - w0)[None, :]
    out = (table[(h0[:, None] * side + w0[None, :]).ravel()].reshape(h, w, D)
           * ((1 - dh) * (1 - dw))[..., None]
           + table[(h0[:, None] * side + w1[None, :]).ravel()].reshape(
               h, w, D) * ((1 - dh) * dw)[..., None]
           + table[(h1[:, None] * side + w0[None, :]).ravel()].reshape(
               h, w, D) * (dh * (1 - dw))[..., None]
           + table[(h1[:, None] * side + w1[None, :]).ravel()].reshape(
               h, w, D) * (dh * dw)[..., None])
    blocked = out.reshape(h // merge, merge, w // merge, merge, D)
    blocked = blocked.transpose(0, 2, 1, 3, 4).reshape(h * w, D)
    return np.tile(blocked, (t, 1)).astype(np.float32)


def _merger(node, x, merge_unit: int, postshuffle: bool):
    """Qwen3 PatchMerger: LayerNorm (pre- or post-shuffle) → fc1 → exact
    GELU → fc2 (HF Qwen3VLVisionPatchMerger)."""
    L, D = x.shape
    if postshuffle:
        x = x.reshape(L // merge_unit, merge_unit * D)
        x = _ln(x, node["norm"]).astype(x.dtype)
    else:
        x = _ln(x, node["norm"]).astype(x.dtype).reshape(
            L // merge_unit, merge_unit * D)
    y = x @ node["fc1"]["kernel"] + node["fc1"]["bias"]
    y = jax.nn.gelu(y.astype(jnp.float32), approximate=False).astype(y.dtype)
    return y @ node["fc2"]["kernel"] + node["fc2"]["bias"]


@functools.partial(jax.jit, static_argnames=("num_heads", "merge_unit",
                                             "deepstack"))
def _qwen3_vision_tower(params, patches, pos_embeds, cos, sin, frame_group,
                        *, num_heads: int, merge_unit: int,
                        deepstack: Tuple[int, ...]):
    """patches [L, C*Tp*P*P] f32 → [L/mu, (1+len(deepstack))*out]: the
    main merger output with each deepstack level's postshuffle-merged
    features concatenated on the channel dim (reference ViT forward
    qwen3_vl.py:804-823)."""
    h = patches @ params["patch_embed"] + params["patch_embed_bias"]
    h = h + pos_embeds
    L, D = h.shape
    Hd = D // num_heads
    scale = Hd ** -0.5
    cos_ = cos[:, None, :]
    sin_ = sin[:, None, :]

    def rot(x):
        half = x.shape[-1] // 2
        rx = jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)
        return x * cos_ + rx * sin_

    mask = frame_group[:, None] == frame_group[None, :]
    outs = []
    for b, bp in enumerate(params["blocks"]):
        res = h
        x = _ln(h, bp["norm1"]).astype(h.dtype)
        qkv = x @ bp["qkv"]["kernel"] + bp["qkv"]["bias"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = rot(q.reshape(L, num_heads, Hd).astype(jnp.float32))
        k = rot(k.reshape(L, num_heads, Hd).astype(jnp.float32))
        v = v.reshape(L, num_heads, Hd).astype(jnp.float32)
        s = jnp.einsum("thd,shd->hts", q, k) * scale
        s = jnp.where(mask[None], s, -jnp.inf)
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("hts,shd->thd", p, v).reshape(L, D)
        o = o.astype(h.dtype) @ bp["proj"]["kernel"] + bp["proj"]["bias"]
        h = res + o
        res = h
        x = _ln(h, bp["norm2"]).astype(h.dtype)
        y = x @ bp["fc1"]["kernel"] + bp["fc1"]["bias"]
        y = jax.nn.gelu(y.astype(jnp.float32),
                        approximate=True).astype(y.dtype)
        y = y @ bp["fc2"]["kernel"] + bp["fc2"]["bias"]
        h = res + y
        if b in deepstack:
            lvl = deepstack.index(b)
            outs.append(_merger(params["deepstack_mergers"][lvl], h,
                                merge_unit, postshuffle=True))
    main = _merger(params["merger"], h, merge_unit, postshuffle=False)
    return jnp.concatenate([main] + outs, axis=-1)


class Qwen3VLModel(Qwen2VLModel):
    """Qwen3-VL (dense) and Qwen3-VL-MoE: Qwen3(MoE) decoder + deepstack
    ViT + interleaved M-RoPE (registry.py:535-538)."""

    def __init__(self, config: ModelConfig):
        # Skip Qwen2VLModel.__init__'s v2-specific vision parsing.
        from lvllm_tpu.models.qwen3 import Qwen3Model
        Qwen3Model.__init__(self, config)
        vc = config.vision_config or {}
        self.v_hidden = vc.get("hidden_size", 1152)
        self.v_intermediate = vc.get("intermediate_size", 4304)
        self.v_out = vc.get("out_hidden_size", config.hidden_size)
        self.v_heads = vc.get("num_heads", 16)
        self.v_depth = vc.get("depth", 27)
        self.patch_size = vc.get("patch_size", 16)
        self.temporal_patch_size = vc.get("temporal_patch_size", 2)
        self.merge = vc.get("spatial_merge_size", 2)
        self.in_channels = vc.get("in_channels", 3)
        self.num_pos_embeddings = vc.get("num_position_embeddings", 2304)
        self.deepstack_indexes = tuple(
            vc.get("deepstack_visual_indexes") or ())
        self.num_deepstack = len(self.deepstack_indexes)

    # ---- vision ------------------------------------------------------------

    def encode_mm(self, params, mm_data: dict) -> np.ndarray:
        """Returns [N_merged, (1+levels)*out]: main features then each
        deepstack level stacked on the channel dim (the runner splits
        them back out into mm_embeds + mm_deepstack)."""
        pix = np.asarray(mm_data["pixel_values"], np.float32)
        grids = np.asarray(mm_data["image_grid_thw"], np.int64).reshape(-1, 3)
        vp = params["vision"]
        table = np.asarray(vp["pos_embed"], np.float32)
        Hd = self.v_hidden // self.v_heads
        feats: List[np.ndarray] = []
        off = 0
        for (t, h, w) in grids:
            t, h, w = int(t), int(h), int(w)
            L = t * h * w
            patches = pix[off:off + L]
            off += L
            pos_ids = vision_rot_pos_ids(t, h, w, self.merge)
            cos, sin = vision_cos_sin(pos_ids, Hd)
            pe = pos_embed_interpolate(table, t, h, w, self.merge)
            frame_group = np.repeat(np.arange(t, dtype=np.int32), h * w)
            out = _qwen3_vision_tower(
                vp, jnp.asarray(patches), jnp.asarray(pe),
                jnp.asarray(cos), jnp.asarray(sin),
                jnp.asarray(frame_group), num_heads=self.v_heads,
                merge_unit=self.merge * self.merge,
                deepstack=self.deepstack_indexes)
            feats.append(np.asarray(out, np.float32))
        return np.concatenate(feats, axis=0)

    def mm_positions(self, prompt_ids, mm_data: dict
                     ) -> Tuple[np.ndarray, int]:
        """Qwen3-VL rope index: videos are timestamp-split per frame
        (grid repeated with t=1 — HF get_rope_index qwen3_vl.py:921)."""
        grids = np.asarray(mm_data["image_grid_thw"], np.int64).reshape(-1, 3)
        vgrids = mm_data.get("video_grid_thw")
        if vgrids is not None:
            vgrids = np.asarray(vgrids, np.int64).reshape(-1, 3)
            expanded = np.repeat(vgrids, vgrids[:, 0], axis=0)
            expanded[:, 0] = 1
            grids = np.concatenate([grids, expanded], axis=0) \
                if len(grids) else expanded
        return mrope_positions(prompt_ids, grids,
                               self.config.image_token_id,
                               self.config.video_token_id, self.merge)

    # ---- params ------------------------------------------------------------

    def init_params(self, rng) -> Dict[str, Any]:
        from lvllm_tpu.models.qwen3 import Qwen3Model
        params = Qwen3Model.init_params(self, rng)
        nprng = np.random.default_rng(1234 + self.config.seed)
        D, I = self.v_hidden, self.v_intermediate
        mu = self.merge * self.merge
        patch_in = (self.in_channels * self.temporal_patch_size
                    * self.patch_size ** 2)

        def dense(shape, scale=0.02):
            return jnp.asarray(nprng.standard_normal(size=shape) * scale,
                               jnp.float32)

        def normn(width=D):
            return {"weight": jnp.ones((width,), jnp.float32),
                    "bias": jnp.zeros((width,), jnp.float32)}

        def merger_node(postshuffle: bool):
            return {
                "norm": normn(mu * D if postshuffle else D),
                "fc1": {"kernel": dense((mu * D, mu * D)),
                        "bias": jnp.zeros((mu * D,), jnp.float32)},
                "fc2": {"kernel": dense((mu * D, self.v_out)),
                        "bias": jnp.zeros((self.v_out,), jnp.float32)},
            }

        blocks = []
        for _ in range(self.v_depth):
            blocks.append({
                "norm1": normn(), "norm2": normn(),
                "qkv": {"kernel": dense((D, 3 * D)),
                        "bias": jnp.zeros((3 * D,), jnp.float32)},
                "proj": {"kernel": dense((D, D)),
                         "bias": jnp.zeros((D,), jnp.float32)},
                "fc1": {"kernel": dense((D, I)),
                        "bias": jnp.zeros((I,), jnp.float32)},
                "fc2": {"kernel": dense((I, D)),
                        "bias": jnp.zeros((D,), jnp.float32)},
            })
        params["vision"] = {
            "patch_embed": dense((patch_in, D)),
            "patch_embed_bias": jnp.zeros((D,), jnp.float32),
            "pos_embed": dense((self.num_pos_embeddings, D)),
            "blocks": blocks,
            "merger": merger_node(False),
            "deepstack_mergers": [merger_node(True)
                                  for _ in range(self.num_deepstack)],
        }
        return params

    # ---- weight loading -----------------------------------------------------

    def load_weights(self, weights: Iterable[Tuple[str, np.ndarray]]):
        from lvllm_tpu.models.qwen3 import Qwen3Model

        vision: Dict[str, Any] = {
            "blocks": [{} for _ in range(self.v_depth)],
            "merger": {},
            "deepstack_mergers": [{} for _ in range(self.num_deepstack)],
        }

        def as_linear(node: Dict[str, Any], kind: str, w: np.ndarray):
            if kind == "weight":
                node["kernel"] = jnp.asarray(np.ascontiguousarray(w.T),
                                             jnp.float32)
            else:
                node["bias"] = jnp.asarray(w, jnp.float32)

        def put_merger(node: Dict[str, Any], rest: str, w: np.ndarray):
            if rest.startswith("norm."):
                node.setdefault("norm", {})[rest.split(".")[1]] = \
                    jnp.asarray(w, jnp.float32)
            elif rest.startswith("linear_fc1."):
                as_linear(node.setdefault("fc1", {}), rest.split(".")[1], w)
            elif rest.startswith("linear_fc2."):
                as_linear(node.setdefault("fc2", {}), rest.split(".")[1], w)

        def _vis_put(rest: str, w: np.ndarray):
            if rest == "patch_embed.proj.weight":
                vision["patch_embed"] = jnp.asarray(
                    w.reshape(w.shape[0], -1).T, jnp.float32)
            elif rest == "patch_embed.proj.bias":
                vision["patch_embed_bias"] = jnp.asarray(w, jnp.float32)
            elif rest == "pos_embed.weight":
                vision["pos_embed"] = jnp.asarray(w, jnp.float32)
            elif m := re.match(r"blocks\.(\d+)\.(.+)", rest):
                bp = vision["blocks"][int(m.group(1))]
                leaf = m.group(2)
                for hf, ours in (("attn.qkv", "qkv"), ("attn.proj", "proj"),
                                 ("mlp.linear_fc1", "fc1"),
                                 ("mlp.linear_fc2", "fc2")):
                    if leaf.startswith(hf + "."):
                        as_linear(bp.setdefault(ours, {}),
                                  leaf.rsplit(".", 1)[1], w)
                        return
                if leaf.startswith(("norm1.", "norm2.")):
                    which, kind = leaf.split(".", 1)
                    bp.setdefault(which, {})[kind] = jnp.asarray(
                        w, jnp.float32)
            elif m := re.match(r"deepstack_merger_list\.(\d+)\.(.+)", rest):
                put_merger(vision["deepstack_mergers"][int(m.group(1))],
                           m.group(2), w)
            elif rest.startswith("merger."):
                put_merger(vision["merger"], rest.removeprefix("merger."), w)

        def adapt_stream():
            E = self.config.num_experts or 0
            for name, w in weights:
                name = name.removeprefix("model.")
                if name.startswith("visual."):
                    _vis_put(name.removeprefix("visual."), w)
                    continue
                name = name.removeprefix("language_model.")
                # Qwen3-VL-MoE packs experts as 3D tensors
                # (modeling_qwen3_vl_moe.py:74-75: gate_up_proj [E, H, 2I],
                # down_proj [E, I, H]) — split into the per-expert names
                # the base mapping stacks back up.
                if m := re.match(r"layers\.(\d+)\.mlp\.experts\."
                                 r"(gate_up_proj|down_proj)$", name):
                    i, which = m.group(1), m.group(2)
                    I2 = w.shape[-1] // 2 if which == "gate_up_proj" else None
                    for e in range(E):
                        if which == "gate_up_proj":
                            yield (f"layers.{i}.mlp.experts.{e}."
                                   f"gate_proj.weight",
                                   np.ascontiguousarray(w[e, :, :I2].T))
                            yield (f"layers.{i}.mlp.experts.{e}."
                                   f"up_proj.weight",
                                   np.ascontiguousarray(w[e, :, I2:].T))
                        else:
                            yield (f"layers.{i}.mlp.experts.{e}."
                                   f"down_proj.weight",
                                   np.ascontiguousarray(w[e].T))
                    continue
                yield name, w

        params = Qwen3Model.load_weights(self, adapt_stream())
        params["vision"] = vision
        return params
