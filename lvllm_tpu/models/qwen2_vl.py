"""Qwen2-VL / Qwen2.5-VL multimodal family (M-RoPE + ViT vision tower).

Behavioral reference: ``vllm/model_executor/models/qwen2_vl.py`` /
``qwen2_5_vl.py`` (Qwen2VLForConditionalGeneration,
Qwen2_5_VLForConditionalGeneration) and the mrope rotary
(``model_executor/layers/rotary_embedding/mrope.py``); numerics follow
transformers ``modeling_qwen2_vl.py`` / ``modeling_qwen2_5_vl.py``.

Architecture notes (TPU-first):
- The language side is the unified Qwen2 decoder (attention bias, RMSNorm,
  SwiGLU) served by the base class; only rope changes — M-RoPE splits the
  rotary features into (t, h, w) sections driven by a [3, T] position
  array (ops/rope.apply_mrope).
- The vision tower is a pure function over flat HF-layout patches: the
  Conv3D patch embed is a single matmul (stride == kernel), 2D rotary
  cos/sin and the window/frame attention groups are precomputed host-side
  in numpy, and attention is mask-based (same-group membership) — the
  mathematical equivalent of HF's varlen cu_seqlens without any dynamic
  shapes inside jit. Qwen2.5-VL's window partition is a host-side row
  permutation at spatial-merge-unit granularity, inverted after the
  merger exactly like HF's reverse_indices.
"""

import functools
import re
from typing import Any, Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lvllm_tpu.config import ModelConfig
from lvllm_tpu.models.qwen3 import Qwen3Model
from lvllm_tpu.logger import init_logger

logger = init_logger(__name__)


# ---------------------------------------------------------------------------
# Host-side metadata (numpy; replicates HF rot_pos_emb / get_window_index)
# ---------------------------------------------------------------------------

def vision_rot_pos_ids(t: int, h: int, w: int, merge: int) -> np.ndarray:
    """Per-patch (h, w) position ids in the processor's merged-block patch
    order (HF ``rot_pos_emb``). Returns [t*h*w, 2] int32."""
    hpos = np.broadcast_to(np.arange(h)[:, None], (h, w))
    wpos = np.broadcast_to(np.arange(w)[None, :], (h, w))

    def blockify(x):
        x = x.reshape(h // merge, merge, w // merge, merge)
        return x.transpose(0, 2, 1, 3).reshape(-1)

    ids = np.stack([blockify(hpos), blockify(wpos)], axis=-1)  # [h*w, 2]
    return np.tile(ids, (t, 1)).astype(np.int32)


def vision_cos_sin(pos_ids: np.ndarray, head_dim: int,
                   theta: float = 10000.0) -> Tuple[np.ndarray, np.ndarray]:
    """2D rotary tables for the tower: freqs from h-ids ‖ w-ids, each
    head_dim/4 frequencies; duplicated to the full head_dim like HF's
    ``emb = cat(freqs, freqs)``. Returns (cos, sin) [L, head_dim] f32."""
    dim = head_dim // 2
    inv_freq = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float32) / dim))
    fh = pos_ids[:, 0:1].astype(np.float32) * inv_freq[None]   # [L, d/4]
    fw = pos_ids[:, 1:2].astype(np.float32) * inv_freq[None]
    freqs = np.concatenate([fh, fw], axis=-1)                  # [L, d/2]
    emb = np.concatenate([freqs, freqs], axis=-1)              # [L, d]
    return np.cos(emb), np.sin(emb)


def window_partition(t: int, h: int, w: int, merge: int, window_size: int,
                     patch_size: int) -> Tuple[np.ndarray, np.ndarray]:
    """Qwen2.5-VL window partition at spatial-merge-unit granularity (HF
    ``get_window_index``). Returns (window_index [G], win_id [G]) where
    G = t*(h/merge)*(w/merge): ``window_index`` permutes merge groups into
    window order; ``win_id[g]`` is the window id of permuted group g."""
    ws = window_size // merge // patch_size
    gh, gw = h // merge, w // merge
    index = np.arange(t * gh * gw).reshape(t, gh, gw)
    pad_h = (-gh) % ws
    pad_w = (-gw) % ws
    nwh, nww = (gh + pad_h) // ws, (gw + pad_w) // ws
    padded = np.full((t, gh + pad_h, gw + pad_w), -100, np.int64)
    padded[:, :gh, :gw] = index
    padded = padded.reshape(t, nwh, ws, nww, ws)
    padded = padded.transpose(0, 1, 3, 2, 4).reshape(t, nwh * nww, ws, ws)
    seqlens = (padded != -100).sum(axis=(2, 3)).reshape(-1)
    flat = padded.reshape(-1)
    window_index = flat[flat != -100]
    win_id = np.repeat(np.arange(len(seqlens)), seqlens)
    return window_index.astype(np.int32), win_id.astype(np.int32)


def mrope_positions(prompt_ids: np.ndarray, grids: np.ndarray,
                    image_token_id: int, video_token_id: Optional[int],
                    merge: int) -> Tuple[np.ndarray, int]:
    """3D rope positions for one prompt (HF ``get_rope_index``): text runs
    advance all three streams together; each vision block of grid (t,h,w)
    gets (frame, row, col) streams offset past the preceding max. Returns
    (positions [3, L] int32, mrope_delta) — decode positions continue at
    ``seq_pos + delta`` on all streams."""
    ids = np.asarray(prompt_ids)
    L = len(ids)
    pos = np.zeros((3, L), np.int64)
    is_vis = ids == image_token_id
    if video_token_id is not None:
        is_vis |= ids == video_token_id
    i = 0
    st_idx = 0
    g = 0
    while i < L:
        if not is_vis[i]:
            j = i
            while j < L and not is_vis[j]:
                j += 1
            n = j - i
            pos[:, i:j] = st_idx + np.arange(n)
            st_idx += n
            i = j
        else:
            if g >= len(grids):
                raise ValueError("more vision placeholder runs than grids")
            t, h, w = (int(grids[g][0]), int(grids[g][1]) // merge,
                       int(grids[g][2]) // merge)
            g += 1
            n = t * h * w
            if not np.all(is_vis[i:i + n]):
                raise ValueError("vision placeholder run shorter than grid")
            ti = np.repeat(np.arange(t), h * w)
            hi = np.tile(np.repeat(np.arange(h), w), t)
            wi = np.tile(np.arange(w), t * h)
            pos[0, i:i + n] = st_idx + ti
            pos[1, i:i + n] = st_idx + hi
            pos[2, i:i + n] = st_idx + wi
            st_idx += max(t, h, w)
            i += n
    delta = int(pos.max()) + 1 - L if L else 0
    return pos.astype(np.int32), delta


# ---------------------------------------------------------------------------
# Vision tower (device; pure function over a params dict)
# ---------------------------------------------------------------------------

def _ln(x, node, eps=1e-6):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * node["weight"]
            + node["bias"])


def _rms(x, node, eps=1e-6):
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(jnp.square(xf).mean(-1, keepdims=True) + eps)
    return y * node["weight"]


def _rotate_half(x):
    h = x.shape[-1] // 2
    return jnp.concatenate([-x[..., h:], x[..., :h]], axis=-1)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "gated", "rmsnorm",
                              "fullatt", "merge_unit"))
def _vision_tower(params, patches, cos, sin, frame_group, win_group, *,
                  num_heads: int, gated: bool, rmsnorm: bool,
                  fullatt: Tuple[int, ...], merge_unit: int):
    """patches [L, C*Tp*P*P] f32 → merged features [L/merge_unit, out].

    ``frame_group``/``win_group`` [L] int32: attention is allowed within
    equal group ids — frame groups for full-attention blocks, window
    groups for windowed blocks (Qwen2.5-VL)."""
    norm = _rms if rmsnorm else _ln
    h = patches @ params["patch_embed"]                       # [L, D]
    L, D = h.shape
    Hd = D // num_heads
    scale = Hd ** -0.5
    cos_ = cos[:, None, :]                                    # [L, 1, Hd]
    sin_ = sin[:, None, :]
    for b, bp in enumerate(params["blocks"]):
        group = frame_group if (not fullatt or b in fullatt) else win_group
        mask = group[:, None] == group[None, :]               # [L, L]
        res = h
        x = norm(h, bp["norm1"]).astype(h.dtype)
        qkv = x @ bp["qkv"]["kernel"] + bp["qkv"]["bias"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(L, num_heads, Hd).astype(jnp.float32)
        k = k.reshape(L, num_heads, Hd).astype(jnp.float32)
        v = v.reshape(L, num_heads, Hd).astype(jnp.float32)
        q = q * cos_ + _rotate_half(q) * sin_
        k = k * cos_ + _rotate_half(k) * sin_
        s = jnp.einsum("thd,shd->hts", q, k) * scale          # [H, L, L]
        s = jnp.where(mask[None], s, -jnp.inf)
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("hts,shd->thd", p, v).reshape(L, D)
        o = o.astype(h.dtype) @ bp["proj"]["kernel"] + bp["proj"]["bias"]
        h = res + o
        res = h
        x = norm(h, bp["norm2"]).astype(h.dtype)
        if gated:
            gate = x @ bp["gate_proj"]["kernel"] + bp["gate_proj"]["bias"]
            up = x @ bp["up_proj"]["kernel"] + bp["up_proj"]["bias"]
            y = jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up
            y = y @ bp["down_proj"]["kernel"] + bp["down_proj"]["bias"]
        else:
            y = x @ bp["fc1"]["kernel"] + bp["fc1"]["bias"]
            y = (y * jax.nn.sigmoid(1.702 * y.astype(jnp.float32))
                 ).astype(y.dtype)                            # quick_gelu
            y = y @ bp["fc2"]["kernel"] + bp["fc2"]["bias"]
        h = res + y
    m = params["merger"]
    x = norm(h, m["ln_q"]).astype(h.dtype).reshape(
        L // merge_unit, merge_unit * D)
    x = x @ m["mlp0"]["kernel"] + m["mlp0"]["bias"]
    x = jax.nn.gelu(x.astype(jnp.float32), approximate=False).astype(x.dtype)
    return x @ m["mlp1"]["kernel"] + m["mlp1"]["bias"]


# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------

class Qwen2VLModel(Qwen3Model):
    """Qwen2-VL / Qwen2.5-VL: Qwen2 decoder + M-RoPE + ViT tower."""

    is_multimodal = True
    # Vision encode handles variable grids itself (runner calls encode_mm
    # with the raw mm_data instead of jitting encode_images over a fixed
    # pixel shape).
    mm_dynamic = True
    uses_mrope = True
    dcp_compatible = False

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        vc = config.vision_config or {}
        self.is_v25 = (config.architecture
                       == "Qwen2_5_VLForConditionalGeneration")
        if self.is_v25:
            self.v_hidden = vc.get("hidden_size", 1280)
            self.v_intermediate = vc.get("intermediate_size", 3420)
            self.v_out = vc.get("out_hidden_size", config.hidden_size)
        else:
            self.v_hidden = vc.get("embed_dim", 1280)
            self.v_intermediate = int(self.v_hidden
                                      * vc.get("mlp_ratio", 4))
            self.v_out = vc.get("hidden_size", config.hidden_size)
        self.v_heads = vc.get("num_heads", 16)
        self.v_depth = vc.get("depth", 32)
        self.patch_size = vc.get("patch_size", 14)
        self.temporal_patch_size = vc.get("temporal_patch_size", 2)
        self.merge = vc.get("spatial_merge_size", 2)
        self.window_size = vc.get("window_size", 112)
        self.fullatt = tuple(vc.get("fullatt_block_indexes") or ()) \
            if self.is_v25 else ()
        self.in_channels = vc.get("in_channels", 3)

    # ---- vision ------------------------------------------------------------

    def encode_mm(self, params, mm_data: dict) -> np.ndarray:
        """mm_data: pixel_values [ΣL_i, C*Tp*P*P] (HF processor layout) +
        image_grid_thw [N, 3]. Returns merged features [ΣL_i/merge², out]
        in placeholder order."""
        pix = np.asarray(mm_data["pixel_values"], np.float32)
        grids = np.asarray(mm_data["image_grid_thw"], np.int64).reshape(-1, 3)
        mu = self.merge * self.merge
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
            frame_group = np.repeat(np.arange(t, dtype=np.int32), h * w)
            if self.is_v25:
                widx, win_id = window_partition(
                    t, h, w, self.merge, self.window_size, self.patch_size)
                # Permute rows at merge-unit granularity into window order.
                perm = (widx[:, None] * mu
                        + np.arange(mu)[None]).reshape(-1)
                patches = patches[perm]
                cos, sin = cos[perm], sin[perm]
                frame_group = frame_group[perm]
                win_group = np.repeat(win_id, mu).astype(np.int32)
            else:
                win_group = frame_group
            out = _vision_tower(
                params["vision"], jnp.asarray(patches), jnp.asarray(cos),
                jnp.asarray(sin), jnp.asarray(frame_group),
                jnp.asarray(win_group), num_heads=self.v_heads,
                gated=self.is_v25, rmsnorm=self.is_v25,
                fullatt=self.fullatt, merge_unit=mu)
            out = np.asarray(out, np.float32)
            if self.is_v25:
                out = out[np.argsort(widx)]          # undo window permute
            feats.append(out)
        return np.concatenate(feats, axis=0)

    def mm_positions(self, prompt_ids, mm_data: dict
                     ) -> Tuple[np.ndarray, int]:
        grids = np.asarray(mm_data["image_grid_thw"], np.int64).reshape(-1, 3)
        return mrope_positions(prompt_ids, grids,
                               self.config.image_token_id,
                               self.config.video_token_id, self.merge)

    def num_mm_tokens(self, mm_data: dict) -> List[int]:
        """Per-image merged-token counts (for placeholder expansion)."""
        grids = np.asarray(mm_data["image_grid_thw"], np.int64).reshape(-1, 3)
        mu = self.merge * self.merge
        return [int(t * h * w) // mu for (t, h, w) in grids]

    # ---- params ------------------------------------------------------------

    def init_params(self, rng) -> Dict[str, Any]:
        params = super().init_params(rng)
        nprng = np.random.default_rng(1234 + self.config.seed)
        D, I = self.v_hidden, self.v_intermediate
        patch_in = (self.in_channels * self.temporal_patch_size
                    * self.patch_size ** 2)

        def dense(shape, scale=0.02):
            return jnp.asarray(nprng.standard_normal(size=shape) * scale,
                               jnp.float32)

        def normn():
            n = {"weight": jnp.ones((D,), jnp.float32)}
            if not self.is_v25:
                n["bias"] = jnp.zeros((D,), jnp.float32)
            return n

        blocks = []
        for _ in range(self.v_depth):
            bp = {
                "norm1": normn(), "norm2": normn(),
                "qkv": {"kernel": dense((D, 3 * D)),
                        "bias": jnp.zeros((3 * D,), jnp.float32)},
                "proj": {"kernel": dense((D, D)),
                         "bias": jnp.zeros((D,), jnp.float32)},
            }
            if self.is_v25:
                bp["gate_proj"] = {"kernel": dense((D, I)),
                                   "bias": jnp.zeros((I,), jnp.float32)}
                bp["up_proj"] = {"kernel": dense((D, I)),
                                 "bias": jnp.zeros((I,), jnp.float32)}
                bp["down_proj"] = {"kernel": dense((I, D)),
                                   "bias": jnp.zeros((D,), jnp.float32)}
            else:
                bp["fc1"] = {"kernel": dense((D, I)),
                             "bias": jnp.zeros((I,), jnp.float32)}
                bp["fc2"] = {"kernel": dense((I, D)),
                             "bias": jnp.zeros((D,), jnp.float32)}
            blocks.append(bp)
        mu = self.merge * self.merge
        params["vision"] = {
            "patch_embed": dense((patch_in, D)),
            "blocks": blocks,
            "merger": {
                "ln_q": normn(),
                "mlp0": {"kernel": dense((mu * D, mu * D)),
                         "bias": jnp.zeros((mu * D,), jnp.float32)},
                "mlp1": {"kernel": dense((mu * D, self.v_out)),
                         "bias": jnp.zeros((self.v_out,), jnp.float32)},
            },
        }
        return params

    # ---- weight loading ------------------------------------------------------

    def load_weights(self, weights: Iterable[Tuple[str, np.ndarray]]):
        vision: Dict[str, Any] = {
            "blocks": [{} for _ in range(self.v_depth)], "merger": {}}

        def as_linear(node: Dict[str, Any], kind: str, w: np.ndarray):
            if kind == "weight":
                node["kernel"] = jnp.asarray(np.ascontiguousarray(w.T),
                                             jnp.float32)
            else:
                node["bias"] = jnp.asarray(w, jnp.float32)

        def _vis_put(rest: str, w: np.ndarray):
            if rest.startswith("patch_embed.proj."):
                # Conv3D [D, C, Tp, P, P] → matmul kernel [C*Tp*P*P, D].
                vision["patch_embed"] = jnp.asarray(
                    w.reshape(w.shape[0], -1).T, jnp.float32)
                return
            if m := re.match(r"blocks\.(\d+)\.(.+)", rest):
                bp = vision["blocks"][int(m.group(1))]
                leaf = m.group(2)
                for hf, ours in (("attn.qkv", "qkv"), ("attn.proj", "proj"),
                                 ("mlp.fc1", "fc1"), ("mlp.fc2", "fc2"),
                                 ("mlp.gate_proj", "gate_proj"),
                                 ("mlp.up_proj", "up_proj"),
                                 ("mlp.down_proj", "down_proj")):
                    if leaf.startswith(hf + "."):
                        as_linear(bp.setdefault(ours, {}),
                                  leaf.rsplit(".", 1)[1], w)
                        return
                if leaf.startswith(("norm1.", "norm2.")):
                    which, kind = leaf.split(".", 1)
                    bp.setdefault(which, {})[kind] = jnp.asarray(
                        w, jnp.float32)
                return
            if rest.startswith("merger.ln_q."):
                vision["merger"].setdefault("ln_q", {})[
                    rest.rsplit(".", 1)[1]] = jnp.asarray(w, jnp.float32)
            elif m := re.match(r"merger\.mlp\.([02])\.(weight|bias)", rest):
                slot = "mlp0" if m.group(1) == "0" else "mlp1"
                as_linear(vision["merger"].setdefault(slot, {}),
                          m.group(2), w)

        def filter_stream():
            for name, w in weights:
                name = name.removeprefix("model.")
                if name.startswith("visual."):
                    _vis_put(name.removeprefix("visual."), w)
                elif name.startswith("language_model."):
                    yield name.removeprefix("language_model."), w
                else:
                    yield name, w

        params = super().load_weights(filter_stream())
        params["vision"] = vision
        return params
