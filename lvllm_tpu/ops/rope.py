"""Rotary position embeddings.

Counterpart of the reference's ``csrc/pos_encoding_kernels.cu``
(``rotary_embedding``) and ``model_executor/layers/rotary_embedding``.
Neox-style (half rotation) layout, precomputed cos/sin cache gathered by
position — a single fused elementwise op under XLA.
"""

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _yarn_inv_freq(rot_dim: int, theta: float, scaling: dict
                   ) -> Tuple[np.ndarray, float]:
    """YaRN inverse frequencies + attention (mscale) factor.

    Numerics reference: transformers modeling_rope_utils
    ``_compute_yarn_parameters`` (used by gpt-oss, DeepSeek V3, Qwen long
    contexts); the reference consumes the same HF rope_scaling dicts via
    ``model_executor/layers/rotary_embedding``.
    """
    factor = float(scaling.get("factor", 1.0))
    attention_factor = scaling.get("attention_factor")
    mscale = scaling.get("mscale")
    mscale_all_dim = scaling.get("mscale_all_dim")
    orig_max = scaling.get("original_max_position_embeddings")

    def get_mscale(scale, m=1.0):
        if scale <= 1:
            return 1.0
        return 0.1 * m * math.log(scale) + 1.0

    if attention_factor is None:
        if mscale and mscale_all_dim:
            attention_factor = float(
                get_mscale(factor, mscale) / get_mscale(factor, mscale_all_dim))
        else:
            attention_factor = get_mscale(factor)
    beta_fast = scaling.get("beta_fast") or 32.0
    beta_slow = scaling.get("beta_slow") or 1.0

    def correction_dim(num_rot):
        return (rot_dim * math.log(orig_max / (num_rot * 2 * math.pi))
                ) / (2 * math.log(theta))

    low, high = correction_dim(beta_fast), correction_dim(beta_slow)
    if scaling.get("truncate", True):
        low, high = math.floor(low), math.ceil(high)
    low, high = max(low, 0), min(high, rot_dim - 1)
    if low == high:
        high += 0.001

    pos_freqs = theta ** (np.arange(0, rot_dim, 2, dtype=np.float32) / rot_dim)
    extrapolation = 1.0 / pos_freqs
    interpolation = 1.0 / (factor * pos_freqs)
    ramp = np.clip((np.arange(rot_dim // 2, dtype=np.float32) - low)
                   / (high - low), 0, 1)
    extrapolation_factor = 1 - ramp
    inv_freq = (interpolation * (1 - extrapolation_factor)
                + extrapolation * extrapolation_factor)
    return inv_freq, float(attention_factor)


def _llama3_inv_freq(inv_freq: np.ndarray, scaling: dict) -> np.ndarray:
    """Llama-3.1 frequency warp (transformers _compute_llama3_parameters)."""
    factor = float(scaling["factor"])
    low_f = float(scaling["low_freq_factor"])
    high_f = float(scaling["high_freq_factor"])
    old_len = float(scaling["original_max_position_embeddings"])
    low_wl, high_wl = old_len / low_f, old_len / high_f
    wavelen = 2 * math.pi / inv_freq
    scaled = np.where(wavelen > low_wl, inv_freq / factor, inv_freq)
    smooth = (old_len / wavelen - low_f) / (high_f - low_f)
    smoothed = (1 - smooth) * scaled / factor + smooth * scaled
    medium = (wavelen >= high_wl) & (wavelen <= low_wl)
    return np.where(medium, smoothed, scaled).astype(np.float32)


def compute_cos_sin_cache(
    head_dim: int,
    max_position: int,
    theta: float = 10000.0,
    rope_scaling: Optional[dict] = None,
    dtype=jnp.float32,
) -> jax.Array:
    """[max_position, head_dim] with cos in [:, :d/2], sin in [:, d/2:].

    Supports HF rope_scaling types: linear, yarn (incl. DeepSeek mscale
    variants; cos/sin scaled by the attention factor), llama3, dynamic
    (identity at build time). Computed host-side in numpy — this is a
    constant folded into the jitted step, never a device op at load.
    """
    rot_dim = head_dim
    inv_freq = 1.0 / (theta ** (
        np.arange(0, rot_dim, 2, dtype=np.float32) / rot_dim))
    attn_factor = 1.0
    if rope_scaling:
        stype = rope_scaling.get("rope_type", rope_scaling.get("type"))
        factor = float(rope_scaling.get("factor", 1.0))
        if stype == "linear":
            inv_freq = inv_freq / factor
        elif stype == "yarn":
            scaling = dict(rope_scaling)
            if not scaling.get("original_max_position_embeddings"):
                scaling["original_max_position_embeddings"] = max_position
            inv_freq, attn_factor = _yarn_inv_freq(rot_dim, theta, scaling)
        elif stype == "llama3":
            inv_freq = _llama3_inv_freq(inv_freq, rope_scaling)
        elif stype in ("longrope", "su"):
            # Phi-3 LongRoPE: per-frequency short/long rescale factors.
            # Positions < original_max use the short factors, beyond use
            # the long ones (the reference's Phi3LongRoPEScaledRotary-
            # Embedding per-position switch; HF switches per seq_len —
            # identical whenever the sequence fits the original window).
            orig = int(rope_scaling.get("original_max_position_embeddings")
                       or max_position)
            factor = max_position / orig
            attn_factor = rope_scaling.get("attention_factor")
            if attn_factor is None:
                attn_factor = (1.0 if factor <= 1.0 else
                               math.sqrt(1 + math.log(factor)
                                         / math.log(orig)))
            short = np.asarray(rope_scaling["short_factor"], np.float32)
            long_ = np.asarray(rope_scaling["long_factor"], np.float32)
            inv_short = inv_freq / short
            inv_long = inv_freq / long_
            t = np.arange(max_position, dtype=np.float32)
            freqs = np.where((t < orig)[:, None],
                             np.outer(t, inv_short), np.outer(t, inv_long))
            cache = np.concatenate([np.cos(freqs), np.sin(freqs)],
                                   axis=-1) * attn_factor
            return jnp.asarray(cache, dtype)
        elif stype in ("dynamic", "default", None):
            pass  # dynamic NTK applied at runtime for >max_position; skip
    t = np.arange(max_position, dtype=np.float32)
    freqs = np.outer(t, inv_freq)  # [P, d/2]
    cache = np.concatenate([np.cos(freqs), np.sin(freqs)],
                           axis=-1) * attn_factor
    return jnp.asarray(cache, dtype)


def apply_rope(
    q: jax.Array,          # [T, Hq, D]
    k: jax.Array,          # [T, Hkv, D]
    positions: jax.Array,  # [T] int32
    cos_sin_cache: jax.Array,  # [P, rot_dim]
) -> Tuple[jax.Array, jax.Array]:
    """Neox-style rotation of q and k by position. Supports partial rotary
    (rot_dim < head_dim, e.g. GLM partial_rotary_factor=0.5): only the first
    rot_dim features rotate, the rest pass through."""
    d = q.shape[-1]
    rot_dim = cos_sin_cache.shape[-1]
    cs = cos_sin_cache[positions]               # [T, rot_dim]
    cos = cs[:, : rot_dim // 2][:, None, :]     # [T, 1, rot/2]
    sin = cs[:, rot_dim // 2:][:, None, :]

    def rot(x):
        xr, x_pass = x[..., :rot_dim], x[..., rot_dim:]
        x1 = xr[..., : rot_dim // 2].astype(jnp.float32)
        x2 = xr[..., rot_dim // 2:].astype(jnp.float32)
        o1 = x1 * cos - x2 * sin
        o2 = x2 * cos + x1 * sin
        out = jnp.concatenate([o1, o2], axis=-1).astype(x.dtype)
        if x_pass.shape[-1]:
            out = jnp.concatenate([out, x_pass], axis=-1)
        return out

    return rot(q), rot(k)


def apply_mrope(
    q: jax.Array,          # [T, Hq, D]
    k: jax.Array,          # [T, Hkv, D]
    positions: jax.Array,  # [3, T] int32 — (temporal, height, width) streams
    cos_sin_cache: jax.Array,  # [P, rot_dim]
    mrope_section,         # e.g. (16, 24, 24); sums to rot_dim // 2
) -> Tuple[jax.Array, jax.Array]:
    """Multimodal rotary (M-RoPE, Qwen2-VL family).

    Counterpart of the reference's MRotaryEmbedding
    (``model_executor/layers/rotary_embedding/mrope.py``) / HF
    ``apply_multimodal_rotary_pos_emb``: the rotary feature dim is split
    into sections, section ``i`` rotating by position stream ``i % 3``
    (temporal / height / width). Text tokens carry identical streams, so
    this degrades to standard RoPE for pure text."""
    rot_dim = cos_sin_cache.shape[-1]
    half = rot_dim // 2
    assert sum(mrope_section) == half, (mrope_section, half)
    cs = cos_sin_cache[positions]               # [3, T, rot_dim]
    cos3 = cs[..., :half]                        # [3, T, half]
    sin3 = cs[..., half:]

    # Assemble [T, half] by taking section i from stream i % 3.
    parts_c, parts_s = [], []
    off = 0
    for i, sec in enumerate(mrope_section):
        parts_c.append(cos3[i % 3, :, off:off + sec])
        parts_s.append(sin3[i % 3, :, off:off + sec])
        off += sec
    cos = jnp.concatenate(parts_c, axis=-1)[:, None, :]   # [T, 1, half]
    sin = jnp.concatenate(parts_s, axis=-1)[:, None, :]

    def rot(x):
        xr, x_pass = x[..., :rot_dim], x[..., rot_dim:]
        x1 = xr[..., :half].astype(jnp.float32)
        x2 = xr[..., half:].astype(jnp.float32)
        o1 = x1 * cos - x2 * sin
        o2 = x2 * cos + x1 * sin
        out = jnp.concatenate([o1, o2], axis=-1).astype(x.dtype)
        if x_pass.shape[-1]:
            out = jnp.concatenate([out, x_pass], axis=-1)
        return out

    return rot(q), rot(k)


def apply_mrope_interleaved_streams(
    q: jax.Array,          # [T, Hq, D]
    k: jax.Array,          # [T, Hk, D]
    positions: jax.Array,  # [3, T] int32 — (temporal, height, width)
    cos_sin_cache: jax.Array,  # [P, rot_dim]
    mrope_section,         # (t, h, w); sums to rot_dim // 2
) -> Tuple[jax.Array, jax.Array]:
    """Qwen3-VL interleaved M-RoPE (HF modeling_qwen3_vl
    apply_interleaved_mrope:299; reference mrope.py mrope_interleaved):
    instead of contiguous per-stream sections, frequency index ``i``
    reads the H stream when ``i % 3 == 1`` (within 3*sec_h), the W stream
    when ``i % 3 == 2`` (within 3*sec_w), and T otherwise —
    [THWTHW...TT], preserving frequency continuity per stream. Rotation
    itself is the standard rotate-half convention."""
    rot_dim = cos_sin_cache.shape[-1]
    half = rot_dim // 2
    assert sum(mrope_section) == half, (mrope_section, half)
    cs = cos_sin_cache[positions]               # [3, T, rot_dim]
    cos3 = cs[..., :half]
    sin3 = cs[..., half:]
    idx = np.arange(half)
    stream = np.zeros(half, np.int32)
    stream[(idx % 3 == 1) & (idx < 3 * mrope_section[1])] = 1
    stream[(idx % 3 == 2) & (idx < 3 * mrope_section[2])] = 2
    sel = jnp.asarray(stream)
    cos = jnp.take_along_axis(cos3, sel[None, None, :], axis=0)[0][:, None]
    sin = jnp.take_along_axis(sin3, sel[None, None, :], axis=0)[0][:, None]

    def rot(x):
        xr, x_pass = x[..., :rot_dim], x[..., rot_dim:]
        x1 = xr[..., :half].astype(jnp.float32)
        x2 = xr[..., half:].astype(jnp.float32)
        o1 = x1 * cos - x2 * sin
        o2 = x2 * cos + x1 * sin
        out = jnp.concatenate([o1, o2], axis=-1).astype(x.dtype)
        if x_pass.shape[-1]:
            out = jnp.concatenate([out, x_pass], axis=-1)
        return out

    return rot(q), rot(k)


def apply_mrope_interleaved(
    q: jax.Array,          # [T, Hq, D]
    k: jax.Array,          # [T, Hk, D]
    positions: jax.Array,  # [3, T] int32 — (temporal, height, width)
    cos_sin_cache: jax.Array,  # [P, rot_dim]
    mrope_section,         # sums to rot_dim // 2
) -> Tuple[jax.Array, jax.Array]:
    """GLM-4V M-RoPE: Qwen-style section assembly of the (t, h, w) streams,
    then GLM's interleaved-pair partial rotation (HF
    modeling_glm4v.apply_multimodal_rotary_pos_emb: cos halves are
    repeat_interleaved and pairs (x0,x1),(x2,x3)… rotate by freq i over the
    first rot_dim features)."""
    rot_dim = cos_sin_cache.shape[-1]
    half = rot_dim // 2
    assert sum(mrope_section) == half, (mrope_section, half)
    cs = cos_sin_cache[positions]               # [3, T, rot_dim]
    cos3 = cs[..., :half]
    sin3 = cs[..., half:]
    parts_c, parts_s = [], []
    off = 0
    for i, sec in enumerate(mrope_section):
        parts_c.append(cos3[i % 3, :, off:off + sec])
        parts_s.append(sin3[i % 3, :, off:off + sec])
        off += sec
    cos = jnp.concatenate(parts_c, axis=-1)[:, None, :]   # [T, 1, half]
    sin = jnp.concatenate(parts_s, axis=-1)[:, None, :]

    def rot(x):
        xr, x_pass = x[..., :rot_dim], x[..., rot_dim:]
        p = xr.astype(jnp.float32).reshape(*xr.shape[:-1], half, 2)
        x0, x1 = p[..., 0], p[..., 1]
        o0 = x0 * cos - x1 * sin
        o1 = x1 * cos + x0 * sin
        out = jnp.stack([o0, o1], axis=-1).reshape(xr.shape).astype(x.dtype)
        if x_pass.shape[-1]:
            out = jnp.concatenate([out, x_pass], axis=-1)
        return out

    return rot(q), rot(k)


def apply_rope_interleaved(
    q: jax.Array,          # [T, Hq, D]
    k: jax.Array,          # [T, Hk, D]
    positions: jax.Array,  # [T]
    cos_sin_cache: jax.Array,  # [P, D] (cos | sin halves, per freq index)
) -> Tuple[jax.Array, jax.Array]:
    """GPT-J/DeepSeek-style interleaved rotation: pairs are (x0,x1),(x2,x3)…
    rotated by freq i — the complex view_as_complex convention in the HF
    DeepSeek implementation (modeling_deepseek_v2.apply_rotary_emb).
    Supports partial rotary (rot_dim < head_dim, GPT-J rotary_dim=64):
    only the first rot_dim features rotate."""
    rot_dim = cos_sin_cache.shape[-1]
    cs = cos_sin_cache[positions]
    cos = cs[:, : rot_dim // 2][:, None, :]     # [T, 1, rot/2]
    sin = cs[:, rot_dim // 2:][:, None, :]

    def rot(x):
        xr, x_pass = x[..., :rot_dim], x[..., rot_dim:]
        p = xr.astype(jnp.float32).reshape(*xr.shape[:-1], rot_dim // 2, 2)
        x0, x1 = p[..., 0], p[..., 1]
        o0 = x0 * cos - x1 * sin
        o1 = x1 * cos + x0 * sin
        out = jnp.stack([o0, o1], axis=-1).reshape(xr.shape).astype(x.dtype)
        if x_pass.shape[-1]:
            out = jnp.concatenate([out, x_pass], axis=-1)
        return out

    return rot(q), rot(k)
