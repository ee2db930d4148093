"""Rotary position embeddings.

Counterpart of the reference's ``csrc/pos_encoding_kernels.cu``
(``rotary_embedding``) and ``model_executor/layers/rotary_embedding``.
Neox-style (half rotation) layout, precomputed cos/sin cache gathered by
position — a single fused elementwise op under XLA.
"""

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def compute_cos_sin_cache(
    head_dim: int,
    max_position: int,
    theta: float = 10000.0,
    rope_scaling: Optional[dict] = None,
    dtype=jnp.float32,
) -> jax.Array:
    """[max_position, head_dim] with cos in [:, :d/2], sin in [:, d/2:]."""
    rot_dim = head_dim
    inv_freq = 1.0 / (theta ** (
        jnp.arange(0, rot_dim, 2, dtype=jnp.float32) / rot_dim))
    if rope_scaling:
        stype = rope_scaling.get("rope_type", rope_scaling.get("type"))
        factor = float(rope_scaling.get("factor", 1.0))
        if stype == "linear":
            inv_freq = inv_freq / factor
        elif stype in ("dynamic", None):
            pass  # dynamic NTK applied at runtime for >max_position; skip
        # yarn/llama3 variants land with the long-context work.
    t = jnp.arange(max_position, dtype=jnp.float32)
    freqs = jnp.outer(t, inv_freq)  # [P, d/2]
    return jnp.concatenate([jnp.cos(freqs), jnp.sin(freqs)],
                           axis=-1).astype(dtype)


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


def apply_rope_interleaved(
    q: jax.Array,          # [T, Hq, D]
    k: jax.Array,          # [T, Hk, D]
    positions: jax.Array,  # [T]
    cos_sin_cache: jax.Array,  # [P, D] (cos | sin halves, per freq index)
) -> Tuple[jax.Array, jax.Array]:
    """GPT-J/DeepSeek-style interleaved rotation: pairs are (x0,x1),(x2,x3)…
    rotated by freq i — the complex view_as_complex convention in the HF
    DeepSeek implementation (modeling_deepseek_v2.apply_rotary_emb)."""
    d = q.shape[-1]
    cs = cos_sin_cache[positions]
    cos = cs[:, : d // 2][:, None, :]     # [T, 1, d/2]
    sin = cs[:, d // 2:][:, None, :]

    def rot(x):
        xr = x.astype(jnp.float32).reshape(*x.shape[:-1], d // 2, 2)
        x0, x1 = xr[..., 0], xr[..., 1]
        o0 = x0 * cos - x1 * sin
        o1 = x1 * cos + x0 * sin
        return jnp.stack([o0, o1], axis=-1).reshape(x.shape).astype(x.dtype)

    return rot(q), rot(k)
