"""Lightning (linear) attention — MiniMax-Text-01 / MiniMax-M1.

Behavioral reference: ``/root/reference/vllm/model_executor/layers/mamba/
linear_attn.py`` (MiniMaxText01LinearAttention) / HF
``modeling_minimax.MiniMaxLightningAttention``: per-head constant decay
λ_h = exp(-slope_h) (ALiBi-style slopes, scaled per layer by
``1 - layer_idx/(L-1) + 1e-5``), recurrent state S [H, Dk, Dv]:

    S_t = λ · S_{t-1} + k_t v_tᵀ          o_t = q_t · S_t

SiLU is applied to q/k/v upstream (on the fused qkv projection). Same
slot/reset conventions as ops/kda.py: persistent per-request state rows,
position-0 tokens reset, scratch slot = last row.
"""

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def build_slopes(num_heads: int) -> np.ndarray:
    """ALiBi slope ladder — HF MiniMaxLightningAttention.get_slope_rate
    convention (base**(i+1) for all head counts; equals the
    _build_slope_tensor power-of-2 ladder when H is a power of two)."""
    base = 1.0 / (2 ** (8.0 / num_heads))
    return np.asarray([base ** (i + 1) for i in range(num_heads)],
                      np.float32)


def layer_slope(num_heads: int, layer_idx: int,
                num_layers: int) -> np.ndarray:
    """Per-layer decay rate (HF get_slope_rate; the vLLM reference's
    linear_attn.py:309-314 formula differs by O(1e-5) at the last
    layer — HF is the checkpoint-numerics authority)."""
    base = build_slopes(num_heads)
    factor = 1 - layer_idx / (num_layers - 1 + 1e-5) + 1e-5
    return base * factor


def lightning_ragged(
    q: jax.Array,          # [T, H, D]
    k: jax.Array,          # [T, H, D]
    v: jax.Array,          # [T, H, D]
    slope: jax.Array,      # [H] f32 decay rate (λ = exp(-slope))
    rec_state: jax.Array,  # [S+1, H, Dk, Dv]
    token_slot: jax.Array,  # [T] i32
    reset: jax.Array,      # [T] bool
) -> Tuple[jax.Array, jax.Array]:
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    lam = jnp.exp(-slope.astype(jnp.float32))             # [H]

    def step(state, inp):
        q_t, k_t, v_t, slot, rst = inp
        st = state[slot]                                   # [H, Dk, Dv]
        st = jnp.where(rst, 0.0, st)
        st = st * lam[:, None, None]
        st = st + k_t[:, :, None] * v_t[:, None, :]
        out = jnp.sum(st * q_t[:, :, None], axis=-2)       # [H, Dv]
        state = state.at[slot].set(st)
        return state, out

    rec_state, outs = jax.lax.scan(
        step, rec_state.astype(jnp.float32),
        (qf, kf, vf, token_slot, reset))
    return outs, rec_state


def lightning_decode(
    q: jax.Array, k: jax.Array, v: jax.Array, slope: jax.Array,
    rec_state: jax.Array, token_slot: jax.Array, reset: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """One-token-per-request batch: fully parallel update."""
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    lam = jnp.exp(-slope.astype(jnp.float32))
    st = rec_state.astype(jnp.float32)[token_slot]         # [T, H, Dk, Dv]
    st = jnp.where(reset[:, None, None, None], 0.0, st)
    st = st * lam[None, :, None, None]
    st = st + kf[..., None] * vf[:, :, None, :]
    out = jnp.sum(st * qf[..., None], axis=-2)
    rec_state = rec_state.astype(jnp.float32).at[token_slot].set(st)
    return out, rec_state
