"""Mamba1 selective-scan op.

TPU-native counterpart of the reference's mamba1 stack
(``vllm/model_executor/layers/mamba/mamba_mixer.py``, CUDA
``csrc/mamba/``, backend ``v1/attention/backends/mamba1_attn.py``); HF
numerics reference: transformers ``modeling_mamba.slow_forward``.

Per-channel recurrence with a PER-STATE decay matrix (vs mamba2's scalar
per head):
    h_t[d, n] = exp(dt_t[d]·A[d, n]) · h_{t-1}[d, n] + dt_t[d]·B_t[n]·x_t[d]
    y_t[d]    = Σ_n C_t[n]·h_t[d, n] + D[d]·x_t[d]

One lax.scan over the flat ragged batch; each token updates its request's
state slot (same slotting as ops/mamba2.mamba2_scan_ragged).
"""

from typing import Tuple

import jax
import jax.numpy as jnp


def mamba1_scan_ragged(
    x: jax.Array,          # [T, D] f32 (post conv + SiLU)
    B: jax.Array,          # [T, N] f32
    C: jax.Array,          # [T, N] f32
    dt: jax.Array,         # [T, D] f32 (post softplus)
    A: jax.Array,          # [D, N] f32 (negative)
    Dskip: jax.Array,      # [D] f32
    ssm_state: jax.Array,  # [S+1, D, N]
    token_slot: jax.Array,  # [T] i32 (S = scratch)
    reset: jax.Array,       # [T] bool
) -> Tuple[jax.Array, jax.Array]:
    xf = x.astype(jnp.float32)
    Bf = B.astype(jnp.float32)
    Cf = C.astype(jnp.float32)
    dtf = dt.astype(jnp.float32)
    Af = A.astype(jnp.float32)

    def step(state, inp):
        x_t, B_t, C_t, dt_t, slot, rst = inp
        h = state[slot]                                  # [D, N]
        h = jnp.where(rst, 0.0, h)
        dA = jnp.exp(dt_t[:, None] * Af)                 # [D, N]
        h = h * dA + (dt_t * x_t)[:, None] * B_t[None, :]
        y = jnp.sum(h * C_t[None, :], axis=-1)           # [D]
        y = y + Dskip * x_t
        state = state.at[slot].set(h)
        return state, y

    ssm_state, ys = jax.lax.scan(
        step, ssm_state.astype(jnp.float32),
        (xf, Bf, Cf, dtf, token_slot, reset))
    return ys, ssm_state.astype(jnp.float32)


def mamba1_decode(
    x: jax.Array,          # [T, D]
    B: jax.Array,          # [T, N]
    C: jax.Array,          # [T, N]
    dt: jax.Array,         # [T, D]
    A: jax.Array,          # [D, N]
    Dskip: jax.Array,      # [D]
    ssm_state: jax.Array,  # [S+1, D, N]
    token_slot: jax.Array,  # [T] i32
    reset: jax.Array,       # [T] bool
) -> Tuple[jax.Array, jax.Array]:
    """Decode-batch fast path: one token per request → batched update with
    the same per-token arithmetic as ``mamba1_scan_ragged``."""
    xf = x.astype(jnp.float32)
    Bf = B.astype(jnp.float32)
    Cf = C.astype(jnp.float32)
    dtf = dt.astype(jnp.float32)
    Af = A.astype(jnp.float32)
    h = ssm_state.astype(jnp.float32)[token_slot]           # [T, D, N]
    h = jnp.where(reset[:, None, None], 0.0, h)
    dA = jnp.exp(dtf[:, :, None] * Af[None])                # [T, D, N]
    h = h * dA + (dtf * xf)[:, :, None] * Bf[:, None, :]
    y = jnp.sum(h * Cf[:, None, :], axis=-1)                # [T, D]
    y = y + Dskip[None, :] * xf
    ssm_state = ssm_state.astype(jnp.float32).at[token_slot].set(h)
    return y, ssm_state
