"""Mamba2 (SSD) selective state-space op.

TPU-native counterpart of the reference's mamba2 stack
(``vllm/model_executor/layers/mamba/mamba_mixer2.py``, CUDA
``csrc/mamba/``, backend ``v1/attention/backends/mamba2_attn.py``); HF
numerics reference: transformers ``modeling_mamba2.torch_forward``.

The per-head diagonal recurrence
    h_t = exp(dt_t·A_h) · h_{t-1} + dt_t · B_t ⊗ x_t
    y_t = C_t · h_t + D_h · x_t
runs in two regimes, mirroring ops/gdn.py:
- ``mamba2_scan_ragged`` — one lax.scan over the flat mixed batch, each
  token updating its request's state slot (decode + mixed prefill);
- ``mamba2_chunked`` — chunk-parallel SSD form for one contiguous
  sequence: within-chunk work is causal-masked matmuls on the MXU,
  states propagate once per chunk.

Inputs here are post-projection/post-conv; dt is already
softplus(dt+bias)-clamped; B/C are already expanded to value heads.
"""

from typing import Tuple

import jax
import jax.numpy as jnp


def mamba2_scan_ragged(
    x: jax.Array,          # [T, NH, HD] f32
    B: jax.Array,          # [T, NH, N] f32 (group-expanded)
    C: jax.Array,          # [T, NH, N] f32
    dt: jax.Array,         # [T, NH] f32 (post softplus + clamp)
    A: jax.Array,          # [NH] f32 (negative)
    D: jax.Array,          # [NH] f32 skip
    ssm_state: jax.Array,  # [S+1, NH, HD, N]
    token_slot: jax.Array,  # [T] i32 (S = scratch)
    reset: jax.Array,       # [T] bool
) -> Tuple[jax.Array, jax.Array]:
    xf = x.astype(jnp.float32)
    Bf = B.astype(jnp.float32)
    Cf = C.astype(jnp.float32)
    dtf = dt.astype(jnp.float32)

    def step(state, inp):
        x_t, B_t, C_t, dt_t, slot, rst = inp
        h = state[slot]                                     # [NH, HD, N]
        h = jnp.where(rst, 0.0, h)
        dA = jnp.exp(dt_t * A)                              # [NH]
        h = h * dA[:, None, None] + \
            (dt_t[:, None] * x_t)[:, :, None] * B_t[:, None, :]
        y = jnp.sum(h * C_t[:, None, :], axis=-1)           # [NH, HD]
        y = y + D[:, None] * x_t
        state = state.at[slot].set(h)
        return state, y

    ssm_state, ys = jax.lax.scan(
        step, ssm_state.astype(jnp.float32),
        (xf, Bf, Cf, dtf, token_slot, reset))
    return ys, ssm_state.astype(jnp.float32)


def mamba2_decode(
    x: jax.Array,          # [T, NH, HD]
    B: jax.Array,          # [T, NH, N]
    C: jax.Array,          # [T, NH, N]
    dt: jax.Array,         # [T, NH]
    A: jax.Array,          # [NH]
    D: jax.Array,          # [NH]
    ssm_state: jax.Array,  # [S+1, NH, HD, N]
    token_slot: jax.Array,  # [T] i32
    reset: jax.Array,       # [T] bool
) -> Tuple[jax.Array, jax.Array]:
    """Decode-batch fast path: one token per request → the scan collapses
    to a single batched state update (same per-token arithmetic as
    ``mamba2_scan_ragged``)."""
    xf = x.astype(jnp.float32)
    Bf = B.astype(jnp.float32)
    Cf = C.astype(jnp.float32)
    dtf = dt.astype(jnp.float32)
    h = ssm_state.astype(jnp.float32)[token_slot]           # [T, NH, HD, N]
    h = jnp.where(reset[:, None, None, None], 0.0, h)
    dA = jnp.exp(dtf * A[None, :])                          # [T, NH]
    h = h * dA[:, :, None, None] + \
        (dtf[:, :, None] * xf)[:, :, :, None] * Bf[:, :, None, :]
    y = jnp.sum(h * Cf[:, :, None, :], axis=-1)             # [T, NH, HD]
    y = y + D[None, :, None] * xf
    ssm_state = ssm_state.astype(jnp.float32).at[token_slot].set(h)
    return y, ssm_state


def mamba2_chunked(
    x: jax.Array,        # [L, NH, HD]
    B: jax.Array,        # [L, NH, N]
    C: jax.Array,        # [L, NH, N]
    dt: jax.Array,       # [L, NH] (post softplus + clamp; 0 on pad rows)
    A: jax.Array,        # [NH]
    D: jax.Array,        # [NH]
    state0: jax.Array,   # [NH, HD, N] entering state
    chunk_size: int = 64,
) -> Tuple[jax.Array, jax.Array]:
    """Chunk-parallel SSD for one contiguous sequence (dt=0 on padded tail
    rows freezes the state — exp(0·A)=1, no update, zero output weight).

    Within a chunk with cumulative log-decay G_t = Σ_{s≤t} dt_s·A:
        y_t = exp(G_t)·(C_t·h₀) + Σ_{i≤t} exp(G_t−G_i)(C_t·B_i) dt_i x_i
        h_C = exp(G_C)·h₀ + Σ_t exp(G_C−G_t) dt_t (B_t ⊗ x_t)
    — all matmuls plus one causal mask; no triangular solve needed (the
    recurrence is diagonal, unlike the delta rule in ops/gdn.py).
    Returns (y [L, NH, HD], final state [NH, HD, N])."""
    L, NH, HD = x.shape
    N = B.shape[-1]
    Cc = chunk_size
    pad = (-L) % Cc
    xf = x.astype(jnp.float32)
    Bf = B.astype(jnp.float32)
    Cf = C.astype(jnp.float32)
    dtf = dt.astype(jnp.float32)
    if pad:
        xf = jnp.pad(xf, ((0, pad), (0, 0), (0, 0)))
        Bf = jnp.pad(Bf, ((0, pad), (0, 0), (0, 0)))
        Cf = jnp.pad(Cf, ((0, pad), (0, 0), (0, 0)))
        dtf = jnp.pad(dtf, ((0, pad), (0, 0)))
    NC = (L + pad) // Cc

    def chunks(t):
        return t.reshape(NC, Cc, *t.shape[1:])

    xc, Bc, Cc_, dtc = map(chunks, (xf, Bf, Cf, dtf))
    tril_incl = jnp.tril(jnp.ones((Cc, Cc), jnp.float32))

    def one_chunk(state, inp):
        xt, Bt, Ct, dtt = inp                       # [C, NH, *]
        G = jnp.cumsum(dtt * A[None, :], axis=0)    # [C, NH] (≤ 0 cumsum)
        # decay[h, t, i] = exp(G_t − G_i), i ≤ t (mask before exp: the
        # upper triangle has positive exponents).
        diff = G.T[:, :, None] - G.T[:, None, :]    # [NH, C, C]
        decay = jnp.exp(jnp.where(tril_incl[None] > 0, diff, -jnp.inf))
        CB = jnp.einsum("thn,ihn->hti", Ct, Bt)     # [NH, C, C]
        M = CB * decay                               # causal mixing matrix
        dx = dtt[:, :, None] * xt                    # [C, NH, HD]
        y_diag = jnp.einsum("hti,ihd->thd", M, dx)
        gamma = jnp.exp(G)                           # [C, NH]
        y_off = gamma[:, :, None] * jnp.einsum("thn,hdn->thd", Ct, state)
        # State update: h_C = exp(G_C) h₀ + Σ_t exp(G_C−G_t) dt_t B_t⊗x_t.
        decay_to_end = jnp.exp(G[-1][None, :] - G)   # [C, NH]
        state = (gamma[-1][:, None, None] * state
                 + jnp.einsum("th,thd,thn->hdn", decay_to_end, dx, Bt))
        return state, y_diag + y_off

    state, ys = jax.lax.scan(one_chunk, state0.astype(jnp.float32),
                             (xc, Bc, Cc_, dtc))
    ys = ys.reshape(NC * Cc, NH, HD)[:L]
    ys = ys + D[None, :, None] * x.astype(jnp.float32)
    return ys, state
