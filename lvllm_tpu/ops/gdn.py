"""Gated DeltaNet (linear attention) for hybrid models — Qwen3-Next.

TPU-native counterpart of the reference's SSM/linear-attention stack
(``vllm/model_executor/layers/mamba/``, GDN backends in
``v1/attention/backends/gdn*``, ``csrc/mamba``): the recurrent state
(per-request conv window + delta-rule matrix memory) replaces paged KV for
linear-attention layers — the hybrid cache-group design of
``kv_cache_interface.py`` MambaSpec.

Math follows HF ``modeling_qwen3_next.torch_recurrent_gated_delta_rule``:
    S ← S * exp(g_t);   Δ = (v_t − k_tᵀS) * β_t;   S ← S + k_t Δᵀ;
    o_t = q_tᵀ S
with q,k L2-normalized and q scaled by dk^-1/2.

Ragged batching: one ``lax.scan`` walks the flat token stream; each token
updates its request's state slot (slot S = scratch for padding). Position-0
tokens reset their slots (fresh or resumed-from-preemption prefill).
A chunk-parallel Pallas kernel is the future fast path; this scan is the
correctness-first implementation.
"""

from typing import Tuple

import jax
import jax.numpy as jnp


def l2norm(x: jax.Array, eps: float = 1e-6) -> jax.Array:
    return x * jax.lax.rsqrt(jnp.sum(x * x, axis=-1, keepdims=True) + eps)


def causal_conv1d_ragged(
    x: jax.Array,           # [T, C] conv input channels
    conv_state: jax.Array,  # [S+1, C, K-1] per-slot rolling window
    weight: jax.Array,      # [C, K] depthwise kernel
    token_slot: jax.Array,  # [T] i32 (S = scratch)
    reset: jax.Array,       # [T] bool — reset the window at this token
) -> Tuple[jax.Array, jax.Array]:
    """Depthwise causal conv with per-request state, SiLU activation."""
    K = weight.shape[1]

    def step(state, inp):
        x_t, slot, rst = inp
        win = state[slot]                              # [C, K-1]
        win = jnp.where(rst, 0.0, win)
        full = jnp.concatenate([win, x_t[:, None]], axis=1)   # [C, K]
        y = jnp.sum(full * weight, axis=1)             # [C]
        state = state.at[slot].set(full[:, 1:])
        return state, y

    conv_state, ys = jax.lax.scan(
        step, conv_state.astype(jnp.float32),
        (x.astype(jnp.float32), token_slot, reset))
    return jax.nn.silu(ys).astype(x.dtype), conv_state.astype(jnp.float32)


def gated_delta_rule_ragged(
    q: jax.Array,           # [T, H, dk] (raw; normalized+scaled inside)
    k: jax.Array,           # [T, H, dk]
    v: jax.Array,           # [T, H, dv]
    g: jax.Array,           # [T, H] log-decay
    beta: jax.Array,        # [T, H]
    rec_state: jax.Array,   # [S+1, H, dk, dv]
    token_slot: jax.Array,  # [T] i32
    reset: jax.Array,       # [T] bool
) -> Tuple[jax.Array, jax.Array]:
    dk = q.shape[-1]
    qf = l2norm(q.astype(jnp.float32)) * (dk ** -0.5)
    kf = l2norm(k.astype(jnp.float32))
    vf = v.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    bf = beta.astype(jnp.float32)

    def step(state, inp):
        q_t, k_t, v_t, g_t, b_t, slot, rst = inp
        st = state[slot]                                    # [H, dk, dv]
        st = jnp.where(rst, 0.0, st)
        st = st * jnp.exp(g_t)[:, None, None]
        kv_mem = jnp.sum(st * k_t[:, :, None], axis=-2)     # [H, dv]
        delta = (v_t - kv_mem) * b_t[:, None]
        st = st + k_t[:, :, None] * delta[:, None, :]
        out = jnp.sum(st * q_t[:, :, None], axis=-2)        # [H, dv]
        state = state.at[slot].set(st)
        return state, out

    rec_state, outs = jax.lax.scan(
        step, rec_state.astype(jnp.float32),
        (qf, kf, vf, gf, bf, token_slot, reset))
    return outs, rec_state.astype(jnp.float32)
