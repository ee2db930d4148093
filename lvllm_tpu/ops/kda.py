"""KDA — Kimi Delta Attention (per-channel gated delta rule).

Behavioral reference: ``/root/reference/vllm/model_executor/layers/
kda.py`` + the Triton recurrence ``layers/fla/ops/fused_recurrent.py``
(IS_KDA=True) and gate ``fla/ops/kda.py:1274`` (kda_gate_fwd_kernel).

KDA generalizes the gated delta rule (ops/gdn.py): the log-decay ``g``
is a VECTOR over the key dimension ([T, H, Dk]) instead of a scalar per
head — the state decays per (head, k-channel):

    S ← S ⊙ exp(g_t)[.., None];  Δ = (v_t − S·k_t)·β_t;  S ← S + k_t⊗Δ;
    o_t = S·q_t

with q/k L2-normalized and q scaled by Dk^-1/2 (use_qk_l2norm_in_kernel
+ default scale in the reference kernel).
"""

from typing import Tuple

import jax
import jax.numpy as jnp

from lvllm_tpu.ops.gdn import l2norm


def kda_gate(g_raw: jax.Array, a_log: jax.Array, dt_bias: jax.Array,
             head_dim: int) -> jax.Array:
    """[T, H*D] raw gate → [T, H, D] log-decay: −exp(A_log_h) ·
    softplus(g + bias) (fla fused_kda_gate, beta=1, threshold=20)."""
    T = g_raw.shape[0]
    H = a_log.reshape(-1).shape[0]
    g = g_raw.astype(jnp.float32).reshape(T, H, head_dim)
    g = g + dt_bias.astype(jnp.float32).reshape(H, head_dim)[None]
    sp = jnp.where(g > 20.0, g, jnp.log1p(jnp.exp(jnp.minimum(g, 20.0))))
    return -jnp.exp(a_log.astype(jnp.float32).reshape(1, H, 1)) * sp


def kda_ragged(
    q: jax.Array,           # [T, H, D]
    k: jax.Array,           # [T, H, D]
    v: jax.Array,           # [T, H, D]
    g: jax.Array,           # [T, H, D] log-decay (≤ 0)
    beta: jax.Array,        # [T, H]
    rec_state: jax.Array,   # [S+1, H, D, D]  (k-dim, v-dim)
    token_slot: jax.Array,  # [T] i32
    reset: jax.Array,       # [T] bool
) -> Tuple[jax.Array, jax.Array]:
    D = q.shape[-1]
    qf = l2norm(q.astype(jnp.float32)) * (D ** -0.5)
    kf = l2norm(k.astype(jnp.float32))
    vf = v.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    bf = beta.astype(jnp.float32)

    def step(state, inp):
        q_t, k_t, v_t, g_t, b_t, slot, rst = inp
        st = state[slot]                                  # [H, Dk, Dv]
        st = jnp.where(rst, 0.0, st)
        st = st * jnp.exp(g_t)[:, :, None]                # per-k decay
        kv_mem = jnp.sum(st * k_t[:, :, None], axis=-2)   # [H, Dv]
        delta = (v_t - kv_mem) * b_t[:, None]
        st = st + k_t[:, :, None] * delta[:, None, :]
        out = jnp.sum(st * q_t[:, :, None], axis=-2)
        state = state.at[slot].set(st)
        return state, out

    rec_state, outs = jax.lax.scan(
        step, rec_state.astype(jnp.float32),
        (qf, kf, vf, gf, bf, token_slot, reset))
    return outs, rec_state.astype(jnp.float32)


def kda_decode(
    q: jax.Array, k: jax.Array, v: jax.Array, g: jax.Array,
    beta: jax.Array, rec_state: jax.Array, token_slot: jax.Array,
    reset: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """One-token-per-request batch: fully parallel (see ops/gdn.py
    gated_delta_rule_decode)."""
    D = q.shape[-1]
    qf = l2norm(q.astype(jnp.float32)) * (D ** -0.5)
    kf = l2norm(k.astype(jnp.float32))
    vf = v.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    bf = beta.astype(jnp.float32)
    st = rec_state.astype(jnp.float32)[token_slot]        # [T, H, Dk, Dv]
    st = jnp.where(reset[:, None, None, None], 0.0, st)
    st = st * jnp.exp(gf)[..., None]
    kv_mem = jnp.sum(st * kf[..., None], axis=-2)
    delta = (vf - kv_mem) * bf[..., None]
    st = st + kf[..., None] * delta[:, :, None, :]
    out = jnp.sum(st * qf[..., None], axis=-2)
    rec_state = rec_state.astype(jnp.float32).at[token_slot].set(st)
    return out, rec_state
