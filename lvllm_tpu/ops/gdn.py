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

Execution regimes:
- decode batches (one token per request): fully parallel batched update
  (``*_decode`` — no sequential dependency exists between requests);
- single-request prefill segments: chunk-parallel WY form, run as a
  Pallas kernel on TPU (``ops/pallas/gdn_chunk.py``) with the state in
  VMEM scratch, jnp chunk scan elsewhere;
- mixed ragged batches: one ``lax.scan`` walks the flat token stream;
  each token updates its request's state slot (slot S = scratch for
  padding). Position-0 tokens reset their slots.
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
    bias: jax.Array = None,  # [C] optional (Mamba2 use_conv_bias)
    activation: bool = True,  # SiLU on the conv output (False: LFM2)
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
    if bias is not None:
        ys = ys + bias.astype(jnp.float32)
    if activation:
        ys = jax.nn.silu(ys)
    return ys.astype(x.dtype), conv_state.astype(jnp.float32)


def causal_conv1d_decode(
    x: jax.Array,           # [T, C]
    conv_state: jax.Array,  # [S+1, C, K-1]
    weight: jax.Array,      # [C, K]
    token_slot: jax.Array,  # [T] i32 (S = scratch)
    reset: jax.Array,       # [T] bool
    bias: jax.Array = None,
    activation: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Decode-batch fast path: every token is a distinct request's single
    token, so there is NO sequential dependency between tokens — the
    T-step scan collapses to one batched gather/update/scatter (padding
    tokens share the scratch slot; whichever write wins is discarded).
    Identical arithmetic to ``causal_conv1d_ragged`` per token."""
    xf = x.astype(jnp.float32)
    win = conv_state.astype(jnp.float32)[token_slot]        # [T, C, K-1]
    win = jnp.where(reset[:, None, None], 0.0, win)
    full = jnp.concatenate([win, xf[:, :, None]], axis=2)   # [T, C, K]
    y = jnp.sum(full * weight[None], axis=2)                # [T, C]
    conv_state = conv_state.astype(jnp.float32).at[token_slot].set(
        full[:, :, 1:])
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    if activation:
        y = jax.nn.silu(y)
    return y.astype(x.dtype), conv_state


def causal_conv1d_single(
    x: jax.Array,        # [T, C] (first L = real tokens of one sequence)
    window: jax.Array,   # [C, K-1] entering rolling window
    weight: jax.Array,   # [C, K]
    seq_len: jax.Array,  # scalar i32: real length L (pads after are inert)
    bias: jax.Array = None,  # [C] optional
) -> Tuple[jax.Array, jax.Array]:
    """Vectorized depthwise causal conv for one contiguous sequence —
    K shifted adds instead of a T-step scan. Returns (SiLU outputs [T, C],
    window after token L-1)."""
    T = x.shape[0]
    K = weight.shape[1]
    xf = x.astype(jnp.float32)
    xx = jnp.concatenate([window.astype(jnp.float32).T, xf], axis=0)
    y = sum(xx[j:j + T] * weight[:, j] for j in range(K))
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    new_window = jax.lax.dynamic_slice_in_dim(xx, seq_len, K - 1, axis=0)
    return jax.nn.silu(y).astype(x.dtype), new_window.T


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


def gated_delta_rule_decode(
    q: jax.Array,           # [T, H, dk]
    k: jax.Array,           # [T, H, dk]
    v: jax.Array,           # [T, H, dv]
    g: jax.Array,           # [T, H]
    beta: jax.Array,        # [T, H]
    rec_state: jax.Array,   # [S+1, H, dk, dv]
    token_slot: jax.Array,  # [T] i32
    reset: jax.Array,       # [T] bool
) -> Tuple[jax.Array, jax.Array]:
    """Decode-batch fast path for the gated delta rule: one token per
    request → fully parallel rank-1 state updates (same arithmetic as one
    ``gated_delta_rule_ragged`` scan step, batched over tokens)."""
    dk = q.shape[-1]
    qf = l2norm(q.astype(jnp.float32)) * (dk ** -0.5)
    kf = l2norm(k.astype(jnp.float32))
    vf = v.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    bf = beta.astype(jnp.float32)
    st = rec_state.astype(jnp.float32)[token_slot]          # [T, H, dk, dv]
    st = jnp.where(reset[:, None, None, None], 0.0, st)
    st = st * jnp.exp(gf)[:, :, None, None]
    kv_mem = jnp.sum(st * kf[..., None], axis=-2)           # [T, H, dv]
    delta = (vf - kv_mem) * bf[..., None]
    st = st + kf[..., None] * delta[:, :, None, :]
    out = jnp.sum(st * qf[..., None], axis=-2)              # [T, H, dv]
    rec_state = rec_state.astype(jnp.float32).at[token_slot].set(st)
    return out, rec_state


def gated_delta_rule_chunked(
    q: jax.Array,        # [L, H, dk] (raw; normalized+scaled inside)
    k: jax.Array,        # [L, H, dk]
    v: jax.Array,        # [L, H, dv]
    g: jax.Array,        # [L, H] log-decay (≤ 0)
    beta: jax.Array,     # [L, H]
    state0: jax.Array,   # [H, dk, dv] entering recurrent state
    chunk_size: int = 128,
    use_pallas: bool = None,
) -> Tuple[jax.Array, jax.Array]:
    """Chunk-parallel gated delta rule for one contiguous sequence.

    MXU-friendly prefill path (counterpart of the reference's chunked GDN
    kernels, ``fla``-style chunk_gated_delta_rule): the per-token rank-1
    recurrence  S_t = exp(g_t)(I − β_t k_t k_tᵀ) S_{t-1} + β_t k_t v_tᵀ
    is solved per chunk in closed form via the WY representation. With
    within-chunk cumulative decay G_t = Σ_{s≤t} g_s, the auxiliary rows Ū
    satisfy the unit-lower-triangular system

        (I + strict_tril(diag(β) · (K Kᵀ ⊙ D))) Ū
            = diag(β) (Γ ⊙ (K S₀) − V),   D_{ti} = exp(G_t − G_i),

    (all decay factors exp(G_t − G_i), i ≤ t, are ≤ 1 — numerically safe)
    after which outputs and the chunk-exit state are pure matmuls:

        o_t = γ_t q_tᵀ S₀ − Σ_{i≤t} exp(G_t−G_i)(q_tᵀ k_i) ū_iᵀ
        S_C = γ_C S₀ − Σ_t exp(G_C−G_t) k_t ū_tᵀ.

    Cost: O(L·C) with C×C unit-triangular solves (done as log-doubling
    Neumann products — pure MXU matmuls) instead of an O(L) scalar
    scan. Exactly matches the ragged scan oracle (tests/ops/test_gdn.py).
    The general mixed-batch engine path keeps the scan; this op serves
    single-request prefill segments.

    On TPU the per-chunk body runs as one Pallas kernel with the running
    state carried in VMEM scratch (ops/pallas/gdn_chunk.py); elsewhere
    (and under LVLLM_USE_REFERENCE_OPS) the jnp chunk scan below is the
    oracle.

    Returns (outputs [L, H, dv], final state [H, dk, dv]).
    """
    L, H, dk = q.shape
    dv = v.shape[-1]
    C = chunk_size
    pad = (-L) % C
    qf = l2norm(q.astype(jnp.float32)) * (dk ** -0.5)
    kf = l2norm(k.astype(jnp.float32))
    vf = v.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    bf = beta.astype(jnp.float32)
    if pad:
        qf = jnp.pad(qf, ((0, pad), (0, 0), (0, 0)))
        kf = jnp.pad(kf, ((0, pad), (0, 0), (0, 0)))
        vf = jnp.pad(vf, ((0, pad), (0, 0), (0, 0)))
        gf = jnp.pad(gf, ((0, pad), (0, 0)))   # g=0: pads don't decay
        bf = jnp.pad(bf, ((0, pad), (0, 0)))   # β=0: pads don't update
    NC = (L + pad) // C

    if use_pallas is None:
        from lvllm_tpu import envs
        use_pallas = (not envs.LVLLM_USE_REFERENCE_OPS and
                      jax.default_backend() in ("tpu", "axon"))
    if use_pallas:
        from lvllm_tpu.ops.pallas.gdn_chunk import gdn_chunked_pallas
        outs, state = gdn_chunked_pallas(qf, kf, vf, gf, bf,
                                         state0.astype(jnp.float32),
                                         chunk_size=C)
        return outs[:L], state

    def to_chunks(x):
        return x.reshape(NC, C, *x.shape[1:])

    qc, kc, vc, gc, bc = map(to_chunks, (qf, kf, vf, gf, bf))
    tril_strict = jnp.tril(jnp.ones((C, C), jnp.float32), -1)
    tril_incl = jnp.tril(jnp.ones((C, C), jnp.float32))

    def one_chunk(state, inp):
        qt, kt, vt, gt, bt = inp                 # [C, H, *]
        G = jnp.cumsum(gt, axis=0)               # [C, H]
        gamma = jnp.exp(G)
        # D[h, t, i] = exp(G_t − G_i) for i ≤ t; mask BEFORE the exp — the
        # upper triangle has positive exponents that overflow to inf, and
        # inf · 0 would poison the masked product with NaNs.
        diff = G.T[:, :, None] - G.T[:, None, :]           # [H, C, C]
        D = jnp.exp(jnp.where(tril_incl[None] > 0, diff, -jnp.inf))
        KK = jnp.einsum("thd,ihd->hti", kt, kt)
        A = bt.T[:, :, None] * KK * D * tril_strict[None]
        kS0 = jnp.einsum("thd,hdv->htv", kt, state)        # [H, C, dv]
        rhs = bt.T[:, :, None] * (gamma.T[:, :, None] * kS0
                                  - jnp.transpose(vt, (1, 0, 2)))
        # Unit-lower-triangular solve by log-doubling Neumann products
        # ((I + A)⁻¹ = Π_k (I + M^{2^k}), M = −A nilpotent): 2·log₂(C)
        # batched MXU matmuls instead of XLA's blocked triangular solve.
        U = rhs                                              # [H, C, dv]
        P = -A
        n_solve = max((C - 1).bit_length(), 1)
        for i_s in range(n_solve):
            U = U + jnp.matmul(P, U)
            if i_s + 1 < n_solve:
                P = jnp.matmul(P, P)
        qS0 = jnp.einsum("thd,hdv->htv", qt, state)
        QK = jnp.einsum("thd,ihd->hti", qt, kt)
        o = (gamma.T[:, :, None] * qS0
             - jnp.einsum("hti,hiv->htv", QK * D * tril_incl[None], U))
        decay_to_end = jnp.exp(G[-1][None, :] - G)          # [C, H]
        state = (jnp.exp(G[-1])[:, None, None] * state
                 - jnp.einsum("thd,th,thv->hdv", kt, decay_to_end,
                              jnp.transpose(U, (1, 0, 2))))
        return state, jnp.transpose(o, (1, 0, 2))           # [C, H, dv]

    state, outs = jax.lax.scan(one_chunk, state0.astype(jnp.float32),
                               (qc, kc, vc, gc, bc))
    outs = outs.reshape(NC * C, H, dv)[:L]
    return outs, state
