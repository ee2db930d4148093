"""Pallas TPU kernel: chunk-parallel gated delta rule (GDN prefill).

Counterpart of the reference's chunked GDN kernels
(``/root/reference/vllm/model_executor/layers/mamba/ops/`` fla-style
``chunk_gated_delta_rule``; backend ``v1/attention/backends/gdn_attn.py``)
— the WY-form closed solution of the rank-1 delta-rule recurrence,
executed one (head, chunk) grid step at a time with the running state
carried in VMEM scratch across the sequential chunk axis.

Math identical to ``ops/gdn.gated_delta_rule_chunked`` (the jnp oracle):
with within-chunk cumulative decay G and the unit-lower-triangular system
(I + A)·Ū = rhs, A = strict_tril(β·(K Kᵀ ⊙ D)), the solve is done by the
log-doubling Neumann product (I + A)⁻¹ = Π_k (I + M^{2^k}), M = −A —
2·log₂(C) small MXU matmuls, no sequential substitution.

Mosaic notes: all [C, C] outer-product shapes are built with
``dot_general`` contracting the singleton dim (A·Bᵀ without an explicit
transpose — in-kernel 2-D transposes are avoided); masks come from
``broadcasted_iota``.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dot_t(a, b):
    """a @ b.T via dot_general (no in-kernel transpose)."""
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)


def _gdn_chunk_kernel(q_ref, k_ref, v_ref, g_ref, b_ref, s0_ref,
                      o_ref, sout_ref, state, *, C: int, n_solve: int):
    nc = pl.program_id(1)
    NC = pl.num_programs(1)

    @pl.when(nc == 0)
    def _():
        state[:] = s0_ref[0]

    qt = q_ref[0, 0]                       # [C, dk]
    kt = k_ref[0, 0]                       # [C, dk]
    vt = v_ref[0, 0]                       # [C, dv]
    g_col = g_ref[0, 0]                    # [C, 1]
    b_col = b_ref[0, 0]                    # [C, 1]
    S = state[:]                           # [dk, dv]

    rows = jax.lax.broadcasted_iota(jnp.int32, (C, C), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (C, C), 1)
    incl = rows >= cols
    strict = rows > cols

    ones = jnp.ones((C, 1), jnp.float32)
    G_col = jax.lax.dot_general(          # cumsum via lower-tri matmul
        (rows >= cols).astype(jnp.float32), g_col,
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    Gt = _dot_t(G_col, ones)               # [C, C]: row t = G_t
    Gi = _dot_t(ones, G_col)               # [C, C]: col i = G_i
    # Mask BEFORE exp: the upper triangle has positive exponents.
    D = jnp.exp(jnp.where(incl, Gt - Gi, -jnp.inf))
    gamma = jnp.exp(G_col)                 # [C, 1]

    KK = _dot_t(kt, kt)                    # [C, C]
    A = jnp.where(strict, b_col * KK * D, 0.0)
    kS0 = jnp.dot(kt, S, preferred_element_type=jnp.float32)   # [C, dv]
    rhs = b_col * (gamma * kS0 - vt)

    # (I + A)^-1 rhs by doubling: U ← (I + P)U, P ← P² ; P₀ = −A.
    U = rhs
    P = -A
    for i in range(n_solve):
        U = U + jnp.dot(P, U, preferred_element_type=jnp.float32)
        if i + 1 < n_solve:
            P = jnp.dot(P, P, preferred_element_type=jnp.float32)

    qS0 = jnp.dot(qt, S, preferred_element_type=jnp.float32)
    QK = _dot_t(qt, kt)
    o_ref[0, 0] = (gamma * qS0
                   - jnp.dot(jnp.where(incl, QK * D, 0.0), U,
                             preferred_element_type=jnp.float32))

    G_last = G_col[C - 1, 0]
    decay_to_end = jnp.exp(G_last - G_col)          # [C, 1]
    S_new = (jnp.exp(G_last) * S
             - jax.lax.dot_general(
                 kt, decay_to_end * U, (((0,), (0,)), ((), ())),
                 preferred_element_type=jnp.float32))
    state[:] = S_new

    @pl.when(nc == NC - 1)
    def _():
        sout_ref[0] = S_new


@functools.partial(jax.jit, static_argnames=("chunk_size", "interpret"))
def gdn_chunked_pallas(q, k, v, g, beta, state0, chunk_size: int = 64,
                       interpret: bool = False):
    """Chunk-parallel gated delta rule on already padded+normalized
    inputs: q/k [NC*C, H, dk] (q pre-scaled, both L2-normalized),
    v [NC*C, H, dv], g/beta [NC*C, H], state0 [H, dk, dv] f32.
    Returns (outputs [NC*C, H, dv] f32, final state [H, dk, dv] f32)."""
    T, H, dk = q.shape
    dv = v.shape[-1]
    C = chunk_size
    assert T % C == 0, (T, C)
    NC = T // C
    n_solve = max((C - 1).bit_length(), 1)

    def heads_chunks(x):                   # [T, H, d] → [H, NC, C, d]
        return x.astype(jnp.float32).transpose(1, 0, 2).reshape(
            H, NC, C, x.shape[-1])

    qh, kh, vh = heads_chunks(q), heads_chunks(k), heads_chunks(v)
    gh = g.astype(jnp.float32).T.reshape(H, NC, C, 1)
    bh = beta.astype(jnp.float32).T.reshape(H, NC, C, 1)

    kernel = functools.partial(_gdn_chunk_kernel, C=C, n_solve=n_solve)
    o, s_out = pl.pallas_call(
        kernel,
        grid=(H, NC),
        in_specs=[
            pl.BlockSpec((1, 1, C, dk), lambda h, nc: (h, nc, 0, 0)),
            pl.BlockSpec((1, 1, C, dk), lambda h, nc: (h, nc, 0, 0)),
            pl.BlockSpec((1, 1, C, dv), lambda h, nc: (h, nc, 0, 0)),
            pl.BlockSpec((1, 1, C, 1), lambda h, nc: (h, nc, 0, 0)),
            pl.BlockSpec((1, 1, C, 1), lambda h, nc: (h, nc, 0, 0)),
            pl.BlockSpec((1, dk, dv), lambda h, nc: (h, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, C, dv), lambda h, nc: (h, nc, 0, 0)),
            pl.BlockSpec((1, dk, dv), lambda h, nc: (h, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((H, NC, C, dv), jnp.float32),
            jax.ShapeDtypeStruct((H, dk, dv), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((dk, dv), jnp.float32)],
        interpret=interpret,
    )(qh, kh, vh, gh, bh, state0.astype(jnp.float32))
    outs = o.reshape(H, NC * C, dv).transpose(1, 0, 2)
    return outs, s_out
