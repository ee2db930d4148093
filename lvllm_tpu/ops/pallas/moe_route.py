"""Fused MoE routing kernel: router GEMM → top-k → counting-sort rank, one
Pallas launch.

TPU-native counterpart of the reference's topk_softmax + moe_align CUDA
kernels (``csrc/moe/topk_softmax_kernels.cu``,
``csrc/moe/moe_align_block_size_kernels.cu``): the XLA pipeline for
route → one-hot cumsum rank cost ~0.40 ms/layer at prefill width on v5e
(tools/probe_moe_glue.py) because the [T*K, E] one-hot materializes in HBM
and the cumsum makes log-N passes over it. Here everything stays in VMEM:

- top-k by iterative masked argmax (min-index tie-break == lax.top_k),
- the per-token-prefix expert counts via a lower-triangular MATMUL (the
  MXU does the cumsum), pair rank = token prefix + within-token prefix,
- running per-expert counts carried across sequential grid steps in the
  counts output block (TPU grid steps execute in order on one core).

Outputs feed ops/moe_align.align_tokens_from_route: dest rows are
bit-identical to the jnp counting-sort path.
"""

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _route_rank_kernel(x_ref, r_ref, rb_ref, w_ref, i_ref, rank_ref,
                       counts_ref, *, top_k: int, num_experts: int,
                       chunk: int, total_tokens: int, scoring_fn: str,
                       norm_topk_prob: bool, scaling_factor: float,
                       has_bias: bool):
    step = pl.program_id(0)
    E = num_experts
    T = chunk
    K = top_k

    @pl.when(step == 0)
    def _():
        counts_ref[:] = jnp.zeros_like(counts_ref)

    logits = jax.lax.dot_general(
        x_ref[:].astype(jnp.float32), r_ref[:].astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # [T, E]
    if has_bias:
        logits = logits + rb_ref[0].astype(jnp.float32)[None, :]

    if scoring_fn == "softmax":
        m = jnp.max(logits, axis=1, keepdims=True)
        ex = jnp.exp(logits - m)
        scores = ex / jnp.sum(ex, axis=1, keepdims=True)
    else:  # sigmoid
        scores = jax.lax.logistic(logits)

    # Mask rows past the real token count (x is zero-padded to a chunk
    # multiple): they select no expert and contribute nothing to counts.
    row_g = step * T + jax.lax.broadcasted_iota(jnp.int32, (T, E), 0)
    valid = row_g < total_tokens

    # Iterative masked argmax == lax.top_k (ties → lowest index).
    e_iota = jax.lax.broadcasted_iota(jnp.int32, (T, E), 1)
    cur = jnp.where(valid, scores, -jnp.inf)
    id_cols = []
    w_cols = []
    onehots = []
    for _ in range(K):
        mx = jnp.max(cur, axis=1, keepdims=True)
        idx = jnp.min(jnp.where(cur == mx, e_iota, E), axis=1,
                      keepdims=True)                      # [T, 1]
        oh = (e_iota == idx)                              # [T, E] bool
        id_cols.append(idx)
        w_cols.append(jnp.sum(jnp.where(oh, scores, 0.0), axis=1,
                              keepdims=True))
        onehots.append(jnp.where(valid & oh, 1.0, 0.0))
        cur = jnp.where(oh, -jnp.inf, cur)

    w = jnp.concatenate(w_cols, axis=1)                   # [T, K]
    if norm_topk_prob:
        w = w / jnp.clip(jnp.sum(w, axis=1, keepdims=True), 1e-9)
    if scaling_factor != 1.0:
        w = w * scaling_factor
    w_ref[:] = w
    i_ref[:] = jnp.concatenate(id_cols, axis=1)

    total = onehots[0]
    for k in range(1, K):
        total = total + onehots[k]                        # [T, E] f32
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
    c_iota = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
    tri = (c_iota < r_iota).astype(jnp.float32)
    csum_tok_ex = jax.lax.dot_general(
        tri, total, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)               # [T, E]
    base = counts_ref[0].astype(jnp.float32)[None, :]
    acc = csum_tok_ex + base
    rank_cols = []
    for k in range(K):
        rank_cols.append(jnp.sum(onehots[k] * acc, axis=1, keepdims=True))
        acc = acc + onehots[k]
    rank_ref[:] = jnp.concatenate(rank_cols, axis=1).astype(jnp.int32)
    counts_ref[0] = counts_ref[0] + jnp.sum(total, axis=0).astype(jnp.int32)


def fused_route_rank(
    x: jax.Array,                 # [T, H]
    router: jax.Array,            # [H, E]
    top_k: int,
    *,
    router_bias: Optional[jax.Array] = None,   # [E]
    scoring_fn: str = "softmax",
    norm_topk_prob: bool = True,
    scaling_factor: float = 1.0,
    chunk: int = 256,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """One-launch routing: (topk_w [T,K] f32, topk_ids [T,K] i32,
    rank [T,K] i32 — # earlier same-expert pairs in token-major pair
    order, counts [E] i32)."""
    T, H = x.shape
    E = router.shape[1]
    assert scoring_fn in ("softmax", "sigmoid")
    # Small batches (decode) use one right-sized chunk instead of padding
    # to the full prefill chunk width.
    chunk = min(chunk, max(8, -(-T // 8) * 8))
    T_pad = -(-T // chunk) * chunk
    if T_pad != T:
        x = jnp.concatenate(
            [x, jnp.zeros((T_pad - T, H), x.dtype)], axis=0)
    nsteps = T_pad // chunk
    has_bias = router_bias is not None
    rb = (router_bias.reshape(1, E) if has_bias
          else jnp.zeros((1, E), jnp.float32))

    kern = functools.partial(
        _route_rank_kernel, top_k=top_k, num_experts=E, chunk=chunk,
        total_tokens=T, scoring_fn=scoring_fn,
        norm_topk_prob=norm_topk_prob, scaling_factor=scaling_factor,
        has_bias=has_bias)
    w, ids, rank, counts = pl.pallas_call(
        kern,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((chunk, H), lambda s: (s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, E), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, E), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((chunk, top_k), lambda s: (s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, top_k), lambda s: (s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, top_k), lambda s: (s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, E), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T_pad, top_k), jnp.float32),
            jax.ShapeDtypeStruct((T_pad, top_k), jnp.int32),
            jax.ShapeDtypeStruct((T_pad, top_k), jnp.int32),
            jax.ShapeDtypeStruct((1, E), jnp.int32),
        ),
    )(x, router, rb)
    return w[:T], ids[:T], rank[:T], counts[0]
