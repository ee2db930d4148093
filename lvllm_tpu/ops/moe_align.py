"""Token alignment for blocked grouped GEMM.

TPU-native counterpart of the reference's ``moe_align_block_size`` CUDA
kernel (``csrc/moe/moe_align_block_size_kernels.cu``) + permute/unpermute:
pad each expert's token segment to a multiple of TILE_M so every GEMM tile
maps to exactly one expert, then the Pallas grouped kernel
(``ops/pallas/quant_gemm.py``) indexes expert weights per tile via scalar
prefetch. All jnp with static shapes — runs inside the jitted step.
"""

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class AlignedDispatch(NamedTuple):
    x_aligned: jax.Array     # [M_pad, H] tokens sorted by expert, zeros pad
    pair_pos: jax.Array      # [T*K] position of each (token,k) pair in M_pad
    block_expert: jax.Array  # [M_pad // tile_m] expert of each row block
    num_valid: jax.Array     # scalar — total real pairs (T*K)


def max_padded_rows(num_pairs: int, num_experts: int, tile_m: int) -> int:
    """Static M_pad bound: each expert wastes < tile_m rows; rounded up so
    M_pad itself is a whole number of row blocks."""
    raw = num_pairs + num_experts * tile_m
    return -(-raw // tile_m) * tile_m


def align_tokens(
    x: jax.Array,         # [T, H]
    topk_ids: jax.Array,  # [T, K] i32
    num_experts: int,
    tile_m: int,
) -> AlignedDispatch:
    T, K = topk_ids.shape
    flat = topk_ids.reshape(-1)
    # Stable counting sort via one-hot cumsum — a general argsort costs
    # ~2 ms at prefill widths (16k pairs) on TPU and dominated the MoE
    # glue; the destination row of each pair is just
    # offsets[expert] + (# earlier pairs of the same expert).
    onehot = (flat[:, None] ==
              jnp.arange(num_experts, dtype=flat.dtype)[None, :]
              ).astype(jnp.int32)
    csum = jnp.cumsum(onehot, axis=0)                    # inclusive [N, E]
    counts = csum[-1]                                    # [E]
    rank = jnp.take_along_axis(csum - onehot, flat[:, None],
                               axis=1)[:, 0]             # [N]
    return align_tokens_from_rank(x, topk_ids, rank, counts, num_experts,
                                  tile_m)


def align_tokens_from_rank(
    x: jax.Array,         # [T, H]
    topk_ids: jax.Array,  # [T, K] i32
    rank: jax.Array,      # [T*K] or [T, K] i32 — earlier same-expert pairs
    counts: jax.Array,    # [E] i32
    num_experts: int,
    tile_m: int,
) -> AlignedDispatch:
    """Dispatch from precomputed (rank, counts) — the fused routing kernel
    (ops/pallas/moe_route.fused_route_rank) produces them in one launch;
    dest rows are identical to the jnp counting sort."""
    T, K = topk_ids.shape
    H = x.shape[1]
    N = T * K
    E = num_experts
    M_pad = max_padded_rows(N, E, tile_m)
    flat = topk_ids.reshape(-1)
    rank = rank.reshape(-1)
    padded = ((counts + tile_m - 1) // tile_m) * tile_m  # [E]
    offsets = jnp.cumsum(padded) - padded                # exclusive [E]
    dest = (offsets[flat] + rank).astype(jnp.int32)      # [N] in M_pad

    # pair_pos[pair] = destination row of that (token, k) pair.
    pair_pos = dest

    # Row placement as an int32 index scatter + H-wide row GATHER: the
    # direct H-wide row scatter (.at[dest].set(x[token])) costs 1.13 ms at
    # prefill width on v5e vs 0.19 ms for this form (tools/probe_moe_glue.py)
    # — TPU scatter lowering serializes, gathers stream. Pad rows pull the
    # appended zero row (src == T).
    token_of_pair = (jnp.arange(N, dtype=jnp.int32) // K)
    src = jnp.full((M_pad,), T, jnp.int32).at[dest].set(token_of_pair)
    xp = jnp.concatenate([x, jnp.zeros((1, H), x.dtype)], axis=0)
    x_aligned = xp[src]

    # Expert of each row-block: block b starts at row b*tile_m; it belongs
    # to expert e iff offsets[e] <= b*tile_m < offsets[e] + padded[e].
    nb = M_pad // tile_m
    block_start = jnp.arange(nb, dtype=jnp.int32) * tile_m
    seg_end = offsets + padded                            # [E]
    e_of_block = jnp.searchsorted(seg_end, block_start,
                                  side="right").astype(jnp.int32)
    total = seg_end[E - 1] if E > 0 else 0
    block_expert = jnp.where(block_start < total,
                             jnp.clip(e_of_block, 0, E - 1), -1)
    return AlignedDispatch(x_aligned, pair_pos, block_expert,
                           jnp.asarray(N, jnp.int32))


def combine_tokens(
    y_aligned: jax.Array,   # [M_pad, H]
    pair_pos: jax.Array,    # [T*K]
    topk_weights: jax.Array,  # [T, K] f32
    out_dtype=None,
) -> jax.Array:
    """Gather expert outputs back to (token, k) order and combine.

    Broadcast-multiply + sum instead of einsum: the [T, K, H] einsum
    relayouts for the MXU where a VPU mul+reduce streams (0.26 → 0.22 ms
    at prefill width, tools/probe_moe_glue.py)."""
    T, K = topk_weights.shape
    H = y_aligned.shape[1]
    y_pairs = y_aligned[pair_pos].reshape(T, K, H).astype(jnp.float32)
    y = (y_pairs * topk_weights.astype(jnp.float32)[:, :, None]).sum(1)
    return y.astype(out_dtype or y_aligned.dtype)
