"""Cascade attention: two-phase shared-prefix attention.

Counterpart of the reference's cascade attention
(``gpu_model_runner.py:2356-2489`` use_cascade heuristic + the FlashAttention
cascade path): when many requests share a common prompt prefix (system
prompt), phase 1 computes every query's attention over the SHARED prefix KV
once (a dense, non-causal batch — far better MXU utilization than paged
gathers per request), phase 2 runs ordinary ragged paged attention over each
request's unique suffix, and the two partials merge with the same LSE
correction used for DCP (``ops/context_parallel.merge_attention_partials``).
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from lvllm_tpu.ops.context_parallel import (merge_attention_partials,
                                            ragged_paged_attention_with_lse)


def shared_prefix_attention_with_lse(
    q: jax.Array,         # [T, Hq, D] all queries
    prefix_k: jax.Array,  # [P, Hkv, D] shared prefix keys
    prefix_v: jax.Array,  # [P, Hkv, D]
    scale: float,
    prefix_len: Optional[jax.Array] = None,  # scalar; None => all P valid
) -> Tuple[jax.Array, jax.Array]:
    """Every query attends the whole shared prefix (all queries sit after
    it, so no causal mask). ``prefix_len`` masks bucket-padding columns
    when P is padded to a compile-stable size.
    Returns (out [T, Hq, D], lse [T, Hq])."""
    T, Hq, D = q.shape
    P, Hkv, _ = prefix_k.shape
    G = Hq // Hkv
    qf = q.reshape(T, Hkv, G, D).astype(jnp.float32)
    kf = prefix_k.astype(jnp.float32)
    scores = jnp.einsum("thgd,phd->thgp", qf, kf) * scale
    if prefix_len is not None:
        cols = jnp.arange(P, dtype=jnp.int32)
        scores = jnp.where(cols[None, None, None, :] < prefix_len,
                           scores, -jnp.inf)
    m = jnp.max(scores, axis=-1, keepdims=True)
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    p = jnp.exp(scores - m_safe)
    p = jnp.where(jnp.isfinite(scores), p, 0.0)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.einsum("thgp,phd->thgd", p, prefix_v.astype(jnp.float32)) \
        / jnp.maximum(denom, 1e-30)
    lse = (m_safe[..., 0] +
           jnp.log(jnp.maximum(denom[..., 0], 1e-30))).reshape(T, Hq)
    return out.reshape(T, Hq, D).astype(q.dtype), lse


def cascade_attention(
    q: jax.Array,                # [T, Hq, D]
    prefix_k: jax.Array,         # [P, Hkv, D] shared prefix
    prefix_v: jax.Array,
    suffix_kv_cache: jax.Array,  # paged cache holding per-request suffixes
    block_table: jax.Array,      # [R, MAXB] suffix pages
    query_start_loc: jax.Array,  # [R+1]
    suffix_seq_lens: jax.Array,  # [R] suffix-only lengths
    scale: float,
    prefix_len: Optional[jax.Array] = None,
) -> jax.Array:
    """Two-phase shared-prefix attention with LSE merge."""
    D = q.shape[-1]
    Dp = suffix_kv_cache.shape[-1]
    if D < Dp:
        # Lane-padded cache (config.kv_cache_dim): prefix_k/v come from
        # the cache (already padded); pad q and slice the merged output.
        q = jnp.pad(q, [(0, 0), (0, 0), (0, Dp - D)])
        return cascade_attention(q, prefix_k, prefix_v, suffix_kv_cache,
                                 block_table, query_start_loc,
                                 suffix_seq_lens, scale,
                                 prefix_len=prefix_len)[..., :D]
    prefix_out, prefix_lse = shared_prefix_attention_with_lse(
        q, prefix_k, prefix_v, scale, prefix_len=prefix_len)
    suffix_out, suffix_lse = ragged_paged_attention_with_lse(
        q, suffix_kv_cache, block_table, query_start_loc, suffix_seq_lens,
        scale=scale)
    outs = jnp.stack([prefix_out.astype(jnp.float32),
                      suffix_out.astype(jnp.float32)])
    lses = jnp.stack([prefix_lse, suffix_lse])
    return merge_attention_partials(outs, lses).astype(q.dtype)


def use_cascade_heuristic(num_reqs: int, shared_prefix_len: int,
                          block_size: int) -> bool:
    """Reference heuristic shape: worth it with enough sharers and a prefix
    of at least a few blocks (gpu_model_runner.py:2356)."""
    return num_reqs >= 8 and shared_prefix_len >= 4 * block_size
