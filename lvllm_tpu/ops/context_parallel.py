"""Decode context parallelism (DCP): partial attention + LSE-corrected merge.

Counterpart of the reference's DCP machinery (SURVEY.md §2.3): the KV cache
of one sequence is interleaved across ranks
(``cp_kv_cache_interleave_size``); each rank attends over its local KV and
the partial results are merged with flash-attention log-sum-exp correction —
``_correct_attn_cp_out_kernel`` / ``cp_lse_ag_out_rs`` / ``cp_lse_ag_out_ar``
(``vllm/v1/attention/ops/common.py:10-259``). Here the merge is the math
(this module) + an ``all_gather`` over the mesh axis (XLA rides ICI).
"""

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from lvllm_tpu.ops.attention import _token_request_map


@functools.partial(jax.jit, static_argnames=("scale", "sliding_window"))
def ragged_paged_attention_with_lse(
    q: jax.Array,                # [T, Hq, D]
    kv_cache: jax.Array,         # [2, NB, BS, Hkv, D] (local shard pages)
    block_table: jax.Array,      # [R, MAXB] local pages
    query_start_loc: jax.Array,  # [R+1]
    seq_lens: jax.Array,         # [R] — LOCAL kv length on this shard
    scale: float,
    sliding_window: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Partial attention over a KV shard → (out [T,Hq,D], lse [T,Hq]).

    ``lse`` is log(sum(exp(scaled scores))) over this shard's keys; -inf
    when the shard holds no keys for the token. Causal within the local
    key sequence: each query covers ``seq_lens - q_len + pos + 1`` local
    keys — for DCP decode (q_len=1) that is the whole shard; for cascade
    suffixes it is the usual causal prefix.
    """
    T, Hq, D = q.shape
    R, MAXB = block_table.shape
    BS = kv_cache.shape[2]
    Hkv = kv_cache.shape[3]
    G = Hq // Hkv
    C = MAXB * BS

    req_idx = _token_request_map(query_start_loc, T, R)
    q_start = query_start_loc[req_idx]
    q_len = query_start_loc[req_idx + 1] - q_start
    pos_in_q = jnp.arange(T, dtype=jnp.int32) - q_start
    kv_len = seq_lens[req_idx] - q_len + pos_in_q + 1   # [T] causal local

    def one_token(q_t, req, klen):
        pages = kv_cache[:, block_table[req]]
        k = pages[0].reshape(C, Hkv, D).astype(jnp.float32)
        v = pages[1].reshape(C, Hkv, D).astype(jnp.float32)
        qg = q_t.reshape(Hkv, G, D).astype(jnp.float32)
        scores = jnp.einsum("hgd,chd->hgc", qg, k) * scale
        c_idx = jnp.arange(C, dtype=jnp.int32)
        mask = c_idx < klen
        if sliding_window is not None:
            mask &= c_idx >= (klen - sliding_window)
        scores = jnp.where(mask[None, None, :], scores, -jnp.inf)
        m = jnp.max(scores, axis=-1, keepdims=True)
        m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
        p = jnp.exp(scores - m_safe)
        p = jnp.where(mask[None, None, :], p, 0.0)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        out = jnp.einsum("hgc,chd->hgd", p, v) / jnp.maximum(denom, 1e-30)
        lse = jnp.where(denom[..., 0] > 0,
                        m_safe[..., 0] + jnp.log(jnp.maximum(denom[..., 0],
                                                             1e-30)),
                        -jnp.inf)
        return out.reshape(Hq, D), lse.reshape(Hq)

    out, lse = jax.vmap(one_token)(q, req_idx, kv_len)
    return out.astype(q.dtype), lse


def merge_attention_partials(
    outs: jax.Array,  # [S, T, Hq, D] per-shard partial outputs
    lses: jax.Array,  # [S, T, Hq] per-shard log-sum-exp
) -> jax.Array:
    """LSE-corrected combine of S partial attentions (the reference's
    correction kernel ops/common.py:10-110): weights w_s = exp(lse_s - max)
    normalized over shards; empty shards (lse=-inf) contribute 0."""
    m = jnp.max(lses, axis=0, keepdims=True)                  # [1, T, Hq]
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    w = jnp.where(jnp.isfinite(lses), jnp.exp(lses - m_safe), 0.0)
    denom = jnp.sum(w, axis=0)                                # [T, Hq]
    out = jnp.einsum("sth,sthd->thd", w, outs.astype(jnp.float32))
    out = out / jnp.maximum(denom, 1e-30)[..., None]
    return out.astype(outs.dtype)


def dcp_shard_seq_lens(seq_lens: jax.Array, shard_idx, num_shards: int,
                       interleave: int = 1) -> jax.Array:
    """Local KV length per request for one DCP shard when tokens are
    round-robin interleaved across shards in ``interleave``-sized groups
    (reference: cp_kv_cache_interleave_size, config/parallel.py:313)."""
    g = interleave
    full_groups = seq_lens // (g * num_shards)
    rem = seq_lens - full_groups * g * num_shards
    extra = jnp.clip(rem - shard_idx * g, 0, g)
    return full_groups * g + extra
