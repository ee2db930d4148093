"""PCP — prefill context parallelism.

Counterpart of the reference's prefill-context-parallel group
(``prefill_context_parallel_size``, ``parallel_state.py:1277``,
``v1/worker/cp_utils.py``): a long prompt's query sequence is split into
contiguous chunks across the PCP ranks; every rank computes the KV for its
own chunk, the chunks are all-gathered over ICI, and each rank runs causal
attention for its queries against the full gathered prefix. Combined with
DCP (``ops/context_parallel.py``) this is the long-context scaling story —
no ring attention needed (SURVEY.md §5.7).
"""

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from lvllm_tpu.parallel.mesh import AXIS_CONTEXT, AXIS_MODEL


def pcp_prefill_attention(
    q: jax.Array,  # [T, Hq, D] — sequence-sharded over the model axis
    k: jax.Array,  # [T, Hkv, D] — same sharding
    v: jax.Array,  # [T, Hkv, D]
    mesh,
    scale: float,
) -> jax.Array:
    """Causal attention for one long prefill, queries sharded by sequence
    chunk. Returns [T, Hq, D] with the same sharding as q."""
    p = mesh.shape[AXIS_MODEL]
    T = q.shape[0]
    assert T % p == 0, (T, p)
    chunk = T // p

    def shard_fn(q_c, k_c, v_c):
        Hq, D = q_c.shape[1], q_c.shape[2]
        Hkv = k_c.shape[1]
        G = Hq // Hkv
        rank = jax.lax.axis_index(AXIS_MODEL)
        # Gather the full KV prefix (rank-ordered == sequence-ordered).
        k_full = jax.lax.all_gather(k_c, AXIS_MODEL).reshape(T, Hkv, D)
        v_full = jax.lax.all_gather(v_c, AXIS_MODEL).reshape(T, Hkv, D)

        qf = q_c.reshape(chunk, Hkv, G, D).astype(jnp.float32)
        kf = k_full.astype(jnp.float32)
        scores = jnp.einsum("thgd,chd->thgc", qf, kf) * scale
        # Causal mask at global positions: query i sits at rank*chunk + i.
        q_pos = rank * chunk + jnp.arange(chunk)
        mask = jnp.arange(T)[None, :] <= q_pos[:, None]   # [chunk, T]
        scores = jnp.where(mask[:, None, None, :], scores, -jnp.inf)
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("thgc,chd->thgd", probs,
                         v_full.astype(jnp.float32))
        return out.reshape(chunk, Hq, D).astype(q_c.dtype)

    return shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(AXIS_MODEL), P(AXIS_MODEL), P(AXIS_MODEL)),
        out_specs=P(AXIS_MODEL),
        check_vma=False,
    )(q, k, v)


def pcp_chunked_prefill(
    q: jax.Array,             # [T, Hq, D] — sequence-sharded over "context"
    k: jax.Array,             # [T, Hkv, D] — same sharding
    v: jax.Array,             # [T, Hkv, D]
    kv_cache: jax.Array,      # [2, NB, BS, Hkv, D] — replicated
    block_table: jax.Array,   # [MAXB] — the single request's pages
    positions: jax.Array,     # [T] global positions (sharded like q)
    slot_mapping: jax.Array,  # [T] cache slots for this chunk (sharded)
    n_valid: jax.Array,       # scalar i32: real (unpadded) token count
    start: jax.Array,         # scalar i32: already-cached prefix length
    mesh,
    scale: float,
) -> Tuple[jax.Array, jax.Array]:
    """Engine-path PCP: ONE long-prefill chunk with queries sharded over
    the mesh "context" axis (reference: prefill_context_parallel_size,
    ``config/parallel.py:115``; group ``parallel_state.py:1277``).

    Each rank holds a contiguous query chunk; the chunk's K/V is
    all-gathered (ICI) so every rank attends its queries against (a) the
    already-cached prefix via paged partial attention and (b) the gathered
    in-flight chunk — merged with the flash-attention LSE correction
    (``ops/context_parallel.merge_attention_partials``, the analog of the
    reference's ``v1/attention/ops/common.py:10-110``). The chunk's KV is
    written to the (context-replicated) cache by every rank identically.

    Works for any chunk of a chunked prefill: the first chunk has
    ``start == 0`` and the prefix partial contributes nothing (lse=-inf).
    Returns (out [T, Hq, D] sharded like q, updated kv_cache).
    """
    from lvllm_tpu.ops.context_parallel import (
        _partial_attention_token_klen, merge_attention_partials)
    from lvllm_tpu.ops.kv_cache import write_kv

    p = mesh.shape[AXIS_CONTEXT]
    T = q.shape[0]
    assert T % p == 0, (T, p)
    chunk = T // p
    D_in = q.shape[-1]
    Dp = kv_cache.shape[-1]
    if D_in < Dp:
        # Lane-padded cache (config.kv_cache_dim): pad q/k/v, slice out.
        pad = [(0, 0), (0, 0), (0, Dp - D_in)]
        out, kv_cache = pcp_chunked_prefill(
            jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad), kv_cache,
            block_table, positions, slot_mapping, n_valid, start, mesh,
            scale)
        return out[..., :D_in], kv_cache

    def shard_fn(q_c, k_c, v_c, kv, bt, pos_c, slot_c, nv, st):
        Hq, D = q_c.shape[1], q_c.shape[2]
        Hkv = k_c.shape[1]
        G = Hq // Hkv
        # Gather the full chunk KV + positions/slots (shard-major order ==
        # sequence order for contiguous sharding).
        k_full = jax.lax.all_gather(k_c, AXIS_CONTEXT).reshape(T, Hkv, D)
        v_full = jax.lax.all_gather(v_c, AXIS_CONTEXT).reshape(T, Hkv, D)
        pos_full = jax.lax.all_gather(pos_c, AXIS_CONTEXT).reshape(T)
        slot_full = jax.lax.all_gather(slot_c, AXIS_CONTEXT).reshape(T)
        kv = write_kv(kv, k_full, v_full, slot_full)

        # (a) prefix partial: paged attention over the first `st` cached
        # tokens (the chunk's freshly written pages sit beyond `st` in the
        # block table and are masked by kv_len).
        zeros = jnp.zeros((chunk,), jnp.int32)
        out_pre, lse_pre = _partial_attention_token_klen(
            q_c, kv, bt[None, :], zeros, jnp.full((chunk,), st, jnp.int32),
            scale)

        # (b) chunk partial: causal over the gathered in-flight chunk.
        qf = q_c.reshape(chunk, Hkv, G, D).astype(jnp.float32)
        kf = k_full.astype(jnp.float32)
        scores = jnp.einsum("thgd,chd->thgc", qf, kf) * scale
        col = jnp.arange(T, dtype=jnp.int32)
        mask = (col[None, :] < nv) & (pos_full[None, :] <= pos_c[:, None])
        scores = jnp.where(mask[:, None, None, :], scores, -jnp.inf)
        m = jnp.max(scores, axis=-1, keepdims=True)
        m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
        pr = jnp.where(mask[:, None, None, :],
                       jnp.exp(scores - m_safe), 0.0)
        denom = jnp.sum(pr, axis=-1, keepdims=True)
        out_ch = jnp.einsum("thgc,chd->thgd", pr,
                            v_full.astype(jnp.float32)) / \
            jnp.maximum(denom, 1e-30)
        lse_ch = jnp.where(
            denom[..., 0] > 0,
            m_safe[..., 0] + jnp.log(jnp.maximum(denom[..., 0], 1e-30)),
            -jnp.inf)
        out_ch = out_ch.reshape(chunk, Hq, D).astype(q_c.dtype)
        lse_ch = lse_ch.reshape(chunk, Hq)

        merged = merge_attention_partials(
            jnp.stack([out_pre, out_ch]), jnp.stack([lse_pre, lse_ch]))
        return merged, kv

    return shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(AXIS_CONTEXT), P(AXIS_CONTEXT), P(AXIS_CONTEXT), P(),
                  P(), P(AXIS_CONTEXT), P(AXIS_CONTEXT), P(), P()),
        out_specs=(P(AXIS_CONTEXT), P()),
        check_vma=False,
    )(q, k, v, kv_cache, block_table, positions, slot_mapping,
      jnp.asarray(n_valid, jnp.int32), jnp.asarray(start, jnp.int32))
