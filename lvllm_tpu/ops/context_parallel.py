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


def _partial_attention_token_klen(
    q: jax.Array,                # [T, Hq, D]
    kv_cache: jax.Array,         # [2, NB, BS, Hkv, D] (local shard pages)
    block_table: jax.Array,      # [R, MAXB] local pages
    req_idx: jax.Array,          # [T] request of each token
    kv_len: jax.Array,           # [T] visible LOCAL key count per token
    scale: float,
    sliding_window: Optional[int] = None,
    global_pos: Optional[jax.Array] = None,   # [T] query global position
    col_global: Optional[jax.Array] = None,   # [C] global pos of local slots
    logits_soft_cap: Optional[float] = None,
    alibi_slopes: Optional[jax.Array] = None,  # [Hq]
) -> Tuple[jax.Array, jax.Array]:
    """Core partial attention with an explicit per-token local key count
    (the causal-visibility math differs between cascade suffixes and DCP
    interleaving, so callers supply it).

    With ``col_global``/``global_pos`` (the DCP page-interleave mapping),
    sliding-window masking and ALiBi biases are computed over GLOBAL key
    positions — matching the reference's DCP support for SWA/ALiBi layers;
    without them the window falls back to local-index semantics (cascade
    suffixes, single-shard callers)."""
    T, Hq, D = q.shape
    BS = kv_cache.shape[2]
    Hkv = kv_cache.shape[3]
    G = Hq // Hkv
    C = block_table.shape[1] * BS
    if global_pos is None:
        global_pos = jnp.zeros_like(kv_len)
    slopes = (alibi_slopes.astype(jnp.float32).reshape(Hkv, G, 1)
              if alibi_slopes is not None else None)

    def one_token(q_t, req, klen, gpos):
        pages = kv_cache[:, block_table[req]]
        k = pages[0].reshape(C, Hkv, D).astype(jnp.float32)
        v = pages[1].reshape(C, Hkv, D).astype(jnp.float32)
        qg = q_t.reshape(Hkv, G, D).astype(jnp.float32)
        scores = jnp.einsum("hgd,chd->hgc", qg, k) * scale
        if logits_soft_cap is not None:
            scores = logits_soft_cap * jnp.tanh(scores / logits_soft_cap)
        c_idx = jnp.arange(C, dtype=jnp.int32)
        mask = c_idx < klen
        if sliding_window is not None:
            if col_global is not None:
                mask &= col_global >= (gpos + 1 - sliding_window)
            else:
                mask &= c_idx >= (klen - sliding_window)
        if slopes is not None:
            cols = col_global if col_global is not None else c_idx
            scores = scores + slopes * (cols - gpos)[None, None, :].astype(
                jnp.float32)
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

    out, lse = jax.vmap(one_token)(q, req_idx, kv_len, global_pos)
    return out.astype(q.dtype), lse


@functools.partial(jax.jit, static_argnames=("scale", "sliding_window",
                                             "use_pallas"))
def ragged_paged_attention_with_lse(
    q: jax.Array,                # [T, Hq, D]
    kv_cache: jax.Array,         # [2, NB, BS, Hkv, D] (local shard pages)
    block_table: jax.Array,      # [R, MAXB] local pages
    query_start_loc: jax.Array,  # [R+1]
    seq_lens: jax.Array,         # [R] — LOCAL kv length on this shard
    scale: float,
    sliding_window: Optional[int] = None,
    use_pallas: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Partial attention over a KV shard → (out [T,Hq,D], lse [T,Hq]).

    ``lse`` is log(sum(exp(scaled scores))) over this shard's keys; -inf
    when the shard holds no keys for the token. Causal within the local
    key sequence: each query covers ``seq_lens - q_len + pos + 1`` local
    keys — for DCP decode (q_len=1) that is the whole shard; for cascade
    suffixes it is the usual causal prefix.

    On TPU this runs as the Pallas flash kernel with its LSE output
    (ops/pallas/ragged_attention.py want_lse) — no per-token vmap.
    """
    if use_pallas is None:
        from lvllm_tpu import envs
        use_pallas = (not envs.LVLLM_USE_REFERENCE_OPS
                      and jax.default_backend() in ("tpu", "axon")
                      and q.shape[-1] % 128 == 0)
    if use_pallas:
        from lvllm_tpu.ops.pallas.ragged_attention import \
            ragged_paged_attention_pallas
        return ragged_paged_attention_pallas(
            q, kv_cache, block_table, query_start_loc, seq_lens,
            scale=scale, sliding_window=sliding_window, want_lse=True)
    T = q.shape[0]
    R = block_table.shape[0]
    req_idx = _token_request_map(query_start_loc, T, R)
    q_start = query_start_loc[req_idx]
    q_len = query_start_loc[req_idx + 1] - q_start
    pos_in_q = jnp.arange(T, dtype=jnp.int32) - q_start
    kv_len = seq_lens[req_idx] - q_len + pos_in_q + 1   # [T] causal local
    return _partial_attention_token_klen(
        q, kv_cache, block_table, req_idx, kv_len, scale, sliding_window)


def merge_attention_partials(
    outs: jax.Array,  # [S, T, Hq, D] per-shard partial outputs
    lses: jax.Array,  # [S, T, Hq] per-shard log-sum-exp
    sinks: Optional[jax.Array] = None,  # [Hq] attention-sink logits
) -> jax.Array:
    """LSE-corrected combine of S partial attentions (the reference's
    correction kernel ops/common.py:10-110): weights w_s = exp(lse_s - max)
    normalized over shards; empty shards (lse=-inf) contribute 0.

    ``sinks`` (gpt-oss) joins the merge as one extra virtual shard with a
    zero numerator — the sink logit enters the global softmax denominator
    exactly once."""
    if sinks is not None:
        T, Hq = lses.shape[1], lses.shape[2]
        sink_lse = jnp.broadcast_to(
            sinks.astype(jnp.float32)[None, None, :], (1, T, Hq))
        lses = jnp.concatenate([lses, sink_lse], axis=0)
        outs = jnp.concatenate(
            [outs, jnp.zeros((1,) + outs.shape[1:], outs.dtype)], axis=0)
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


def dcp_write_and_attend(
    q: jax.Array,                 # [T, Hq, D]
    k: jax.Array,                 # [T, Hkv, D] new keys (global, all tokens)
    v: jax.Array,                 # [T, Hkv, D]
    kv_cache: jax.Array,          # [CP, 2, NBl, BS, Hkv, D] context-sharded
    block_table: jax.Array,       # [R, MAXB] per-shard page ids (shared)
    positions: jax.Array,         # [T] global position of each token
    query_start_loc: jax.Array,   # [R+1]
    dcp_slot_mapping: jax.Array,  # [CP, T] local slot per shard (null-block
                                  #   slots for tokens a shard doesn't own)
    mesh,
    scale: float,
    sliding_window: Optional[int] = None,
    logits_soft_cap: Optional[float] = None,
    sinks: Optional[jax.Array] = None,          # [Hq]
    alibi_slopes: Optional[jax.Array] = None,   # [Hq]
) -> Tuple[jax.Array, jax.Array]:
    """The engine's DCP attention step: each context shard scatters the new
    K/V it owns into its local pages, attends over its local KV with a
    per-token visible-key count derived from the page-granularity
    interleave, then the partials are LSE-merged via an all-gather over the
    ``context`` axis (ICI). Returns (out [T, Hq, D], new kv_cache).

    TPU-native equivalent of the reference's DCP decode path
    (``cp_lse_ag_out_ar``, ``v1/attention/ops/common.py:237`` + interleaved
    KV ``config/parallel.py:313``) with interleave group = page size, so
    logical page j of a sequence lives on shard ``j % CP`` at local page
    index ``j // CP`` — one shared block table addresses every shard.
    """
    D = q.shape[-1]
    Dp = kv_cache.shape[-1]
    if D < Dp:
        # Lane-padded cache (config.kv_cache_dim): pad q/k/v, slice out.
        pad = [(0, 0), (0, 0), (0, Dp - D)]
        out, kv_cache = dcp_write_and_attend(
            jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad), kv_cache,
            block_table, positions, query_start_loc, dcp_slot_mapping,
            mesh, scale, sliding_window=sliding_window,
            logits_soft_cap=logits_soft_cap, sinks=sinks,
            alibi_slopes=alibi_slopes)
        return out[..., :D], kv_cache
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from lvllm_tpu.ops.kv_cache import write_kv
    from lvllm_tpu.parallel.mesh import AXIS_CONTEXT, AXIS_MODEL

    CP = mesh.shape[AXIS_CONTEXT]
    tp = mesh.shape[AXIS_MODEL]
    BS = kv_cache.shape[3]
    Hq, Hkv = q.shape[1], kv_cache.shape[4]
    # Shard heads over the model axis when they divide (mirrors
    # parallel/sharding.py kv_cache_spec); replicate otherwise.
    head_ax = AXIS_MODEL if (Hq % tp == 0 and Hkv % tp == 0) else None
    T = q.shape[0]
    R = block_table.shape[0]

    from lvllm_tpu import envs
    use_pallas = (not envs.LVLLM_USE_REFERENCE_OPS
                  and jax.default_backend() in ("tpu", "axon")
                  and q.shape[-1] % 128 == 0)

    def body(q, k, v, kv, slot, bt, pos, qsl):
        kv_local = kv[0]
        kv_local = write_kv(kv_local, k, v, slot[0])
        s = jax.lax.axis_index(AXIS_CONTEXT)
        # Visible local keys for a token at global position p: the count of
        # positions 0..p that page-interleave onto this shard (includes the
        # token itself exactly on its owner shard, whose K was just written).
        klen = dcp_shard_seq_lens(pos + 1, s, CP, interleave=BS)
        if use_pallas:
            # Pallas flash kernel in explicit-klen mode: window/ALiBi
            # masks over GLOBAL key positions via the page-interleave
            # mapping; LSE comes out of the kernel (no per-token vmap).
            from lvllm_tpu.ops.pallas.ragged_attention import \
                ragged_paged_attention_pallas
            req_last = jnp.maximum(qsl[1:] - 1, qsl[:-1])
            req_seq = pos[jnp.clip(req_last, 0, T - 1)] + 1
            local_lens = dcp_shard_seq_lens(req_seq, s, CP, interleave=BS)
            out, lse = ragged_paged_attention_pallas(
                q, kv_local, bt, qsl, local_lens, scale=scale,
                sliding_window=sliding_window,
                logits_soft_cap=logits_soft_cap,
                alibi_slopes=alibi_slopes, want_lse=True,
                token_klen=klen, token_gpos=pos,
                cp_shards=CP, shard_idx=s)
            outs = jax.lax.all_gather(out.astype(jnp.float32),
                                      AXIS_CONTEXT)
            lses = jax.lax.all_gather(lse, AXIS_CONTEXT)
            merged = merge_attention_partials(outs, lses, sinks=sinks)
            return merged.astype(q.dtype), kv_local[None]
        req_idx = _token_request_map(qsl, T, R)
        # Global position of local slot c under page interleave: logical
        # page (c // BS) on this shard is global page (c // BS) * CP + s.
        C = bt.shape[1] * BS
        c_idx = jnp.arange(C, dtype=jnp.int32)
        col_global = ((c_idx // BS) * CP + s) * BS + c_idx % BS
        need_global = (sliding_window is not None
                       or alibi_slopes is not None)
        out, lse = _partial_attention_token_klen(
            q, kv_local, bt, req_idx, klen, scale,
            sliding_window=sliding_window,
            global_pos=pos if need_global else None,
            col_global=col_global if need_global else None,
            logits_soft_cap=logits_soft_cap,
            alibi_slopes=alibi_slopes)
        outs = jax.lax.all_gather(out.astype(jnp.float32), AXIS_CONTEXT)
        lses = jax.lax.all_gather(lse, AXIS_CONTEXT)
        merged = merge_attention_partials(outs, lses, sinks=sinks)
        return merged.astype(q.dtype), kv_local[None]

    hd = P(None, head_ax, None)
    sharded = shard_map(
        body, mesh=mesh,
        in_specs=(hd, hd, hd,
                  P(AXIS_CONTEXT, None, None, None, head_ax, None),
                  P(AXIS_CONTEXT, None), P(), P(), P()),
        out_specs=(hd, P(AXIS_CONTEXT, None, None, None, head_ax, None)),
        check_vma=False,
    )
    return sharded(q, k, v, kv_cache, dcp_slot_mapping, block_table,
                   positions, query_start_loc)
