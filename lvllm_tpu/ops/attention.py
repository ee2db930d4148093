"""Ragged paged attention.

TPU-native counterpart of the reference's paged-attention stack
(``csrc/attention/*``, ``vllm/v1/attention/backends/flash_attn.py``): one op
serves mixed prefill+decode batches — queries are ragged segments per
request (``query_start_loc``), KV lives in pages addressed by a block table.

Two implementations:
- ``ragged_paged_attention_reference`` — pure jnp, O(T × max_ctx) memory;
  the correctness oracle and CPU fallback.
- the Pallas kernel in ``ops/pallas/ragged_attention.py`` — the production
  path (dispatched via ``ragged_paged_attention``).
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from lvllm_tpu import envs


def alibi_slopes(num_heads: int) -> jnp.ndarray:
    """Standard ALiBi head slopes (train-short-test-long paper; numerics
    match HF ``build_alibi_tensor`` for Bloom and Baichuan-13B, and MPT's
    ``build_mpt_alibi_tensor`` for power-of-two head counts)."""
    import math
    closest = 2 ** math.floor(math.log2(num_heads))
    base = 2.0 ** (-(2.0 ** -(math.log2(closest) - 3)))
    slopes = base ** np.arange(1, closest + 1, dtype=np.float32)
    if closest < num_heads:
        extra_base = 2.0 ** (-(2.0 ** -(math.log2(2 * closest) - 3)))
        extra = extra_base ** np.arange(
            1, 2 * (num_heads - closest) + 1, 2, dtype=np.float32)
        slopes = np.concatenate([slopes, extra])
    return jnp.asarray(slopes, jnp.float32)


def _token_request_map(query_start_loc: jax.Array, num_tokens: int,
                       num_reqs: int) -> jax.Array:
    """req_idx[t] for each token slot t (padded slots map to num_reqs-1 but
    are masked out downstream)."""
    t = jnp.arange(num_tokens, dtype=jnp.int32)
    # qsl is non-decreasing; req of token t is the last r with qsl[r] <= t.
    req_idx = jnp.searchsorted(query_start_loc, t, side="right") - 1
    return jnp.clip(req_idx, 0, num_reqs - 1).astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "sliding_window", "logits_soft_cap"),
)
def ragged_paged_attention_reference(
    q: jax.Array,                # [T, Hq, D]
    kv_cache: jax.Array,         # [2, NB, BS, Hkv, D]
    block_table: jax.Array,      # [R, MAXB] int32
    query_start_loc: jax.Array,  # [R+1] int32, padded rows repeat the end
    seq_lens: jax.Array,         # [R] int32 total context len (0 = inactive)
    scale: float,
    sliding_window: Optional[int] = None,
    logits_soft_cap: Optional[float] = None,
    sinks: Optional[jax.Array] = None,   # [Hq] f32 per-head sink logit
    alibi_slopes: Optional[jax.Array] = None,  # [Hq] f32 ALiBi slopes
    prefix_lens: Optional[jax.Array] = None,   # [R] bidirectional prefix
) -> jax.Array:
    """Correctness-oracle ragged paged attention (GQA, causal).

    ``sinks`` (gpt-oss attention sinks, HF eager_attention_forward): a
    learned per-head logit appended to every softmax — contributes to the
    denominator only (the sink column's probability is dropped).

    ``alibi_slopes`` (Bloom/MPT/Baichuan-13B, HF build_alibi_tensor): adds
    slope_h * (key_pos - query_pos) to the logits — 0 on self, increasingly
    negative into the past (shift-invariant-equal to HF's slope*key_pos)."""
    T, Hq, D = q.shape
    R, MAXB = block_table.shape
    BS = kv_cache.shape[2]
    Hkv = kv_cache.shape[3]
    G = Hq // Hkv
    C = MAXB * BS

    req_idx = _token_request_map(query_start_loc, T, R)
    q_start = query_start_loc[req_idx]
    q_end = query_start_loc[req_idx + 1]
    pos_in_query = jnp.arange(T, dtype=jnp.int32) - q_start
    q_len = q_end - q_start
    ctx_len = seq_lens[req_idx]
    # Causal KV length for each token: context up to and including itself.
    kv_len = ctx_len - q_len + pos_in_query + 1
    if prefix_lens is not None:
        # Prefix-LM (PaliGemma): tokens inside the prefix attend
        # bidirectionally over the whole prefix (clamped to the keys
        # actually written — full fidelity needs the prefix in one
        # prefill chunk).
        kv_len = jnp.maximum(kv_len,
                             jnp.minimum(prefix_lens[req_idx], ctx_len))
    valid_token = (jnp.arange(T, dtype=jnp.int32) < query_start_loc[R]) & \
        (pos_in_query < q_len)

    def one_token(q_t, req, klen, valid):
        pages = kv_cache[:, block_table[req]]       # [2, MAXB, BS, Hkv, D]
        k = pages[0].reshape(C, Hkv, D)
        v = pages[1].reshape(C, Hkv, D)
        qg = q_t.reshape(Hkv, G, D).astype(jnp.float32)
        kf = k.astype(jnp.float32)
        scores = jnp.einsum("hgd,chd->hgc", qg, kf) * scale
        if logits_soft_cap is not None:
            scores = logits_soft_cap * jnp.tanh(scores / logits_soft_cap)
        c_idx = jnp.arange(C, dtype=jnp.int32)
        if alibi_slopes is not None:
            slopes = alibi_slopes.astype(jnp.float32).reshape(Hkv, G, 1)
            scores = scores + slopes * (
                c_idx[None, None, :] - (klen - 1)).astype(jnp.float32)
        mask = c_idx < klen
        if sliding_window is not None:
            mask &= c_idx >= (klen - sliding_window)
        scores = jnp.where(mask[None, None, :], scores, -jnp.inf)
        if sinks is not None:
            sink_col = sinks.astype(jnp.float32).reshape(Hkv, G, 1)
            full = jnp.concatenate([scores, sink_col], axis=-1)
            probs = jax.nn.softmax(full, axis=-1)[..., :-1]
        else:
            probs = jax.nn.softmax(scores, axis=-1)
        probs = jnp.where(valid, probs, 0.0)
        out = jnp.einsum("hgc,chd->hgd", probs, v.astype(jnp.float32))
        return out.reshape(Hq, D)

    out = jax.vmap(one_token)(q, req_idx, kv_len, valid_token)
    return out.astype(q.dtype)


def ragged_paged_attention(
    q: jax.Array,
    kv_cache: jax.Array,
    block_table: jax.Array,
    query_start_loc: jax.Array,
    seq_lens: jax.Array,
    scale: float,
    sliding_window: Optional[int] = None,
    logits_soft_cap: Optional[float] = None,
    sinks: Optional[jax.Array] = None,
    alibi_slopes: Optional[jax.Array] = None,
    prefix_lens: Optional[jax.Array] = None,
) -> jax.Array:
    """Dispatch to the Pallas kernel on TPU, else the jnp reference."""
    D = q.shape[-1]
    Dp = kv_cache.shape[-1]
    if D < Dp:
        # Lane-padded cache (config.kv_cache_dim): pad q to match; the
        # zero lanes add nothing to scores, and the padded value columns
        # are zero, so slicing the output back is exact.
        q = jnp.pad(q, [(0, 0), (0, 0), (0, Dp - D)])
    # The Pallas kernel DMAs [BS, Hkv, D] pages; Mosaic requires the
    # last dim to be 128-aligned. Off-spec head dims use the jnp path.
    use_ref = (envs.LVLLM_USE_REFERENCE_OPS
               or jax.default_backend() not in ("tpu", "axon")
               or q.shape[-1] % 128 != 0)
    out = _ragged_paged_attention_inner(
        q, kv_cache, block_table, query_start_loc, seq_lens, scale,
        sliding_window, logits_soft_cap, sinks, alibi_slopes, use_ref,
        prefix_lens)
    return out[..., :D] if D < Dp else out


def _ragged_paged_attention_inner(q, kv_cache, block_table,
                                  query_start_loc, seq_lens, scale,
                                  sliding_window, logits_soft_cap, sinks,
                                  alibi_slopes, use_ref, prefix_lens=None):
    if not use_ref:
        try:
            from lvllm_tpu.ops.pallas.ragged_attention import (
                ragged_paged_attention_pallas)
            token_klen = token_gpos = None
            if prefix_lens is not None:
                # Prefix-LM visible-key counts ride the kernel's explicit
                # klen mode (the DCP/partial-attention machinery): klen =
                # max(causal, min(prefix, ctx)), gpos = global position.
                T = q.shape[0]
                R = seq_lens.shape[0]
                req_idx = _token_request_map(query_start_loc, T, R)
                pos_in_q = (jnp.arange(T, dtype=jnp.int32)
                            - query_start_loc[req_idx])
                q_len = (query_start_loc[req_idx + 1]
                         - query_start_loc[req_idx])
                ctx = seq_lens[req_idx]
                gpos = ctx - q_len + pos_in_q
                token_klen = jnp.maximum(
                    gpos + 1, jnp.minimum(prefix_lens[req_idx], ctx))
                token_gpos = gpos
            return ragged_paged_attention_pallas(
                q, kv_cache, block_table, query_start_loc, seq_lens,
                scale=scale, sliding_window=sliding_window,
                logits_soft_cap=logits_soft_cap, sinks=sinks,
                alibi_slopes=alibi_slopes, token_klen=token_klen,
                token_gpos=token_gpos)
        except ImportError:
            pass
    return ragged_paged_attention_reference(
        q, kv_cache, block_table, query_start_loc, seq_lens, scale=scale,
        sliding_window=sliding_window, logits_soft_cap=logits_soft_cap,
        sinks=sinks, alibi_slopes=alibi_slopes, prefix_lens=prefix_lens)
