"""MLA — multi-head latent attention (DeepSeek V2/V3 family).

TPU-native counterpart of the reference's MLA stack
(``layers/attention/mla_attention.py:323-2868``, ``csrc/attention/mla``,
flashmla): the KV cache stores only the compressed latent
``c_kv [kv_lora_rank]`` plus the shared rope key ``k_pe [rope_dim]`` per
token (the MLA memory win), and attention runs in the *absorbed* form
(matrix absorption, mla_attention.py decode path): queries are projected
into latent space through W_UK, scores are taken against the latent
directly, and the context is expanded through W_UV after the softmax —
mathematically identical to expanding per-head keys/values, at a fraction
of the bandwidth.

Cache layout reuses the paged structure: plane 0 of the standard
[2, NB, BS, 1, Dc+Dr] cache holds c_kv‖k_pe (plane 1 unused).
"""

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from lvllm_tpu.ops.attention import _token_request_map


@functools.partial(jax.jit, static_argnames=("scale", "kv_lora_rank"))
def mla_attention_reference(
    q_latent: jax.Array,         # [T, H, Dc] — q_nope absorbed via W_UK
    q_pe: jax.Array,             # [T, H, Dr] — rope part of the query
    kv_cache: jax.Array,         # [2, NB, BS, 1, Dc+Dr]; plane 0 used
    block_table: jax.Array,      # [R, MAXB]
    query_start_loc: jax.Array,  # [R+1]
    seq_lens: jax.Array,         # [R]
    scale: float,
    kv_lora_rank: int,
) -> jax.Array:
    """Absorbed MLA attention → latent context [T, H, Dc] (caller expands
    through W_UV)."""
    T, H, Dc = q_latent.shape
    R, MAXB = block_table.shape
    BS = kv_cache.shape[2]
    Dtot = kv_cache.shape[4]
    C = MAXB * BS

    req_idx = _token_request_map(query_start_loc, T, R)
    q_start = query_start_loc[req_idx]
    q_end = query_start_loc[req_idx + 1]
    pos_in_q = jnp.arange(T, dtype=jnp.int32) - q_start
    kv_len = seq_lens[req_idx] - (q_end - q_start) + pos_in_q + 1
    valid = (jnp.arange(T) < query_start_loc[R]) & (pos_in_q < q_end - q_start)

    def one_token(ql_t, qpe_t, req, klen, ok):
        pages = kv_cache[0, block_table[req]]        # [MAXB, BS, 1, Dtot]
        lat = pages.reshape(C, Dtot).astype(jnp.float32)
        Dr = q_pe.shape[-1] if False else qpe_t.shape[-1]
        c_kv = lat[:, :kv_lora_rank]                 # [C, Dc]
        k_pe = lat[:, kv_lora_rank:kv_lora_rank + Dr]  # [C, Dr]
        s = (jnp.einsum("hd,cd->hc", ql_t.astype(jnp.float32), c_kv) +
             jnp.einsum("hr,cr->hc", qpe_t.astype(jnp.float32), k_pe))
        s = s * scale
        mask = jnp.arange(C) < klen
        s = jnp.where(mask[None, :], s, -jnp.inf)
        p = jax.nn.softmax(s, axis=-1)
        p = jnp.where(ok, p, 0.0)
        return jnp.einsum("hc,cd->hd", p, c_kv)      # [H, Dc]

    out = jax.vmap(one_token)(q_latent, q_pe, req_idx, kv_len, valid)
    return out.astype(q_latent.dtype)


def write_mla_cache(kv_cache: jax.Array, c_kv: jax.Array, k_pe: jax.Array,
                    slot_mapping: jax.Array) -> jax.Array:
    """Scatter the latent into the paged cache.

    Plane 0 ("K") holds c_kv‖k_pe‖pad; plane 1 ("V") holds c_kv‖pad — the
    layout that lets the standard ragged attention kernel compute absorbed
    MLA directly: scores are dots over plane 0, the context is the
    probability-weighted sum of plane 1 (sliced back to kv_lora_rank).
    """
    nb, bs = kv_cache.shape[1], kv_cache.shape[2]
    d = kv_cache.shape[4]
    T = c_kv.shape[0]
    raw = c_kv.shape[1] + k_pe.shape[1]
    pad = d - raw
    k_plane = jnp.concatenate(
        [c_kv, k_pe] + ([jnp.zeros((T, pad), c_kv.dtype)] if pad else []),
        axis=-1)[:, None, :]
    v_plane = jnp.concatenate(
        [c_kv, jnp.zeros((T, d - c_kv.shape[1]), c_kv.dtype)],
        axis=-1)[:, None, :]
    flat = kv_cache.reshape(2, nb * bs, 1, d)
    flat = flat.at[0, slot_mapping].set(k_plane.astype(kv_cache.dtype),
                                        mode="drop")
    flat = flat.at[1, slot_mapping].set(v_plane.astype(kv_cache.dtype),
                                        mode="drop")
    return flat.reshape(kv_cache.shape)


def mla_attention(
    q_latent: jax.Array,         # [T, H, Dc]
    q_pe: jax.Array,             # [T, H, Dr]
    kv_cache: jax.Array,         # [2, NB, BS, 1, Dpad]
    block_table: jax.Array,
    query_start_loc: jax.Array,
    seq_lens: jax.Array,
    scale: float,
    kv_lora_rank: int,
) -> jax.Array:
    """Dispatch absorbed MLA: on TPU, ride the standard Pallas ragged
    attention kernel with q = q_lat‖q_pe‖0 (pad columns dot against zero
    keys, contributing nothing); elsewhere use the jnp reference."""
    from lvllm_tpu import envs

    Dpad = kv_cache.shape[4]
    use_ref = (envs.LVLLM_USE_REFERENCE_OPS
               or jax.default_backend() not in ("tpu", "axon")
               or Dpad % 128 != 0)
    if not use_ref:
        from lvllm_tpu.ops.pallas.ragged_attention import (
            ragged_paged_attention_pallas)
        T, H, Dc = q_latent.shape
        pad = Dpad - Dc - q_pe.shape[-1]
        parts = [q_latent, q_pe]
        if pad:
            parts.append(jnp.zeros((T, H, pad), q_latent.dtype))
        q_cat = jnp.concatenate(parts, axis=-1)
        out = ragged_paged_attention_pallas(
            q_cat, kv_cache, block_table, query_start_loc, seq_lens,
            scale=scale)
        return out[..., :kv_lora_rank]
    return mla_attention_reference(
        q_latent, q_pe, kv_cache, block_table, query_start_loc, seq_lens,
        scale=scale, kv_lora_rank=kv_lora_rank)
