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
        c_kv = lat[:, :kv_lora_rank]                 # [C, Dc]
        k_pe = lat[:, kv_lora_rank:]                 # [C, Dr]
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
    """Scatter latent+rope into plane 0 of the paged cache."""
    nb, bs = kv_cache.shape[1], kv_cache.shape[2]
    d = kv_cache.shape[4]
    lat = jnp.concatenate([c_kv, k_pe], axis=-1)[:, None, :]  # [T, 1, D]
    flat = kv_cache.reshape(2, nb * bs, 1, d)
    flat = flat.at[0, slot_mapping].set(lat.astype(kv_cache.dtype),
                                        mode="drop")
    return flat.reshape(kv_cache.shape)
