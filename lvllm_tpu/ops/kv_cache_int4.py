"""INT4 KV cache: 4-bit paged K/V with per-(token, head) scales.

Counterpart of the reference's 4-bit KV quantization (its own serving
config uses ``kv_cache_dtype: "turboquant_4bit_nc"``,
``/root/reference/config.yaml:22``; backend in
``vllm/model_executor/layers/quantization/``): halves fp8-KV's footprint
and quarters bf16's, trading a dequant in the attention read.

TPU-native layout: ONE int8 array per layer ``[2, NB, BS, H+1, D//2]`` —
per token, H rows of nibble-packed values (half-split: element d in the
low nibble pairs with d + D/2 in the high nibble, same convention as the
weight quantizer) plus one extra row holding the H per-head f16 scales
bitcast to int8 pairs. A single donated leaf keeps the jitted-step
donation story identical to the bf16/fp8 caches.

The attention read is the jnp path (the Pallas kernel's 128-lane page
DMA does not fit D/2 rows; kernel support is a perf TODO — this spec is
about CAPACITY: ~3.2x more KV tokens per chip than bf16 at H=4, D=128).
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from lvllm_tpu.ops.attention import _token_request_map


def new_kv_cache_int4(num_blocks: int, block_size: int, num_kv_heads: int,
                      head_dim: int) -> jax.Array:
    assert head_dim % 2 == 0
    assert 2 * num_kv_heads <= head_dim // 2, \
        "scale row must fit 2 bytes per head"
    return jnp.zeros((2, num_blocks, block_size, num_kv_heads + 1,
                      head_dim // 2), jnp.int8)


def _quantize(x: jax.Array):
    """[T, H, D] → (packed [T, H, D//2] int8, scales [T, H] f16)."""
    D = x.shape[-1]
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)                    # [T, H]
    scale = jnp.maximum(amax / 7.0, 1e-8).astype(jnp.float16)
    q = jnp.clip(jnp.round(xf / scale.astype(jnp.float32)[..., None]),
                 -8, 7).astype(jnp.int32)
    lo = q[..., :D // 2] & 0x0F
    hi = (q[..., D // 2:] & 0x0F) << 4
    return (lo | hi).astype(jnp.int8), scale


def _dequantize(packed: jax.Array, scales_f16: jax.Array) -> jax.Array:
    """[..., H, D//2] int8 + [..., H] f16 → [..., H, D] f32."""
    p = packed.astype(jnp.int32)
    lo = ((p & 0x0F) ^ 8) - 8
    hi = (((p >> 4) & 0x0F) ^ 8) - 8
    q = jnp.concatenate([lo, hi], axis=-1).astype(jnp.float32)
    return q * scales_f16.astype(jnp.float32)[..., None]


def write_kv_int4(kv_cache: jax.Array, key: jax.Array, value: jax.Array,
                  slot_mapping: jax.Array) -> jax.Array:
    """Quantize new K/V vectors and scatter them (values + scale row)
    into their paged slots."""
    _, NB, BS, H1, Dh = kv_cache.shape
    H = H1 - 1
    T = key.shape[0]

    def token_rows(x):
        packed, scale = _quantize(x)                         # [T, H, Dh]
        sb = jax.lax.bitcast_convert_type(
            scale, jnp.int8).reshape(T, 2 * H)               # [T, 2H]
        row = jnp.zeros((T, Dh), jnp.int8).at[:, :2 * H].set(sb)
        return jnp.concatenate([packed, row[:, None, :]], axis=1)

    kv_new = jnp.stack([token_rows(key), token_rows(value)])  # [2,T,H+1,Dh]
    flat = kv_cache.reshape(2, NB * BS, H1, Dh)
    flat = flat.at[:, slot_mapping].set(kv_new, mode="drop",
                                        unique_indices=False)
    return flat.reshape(kv_cache.shape)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "sliding_window", "logits_soft_cap"),
)
def ragged_paged_attention_int4(
    q: jax.Array,                # [T, Hq, D]
    kv_cache: jax.Array,         # [2, NB, BS, Hkv+1, D//2] int8
    block_table: jax.Array,      # [R, MAXB]
    query_start_loc: jax.Array,  # [R+1]
    seq_lens: jax.Array,         # [R]
    scale: float,
    sliding_window: Optional[int] = None,
    logits_soft_cap: Optional[float] = None,
) -> jax.Array:
    """Ragged paged attention over the int4 cache (GQA, causal) — the
    jnp reference attention with an in-gather dequant."""
    T, Hq, D = q.shape
    R, MAXB = block_table.shape
    BS = kv_cache.shape[2]
    Hkv = kv_cache.shape[3] - 1
    G = Hq // Hkv
    C = MAXB * BS

    req_idx = _token_request_map(query_start_loc, T, R)
    q_start = query_start_loc[req_idx]
    q_end = query_start_loc[req_idx + 1]
    pos_in_query = jnp.arange(T, dtype=jnp.int32) - q_start
    q_len = q_end - q_start
    ctx_len = seq_lens[req_idx]
    kv_len = ctx_len - q_len + pos_in_query + 1
    valid_token = (jnp.arange(T, dtype=jnp.int32) < query_start_loc[R]) & \
        (pos_in_query < q_len)

    def one_token(q_t, req, klen, valid):
        pages = kv_cache[:, block_table[req]]   # [2, MAXB, BS, H+1, D/2]
        data = pages[:, :, :, :Hkv].reshape(2, C, Hkv, D // 2)
        srow = pages[:, :, :, Hkv, :2 * Hkv].reshape(2, C, Hkv, 2)
        scales = jax.lax.bitcast_convert_type(srow, jnp.float16)  # [2,C,H]
        k = _dequantize(data[0], scales[0])               # [C, Hkv, D] f32
        v = _dequantize(data[1], scales[1])
        qg = q_t.reshape(Hkv, G, D).astype(jnp.float32)
        scores = jnp.einsum("hgd,chd->hgc", qg, k) * scale
        if logits_soft_cap is not None:
            scores = logits_soft_cap * jnp.tanh(scores / logits_soft_cap)
        c_idx = jnp.arange(C, dtype=jnp.int32)
        mask = c_idx < klen
        if sliding_window is not None:
            mask &= c_idx >= (klen - sliding_window)
        scores = jnp.where(mask[None, None, :], scores, -jnp.inf)
        probs = jax.nn.softmax(scores, axis=-1)
        probs = jnp.where(valid, probs, 0.0)
        out = jnp.einsum("hgc,chd->hgd", probs, v)
        return out.reshape(Hq, D)

    out = jax.vmap(one_token)(q, req_idx, kv_len, valid_token)
    return out.astype(q.dtype)
