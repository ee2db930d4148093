"""INT4 KV cache: 4-bit paged K/V with per-(token, head) scales.

Counterpart of the reference's 4-bit KV quantization (its own serving
config uses ``kv_cache_dtype: "turboquant_4bit_nc"``,
``/root/reference/config.yaml:22``; backend in
``vllm/model_executor/layers/quantization/``): halves fp8-KV's footprint
and quarters bf16's, trading a dequant in the attention read.

TPU-native layout — a dict of two leaves per layer, shaped so every
page DMA in the Pallas read kernel has a 128-multiple minor dimension
(Mosaic requires it):

- ``packed`` [2, NB, Hp/2, BS, D] int8 — HEAD-PAIR nibble packing: byte
  (j, t, d) holds head 2j's element d in the low nibble and head 2j+1's
  in the high nibble (Hp = H rounded up to even; the pad head is zeros).
  The minor two dims are (BS, D) — both aligned for int8 page DMAs —
  and each nibble plane j is a static leading index in the kernel.
- ``scales`` [2, NB, 128] f32 — one 128-lane row per page: the scale of
  (token t, head h) lives at lane t * (128 // BS) + h. In-kernel the
  per-row scale vector is rebuilt with a one-hot page matmul + masked
  lane reduction (no gathers, no unaligned slices).

The attention read runs as a Pallas flash kernel on TPU
(``ops/pallas/int4_attention.py``) that dequantizes nibbles inside the
page DMA loop; the jnp path here is the oracle. Capacity: ~3.4x more KV
tokens per chip than bf16 at H=4, D=128.
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from lvllm_tpu.ops.attention import _token_request_map

SCALE_LANES = 128


def new_kv_cache_int4(num_blocks: int, block_size: int, num_kv_heads: int,
                      head_dim: int):
    Hp = num_kv_heads + (num_kv_heads % 2)
    assert SCALE_LANES % block_size == 0
    assert Hp <= SCALE_LANES // block_size, \
        "int4 KV: per-page scale row must fit num_kv_heads per token"
    return {
        "packed": jnp.zeros((2, num_blocks, Hp // 2, block_size, head_dim),
                            jnp.int8),
        "scales": jnp.zeros((2, num_blocks, SCALE_LANES), jnp.float32),
    }


def _quantize(x: jax.Array):
    """[T, H, D] → (int values [T, H, D] i32 in [-8, 7], scales [T, H])."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)                    # [T, H]
    scale = jnp.maximum(amax / 7.0, 1e-8)
    q = jnp.clip(jnp.round(xf / scale[..., None]), -8, 7).astype(jnp.int32)
    return q, scale


def _pack_pairs(q: jax.Array, H: int) -> jax.Array:
    """[T, H, D] i32 → [T, Hp/2, D] int8 (head 2j lo nibble, 2j+1 hi)."""
    T, _, D = q.shape
    if H % 2:
        q = jnp.concatenate(
            [q, jnp.zeros((T, 1, D), jnp.int32)], axis=1)
    lo = q[:, 0::2, :] & 0x0F
    hi = (q[:, 1::2, :] & 0x0F) << 4
    return (lo | hi).astype(jnp.int8)


def _unpack_pairs(packed: jax.Array, H: int) -> jax.Array:
    """[..., Hp/2, D] int8 → [..., H, D] i32 (inverse of _pack_pairs)."""
    p = packed.astype(jnp.int32)
    lo = ((p & 0x0F) ^ 8) - 8                 # [..., Hp/2, D]
    hi = (((p >> 4) & 0x0F) ^ 8) - 8
    q = jnp.stack([lo, hi], axis=-2)          # [..., Hp/2, 2, D]
    q = q.reshape(*p.shape[:-2], p.shape[-2] * 2, p.shape[-1])
    return q[..., :H, :]


def write_kv_int4(kv_cache, key: jax.Array, value: jax.Array,
                  slot_mapping: jax.Array):
    """Quantize new K/V vectors and scatter values + scales into their
    paged slots."""
    packed, scales = kv_cache["packed"], kv_cache["scales"]
    _, NB, HP2, BS, D = packed.shape
    T, H, _ = key.shape
    stride = SCALE_LANES // BS

    qk, sk = _quantize(key)
    qv, sv = _quantize(value)
    # [T, 2, Hp/2, D] — advanced indices (page, tok) put T first.
    p_new = jnp.stack([_pack_pairs(qk, H), _pack_pairs(qv, H)], axis=1)
    page = slot_mapping // BS
    tok = slot_mapping % BS
    pf = packed.at[:, page, :, tok, :].set(
        jnp.moveaxis(p_new, 0, 0), mode="drop", unique_indices=False)

    lane0 = tok * stride
    lanes = lane0[:, None] + jnp.arange(H, dtype=jnp.int32)[None, :]
    flat_idx = (page[:, None] * SCALE_LANES + lanes).reshape(-1)
    s_new = jnp.stack([sk, sv]).reshape(2, T * H)
    sf = scales.reshape(2, NB * SCALE_LANES).at[:, flat_idx].set(
        s_new, mode="drop", unique_indices=False)
    return {"packed": pf, "scales": sf.reshape(scales.shape)}


def _page_scales(scales_pages: jax.Array, BS: int, H: int) -> jax.Array:
    """[..., NPAGES, 128] → [..., NPAGES * BS, H] per-(token, head)."""
    stride = SCALE_LANES // BS
    lead = scales_pages.shape[:-2]
    npages = scales_pages.shape[-2]
    s = scales_pages.reshape(*lead, npages, BS, stride)
    return s[..., :H].reshape(*lead, npages * BS, H)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "sliding_window", "logits_soft_cap",
                     "use_pallas"),
)
def ragged_paged_attention_int4(
    q: jax.Array,                # [T, Hq, D]
    kv_cache,                    # {"packed", "scales"} (see module doc)
    block_table: jax.Array,      # [R, MAXB]
    query_start_loc: jax.Array,  # [R+1]
    seq_lens: jax.Array,         # [R]
    scale: float,
    sliding_window: Optional[int] = None,
    logits_soft_cap: Optional[float] = None,
    use_pallas: Optional[bool] = None,
) -> jax.Array:
    """Ragged paged attention over the int4 cache (GQA, causal) — Pallas
    flash kernel with in-DMA-loop dequant on TPU, jnp oracle elsewhere."""
    T, Hq, D = q.shape
    R, MAXB = block_table.shape
    packed, scales_arr = kv_cache["packed"], kv_cache["scales"]
    _, NB, HP2, BS, _ = packed.shape
    # Derive Hkv from the packed planes (Hp = 2*HP2, possibly one pad
    # head); Hq % Hkv == 0 disambiguates Hp vs Hp-1.
    Hp = HP2 * 2
    Hkv = Hp if Hq % Hp == 0 else Hp - 1
    G = Hq // Hkv
    C = MAXB * BS

    if use_pallas is None:
        from lvllm_tpu import envs
        use_pallas = (not envs.LVLLM_USE_REFERENCE_OPS
                      and jax.default_backend() in ("tpu", "axon")
                      and D % 128 == 0 and sliding_window is None)
    if use_pallas:
        from lvllm_tpu.ops.pallas.int4_attention import \
            ragged_paged_attention_int4_pallas
        return ragged_paged_attention_int4_pallas(
            q, packed, scales_arr, block_table, query_start_loc,
            seq_lens, scale=scale, logits_soft_cap=logits_soft_cap,
            num_kv_heads=Hkv)

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
        pages = packed[:, block_table[req]]       # [2, MAXB, Hp/2, BS, D]
        pages = jnp.transpose(pages, (0, 1, 3, 2, 4))
        ints = _unpack_pairs(pages, Hkv)
        ints = ints.reshape(2, C, Hkv, D)                # [2, C, H, D] i32
        ss = _page_scales(scales_arr[:, block_table[req]], BS, Hkv)
        kf = ints[0].astype(jnp.float32) * ss[0][..., None]
        vf = ints[1].astype(jnp.float32) * ss[1][..., None]
        qg = q_t.reshape(Hkv, G, D).astype(jnp.float32)
        scores = jnp.einsum("hgd,chd->hgc", qg, kf) * scale
        if logits_soft_cap is not None:
            scores = logits_soft_cap * jnp.tanh(scores / logits_soft_cap)
        c_idx = jnp.arange(C, dtype=jnp.int32)
        mask = c_idx < klen
        if sliding_window is not None:
            mask &= c_idx >= (klen - sliding_window)
        scores = jnp.where(mask[None, None, :], scores, -jnp.inf)
        probs = jax.nn.softmax(scores, axis=-1)
        probs = jnp.where(valid, probs, 0.0)
        out = jnp.einsum("hgc,chd->hgd", probs, vf)
        return out.reshape(Hq, D)

    out = jax.vmap(one_token)(q, req_idx, kv_len, valid_token)
    return out.astype(q.dtype)


def quantize_roundtrip(x: jax.Array) -> jax.Array:
    """[T, H, D] → the values the cache would reproduce (test oracle)."""
    H = x.shape[1]
    q, s = _quantize(x)
    ints = _unpack_pairs(_pack_pairs(q, H), H)
    return ints.astype(jnp.float32) * s[..., None]
