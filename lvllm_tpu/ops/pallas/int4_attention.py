"""Pallas TPU kernel: ragged paged attention over the INT4 KV cache.

Counterpart of the reference's 4-bit KV attention read (turboquant
backend, ``vllm/model_executor/layers/quantization/``): the flash loop
DMAs head-pair nibble-packed pages (``[Hp/2, BS, D]`` int8 — minor dims
(BS, D) satisfy Mosaic's int8 DMA tiling) plus
per-page 128-lane f32 scale rows, and dequantizes INSIDE the chunk loop:
arithmetic-shift nibble unpack gives head 2j (lo) and 2j+1 (hi), and the
per-row (token, head) scale vector is rebuilt with a one-hot page matmul
+ masked lane reduction — no gathers, no sub-128 lane slices
(r03 VERDICT next #2c; layout rationale in ops/kv_cache_int4.py).

Tile/grid structure mirrors ``ops/pallas/ragged_attention.py``; causal
GQA with optional logit soft cap (Int4KVSpec gates out windows, sinks
and ALiBi).
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lvllm_tpu.ops.pallas.ragged_attention import (device_tile_metadata,
                                                   num_tiles_upper_bound,
                                                   pick_tile_q)

SCALE_LANES = 128


def _int4_attn_kernel(
    # scalar prefetch
    tile_req_ref, tile_qpos_ref, seq_lens_ref, qsl_ref, block_table_ref,
    # inputs
    q_tile_ref,        # [1, TILE_Q, Hq, D] VMEM
    packed_hbm_ref,    # [2, NB, Hp/2, BS, D] int8 ANY
    scales_hbm_ref,    # [2, NB, 128] f32 ANY
    # outputs
    out_tile_ref,      # [1, TILE_Q, Hq, D] VMEM
    # scratch
    kp_buf, vp_buf,    # [2, Hp/2, CHUNK_K, D] int8 double buffers
    ks_buf, vs_buf,    # [2, CHUNK_PAGES, 128] f32 double buffers
    sems,              # DMA semaphores [4, 2, CHUNK_PAGES]
    *,
    scale: float,
    block_size: int,
    chunk_pages: int,
    logits_soft_cap: Optional[float],
    num_kv_heads: int,
    q_heads_per_kv: int,
    head_dim: int,
    tile_q: int,
):
    t = pl.program_id(0)
    r = tile_req_ref[t]

    @pl.when(r >= 0)
    def _run():
        chunk_k = chunk_pages * block_size
        G = q_heads_per_kv
        Hkv = num_kv_heads
        HP2 = (Hkv + 1) // 2
        D = head_dim
        ROWS = tile_q * G
        stride = SCALE_LANES // block_size

        seq_len = seq_lens_ref[r]
        q_len = qsl_ref[r + 1] - qsl_ref[r]
        qpos0 = tile_qpos_ref[t]
        num_chunks = pl.cdiv(seq_len, chunk_k)

        def start_chunk_dma(c, slot):
            base_page = c * chunk_pages
            for p in range(chunk_pages):
                page = block_table_ref[r, base_page + p]
                for kv, pbuf, sbuf in ((0, kp_buf, ks_buf),
                                       (1, vp_buf, vs_buf)):
                    pltpu.make_async_copy(
                        packed_hbm_ref.at[kv, page],
                        pbuf.at[slot, :,
                                pl.ds(p * block_size, block_size)],
                        sems.at[2 * kv, slot, p],
                    ).start()
                    pltpu.make_async_copy(
                        scales_hbm_ref.at[kv, page],
                        sbuf.at[slot, p],
                        sems.at[2 * kv + 1, slot, p],
                    ).start()

        def wait_chunk_dma(slot):
            for p in range(chunk_pages):
                for kv, pbuf, sbuf in ((0, kp_buf, ks_buf),
                                       (1, vp_buf, vs_buf)):
                    pltpu.make_async_copy(
                        packed_hbm_ref.at[kv, 0],
                        pbuf.at[slot, :,
                                pl.ds(p * block_size, block_size)],
                        sems.at[2 * kv, slot, p],
                    ).wait()
                    pltpu.make_async_copy(
                        scales_hbm_ref.at[kv, 0],
                        sbuf.at[slot, p],
                        sems.at[2 * kv + 1, slot, p],
                    ).wait()

        start_chunk_dma(0, 0)

        q = q_tile_ref[0].reshape(tile_q, Hkv, G, D)
        q = jnp.transpose(q, (1, 0, 2, 3)).reshape(Hkv, ROWS, D)
        q = q.astype(jnp.float32) * scale

        m0 = jnp.full((Hkv, ROWS, 1), -jnp.inf, jnp.float32)
        l0 = jnp.zeros((Hkv, ROWS, 1), jnp.float32)
        acc0 = jnp.zeros((Hkv, ROWS, D), jnp.float32)

        row_tok = jax.lax.broadcasted_iota(
            jnp.int32, (ROWS, chunk_k), 0) // G
        row_ctx = seq_len - q_len + qpos0 + row_tok + 1

        # Per-row scale selection machinery (static): rows of the chunk →
        # one-hot page matrix, and the per-head lane mask.
        page_of_row = jax.lax.broadcasted_iota(
            jnp.int32, (chunk_k, chunk_pages), 0) // block_size
        page_sel = (page_of_row == jax.lax.broadcasted_iota(
            jnp.int32, (chunk_k, chunk_pages), 1)).astype(jnp.float32)
        row_lane0 = (jax.lax.broadcasted_iota(
            jnp.int32, (chunk_k, SCALE_LANES), 0) % block_size) * stride
        lane_idx = jax.lax.broadcasted_iota(
            jnp.int32, (chunk_k, SCALE_LANES), 1)

        def row_scales(sbuf_slot, h):
            # [CHUNK_K, 128]: every row = its page's scale lanes.
            per_row = jnp.dot(page_sel, sbuf_slot,
                              preferred_element_type=jnp.float32)
            want = lane_idx == (row_lane0 + h)
            return jnp.sum(jnp.where(want, per_row, 0.0), axis=-1,
                           keepdims=True)                  # [CHUNK_K, 1]

        def body(c, carry):
            m, l, acc = carry
            slot = jax.lax.rem(c, 2)

            @pl.when(c + 1 < num_chunks)
            def _():
                start_chunk_dma(c + 1, jax.lax.rem(c + 1, 2))

            wait_chunk_dma(slot)

            col0 = c * chunk_k
            col_idx = col0 + jax.lax.broadcasted_iota(
                jnp.int32, (ROWS, chunk_k), 1)
            mask = col_idx < row_ctx

            # [Hp/2, CHUNK_K, D] nibble planes (plane = leading index).
            kp = kp_buf[slot].astype(jnp.int32)
            vp = vp_buf[slot].astype(jnp.int32)
            ks = ks_buf[slot]
            vs = vs_buf[slot]

            outs = []
            for h in range(Hkv):
                plane_k = kp[h // 2]
                plane_v = vp[h // 2]
                if h % 2 == 0:
                    ki = (plane_k << 28) >> 28
                    vi = (plane_v << 28) >> 28
                else:
                    ki = plane_k >> 4
                    vi = plane_v >> 4
                k_h = ki.astype(jnp.float32) * row_scales(ks, h)
                v_h = vi.astype(jnp.float32) * row_scales(vs, h)
                s = jax.lax.dot_general(
                    q[h], k_h,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                if logits_soft_cap is not None:
                    s = logits_soft_cap * jnp.tanh(s / logits_soft_cap)
                s = jnp.where(mask, s, -jnp.inf)
                m_h = jnp.maximum(m[h], jnp.max(s, axis=-1, keepdims=True))
                m_safe = jnp.where(jnp.isfinite(m_h), m_h, 0.0)
                p = jnp.exp(s - m_safe)
                p = jnp.where(mask, p, 0.0)
                alpha = jnp.where(jnp.isfinite(m[h]),
                                  jnp.exp(m[h] - m_safe), 0.0)
                l_h = alpha * l[h] + jnp.sum(p, axis=-1, keepdims=True)
                acc_h = alpha * acc[h] + jax.lax.dot_general(
                    p, v_h, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                outs.append((m_h, l_h, acc_h))
            return (jnp.stack([o[0] for o in outs]),
                    jnp.stack([o[1] for o in outs]),
                    jnp.stack([o[2] for o in outs]))

        m, l, acc = jax.lax.fori_loop(0, num_chunks, body, (m0, l0, acc0))

        out = acc / jnp.maximum(l, 1e-20)                  # [Hkv, ROWS, D]
        out = out.reshape(Hkv, tile_q, G, D)
        out = jnp.transpose(out, (1, 0, 2, 3)).reshape(tile_q, Hkv * G, D)
        out_tile_ref[0] = out.astype(out_tile_ref.dtype)

    @pl.when(r < 0)
    def _pad():
        out_tile_ref[0] = jnp.zeros((tile_q, num_kv_heads * q_heads_per_kv,
                                     head_dim), out_tile_ref.dtype)


def ragged_paged_attention_int4_pallas(
    q: jax.Array,                # [T, Hq, D]
    packed: jax.Array,           # [2, NB, Hp/2, BS, D] int8
    scales: jax.Array,           # [2, NB, 128] f32
    block_table: jax.Array,      # [R, MAXB]
    query_start_loc: jax.Array,  # [R+1]
    seq_lens: jax.Array,         # [R]
    *,
    scale: float,
    logits_soft_cap: Optional[float] = None,
    num_kv_heads: int,
) -> jax.Array:
    T, Hq, D = q.shape
    R = seq_lens.shape[0]
    _, NB, HP2, BS, _ = packed.shape
    Hkv = num_kv_heads
    G = Hq // Hkv
    tile_q = pick_tile_q(T)
    NT = num_tiles_upper_bound(T, R, tile_q)
    tile_req, tile_qpos, tile_token = device_tile_metadata(
        query_start_loc, T, R, tile_q)

    safe_idx = jnp.maximum(tile_token, 0)
    q_tiles = q[safe_idx.reshape(-1)].reshape(NT, tile_q, Hq, D)

    chunk_pages = max(1, 128 // BS)
    chunk_k = chunk_pages * BS
    maxb = block_table.shape[1]
    pad_b = (-maxb) % chunk_pages
    if pad_b:
        block_table = jnp.pad(block_table, ((0, 0), (0, pad_b)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(NT,),
        in_specs=[
            pl.BlockSpec((1, tile_q, Hq, D), lambda t, *_: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, tile_q, Hq, D),
                               lambda t, *_: (t, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, HP2, chunk_k, D), jnp.int8),
            pltpu.VMEM((2, HP2, chunk_k, D), jnp.int8),
            pltpu.VMEM((2, chunk_pages, SCALE_LANES), jnp.float32),
            pltpu.VMEM((2, chunk_pages, SCALE_LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((4, 2, chunk_pages)),
        ],
    )

    kernel = functools.partial(
        _int4_attn_kernel,
        scale=scale,
        block_size=BS,
        chunk_pages=chunk_pages,
        logits_soft_cap=logits_soft_cap,
        num_kv_heads=Hkv,
        q_heads_per_kv=G,
        head_dim=D,
        tile_q=tile_q,
    )

    out_tiles = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NT, tile_q, Hq, D), q.dtype),
    )(tile_req, tile_qpos, seq_lens, query_start_loc, block_table,
      q_tiles, packed, scales)

    flat_idx = tile_token.reshape(-1)
    flat_idx = jnp.where(flat_idx < 0, T, flat_idx)
    out = jnp.zeros_like(q)
    out = out.at[flat_idx].set(
        out_tiles.reshape(NT * tile_q, Hq, D), mode="drop")
    return out
