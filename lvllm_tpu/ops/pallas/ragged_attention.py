"""Pallas ragged paged attention (TPU).

The production attention path — TPU-native counterpart of the reference's
paged-attention CUDA kernels (``csrc/attention/paged_attention_v1/v2``) and
FlashAttention varlen backend (``v1/attention/backends/flash_attn.py``):
one kernel serves mixed prefill+decode ragged batches against a paged KV
cache, with causal masking, GQA, sliding window and optional logit soft cap.

Design (see SURVEY.md §7 hard-parts):
- The host (or a cheap device gather) packs queries into fixed
  ``[NT, TILE_Q, Hq, D]`` tiles; per-tile scalar metadata (request id, tile
  offset inside the request) is scalar-prefetched into SMEM.
- Grid = (NT,). Each program flash-iterates that request's KV pages,
  DMA-ing ``CHUNK_PAGES`` pages at a time HBM→VMEM with double buffering
  (jax.experimental.pallas async copies), accumulating softmax in f32.
- KV stays in its paged HBM layout — no reshape/copy of the cache.

Numerics match ``ragged_paged_attention_reference`` to bf16/f32 tolerance
(tested in tests/ops/test_pallas_attention.py).
"""

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_Q = 8  # decode-regime query tokens per tile (rows = TILE_Q * G)


def pick_tile_q(num_tokens: int) -> int:
    """Adaptive query tile: decode-ish batches keep small tiles (one live
    token per request-tile anyway); prefill batches take 32-token tiles so
    the per-tile grid overhead amortizes and ROWS=tile_q*G fills the MXU
    (profiled: TILE_Q=8 made attention ~35% of the 2048-token prefill
    step; 32/64 cut it ~3-4x)."""
    if num_tokens <= 64:
        return 8
    return 32 if num_tokens <= 1024 else 64


def build_tile_metadata(
    query_start_loc: np.ndarray,  # [R+1] host int32
    num_tiles: int,
    tile_q: int = TILE_Q,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host-side tile map: walk requests, emit one entry per tile_q-chunk of
    each request's query segment.

    Returns (tile_req [NT], tile_qpos [NT] — offset of the tile inside the
    request's segment, tile_token [NT, tile_q] — flat q indices, -1 = pad).
    """
    R = len(query_start_loc) - 1
    tile_req = np.full(num_tiles, -1, dtype=np.int32)
    tile_qpos = np.zeros(num_tiles, dtype=np.int32)
    tile_token = np.full((num_tiles, tile_q), -1, dtype=np.int32)
    t = 0
    for r in range(R):
        start, end = query_start_loc[r], query_start_loc[r + 1]
        q_len = end - start
        for off in range(0, q_len, tile_q):
            if t >= num_tiles:
                raise ValueError("tile metadata overflow")
            tile_req[t] = r
            tile_qpos[t] = off
            n = min(tile_q, q_len - off)
            tile_token[t, :n] = np.arange(start + off, start + off + n)
            t += 1
    return tile_req, tile_qpos, tile_token


def num_tiles_upper_bound(max_tokens: int, max_reqs: int,
                          tile_q: int = TILE_Q) -> int:
    """Static NT: every request wastes at most one partial tile."""
    return -(-max_tokens // tile_q) + max_reqs


def _attn_kernel(
    # scalar prefetch
    tile_req_ref,      # [NT] i32
    tile_qpos_ref,     # [NT] i32
    seq_lens_ref,      # [R] i32
    qsl_ref,           # [R+1] i32
    block_table_ref,   # [R, MAXB] i32
    # inputs
    q_tile_ref,        # [TILE_Q, Hq, D] VMEM (auto-sliced per tile)
    kv_hbm_ref,        # [2, NB, BS, Hkv, D] ANY/HBM
    # outputs
    out_tile_ref,      # [TILE_Q, Hq, D] VMEM
    # scratch
    k_buf, v_buf,      # [2, CHUNK_K, Hkv, D] VMEM double buffers
    sems,              # DMA semaphores [2, 2, CHUNK_PAGES]
    *,
    scale: float,
    block_size: int,
    chunk_pages: int,
    sliding_window: Optional[int],
    logits_soft_cap: Optional[float],
    num_kv_heads: int,
    q_heads_per_kv: int,
    head_dim: int,
    tile_q: int,
    sink_ref=None,     # [Hkv, ROWS] f32 VMEM (gpt-oss attention sinks)
    alibi_ref=None,    # [Hkv, ROWS] f32 VMEM (ALiBi per-row slopes)
    # DCP / partial-attention extensions (ops/context_parallel.py):
    klen_ref=None,     # [NT*tile_q] i32 SMEM — per-token visible key count
    gpos_ref=None,     # [NT*tile_q] i32 SMEM — per-token GLOBAL position
    shard_ref=None,    # [1] i32 scalar prefetch — this context shard
    cp_shards: int = 1,
    lse_tile_ref=None,  # [1, tile_q, Hq] f32 VMEM output (log-sum-exp)
):
    t = pl.program_id(0)
    r = tile_req_ref[t]

    @pl.when(r >= 0)
    def _run():
        chunk_k = chunk_pages * block_size
        G = q_heads_per_kv
        Hkv = num_kv_heads
        D = head_dim
        ROWS = tile_q * G

        seq_len = seq_lens_ref[r]
        q_len = qsl_ref[r + 1] - qsl_ref[r]
        qpos0 = tile_qpos_ref[t]

        num_chunks = pl.cdiv(seq_len, chunk_k)

        def start_chunk_dma(c, slot):
            base_page = c * chunk_pages
            for p in range(chunk_pages):
                page = block_table_ref[r, base_page + p]
                pltpu.make_async_copy(
                    kv_hbm_ref.at[0, page],
                    k_buf.at[slot, pl.ds(p * block_size, block_size)],
                    sems.at[0, slot, p],
                ).start()
                pltpu.make_async_copy(
                    kv_hbm_ref.at[1, page],
                    v_buf.at[slot, pl.ds(p * block_size, block_size)],
                    sems.at[1, slot, p],
                ).start()

        def wait_chunk_dma(slot):
            for p in range(chunk_pages):
                pltpu.make_async_copy(
                    kv_hbm_ref.at[0, 0],
                    k_buf.at[slot, pl.ds(p * block_size, block_size)],
                    sems.at[0, slot, p],
                ).wait()
                pltpu.make_async_copy(
                    kv_hbm_ref.at[1, 0],
                    v_buf.at[slot, pl.ds(p * block_size, block_size)],
                    sems.at[1, slot, p],
                ).wait()
        # Note: for Hkv==1 the wrapper folds the head dim out of the cache
        # ([2, NB, BS, D] pages; [BS, 1, D] would violate the bf16
        # second-minor tiling of 2), so these copies are [BS, D] slabs and
        # load_slot re-inserts the unit head axis.

        # Sliding window: skip chunks entirely before the earliest row's
        # window start (row 0 has the smallest context) — for short windows
        # against long contexts this collapses the loop to O(window) work.
        # (Skipped in klen mode: local column order is shard-interleaved.)
        if sliding_window is not None and klen_ref is None:
            first_col = seq_len - q_len + qpos0 + 1 - sliding_window
            c_start = jnp.maximum(first_col // chunk_k, 0)
        else:
            c_start = jnp.int32(0)

        start_chunk_dma(c_start, jax.lax.rem(c_start, 2))

        # Per-kv-head flash state, carried through the chunk loop.
        # q laid out [Hkv, ROWS(=TILE_Q*G), D] so each head is one matmul.
        q = q_tile_ref[0].reshape(tile_q, Hkv, G, D)
        q = jnp.transpose(q, (1, 0, 2, 3)).reshape(Hkv, ROWS, D)
        q = q.astype(jnp.float32) * scale

        if sink_ref is not None:
            # Attention sink = a pre-existing logit per row: start the
            # flash recursion at m=sink, l=exp(sink-sink)=1, acc=0 — the
            # sink then contributes exp(sink-m_final) to the denominator
            # and nothing to the numerator (HF eager_attention_forward).
            m0 = sink_ref[:].reshape(Hkv, ROWS, 1).astype(jnp.float32)
            l0 = jnp.ones((Hkv, ROWS, 1), jnp.float32)
        else:
            m0 = jnp.full((Hkv, ROWS, 1), -jnp.inf, jnp.float32)
            l0 = jnp.zeros((Hkv, ROWS, 1), jnp.float32)
        acc0 = jnp.zeros((Hkv, ROWS, D), jnp.float32)

        # Row-wise causal limit: row = tok*G + g → token index = row // G.
        # Built from iota arithmetic only (repeat/gather don't lower in
        # Mosaic kernels).
        row_tok = jax.lax.broadcasted_iota(
            jnp.int32, (ROWS, chunk_k), 0) // G
        if klen_ref is None:
            row_ctx = seq_len - q_len + qpos0 + row_tok + 1  # [ROWS, CK]
            row_gpos = row_ctx - 1     # query position in its own order
        else:
            # Explicit per-token visible-key counts (DCP interleave /
            # partial attention / prefix-LM): flat [NT*tile_q] SMEM
            # scalars expanded per row by iota select — a VMEM vector
            # would need a lane→sublane relayout Mosaic can't lower.
            def rows_of(ref):
                acc = jnp.zeros((ROWS, chunk_k), jnp.int32)
                for i in range(tile_q):
                    acc = jnp.where(row_tok == i, ref[t * tile_q + i],
                                    acc)
                return acc
            row_ctx = rows_of(klen_ref)
            row_gpos = rows_of(gpos_ref)

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
            if cp_shards > 1:
                # Global position of local column c under page interleave:
                # logical page (c // BS) lives at global page
                # (c // BS) * CP + shard.
                sh = shard_ref[0]
                col_global = (((col_idx // block_size) * cp_shards + sh)
                              * block_size + col_idx % block_size)
            else:
                col_global = col_idx
            if sliding_window is not None:
                if klen_ref is None:
                    mask &= col_idx >= (row_ctx - sliding_window)
                else:
                    mask &= col_global >= (row_gpos + 1 - sliding_window)

            def load_slot(buf):
                x = buf[slot]
                if Hkv == 1:
                    return x[None]               # [CHUNK_K, D] -> [1, CK, D]
                # [CHUNK_K, Hkv, D] -> [Hkv, CHUNK_K, D]
                return jnp.transpose(x, (1, 0, 2))

            k = load_slot(k_buf).astype(jnp.float32)
            v = load_slot(v_buf).astype(jnp.float32)

            new_m, new_l, new_acc = m, l, acc
            outs_m, outs_l, outs_acc = [], [], []
            for h in range(Hkv):
                s = jax.lax.dot_general(
                    q[h], k[h],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)  # [ROWS, CHUNK_K]
                if logits_soft_cap is not None:
                    s = logits_soft_cap * jnp.tanh(s / logits_soft_cap)
                if alibi_ref is not None:
                    # slope * (key_pos - query_pos).
                    slope = alibi_ref[h].reshape(ROWS, 1)
                    s = s + slope * (col_global - row_gpos).astype(
                        jnp.float32)
                s = jnp.where(mask, s, -jnp.inf)
                m_h = jnp.maximum(m[h], jnp.max(s, axis=-1, keepdims=True))
                # Guard fully-masked rows (m == -inf): exp(-inf - -inf)=nan.
                m_safe = jnp.where(jnp.isfinite(m_h), m_h, 0.0)
                p = jnp.exp(s - m_safe)
                p = jnp.where(mask, p, 0.0)
                alpha = jnp.where(jnp.isfinite(m[h]),
                                  jnp.exp(m[h] - m_safe), 0.0)
                l_h = alpha * l[h] + jnp.sum(p, axis=-1, keepdims=True)
                acc_h = alpha * acc[h] + jax.lax.dot_general(
                    p, v[h],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                outs_m.append(m_h)
                outs_l.append(l_h)
                outs_acc.append(acc_h)
            new_m = jnp.stack(outs_m)
            new_l = jnp.stack(outs_l)
            new_acc = jnp.stack(outs_acc)
            return new_m, new_l, new_acc

        m, l, acc = jax.lax.fori_loop(c_start, num_chunks, body,
                                      (m0, l0, acc0))

        out = acc / jnp.maximum(l, 1e-20)                      # [Hkv,ROWS,D]
        out = out.reshape(Hkv, tile_q, G, D)
        out = jnp.transpose(out, (1, 0, 2, 3)).reshape(tile_q, Hkv * G, D)
        out_tile_ref[0] = out.astype(out_tile_ref.dtype)
        if lse_tile_ref is not None:
            # Emitted in the kernel's native [Hkv, ROWS] layout (the
            # lane-collapsing (tile_q, Hkv, G)→(tile_q, Hq) reshape does
            # not lower in Mosaic); the wrapper rearranges outside.
            lse = jnp.where(l > 0.0,
                            jnp.where(jnp.isfinite(m), m, 0.0)
                            + jnp.log(jnp.maximum(l, 1e-30)),
                            -jnp.inf)                         # [Hkv,ROWS,1]
            lse_tile_ref[0] = lse.reshape(Hkv, ROWS)

    @pl.when(r < 0)
    def _pad():
        out_tile_ref[0] = jnp.zeros((tile_q, num_kv_heads * q_heads_per_kv,
                                     head_dim), out_tile_ref.dtype)
        if lse_tile_ref is not None:
            lse_tile_ref[0] = jnp.full(
                (num_kv_heads, tile_q * q_heads_per_kv), -jnp.inf,
                jnp.float32)


def ragged_paged_attention_pallas(
    q: jax.Array,                # [T, Hq, D]
    kv_cache: jax.Array,         # [2, NB, BS, Hkv, D]
    block_table: jax.Array,      # [R, MAXB]
    query_start_loc: jax.Array,  # [R+1]
    seq_lens: jax.Array,         # [R]
    *,
    scale: float,
    sliding_window: Optional[int] = None,
    logits_soft_cap: Optional[float] = None,
    sinks: Optional[jax.Array] = None,       # [Hq] per-head sink logits
    alibi_slopes: Optional[jax.Array] = None,  # [Hq] per-head ALiBi slopes
    tile_req: Optional[jax.Array] = None,   # [NT] host-built (else device)
    tile_qpos: Optional[jax.Array] = None,
    tile_token: Optional[jax.Array] = None,  # [NT, tile_q]
    tile_q: Optional[int] = None,
    want_lse: bool = False,
    token_klen: Optional[jax.Array] = None,  # [T] visible key count
    token_gpos: Optional[jax.Array] = None,  # [T] global query position
    cp_shards: int = 1,
    shard_idx: Optional[jax.Array] = None,   # scalar i32 context shard
) -> jax.Array:
    T, Hq, D = q.shape
    R = seq_lens.shape[0]
    BS = kv_cache.shape[2]
    Hkv = kv_cache.shape[3]
    G = Hq // Hkv
    if tile_q is None:
        tile_q = tile_token.shape[1] if tile_token is not None \
            else pick_tile_q(T)
    NT = num_tiles_upper_bound(T, R, tile_q)

    if tile_req is None:
        tile_req, tile_qpos, tile_token = device_tile_metadata(
            query_start_loc, T, R, tile_q)

    # Gather queries into aligned tiles (pad rows read q[0], masked later by
    # scatter). [NT, tile_q, Hq, D]
    safe_idx = jnp.maximum(tile_token, 0)
    q_tiles = q[safe_idx.reshape(-1)].reshape(NT, tile_q, Hq, D)

    chunk_pages = max(1, 128 // BS)
    chunk_k = chunk_pages * BS
    if Hkv == 1:
        # Fold the unit head dim out (free reshape): whole-page DMA slices
        # of [BS, 1, D] break Mosaic's bf16 second-minor tiling of 2.
        kv_cache = kv_cache.reshape(2, kv_cache.shape[1], BS, D)
        scratch_kv = (2, chunk_k, D)
    else:
        scratch_kv = (2, chunk_k, Hkv, D)
    maxb = block_table.shape[1]
    # Pad block table so chunk DMA never reads out of bounds.
    pad_b = (-maxb) % chunk_pages
    if pad_b:
        block_table = jnp.pad(block_table, ((0, 0), (0, pad_b)))

    in_specs = [
        pl.BlockSpec((1, tile_q, Hq, D), lambda t, *_: (t, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    inputs = [q_tiles, kv_cache]

    use_klen = token_klen is not None
    if use_klen:
        # Per-token visible-key counts and global positions, gathered into
        # the tile layout (pad rows → klen 0: fully masked).
        # Flat [NT*tile_q] SCALAR-PREFETCH arrays (SMEM): a VMEM (1, tile_q)
        # block would need a lane→sublane relayout inside the kernel
        # ('unsupported shape cast' in Mosaic) and only lowered at NT == 1;
        # scalar reads + iota selects build the per-row values natively.
        klen_flat = jnp.where(
            tile_token >= 0, token_klen[safe_idx.reshape(-1)].reshape(
                NT, tile_q), 0).astype(jnp.int32).reshape(-1)
        gpos_flat = token_gpos[safe_idx.reshape(-1)].astype(
            jnp.int32).reshape(-1)

    def per_row(vals):
        # Per-row values in the kernel's [Hkv, ROWS] layout
        # (row = tok*G + g → q-head h*G + g).
        ROWS = tile_q * G
        return jnp.tile(vals.astype(jnp.float32).reshape(Hkv, 1, G),
                        (1, tile_q, 1)).reshape(Hkv, ROWS)

    n_extra = 0
    for vals in (sinks, alibi_slopes):
        if vals is not None:
            in_specs.append(pl.BlockSpec(
                (Hkv, tile_q * G), lambda t, *_: (0, 0),
                memory_space=pltpu.VMEM))
            inputs.append(per_row(vals))
            n_extra += 1

    out_specs = pl.BlockSpec((1, tile_q, Hq, D),
                             lambda t, *_: (t, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((NT, tile_q, Hq, D), q.dtype)
    if want_lse:
        out_specs = [out_specs,
                     pl.BlockSpec((1, Hkv, tile_q * G),
                                  lambda t, *_: (t, 0, 0),
                                  memory_space=pltpu.VMEM)]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((NT, Hkv, tile_q * G),
                                          jnp.float32)]

    n_scalar = 6 + (2 if use_klen else 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=n_scalar,
        grid=(NT,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM(scratch_kv, kv_cache.dtype),
            pltpu.VMEM(scratch_kv, kv_cache.dtype),
            pltpu.SemaphoreType.DMA((2, 2, chunk_pages)),
        ],
    )

    base = functools.partial(
        _attn_kernel,
        scale=scale,
        block_size=BS,
        chunk_pages=chunk_pages,
        sliding_window=sliding_window,
        logits_soft_cap=logits_soft_cap,
        num_kv_heads=Hkv,
        q_heads_per_kv=G,
        head_dim=D,
        tile_q=tile_q,
        cp_shards=cp_shards,
    )
    has_sinks = sinks is not None
    has_alibi = alibi_slopes is not None
    n_klen = 2 if use_klen else 0
    n_out = 2 if want_lse else 1

    def kernel(*args):
        scalars, rest = args[:n_scalar], args[n_scalar:]
        shard = scalars[5]
        q_t, kv = rest[0], rest[1]
        j = 2
        kw = {"shard_ref": shard}
        if use_klen:
            kw["klen_ref"] = scalars[6]
            kw["gpos_ref"] = scalars[7]
        if has_sinks:
            kw["sink_ref"] = rest[j]
            j += 1
        if has_alibi:
            kw["alibi_ref"] = rest[j]
            j += 1
        out = rest[j]
        j += 1
        if want_lse:
            kw["lse_tile_ref"] = rest[j]
            j += 1
        kb, vb, sm = rest[j:]
        base(*scalars[:5], q_t, kv, out, kb, vb, sm, **kw)

    shard_arr = (jnp.asarray(shard_idx, jnp.int32).reshape(1)
                 if shard_idx is not None else jnp.zeros(1, jnp.int32))
    scalar_args = [tile_req, tile_qpos, seq_lens, query_start_loc,
                   block_table, shard_arr]
    if use_klen:
        scalar_args.extend([klen_flat, gpos_flat])
    result = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
    )(*scalar_args, *inputs)

    # Scatter tiles back to flat [T, Hq, D]. Pad rows are marked -1, which
    # would WRAP to T-1 under jax negative indexing — remap them to T so
    # mode="drop" discards them.
    flat_idx = tile_token.reshape(-1)
    flat_idx = jnp.where(flat_idx < 0, T, flat_idx)
    out_tiles = result[0] if want_lse else result
    out = jnp.zeros_like(q)
    out = out.at[flat_idx].set(
        out_tiles.reshape(NT * tile_q, Hq, D), mode="drop")
    if not want_lse:
        return out
    lse_tiles = result[1].reshape(NT, Hkv, tile_q, G)
    lse_tiles = jnp.transpose(lse_tiles, (0, 2, 1, 3))     # [NT,tq,Hkv,G]
    lse = jnp.full((T, Hq), -jnp.inf, jnp.float32)
    lse = lse.at[flat_idx].set(
        lse_tiles.reshape(NT * tile_q, Hq), mode="drop")
    return out, lse


def device_tile_metadata(query_start_loc: jax.Array, T: int, R: int,
                         tile_q: int = TILE_Q):
    """Device-side tile map (jnp; jit-friendly) — used when the host didn't
    precompute one. One tile per (request, tile_q-chunk).

    Tiles are laid out at offset cdiv-prefix positions; computed with static
    shapes: NT = cdiv(T, tile_q) + R.
    """
    NT = num_tiles_upper_bound(T, R, tile_q)
    q_lens = query_start_loc[1:] - query_start_loc[:-1]          # [R]
    ntiles = -(-q_lens // tile_q)                                # cdiv
    tile_start_of_req = jnp.cumsum(ntiles) - ntiles              # [R]

    tile_idx = jnp.arange(NT, dtype=jnp.int32)
    # req of tile: last r with tile_start_of_req[r] <= t < start+ntiles
    req_of_tile = jnp.searchsorted(tile_start_of_req, tile_idx,
                                   side="right").astype(jnp.int32) - 1
    req_of_tile = jnp.clip(req_of_tile, 0, R - 1)
    within = tile_idx - tile_start_of_req[req_of_tile]
    valid = within < ntiles[req_of_tile]
    tile_req = jnp.where(valid, req_of_tile, -1).astype(jnp.int32)
    tile_qpos = jnp.where(valid, within * tile_q, 0).astype(jnp.int32)

    row = jax.lax.broadcasted_iota(jnp.int32, (NT, tile_q), 1)
    tok = query_start_loc[req_of_tile][:, None] + tile_qpos[:, None] + row
    tok_valid = valid[:, None] & (
        (tile_qpos[:, None] + row) < q_lens[req_of_tile][:, None])
    tile_token = jnp.where(tok_valid, tok, -1).astype(jnp.int32)
    return tile_req, tile_qpos, tile_token
