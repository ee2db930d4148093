"""Pallas blocked grouped GEMM with fused weight dequantization.

TPU-native counterpart of the reference's quantized MoE GEMMs (marlin-moe
wNa16, cutlass grouped GEMM, ``_fused_moe_gguf`` — the kernels behind the
fork's GPU-prefill path, ``moe_runner.py:538``): each row block of the
aligned token matrix (see ``ops/moe_align.py``) belongs to one expert; the
expert's INT4/INT8/FP8 weights are DMA'd per tile, dequantized in VMEM, and
fed straight to the MXU — weights never materialize in bf16 in HBM, so HBM
traffic is the quantized footprint (the whole point of weight-only quant
for bandwidth-bound decode).

Grid: (num_row_blocks, num_col_tiles); expert id per row block arrives via
scalar prefetch and drives the weight BlockSpec index_map — consecutive
blocks of the same expert reuse the in-VMEM tile (Pallas skips equal-index
DMAs).
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 128


def _kernel_int4(block_expert_ref, x_ref, w_ref, s_ref, o_ref, *,
                 group_size: int, out_dtype):
    # x [TILE_M, K]; w [1, K//2, TILE_N] int8 packed; s [1, K//G, TILE_N]
    x = x_ref[:]
    # Sign-extend nibbles arithmetically in i32 — Mosaic rejects vector i8
    # compares, and ((v & 0xF) ^ 8) - 8 is branch-free two's complement.
    packed = w_ref[0].astype(jnp.int32)
    lo = ((packed & 0x0F) ^ 8) - 8
    hi = (((packed >> 4) & 0x0F) ^ 8) - 8
    q = jnp.concatenate([lo, hi], axis=0)            # [K, tn] i32
    K, tn = q.shape
    scales = s_ref[0]                                # [K//G, tn]
    w = q.astype(jnp.float32).reshape(K // group_size, group_size, tn)
    w = (w * scales.astype(jnp.float32)[:, None, :]).reshape(K, tn)
    o_ref[:] = jax.lax.dot_general(
        x.astype(jnp.float32), w,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(out_dtype)


def _kernel_int4_bf16(block_expert_ref, x_ref, w_ref, s_ref, o_ref, *,
                      group_size: int, out_dtype):
    """int4 dequant into bf16 + native-MXU bf16 dot (f32 accumulate):
    halves the VMEM traffic of the f32 weight tile and moves the matmul
    off the slow f32 MXU path."""
    x = x_ref[:]
    packed = w_ref[0].astype(jnp.int32)
    lo = ((packed & 0x0F) ^ 8) - 8
    hi = (((packed >> 4) & 0x0F) ^ 8) - 8
    q = jnp.concatenate([lo, hi], axis=0)            # [K, TILE_N] i32
    K = q.shape[0]
    scales = s_ref[0]                                # [K//G, TILE_N]
    w = q.astype(jnp.bfloat16).reshape(K // group_size, group_size, TILE_N)
    w = (w * scales.astype(jnp.bfloat16)[:, None, :]).reshape(K, TILE_N)
    o_ref[:] = jax.lax.dot_general(
        x.astype(jnp.bfloat16), w,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(out_dtype)


def _kernel_int4_groupscale(block_expert_ref, x_ref, w_ref, s_ref, o_ref, *,
                            group_size: int, out_dtype):
    """int4 with per-group OUTPUT scaling: one bf16 dot per scale group,
    scaling the [M, N] partial instead of the [K, N] weights — K/M times
    less VPU multiply work than weight-side scaling."""
    x = x_ref[:].astype(jnp.bfloat16)
    M = x.shape[0]
    packed = w_ref[0].astype(jnp.int32)
    lo = ((packed & 0x0F) ^ 8) - 8
    hi = (((packed >> 4) & 0x0F) ^ 8) - 8
    q = jnp.concatenate([lo, hi], axis=0).astype(jnp.bfloat16)  # [K, N]
    K = q.shape[0]
    G = group_size
    scales = s_ref[0]                                # [K//G, TILE_N]
    acc = jnp.zeros((M, TILE_N), jnp.float32)
    for g in range(K // G):
        part = jax.lax.dot_general(
            x[:, g * G:(g + 1) * G], q[g * G:(g + 1) * G, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = acc + part * scales[g].astype(jnp.float32)[None, :]
    o_ref[:] = acc.astype(out_dtype)


def _kernel_int4_twodot(block_expert_ref, x_ref, w_ref, s_ref, o_ref, *,
                        group_size: int, out_dtype):
    """int4 without the [K, N] concat copy: the lo/hi nibble halves each
    dequantize in place and contribute their own MXU dot against the
    matching half of x (packing puts rows [0, K/2) in lo, [K/2, K) in hi,
    and K/2 is a multiple of group_size so scales split cleanly)."""
    x = x_ref[:].astype(jnp.bfloat16)
    packed = w_ref[0].astype(jnp.int32)               # [K/2, TILE_N]
    Kh = packed.shape[0]
    G = group_size
    scales = s_ref[0].astype(jnp.bfloat16)            # [K//G, TILE_N]
    nh = Kh // G

    lo = (((packed & 0x0F) ^ 8) - 8).astype(jnp.bfloat16)
    lo = (lo.reshape(nh, G, TILE_N) * scales[:nh, None, :]).reshape(
        Kh, TILE_N)
    acc = jax.lax.dot_general(
        x[:, :Kh], lo, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    hi = ((((packed >> 4) & 0x0F) ^ 8) - 8).astype(jnp.bfloat16)
    hi = (hi.reshape(nh, G, TILE_N) * scales[nh:, None, :]).reshape(
        Kh, TILE_N)
    acc = acc + jax.lax.dot_general(
        x[:, Kh:], hi, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[:] = acc.astype(out_dtype)


def _kernel_int4_native(block_expert_ref, x_ref, w_ref, s_ref, o_ref, *,
                        group_size: int, out_dtype):
    """jnp.int4 storage: Mosaic's native int4→bf16 convert replaces the
    mask/shift/xor unpack chain (weights stay bit-packed in HBM)."""
    x = x_ref[:].astype(jnp.bfloat16)
    q = w_ref[0].astype(jnp.bfloat16)                 # [K, TILE_N]
    K = q.shape[0]
    scales = s_ref[0].astype(jnp.bfloat16)
    w = (q.reshape(K // group_size, group_size, TILE_N) *
         scales[:, None, :]).reshape(K, TILE_N)
    o_ref[:] = jax.lax.dot_general(
        x, w, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(out_dtype)


def _kernel_int4_touch(block_expert_ref, x_ref, w_ref, s_ref, o_ref, *,
                       group_size: int, out_dtype):
    """DMA floor probe: streams the same weight tiles but replaces dequant
    + matmul with a trivial reduce — isolates memory time from compute."""
    packed = w_ref[0]
    t = jnp.sum(packed.astype(jnp.float32)) + \
        jnp.sum(s_ref[0].astype(jnp.float32))
    o_ref[:] = jnp.full(o_ref.shape, t, out_dtype)


def _kernel_int4_bf16dot(block_expert_ref, x_ref, w_ref, s_ref, o_ref, *,
                         group_size: int, out_dtype):
    """Tile-width-generic int4 dequant to bf16 + native-MXU bf16 dot
    (f32 accumulate) — the production tiled-layout kernel: halves the
    in-VMEM weight bytes vs f32 dequant and runs the dot at full bf16
    MXU rate."""
    x = x_ref[:].astype(jnp.bfloat16)
    packed = w_ref[0].astype(jnp.int32)
    lo = ((packed & 0x0F) ^ 8) - 8
    hi = (((packed >> 4) & 0x0F) ^ 8) - 8
    q = jnp.concatenate([lo, hi], axis=0)            # [K, tn] i32
    K, tn = q.shape
    scales = s_ref[0]                                # [K//G, tn]
    w = q.astype(jnp.bfloat16).reshape(K // group_size, group_size, tn)
    w = (w * scales.astype(jnp.bfloat16)[:, None, :]).reshape(K, tn)
    o_ref[:] = jax.lax.dot_general(
        x, w, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(out_dtype)


def _kernel_int8_bf16dot(block_expert_ref, x_ref, w_ref, s_ref, o_ref, *,
                         group_size: int, out_dtype):
    x = x_ref[:].astype(jnp.bfloat16)
    q = w_ref[0]                                     # [K, tn] int8
    K, tn = q.shape
    scales = s_ref[0]
    w = q.astype(jnp.bfloat16).reshape(K // group_size, group_size, tn)
    w = (w * scales.astype(jnp.bfloat16)[:, None, :]).reshape(K, tn)
    o_ref[:] = jax.lax.dot_general(
        x, w, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(out_dtype)


def _kernel_int8(block_expert_ref, x_ref, w_ref, s_ref, o_ref, *,
                 group_size: int, out_dtype):
    x = x_ref[:]
    q = w_ref[0]                                     # [K, tn] int8
    K, tn = q.shape
    scales = s_ref[0]
    w = q.astype(jnp.float32).reshape(K // group_size, group_size, tn)
    w = (w * scales.astype(jnp.float32)[:, None, :]).reshape(K, tn)
    o_ref[:] = jax.lax.dot_general(
        x.astype(jnp.float32), w,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(out_dtype)


def _kernel_fp8(block_expert_ref, x_ref, w_ref, s_ref, o_ref, *, out_dtype):
    x = x_ref[:]
    w = w_ref[0].astype(jnp.float32) * s_ref[0].astype(jnp.float32)[None, :]
    o_ref[:] = jax.lax.dot_general(
        x.astype(jnp.float32), w,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(out_dtype)


def _kernel_bf16(block_expert_ref, x_ref, w_ref, o_ref, *, out_dtype):
    x = x_ref[:]
    o_ref[:] = jax.lax.dot_general(
        x, w_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(out_dtype)


def pick_tile_n(K_eff: int, N: int, dtype_bytes: float,
                vmem_budget: int = 4 << 20) -> int:
    """Largest 128-multiple divisor of N whose [K_eff, tile_n] weight tile
    (double-buffered) fits the VMEM budget. Bigger tiles → fewer grid
    steps → less per-DMA fixed overhead (profiled: the old 128-wide
    strided tiles capped the kernel at ~200 GB/s vs 722 XLA floor)."""
    best = TILE_N
    for cand in range(N, TILE_N - 1, -TILE_N):
        if N % cand:
            continue
        if 2 * K_eff * cand * dtype_bytes <= vmem_budget:
            best = cand
            break
    return best


def _tile_last_dim(a: jax.Array, tile_n: int) -> jax.Array:
    """[E, R, N] → [E, N//tile_n, R, tile_n] contiguous column-tile layout
    so each (expert, col-tile) weight slab is ONE contiguous HBM read
    (marlin-style repack, done once at load)."""
    E, R, N = a.shape
    return jnp.transpose(a.reshape(E, R, N // tile_n, tile_n),
                         (0, 2, 1, 3))


def untile_last_dim(a) -> jax.Array:
    """Inverse of the load-time repack: [E, nb_n, R, tn] → [E, R, N]."""
    E, nb_n, R, tn = a.shape
    return jnp.transpose(a, (0, 2, 1, 3)).reshape(E, R, nb_n * tn)


def grouped_quant_matmul_tiled(
    x_aligned: jax.Array,     # [M_pad, K]
    w_tiled: jax.Array,       # int4: [E, nb_n, K//2, TN]; int8: [..., K, TN]
    s_tiled: jax.Array,       # [E, nb_n, K//G, TN]
    block_expert: jax.Array,  # [M_pad // tile_m] i32 (-1 pad → expert 0)
    *,
    method: str,              # int4 | int8
    tile_m: int,
    group_size: int = 128,
) -> jax.Array:
    """Fused dequant grouped GEMM over column-tiled contiguous weights.

    Same math as :func:`grouped_quant_matmul`; the load-time repack
    (:func:`_tile_last_dim`) makes every weight-tile DMA a single
    contiguous slab and the wide tile_n collapses the grid's n dimension,
    which removes the per-step DMA issue overhead that bounded the
    strided layout at ~25% of HBM peak."""
    M_pad, K = x_aligned.shape
    E, nb_n, rows, tn = w_tiled.shape
    N = nb_n * tn
    assert M_pad % tile_m == 0, (M_pad, tile_m)
    nb_m = M_pad // tile_m
    safe_expert = jnp.maximum(block_expert, 0)
    out_dtype = x_aligned.dtype

    if method == "int4":
        base = _kernel_int4
    elif method == "int8":
        base = _kernel_int8
    else:
        raise ValueError(f"tiled layout unsupported for {method}")

    def kernel(be_ref, x_ref, w_ref, s_ref, o_ref):
        base(be_ref, x_ref, w_ref[:, 0], s_ref[:, 0], o_ref,
             group_size=group_size, out_dtype=out_dtype)

    # m-outer grid keeps the weight stream sequential in HBM (expert-major
    # slabs). Tail pad blocks (block_expert == -1; ~20% of decode blocks)
    # alias the PREVIOUS real block's last tile via the index map, so
    # Pallas skips every one of their weight/scale DMAs — the appended
    # prefetch slot carries max(block_expert) = the last real expert
    # (segments ascend), which is exactly the tile grid step
    # (last_real_m, nb_n-1) just loaded.
    be_ext = jnp.concatenate(
        [block_expert, jnp.max(block_expert, keepdims=True)])
    nb_m_i = nb_m
    _USE_PAD_ALIAS = False  # perf probe: conditional index maps cost more
                            # than the skipped pad DMAs save (full step
                            # 23.1 vs 17.3 ms) — keep plain indexing

    def w_index(m, n, be):
        if not _USE_PAD_ALIAS:
            return (jnp.maximum(be[m], 0), n, 0, 0)
        pad = be[m] < 0
        e = jnp.where(pad, jnp.maximum(be[nb_m_i], 0), be[m])
        nn = jnp.where(pad, nb_n - 1, n)
        return (e, nn, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb_m, nb_n),
        in_specs=[
            pl.BlockSpec((tile_m, K), lambda m, n, be: (m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rows, tn), w_index,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, K // group_size, tn), w_index,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, tn), lambda m, n, be: (m, n),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M_pad, N), out_dtype),
    )(be_ext, x_aligned, w_tiled, s_tiled)


def grouped_quant_matmul(
    x_aligned: jax.Array,     # [M_pad, K]
    w: jax.Array,             # int4: [E, K//2, N]; int8: [E, K, N];
                              # fp8: [E, K, N]; bf16: [E, K, N]
    scales: Optional[jax.Array],  # int4/8: [E, K//G, N]; fp8: [E, N]
    block_expert: jax.Array,  # [M_pad // tile_m] i32 (-1 pad → expert 0)
    *,
    method: str,              # int4 | int8 | fp8 | bf16
    tile_m: int,
    group_size: int = 128,
    variant: str = "default",
) -> jax.Array:
    if w.ndim == 4:
        # Column-tiled contiguous layout (load-time repack; profiled at
        # 655 GB/s vs 195 for the strided [E, R, N] layout on v5e).
        return grouped_quant_matmul_tiled(
            x_aligned, w, scales, block_expert, method=method,
            tile_m=tile_m, group_size=group_size)
    M_pad, K = x_aligned.shape
    E = w.shape[0]
    N = w.shape[2]
    assert M_pad % tile_m == 0 and N % TILE_N == 0, (M_pad, tile_m, N)
    nb_m = M_pad // tile_m
    nb_n = N // TILE_N
    safe_expert = jnp.maximum(block_expert, 0)

    def w_index(m, n, be_ref):
        return (be_ref[m], 0, n)

    def s_index(m, n, be_ref):
        return (be_ref[m], 0, n)

    def s_index_fp8(m, n, be_ref):
        return (be_ref[m], n)

    x_spec = pl.BlockSpec((tile_m, K), lambda m, n, be: (m, 0),
                          memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((tile_m, TILE_N), lambda m, n, be: (m, n),
                          memory_space=pltpu.VMEM)
    out_dtype = x_aligned.dtype

    if method == "int4":
        kfn = {"default": _kernel_int4, "bf16dot": _kernel_int4_bf16,
               "groupscale": _kernel_int4_groupscale,
               "twodot": _kernel_int4_twodot,
               "native": _kernel_int4_native,
               "touch": _kernel_int4_touch}[variant]
        kernel = functools.partial(kfn, group_size=group_size,
                                   out_dtype=out_dtype)
        if variant == "native":
            # w arrives as jnp.int4 [E, K, N] (bit-packed in HBM).
            w_spec = pl.BlockSpec((1, K, TILE_N), w_index,
                                  memory_space=pltpu.VMEM)
        else:
            w_spec = pl.BlockSpec((1, K // 2, TILE_N), w_index,
                                  memory_space=pltpu.VMEM)
        s_spec = pl.BlockSpec((1, K // group_size, TILE_N), s_index,
                              memory_space=pltpu.VMEM)
        in_specs = [x_spec, w_spec, s_spec]
        args = (x_aligned, w, scales)
    elif method == "int8":
        kernel = functools.partial(_kernel_int8, group_size=group_size,
                                   out_dtype=out_dtype)
        w_spec = pl.BlockSpec((1, K, TILE_N), w_index,
                              memory_space=pltpu.VMEM)
        s_spec = pl.BlockSpec((1, K // group_size, TILE_N), s_index,
                              memory_space=pltpu.VMEM)
        in_specs = [x_spec, w_spec, s_spec]
        args = (x_aligned, w, scales)
    elif method == "fp8":
        kernel = functools.partial(_kernel_fp8, out_dtype=out_dtype)
        w_spec = pl.BlockSpec((1, K, TILE_N), w_index,
                              memory_space=pltpu.VMEM)
        s_spec = pl.BlockSpec((1, TILE_N), s_index_fp8,
                              memory_space=pltpu.VMEM)
        in_specs = [x_spec, w_spec, s_spec]
        args = (x_aligned, w, scales)
    elif method == "bf16":
        kernel = functools.partial(_kernel_bf16, out_dtype=out_dtype)
        w_spec = pl.BlockSpec((1, K, TILE_N), w_index,
                              memory_space=pltpu.VMEM)
        in_specs = [x_spec, w_spec]
        args = (x_aligned, w)
    else:
        raise ValueError(f"unknown method {method}")

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb_m, nb_n),
        in_specs=in_specs,
        out_specs=o_spec,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M_pad, N), out_dtype),
    )(safe_expert, *args)


def _dequant_tile_f32(packed, scales, group_size, method):
    """[rows, tn] stored tile → [K, tn] f32 dequantized weights.

    int4 unpack uses sign-preserving arithmetic shifts — ``p >> 4`` IS
    the signed high nibble and ``(p << 28) >> 28`` the signed low nibble
    of the sign-extended byte — 3 VPU ops vs 7 for the mask/xor chain.
    The dequant is VPU-bound at decode shapes (int8 with 2x the HBM
    bytes beats the old int4 kernel), so unpack ops are the cost that
    matters."""
    if method == "int4":
        p = packed.astype(jnp.int32)
        lo = (p << 28) >> 28
        hi = p >> 4
        q = jnp.concatenate([lo, hi], axis=0)
    else:
        q = packed.astype(jnp.int32)
    K, tn = q.shape
    w = q.astype(jnp.float32).reshape(K // group_size, group_size, tn)
    return (w * scales.astype(jnp.float32)[:, None, :]).reshape(K, tn)


def _act_quant_rows(x: jax.Array):
    """Dynamic symmetric per-token int8 activation quant (in-VMEM).

    Counterpart of the reference's per-token dynamic quant epilogue in the
    cutlass w8a8 path (``csrc/quantization/`` scaled_mm): scale[m] =
    max|x[m,:]| / 127; returns (xq int8 [M, K], inv_scale f32 [M, 1] such
    that x ≈ xq * inv_scale)."""
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)
    absmax = jnp.maximum(absmax, 1e-8)
    q = jnp.clip(jnp.round(xf * (127.0 / absmax)), -127.0, 127.0)
    return q.astype(jnp.int8), absmax * (1.0 / 127.0)


def grouped_quant_ffn_tiled(
    x_aligned: jax.Array,     # [M_pad, K]
    w1_t: jax.Array,          # [E, nb1, rows1, tn1] (gate‖up, N1 = 2I)
    s1_t: jax.Array,          # [E, nb1, K//G, tn1]
    w2_t: jax.Array,          # [E, nb2, rows2, tn2] (down, N2 = H)
    s2_t: jax.Array,          # [E, nb2, I//G, tn2]
    block_expert: jax.Array,  # [M_pad // tile_m] i32 (-1 pad)
    *,
    method: str,              # int4 | int8
    tile_m: int,
    group_size: int = 128,
    act_quant: bool = False,
) -> jax.Array:
    """Whole MoE FFN (w1 GEMM → SiLU·mul → w2 GEMM) as ONE fused kernel.

    One 1-D grid step per row block streams the expert's ENTIRE w1+w2
    (contiguous in the column-tiled storage) and keeps the [tile_m, 2I]
    intermediate in VMEM — no HBM round trip for h, no second kernel
    launch, and consecutive blocks of the same expert (including the tail
    pad run, block_expert == -1 → expert 0) hit identical weight indices
    so Pallas skips their DMAs. This is the in-step scheduling fix for
    the r02 gap (expert GEMMs 408 GB/s in-step vs 655 isolated): a single
    uninterrupted weight stream spans the whole layer FFN.
    """
    M_pad, K = x_aligned.shape
    E, nb1, rows1, tn1 = w1_t.shape
    N1 = nb1 * tn1
    _, nb2, rows2, tn2 = w2_t.shape
    N2 = nb2 * tn2
    I = N1 // 2
    assert M_pad % tile_m == 0
    nb_m = M_pad // tile_m
    safe_expert = jnp.maximum(block_expert, 0)
    out_dtype = x_aligned.dtype

    # Dot precision by shape (measured on v5e): DECODE blocks (tile_m 8)
    # run fastest as f32 dequant + f32 dot (bf16 relayouts cost more than
    # they save at tiny M); PREFILL blocks (tile_m >= 32) are MXU-bound —
    # ~5.5 TFLOP/step at the bench geometry — where the bf16 dot's 4x
    # rate over f32 dominates. Scales apply on the OUTPUT per k-group
    # either way (K/M times less VPU work than per-weight scaling).
    use_bf16_dot = tile_m >= 32

    def unpack_w(w_ref_tile):
        if method == "int4":
            pck = w_ref_tile.astype(jnp.int32)
            lo = (pck << 28) >> 28
            hi = pck >> 4
            return jnp.concatenate([lo, hi], axis=0)
        return w_ref_tile.astype(jnp.int32)

    def dot_tile(xv, w_ref_tile, s_ref_tile, K_full):
        q = unpack_w(w_ref_tile)
        Kq, tn = q.shape
        cdt = jnp.bfloat16 if use_bf16_dot else jnp.float32
        qf = q.astype(cdt)
        sc = s_ref_tile.astype(jnp.float32)           # [Kq//G, tn]
        xf = xv.astype(cdt)
        acc = None
        for g in range(Kq // group_size):
            part = jax.lax.dot_general(
                xf[:, g * group_size:(g + 1) * group_size],
                qf[g * group_size:(g + 1) * group_size, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            part = part * sc[g][None, :]
            acc = part if acc is None else acc + part
        return acc

    def dot_tile_a8(xq, xs, w_ref_tile, s_ref_tile, K_full):
        """int8-MXU path (w8a8/w4a8): int8 activations x int8 weights at
        2x the bf16 MXU rate (probed 148 vs 87 TF/s on v5e at prefill
        tiles, tools/probe_int8_mxu.py); per-group weight scale and
        per-token activation scale applied on the int32 OUTPUT partial."""
        q = unpack_w(w_ref_tile).astype(jnp.int8)
        Kq, tn = q.shape
        sc = s_ref_tile.astype(jnp.float32)           # [Kq//G, tn]
        acc = None
        for g in range(Kq // group_size):
            part = jax.lax.dot_general(
                xq[:, g * group_size:(g + 1) * group_size],
                q[g * group_size:(g + 1) * group_size, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            part = part.astype(jnp.float32) * sc[g][None, :]
            acc = part if acc is None else acc + part
        return acc * xs

    def kernel(be_ref, x_ref, w1_ref, s1_ref, w2_ref, s2_ref, o_ref):
        m = pl.program_id(0)

        # Tail pad blocks (block_expert == -1): their weight DMAs already
        # skip (same clamped index as the previous pad) — predicate the
        # dequant + dots away too; ~20% of decode grid steps are pads and
        # the kernel is VPU-dequant-bound. Their output rows are garbage
        # that combine_tokens never gathers.
        @pl.when(be_ref[m] >= 0)
        def _body():
            if act_quant:
                xq, xs = _act_quant_rows(x_ref[:])
                hs = [dot_tile_a8(xq, xs, w1_ref[0, n], s1_ref[0, n], K)
                      for n in range(nb1)]
            else:
                x = x_ref[:].astype(jnp.float32)
                hs = [dot_tile(x, w1_ref[0, n], s1_ref[0, n], K)
                      for n in range(nb1)]
            # Match the two-kernel path's numerics exactly: the first
            # GEMM's output is cast to the activation dtype BEFORE SiLU
            # (which runs in f32), and the product is in that dtype.
            h = jnp.concatenate(hs, axis=1).astype(out_dtype)
            gate = h[:, :I].astype(jnp.float32)
            up = h[:, I:]
            hb = (gate * jax.lax.logistic(gate)).astype(out_dtype) * up
            if act_quant:
                hq, hsc = _act_quant_rows(hb)
                outs = [dot_tile_a8(hq, hsc, w2_ref[0, n], s2_ref[0, n], I)
                        for n in range(nb2)]
            else:
                hb = hb.astype(jnp.float32)
                outs = [dot_tile(hb, w2_ref[0, n], s2_ref[0, n], I)
                        for n in range(nb2)]
            o_ref[:] = jnp.concatenate(outs, axis=1).astype(out_dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb_m,),
        in_specs=[
            pl.BlockSpec((tile_m, K), lambda m, be: (m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nb1, rows1, tn1),
                         lambda m, be: (jnp.maximum(be[m], 0), 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nb1, K // group_size, tn1),
                         lambda m, be: (jnp.maximum(be[m], 0), 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nb2, rows2, tn2),
                         lambda m, be: (jnp.maximum(be[m], 0), 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nb2, I // group_size, tn2),
                         lambda m, be: (jnp.maximum(be[m], 0), 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, N2), lambda m, be: (m, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M_pad, N2), out_dtype),
    )(block_expert, x_aligned, w1_t, s1_t, w2_t, s2_t)


# ---- jnp reference ---------------------------------------------------------

def grouped_quant_ffn_reference(x_aligned, w1_t, s1_t, w2_t, s2_t,
                                block_expert, *, method, tile_m,
                                group_size=128, act_quant=False):
    """Oracle for the fused FFN kernel incl. the w8a8/w4a8 activation-quant
    path: dequantize whole experts, quantize activations per token with the
    same symmetric dynamic rule as the kernel, run the FFN in f32."""
    from lvllm_tpu.layers.common import silu_and_mul

    def dq(w, s):
        if w.ndim == 4:
            w = untile_last_dim(w)
            s = untile_last_dim(s)
        from lvllm_tpu.ops import quant as q
        if method in ("int4", "w4a8"):
            return q.dequant_int4(w, s, group_size, jnp.float32)
        return q.dequant_int8(w, s, group_size, jnp.float32)

    w1 = dq(w1_t, s1_t)
    w2 = dq(w2_t, s2_t)

    def maybe_q(x):
        if not act_quant:
            return x.astype(jnp.float32)
        xq, xs = _act_quant_rows(x)
        return xq.astype(jnp.float32) * xs

    M_pad = x_aligned.shape[0]
    nb = M_pad // tile_m
    safe = jnp.maximum(block_expert, 0)
    out_dtype = x_aligned.dtype
    xb = maybe_q(x_aligned).reshape(nb, tile_m, -1)
    h = jnp.einsum("bmk,bkn->bmn", xb, w1[safe])
    h = h.reshape(M_pad, -1).astype(out_dtype)
    hb = silu_and_mul(h)
    hq = maybe_q(hb).reshape(nb, tile_m, -1)
    out = jnp.einsum("bmk,bkn->bmn", hq, w2[safe])
    return out.reshape(M_pad, -1).astype(out_dtype)

def grouped_quant_matmul_reference(x_aligned, w, scales, block_expert, *,
                                   method, tile_m, group_size=128):
    """Oracle: dequantize whole experts, gather per block, matmul."""
    from lvllm_tpu.ops import quant as q

    if w.ndim == 4:
        w = untile_last_dim(w)
        scales = untile_last_dim(scales)

    if method == "int4":
        wd = q.dequant_int4(w, scales, group_size, jnp.float32)
    elif method == "int8":
        wd = q.dequant_int8(w, scales, group_size, jnp.float32)
    elif method == "fp8":
        wd = q.dequant_fp8(w, scales, jnp.float32)
    else:
        wd = w.astype(jnp.float32)
    M_pad = x_aligned.shape[0]
    nb = M_pad // tile_m
    safe = jnp.maximum(block_expert, 0)
    xb = x_aligned.reshape(nb, tile_m, -1).astype(jnp.float32)
    wb = wd[safe]                                      # [nb, K, N]
    out = jnp.einsum("bmk,bkn->bmn", xb, wb)
    return out.reshape(M_pad, -1).astype(x_aligned.dtype)
