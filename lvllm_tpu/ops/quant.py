"""Weight-only quantization: INT8 / INT4 (AWQ-style symmetric, grouped) and
FP8 (e4m3) with per-channel scales.

TPU-native counterpart of the reference's quant stack
(``csrc/quantization/*`` marlin/machete wNa16 GEMMs,
``layers/quantization/`` fp8/awq/gptq configs, and the fork's FP8→INT4
repack-on-load ``layer.py:_process_block_weights_quant:2074``).

Storage conventions:
- int4: two nibbles per int8 along the *contraction* axis in half-split
  layout — low nibble holds row r, high nibble holds row r + K/2
  (w[..., K, N] → packed [..., K//2, N]); unpacking is a single
  concatenate, which lowers cleanly inside Pallas kernels (an interleaved
  layout would need a gather). Group scales [..., K//G, N].
- int8: plain int8 + per-(group,channel) scales.
- fp8: jnp.float8_e4m3fn + per-channel scale.

The fused dequant+GEMM Pallas kernels live in ``ops/pallas/quant_gemm.py``;
the jnp paths here are the oracle/CPU fallback (dequantize then matmul).
"""

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class QuantConfig:
    """Per-tensor-family quantization choice (reference:
    QuantizationConfig registry, layers/quantization/__init__.py)."""

    method: str = "none"      # none | int8 | int4 | fp8
    group_size: int = 128     # contraction-dim group for int4/int8 scales

    @property
    def is_quantized(self) -> bool:
        return self.method != "none"


# ---- host-side quantization on load (numpy) --------------------------------

def quantize_int4_np(w: np.ndarray, group_size: int = 128
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """Symmetric grouped INT4: w [..., K, N] → (packed [..., K//2, N] int8,
    scales [..., K//G, N] f32). AWQ-sym equivalent (no zero points)."""
    *lead, K, N = w.shape
    G = group_size
    assert K % G == 0 and K % 2 == 0, (K, G)
    wg = w.reshape(*lead, K // G, G, N).astype(np.float32)
    amax = np.abs(wg).max(axis=-2, keepdims=True)          # [..., K//G, 1, N]
    scales = (amax / 7.0).astype(np.float32)
    q = np.clip(np.round(wg / np.maximum(scales, 1e-10)), -8, 7)
    q = q.astype(np.int8).reshape(*lead, K, N)
    # Half-split pack: low nibble = row r, high nibble = row r + K/2.
    lo = q[..., : K // 2, :] & 0x0F
    hi = (q[..., K // 2:, :] & 0x0F) << 4
    packed = (lo | hi).astype(np.int8)
    return packed, scales[..., 0, :]                        # [..., K//G, N]


def tile_n_for(N: int) -> int:
    """Column-tile width for the contiguous quant-weight layout: 512 is
    the profiled sweet spot on v5e (655 GB/s effective vs 195 for the
    strided layout); fall back to smaller 128-multiples when N is narrow.
    Returns 0 when N has no 128-multiple divisor (layout stays legacy)."""
    for cand in (512, 256, 128):
        if N % cand == 0:
            return cand
    return 0


def tile_quant_layout_np(qw: np.ndarray, scales: np.ndarray
                         ) -> "tuple[np.ndarray, np.ndarray]":
    """Repack [E, R, N] quantized weights + [E, G, N] scales into the
    column-tiled layout [E, N/tn, R, tn] consumed by
    ``quant_gemm.grouped_quant_matmul_tiled`` — each (expert, col-tile)
    slab becomes one contiguous HBM read. No-op (returns inputs) when N
    doesn't tile."""
    E, R, N = qw.shape
    tn = tile_n_for(N)
    if tn == 0:
        return qw, scales

    def t(a):
        return np.ascontiguousarray(
            a.reshape(E, a.shape[1], N // tn, tn).transpose(0, 2, 1, 3))

    return t(qw), t(scales)


def quantize_int8_np(w: np.ndarray, group_size: int = 128
                     ) -> Tuple[np.ndarray, np.ndarray]:
    *lead, K, N = w.shape
    G = group_size
    assert K % G == 0
    wg = w.reshape(*lead, K // G, G, N).astype(np.float32)
    amax = np.abs(wg).max(axis=-2, keepdims=True)
    scales = (amax / 127.0).astype(np.float32)
    q = np.clip(np.round(wg / np.maximum(scales, 1e-10)), -128, 127)
    return q.astype(np.int8).reshape(*lead, K, N), scales[..., 0, :]


def quantize_fp8_np(w: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Per-output-channel FP8 e4m3 (reference: fp8 channel scheme)."""
    w = np.asarray(w, np.float32)
    amax = np.abs(w).max(axis=-2, keepdims=True).astype(np.float32)  # [...,1,N]
    scales = np.maximum(amax / 448.0, 1e-10)
    q = np.clip(w / scales, -448.0, 448.0)
    q = jnp.asarray(q, jnp.float8_e4m3fn)
    return np.asarray(q), scales[..., 0, :].astype(np.float32)


def dequant_fp8_np(q: np.ndarray, scales: np.ndarray) -> np.ndarray:
    """Host-side FP8 per-channel dequant (the first half of the fork's
    FP8→INT4 repack, layer.py:2074)."""
    return q.astype(np.float32) * scales[..., None, :].astype(np.float32)


# ---- jnp dequant (oracle / fallback) ---------------------------------------

def unpack_int4(packed: jax.Array) -> jax.Array:
    """[..., K//2, N] int8 → [..., K, N] int8 in [-8, 7] (half-split)."""
    lo = (packed & 0x0F).astype(jnp.int8)
    lo = jnp.where(lo >= 8, lo - 16, lo)
    hi = ((packed >> 4) & 0x0F).astype(jnp.int8)
    hi = jnp.where(hi >= 8, hi - 16, hi)
    return jnp.concatenate([lo, hi], axis=-2)


def dequant_int4(packed: jax.Array, scales: jax.Array,
                 group_size: int = 128, dtype=jnp.bfloat16) -> jax.Array:
    q = unpack_int4(packed)                     # [..., K, N]
    *lead, K, N = q.shape
    qg = q.reshape(*lead, K // group_size, group_size, N).astype(dtype)
    return (qg * scales[..., :, None, :].astype(dtype)).reshape(*lead, K, N)


def dequant_int8(q: jax.Array, scales: jax.Array,
                 group_size: int = 128, dtype=jnp.bfloat16) -> jax.Array:
    *lead, K, N = q.shape
    qg = q.reshape(*lead, K // group_size, group_size, N).astype(dtype)
    return (qg * scales[..., :, None, :].astype(dtype)).reshape(*lead, K, N)


def dequant_fp8(q: jax.Array, scales: jax.Array,
                dtype=jnp.bfloat16) -> jax.Array:
    return q.astype(dtype) * scales[..., None, :].astype(dtype)


# ---- dense-layer w8a8 ------------------------------------------------------

def quantize_dense_np(w: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Per-output-channel symmetric int8 for a dense [K, N] kernel
    (reference: compressed_tensors w8a8-int8 channel scheme,
    schemes/compressed_tensors_w8a8_int8.py). Returns (q int8 [K, N],
    scales f32 [N])."""
    K, N = w.shape
    q, s = quantize_int8_np(w, group_size=K)      # one group = per-channel
    return q, s.reshape(N)


def w8a8_dense(x: jax.Array, wq: jax.Array, wscale: jax.Array
               ) -> jax.Array:
    """Dense w8a8 matmul: per-token symmetric int8 activation quant +
    int8xint8 MXU dot (v5e legalizes s8xs8->s32 at ~2x bf16 FLOPs;
    tools/probe_int8_mxu.py), rescaled by act_scale[t] * w_scale[n].
    Weight HBM reads halve vs bf16 — the decode win — and the dot runs
    the int8 MXU path at prefill tiles — the prefill win."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    s = jnp.maximum(amax, 1e-8) * (1.0 / 127.0)
    xq = jnp.round(xf / s).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * s * wscale.astype(jnp.float32)
    return out.astype(x.dtype)


def dense_matmul(x: jax.Array, p: dict) -> jax.Array:
    """``x @ p['kernel']`` with transparent dense-w8a8: a layer whose
    kernel was replaced at load time by ``kernel_q`` + ``scale`` takes the
    int8 path (loader.quantize_dense_weights). Bias NOT applied here."""
    if "kernel_q" in p:
        return w8a8_dense(x, p["kernel_q"], p["scale"])
    return x @ p["kernel"]
