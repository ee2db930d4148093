"""Pre-quantized checkpoint loading (AWQ / GPTQ file formats).

Counterpart of the reference's checkpoint-quantization configs
(``vllm/model_executor/layers/quantization/awq.py`` / ``gptq.py`` — the
qweight/qzeros/scales tensor layouts and the marlin/machete repack step)
and the fork's repack-on-load design (``layer.py:_process_block_weights_
quant:2074``): packed INT4 tensors are decoded host-side into float
weights, streamed through the normal loader, and MoE expert tensors are
then re-quantized into our TPU-native symmetric INT4 format (half-split
nibble pack, ``ops/quant.py``) for the fused Pallas dequant-GEMM.

Exact-asymmetric→symmetric repack is lossy only in the requant rounding;
dense (non-expert) layers stay bf16 in HBM.

Packing conventions decoded here:
- AWQ (GEMM format): ``qweight`` int32 [K, N/8], nibble j of each int32
  holds column ``8c + AWQ_ORDER[j]`` with AWQ_ORDER = [0, 2, 4, 6, 1, 3,
  5, 7]; ``qzeros`` int32 [K/G, N/8] same order; ``scales`` [K/G, N].
  Dequant: w[k, n] = (q[k, n] - z[k//G, n]) * s[k//G, n], q/z unsigned.
- GPTQ: ``qweight`` int32 [K/8, N] packed sequentially along K (nibble i
  = row 8r + i); ``qzeros`` int32 [K/G, N/8] sequential nibbles storing
  z - 1 (the AutoGPTQ off-by-one); ``scales`` [K/G, N]; optional
  ``g_idx`` [K] — only the trivial (non act-order) layout is supported.
"""

from typing import Dict, Iterable, Iterator, Optional, Tuple

import numpy as np

from lvllm_tpu.logger import init_logger

logger = init_logger(__name__)

AWQ_ORDER = (0, 2, 4, 6, 1, 3, 5, 7)


def _unpack_int32_nibbles(packed: np.ndarray, axis: int,
                          order: Tuple[int, ...]) -> np.ndarray:
    """int32-packed uint4 → uint8, expanding ``axis`` 8×. ``order[j]`` is
    the within-group position held by bit-field j."""
    packed = packed.astype(np.uint32)
    fields = [(packed >> (4 * j)) & 0xF for j in range(8)]  # j-th nibble
    out_shape = list(packed.shape)
    out_shape[axis] *= 8
    out = np.empty(out_shape, np.uint8)
    for j, pos in enumerate(order):
        idx = [slice(None)] * packed.ndim
        idx[axis] = slice(pos, None, 8)
        out[tuple(idx)] = fields[j].astype(np.uint8)
    return out


def dequant_awq(qweight: np.ndarray, qzeros: np.ndarray,
                scales: np.ndarray) -> np.ndarray:
    """AWQ GEMM-format tensors → float32 [K, N]."""
    q = _unpack_int32_nibbles(qweight, axis=-1, order=AWQ_ORDER)  # [K, N]
    z = _unpack_int32_nibbles(qzeros, axis=-1, order=AWQ_ORDER)   # [K/G, N]
    K = q.shape[0]
    G = K // z.shape[0]
    zf = np.repeat(z.astype(np.float32), G, axis=0)
    sf = np.repeat(scales.astype(np.float32), G, axis=0)
    return (q.astype(np.float32) - zf) * sf


def dequant_gptq(qweight: np.ndarray, qzeros: np.ndarray,
                 scales: np.ndarray,
                 g_idx: Optional[np.ndarray] = None) -> np.ndarray:
    """GPTQ tensors → float32 [K, N]. Only trivial g_idx (no act-order)."""
    order = (0, 1, 2, 3, 4, 5, 6, 7)
    q = _unpack_int32_nibbles(qweight, axis=0, order=order)       # [K, N]
    z = _unpack_int32_nibbles(qzeros, axis=-1, order=order)       # [K/G, N]
    K = q.shape[0]
    G = K // z.shape[0]
    if g_idx is not None:
        expect = np.arange(K) // G
        if not np.array_equal(np.asarray(g_idx).ravel(), expect):
            raise NotImplementedError(
                "GPTQ act-order (non-trivial g_idx) checkpoints are not "
                "supported; re-export without desc_act")
    zf = np.repeat(z.astype(np.float32) + 1.0, G, axis=0)  # stored z-1
    sf = np.repeat(scales.astype(np.float32), G, axis=0)
    return (q.astype(np.float32) - zf) * sf


def detect_ckpt_quant(hf_config: dict) -> Optional[dict]:
    """Read config.json's quantization_config; returns {method, bits,
    group_size} for supported formats, None otherwise."""
    qc = hf_config.get("quantization_config")
    if not qc:
        return None
    method = (qc.get("quant_method") or "").lower()
    if method not in ("awq", "gptq"):
        logger.warning("unsupported checkpoint quant_method %r — loading "
                       "as if unquantized", method)
        return None
    bits = qc.get("bits", qc.get("w_bit", 4))
    if bits != 4:
        raise NotImplementedError(f"{method} bits={bits} (only 4 supported)")
    return {"method": method, "bits": bits,
            "group_size": qc.get("group_size", qc.get("q_group_size", 128))}


_PACK_SUFFIXES = (".qweight", ".qzeros", ".scales", ".g_idx", ".bias")


def repack_quantized_stream(
    weights: Iterable[Tuple[str, np.ndarray]],
    method: str,
    dtype=np.float32,
) -> Iterator[Tuple[str, np.ndarray]]:
    """Decode AWQ/GPTQ packed tensors in a weight stream.

    Groups ``<prefix>.qweight/qzeros/scales[/g_idx]`` and emits
    ``<prefix>.weight`` in HF Linear layout [N, K] (out, in) once the
    group is complete; non-packed tensors pass through untouched.
    """
    pending: Dict[str, Dict[str, np.ndarray]] = {}

    def maybe_emit(prefix: str):
        group = pending[prefix]
        if not {"qweight", "qzeros", "scales"} <= set(group):
            return None
        if method == "awq":
            w = dequant_awq(group["qweight"], group["qzeros"],
                            group["scales"])
        else:
            w = dequant_gptq(group["qweight"], group["qzeros"],
                             group["scales"], group.get("g_idx"))
        del pending[prefix]
        # C-order copy: astype(order='K') would keep the transpose's
        # F-layout, which raw-buffer consumers (safetensors, ctypes)
        # silently misread.
        return np.ascontiguousarray(w.T, dtype=dtype)  # [K, N] → HF [N, K]

    for name, w in weights:
        suffix = next((s for s in _PACK_SUFFIXES if name.endswith(s)), None)
        if suffix is None or suffix == ".bias":
            yield name, w
            continue
        prefix = name[: -len(suffix)]
        pending.setdefault(prefix, {})[suffix[1:]] = np.asarray(w)
        out = maybe_emit(prefix)
        if out is not None:
            yield prefix + ".weight", out

    if pending:
        raise ValueError(
            f"incomplete quantized tensor groups: {sorted(pending)}")
