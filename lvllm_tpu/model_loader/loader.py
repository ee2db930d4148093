"""Weight loading: safetensors streaming + dummy init.

Counterpart of the reference's ``vllm/model_executor/model_loader/``
(DefaultModelLoader streaming safetensors shard-by-shard, DummyModelLoader
for tests). Streaming keeps host-RAM peak at one shard, mirroring the
reference's layerwise-load memory ceiling design (SURVEY.md §2.7).
"""

import glob
import os
from typing import Iterable, Iterator, Tuple

import jax
import numpy as np

from lvllm_tpu.config import ModelConfig
from lvllm_tpu.logger import init_logger
from lvllm_tpu.models.registry import build_model

logger = init_logger(__name__)


def safetensors_weight_iterator(
    model_path: str) -> Iterator[Tuple[str, np.ndarray]]:
    """Stream (name, array) from all *.safetensors files in a directory."""
    from safetensors import safe_open

    files = sorted(glob.glob(os.path.join(model_path, "*.safetensors")))
    if not files:
        raise FileNotFoundError(f"no safetensors files under {model_path}")
    for fn in files:
        logger.info("loading shard %s", os.path.basename(fn))
        with safe_open(fn, framework="np") as f:
            for name in f.keys():
                yield name, f.get_tensor(name)


def quantize_moe_weights(params, config: ModelConfig):
    """Quantize-on-load of MoE expert weights (weight-only), per layer.

    Counterpart of the fork's FP8→INT4 repack-on-load
    (``layer.py:_process_block_weights_quant:2074``, MoeComputeStrategy
    KEEP|INT4): expert tensors are converted host-side to each layer's
    configured format (``ModelConfig.quant_method_for_layer`` — the global
    ``quantization`` plus ``moe_quant_overrides`` per-layer hybrid map,
    e.g. FP8 resident layers + INT4 streamed layers, BASELINE config #3)
    and the bf16 originals dropped, capping both HBM footprint and
    load-time peak RAM. Layers already holding FP8 tensors are repacked
    to INT4 when the strategy demands it (dequant → INT4 re-quant).
    """
    from lvllm_tpu.ops import quant

    if not (config.quantization or config.moe_quant_overrides):
        return params
    counts = {}
    for i, layer in enumerate(params["layers"]):
        moe = layer.get("moe")
        if moe is None:
            continue
        method = config.quant_method_for_layer(i)
        if method is None:
            continue
        # Activation-quant variants store weights exactly like their
        # weight-only siblings; the activation side is dynamic (computed
        # in-kernel per token), so load-time work is identical.
        wmethod = {"w8a8": "int8", "w4a8": "int4"}.get(method, method)
        assert wmethod in ("int4", "int8", "fp8"), method
        if "w1" not in moe:
            if wmethod == "int4" and "w1_q" in moe and \
                    str(moe["w1_q"].dtype).startswith("float8"):
                # FP8→INT4 repack (fused_moe/layer.py:2074).
                for name in ("w1", "w2"):
                    deq = quant.dequant_fp8_np(
                        np.asarray(moe.pop(f"{name}_q")),
                        np.asarray(moe.pop(f"{name}_scales")))
                    qw, s = quant.quantize_int4_np(deq, 128)
                    qw, s = quant.tile_quant_layout_np(qw, s)
                    moe[f"{name}_q"] = jax.numpy.asarray(qw)
                    moe[f"{name}_scales"] = jax.numpy.asarray(
                        s, jax.numpy.bfloat16 if config.dtype == "bfloat16"
                        else jax.numpy.float32)
                counts["fp8->int4"] = counts.get("fp8->int4", 0) + 1
            continue
        for name in ("w1", "w2"):
            # No f32 upcast here: the quantizers convert group-wise
            # internally (a standalone astype of multi-GB bf16 zeros costs
            # minutes on the shape probe for nothing).
            w = np.asarray(moe.pop(name))
            if wmethod == "int4":
                qw, s = quant.quantize_int4_np(w, 128)
                qw, s = quant.tile_quant_layout_np(qw, s)
            elif wmethod == "int8":
                qw, s = quant.quantize_int8_np(w, 128)
                qw, s = quant.tile_quant_layout_np(qw, s)
            else:
                qw, s = quant.quantize_fp8_np(w)
            moe[f"{name}_q"] = jax.numpy.asarray(qw)
            moe[f"{name}_scales"] = jax.numpy.asarray(
                s, jax.numpy.bfloat16 if config.dtype == "bfloat16"
                else jax.numpy.float32)
        counts[method] = counts.get(method, 0) + 1
    logger.info("quantized MoE layers: %s", counts or "none")
    params = quantize_dense_weights(params, config)
    return params


_DENSE_QUANT_KEYS = ("q_proj", "k_proj", "v_proj", "o_proj",
                     "gate_up", "up", "down")


def quantize_dense_weights(params, config: ModelConfig):
    """Dense-layer w8a8 (reference: compressed-tensors w8a8-int8 quantizes
    every linear, schemes/compressed_tensors_w8a8_int8.py): under
    quantization w8a8/w4a8, attention qkv/o, dense-MLP and lm_head
    kernels are stored int8 with per-output-channel scales; the matmuls
    quantize activations per token and run the int8 MXU dot
    (ops/quant.w8a8_dense). Families with bespoke projection names
    (MLA q_a_proj etc.) keep bf16 — only the unified-layout keys convert.
    """
    from lvllm_tpu.ops import quant

    if config.quantization not in ("w8a8", "w4a8") or \
            getattr(config, "dense_quantization", None) == "off":
        return params
    n_q = 0

    def convert(p):
        nonlocal n_q
        w = p.get("kernel")
        if w is None or getattr(w, "ndim", 0) != 2:
            return
        w = p.pop("kernel")
        if isinstance(w, _ProbeZeros):
            # Dummy shape probe: skip the real per-channel reduction over
            # multi-GB zeros (same trick as the probe init, r03).
            qw = np.zeros(w.shape, np.int8)
            s = np.full((w.shape[1],), 1e-4, np.float32)
        else:
            qw, s = quant.quantize_dense_np(np.asarray(w))
        p["kernel_q"] = jax.numpy.asarray(qw)
        p["scale"] = jax.numpy.asarray(s, jax.numpy.float32)
        n_q += 1

    for layer in params.get("layers", []):
        attn = layer.get("self_attn")
        if attn is not None:
            for key in _DENSE_QUANT_KEYS[:4]:
                if isinstance(attn.get(key), dict):
                    convert(attn[key])
        mlp = layer.get("mlp")
        if isinstance(mlp, dict):
            for key in ("gate_up", "up", "down"):
                if isinstance(mlp.get(key), dict):
                    convert(mlp[key])
    if not config.tie_word_embeddings and \
            isinstance(params.get("lm_head"), dict):
        convert(params["lm_head"])
    if n_q:
        logger.info("dense w8a8: %d kernels -> int8 per-channel", n_q)
    return params


_REAL_DEFAULT_RNG = np.random.default_rng
_REAL_NP_ASARRAY = np.asarray


class _ProbeZeros(np.ndarray):
    """All-zeros marker array for the shape probe. Scalar arithmetic that
    preserves zeroness short-circuits to ``self`` and dtype casts
    materialize fresh (calloc'd) zeros — model init code paths like
    ``rng.standard_normal(shape) * 0.02`` then ``asarray(..., bfloat16)``
    would otherwise stream GBs of zeros through real multiplies and
    ml_dtypes casts (~7 min host time for an 8B tree, profiled)."""

    def __array_ufunc__(self, ufunc, method, *inputs, **kwargs):
        if (method == "__call__" and not kwargs
                and ufunc in (np.multiply, np.divide, np.true_divide,
                              np.add, np.subtract, np.negative, np.positive)
                and all((i is self) or np.isscalar(i) for i in inputs)
                and all(i is self or i == 0 for i in inputs
                        if ufunc in (np.add, np.subtract))):
            return self
        plain = [i.view(np.ndarray) if isinstance(i, _ProbeZeros) else i
                 for i in inputs]
        return getattr(ufunc, method)(*plain, **kwargs)

    def astype(self, dtype, *args, **kwargs):
        return _probe_zeros(self.shape, dtype)


def _probe_zeros(shape, dtype=np.float32):
    return np.zeros(shape, dtype).view(_ProbeZeros)


def _probe_asarray(a, dtype=None, *args, **kwargs):
    if isinstance(a, _ProbeZeros):
        return np.zeros(a.shape, dtype if dtype is not None else a.dtype)
    return _REAL_NP_ASARRAY(a, dtype, *args, **kwargs)


class _ProbeRng:
    """numpy Generator stand-in for the shape probe: big tensors come back
    as zero markers (regenerated on device later), small ones as real
    randoms so routers/norms keep realistic values."""

    BIG_ELEMS = 1 << 20

    def __init__(self, seed=None):
        self._rng = _REAL_DEFAULT_RNG(seed)

    def _n(self, size):
        return int(np.prod(size)) if size is not None else 1

    def standard_normal(self, size=None, dtype=np.float64):
        if self._n(size) >= self.BIG_ELEMS:
            return _probe_zeros(size, dtype)
        return self._rng.standard_normal(size=size, dtype=dtype)

    def uniform(self, low=0.0, high=1.0, size=None):
        if self._n(size) >= self.BIG_ELEMS:
            return np.full(size, (low + high) / 2.0)
        return self._rng.uniform(low, high, size)

    def __getattr__(self, name):
        return getattr(self._rng, name)


def _shape_only_quant_patches():
    """Shape-true, zero-work stand-ins for the host quantizers (the probe
    tree's big leaves are zeros; quantizing them for real would stream tens
    of GB through the host for nothing)."""
    import jax.numpy as jnp

    def q4(w, group_size=128):
        *lead, K, N = w.shape
        return (np.zeros((*lead, K // 2, N), np.int8),
                np.zeros((*lead, K // group_size, N), np.float32))

    def q8(w, group_size=128):
        *lead, K, N = w.shape
        return (np.zeros((*lead, K, N), np.int8),
                np.zeros((*lead, K // group_size, N), np.float32))

    def qf8(w):
        *lead, K, N = w.shape
        return (np.zeros((*lead, K, N), jnp.float8_e4m3fn),
                np.zeros((*lead, N), np.float32))

    def tq(qw, scales):
        from lvllm_tpu.ops.quant import tile_n_for
        E, R, N = qw.shape
        tn = tile_n_for(N)
        if tn == 0:
            return qw, scales
        return (np.zeros((E, N // tn, qw.shape[1], tn), qw.dtype),
                np.zeros((E, N // tn, scales.shape[1], tn), scales.dtype))

    return {"quantize_int4_np": q4, "quantize_int8_np": q8,
            "quantize_fp8_np": qf8, "tile_quant_layout_np": tq}


# jnp constructors routed to numpy during the shape probe so init_params
# performs no device transfers and triggers no eager remote compiles.
_PROBE_JNP_FNS = ("asarray", "array", "zeros", "ones", "full", "arange",
                  "zeros_like", "ones_like", "full_like", "linspace",
                  "concatenate", "stack", "tile", "repeat", "eye", "where")


def init_params_on_device(model, config: ModelConfig, seed: int = 0,
                          host_layers=()):
    """Dummy init with the big tensors generated ON the device.

    Host→device upload of multi-GB dummy weights dominates startup on
    remote-transport backends (the dev tunnel moves ~30 MB/s; an 8B-class
    model would take >10 min). Instead: (1) probe the exact param tree
    host-side with zeros for every large leaf (numpy-only, no device
    traffic), then (2) regenerate all large leaves inside ONE jitted
    program from a PRNG key — a single compile, no bulk transfer. Small
    leaves (norms, routers, biases) keep their real host randoms and
    transfer normally (a few MB).

    ``host_layers``: MoE layer indices whose expert tensors must END UP in
    host RAM (expert-offload streamed tier) — those leaves are left as
    host numpy so the TieredExpertStore takes them without a device
    round-trip. Values stay zeros; streaming cost depends only on bytes.
    """
    import time as _time

    import jax.numpy as jnp

    from lvllm_tpu.ops import quant

    t0 = _time.time()
    saved_jnp = {n: getattr(jnp, n) for n in _PROBE_JNP_FNS}
    saved_q = {n: getattr(quant, n) for n in _shape_only_quant_patches()}
    try:
        np.random.default_rng = _ProbeRng
        np.asarray = _probe_asarray
        for n in _PROBE_JNP_FNS:
            setattr(jnp, n, getattr(np, n))
        jnp.asarray = jnp.array = _probe_asarray
        for n, f in _shape_only_quant_patches().items():
            setattr(quant, n, f)
        params = model.init_params(seed)
        params = quantize_moe_weights(params, config)
    finally:
        np.random.default_rng = _REAL_DEFAULT_RNG
        np.asarray = _REAL_NP_ASARRAY
        for n, f in saved_jnp.items():
            setattr(jnp, n, f)
        for n, f in saved_q.items():
            setattr(quant, n, f)

    # Leaves that must stay host-side (streamed expert tier).
    host_ids = set()
    expert_keys = ("w1", "w2", "w1_q", "w1_scales", "w2_q", "w2_scales")
    for i in host_layers:
        moe = params["layers"][i].get("moe") or {}
        for k in expert_keys:
            if k in moe:
                host_ids.add(id(moe[k]))

    leaves, treedef = jax.tree_util.tree_flatten(params)
    big_idx = [i for i, l in enumerate(leaves)
               if getattr(l, "nbytes", 0) >= (1 << 20)
               and id(l) not in host_ids]

    def _gen(key):
        out = []
        for j, i in enumerate(big_idx):
            l = leaves[i]
            k = jax.random.fold_in(key, j)
            if np.issubdtype(l.dtype, np.integer):
                arr = jax.random.randint(k, l.shape, -7, 8, jnp.int32
                                         ).astype(l.dtype)
            else:
                arr = (jax.random.normal(k, l.shape, jnp.float32) * 0.02
                       ).astype(l.dtype)
            out.append(arr)
        return out

    big_dev = jax.jit(_gen)(jax.random.key(seed))
    for j, i in enumerate(big_idx):
        leaves[i] = big_dev[j]
    # Small leaves: normal (async) transfers — a few MB total.
    for i, l in enumerate(leaves):
        if isinstance(l, np.ndarray) and id(l) not in host_ids:
            leaves[i] = jnp.asarray(l)
    params = jax.tree_util.tree_unflatten(treedef, leaves)
    total = sum(l.nbytes for l in leaves)
    logger.info("device dummy init: %d large leaves generated on device, "
                "%.2f GB total, %.1fs", len(big_idx), total / 1e9,
                _time.time() - t0)
    return params


def load_model(config: ModelConfig, load_format: str = "auto",
               offload_config=None):
    """Build the model and its params.

    load_format: "dummy" → random init; "dummy_device" → random init with
    large tensors generated on device (no bulk host→device upload);
    "auto"/"safetensors" → stream from config.model directory.
    Returns (model, params).
    """
    model = build_model(config)
    if load_format == "dummy_device":
        logger.info("initializing device dummy weights for %s",
                    config.architecture)
        host_layers = ()
        if offload_config is not None and offload_config.enabled:
            resident = offload_config.resident_layer_set()
            host_layers = tuple(
                i for i in range(config.num_hidden_layers)
                if config.is_moe_layer(i) and i not in resident)
        return model, init_params_on_device(model, config, config.seed,
                                            host_layers)
    if load_format == "sharded_state":
        # Fast boot: restore the post-processed (mapped/quantized/tiled)
        # params tree directly (reference: sharded_state_loader.py).
        from lvllm_tpu.model_loader.sharded_state import load_sharded_state
        return model, load_sharded_state(config.model)
    if load_format == "dummy" or config.model == "dummy":
        logger.info("initializing dummy weights for %s", config.architecture)
        params = model.init_params(config.seed)
    elif load_format == "gguf" or (load_format == "auto" and
                                   config.model.endswith(".gguf")):
        from lvllm_tpu.model_loader.gguf import gguf_weight_iterator
        params = model.load_weights(gguf_weight_iterator(config.model))
        logger.info("loaded GGUF weights for %s from %s",
                    config.architecture, config.model)
    else:
        stream = safetensors_weight_iterator(config.model)
        if config.ckpt_quant:
            from lvllm_tpu.model_loader.quant_ckpt import (
                repack_quantized_stream)
            method = config.ckpt_quant["method"]
            logger.info("decoding %s-quantized checkpoint (group_size=%s)",
                        method, config.ckpt_quant.get("group_size"))
            stream = repack_quantized_stream(stream, method)
            if config.quantization is None and config.num_experts:
                # Keep the checkpoint's HBM savings: re-quantize experts
                # into our symmetric INT4 for the fused Pallas GEMM.
                config.quantization = "int4"
                logger.info("ckpt is pre-quantized → MoE experts repacked "
                            "to native int4")
        params = model.load_weights(stream)
        logger.info("loaded weights for %s from %s", config.architecture,
                    config.model)
    params = quantize_moe_weights(params, config)
    return model, params
