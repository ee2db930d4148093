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
    """Quantize-on-load of MoE expert weights (weight-only).

    Counterpart of the fork's FP8→INT4 repack-on-load
    (``layer.py:_process_block_weights_quant:2074``, MoeComputeStrategy
    KEEP|INT4): expert tensors are converted host-side to the configured
    format and the bf16 originals dropped, capping both HBM footprint and
    load-time peak RAM.
    """
    from lvllm_tpu.ops import quant

    method = config.quantization
    if not method:
        return params
    assert method in ("int4", "int8", "fp8"), method
    n_quant = 0
    for layer in params["layers"]:
        moe = layer.get("moe")
        if moe is None or "w1" not in moe:
            continue
        for name in ("w1", "w2"):
            w = np.asarray(moe.pop(name)).astype(np.float32)
            if method == "int4":
                qw, s = quant.quantize_int4_np(w, 128)
            elif method == "int8":
                qw, s = quant.quantize_int8_np(w, 128)
            else:
                qw, s = quant.quantize_fp8_np(w)
            dt = {"int4": "int8", "int8": "int8", "fp8": "float8_e4m3fn"}
            moe[f"{name}_q"] = jax.numpy.asarray(qw)
            moe[f"{name}_scales"] = jax.numpy.asarray(
                s, jax.numpy.bfloat16 if config.dtype == "bfloat16"
                else jax.numpy.float32)
        n_quant += 1
    logger.info("quantized %d MoE layers to %s", n_quant, method)
    return params


def load_model(config: ModelConfig, load_format: str = "auto"):
    """Build the model and its params.

    load_format: "dummy" → random init; "auto"/"safetensors" → stream from
    config.model directory.
    Returns (model, params).
    """
    model = build_model(config)
    if load_format == "dummy" or config.model == "dummy":
        logger.info("initializing dummy weights for %s", config.architecture)
        params = model.init_params(config.seed)
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
