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


def load_model(config: ModelConfig, load_format: str = "auto"):
    """Build the model and its params.

    load_format: "dummy" → random init; "auto"/"safetensors" → stream from
    config.model directory.
    Returns (model, params).
    """
    model = build_model(config)
    if load_format == "dummy" or config.model == "dummy":
        logger.info("initializing dummy weights for %s", config.architecture)
        params = model.init_params(jax.random.key(config.seed))
        return model, params
    params = model.load_weights(safetensors_weight_iterator(config.model))
    logger.info("loaded weights for %s from %s", config.architecture,
                config.model)
    return model, params
