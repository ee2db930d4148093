"""Environment-variable config layer.

Counterpart of the reference's ``vllm/envs.py`` (lazy dict of ~500 vars;
the fork adds LVLLM_* hybrid-MoE knobs at ``envs.py:233-240``). We keep the
same pattern — a registry of ``LVLLM_*`` vars with typed lazy parsing —
scoped to what the TPU build needs.
"""

import os
from typing import Any, Callable, Dict

_ENV_REGISTRY: Dict[str, Callable[[], Any]] = {
    # Logging level for the lvllm_tpu root logger.
    "LVLLM_LOGGING_LEVEL": lambda: os.environ.get("LVLLM_LOGGING_LEVEL", "INFO"),
    # Force the jnp reference implementations instead of Pallas kernels
    # (used on CPU test meshes and for debugging).
    "LVLLM_USE_REFERENCE_OPS": lambda: os.environ.get(
        "LVLLM_USE_REFERENCE_OPS", "0") in ("1", "true", "True"),
    # Comma/range list of MoE layers pinned resident in HBM, e.g. "0-3,9".
    # Mirrors the reference's LVLLM_GPU_RESIDENT_MOE_LAYERS (envs.py:233).
    "LVLLM_HBM_RESIDENT_MOE_LAYERS": lambda: os.environ.get(
        "LVLLM_HBM_RESIDENT_MOE_LAYERS", ""),
    # Number of layers of expert weights to prefetch ahead of compute when
    # streaming from host RAM (reference: LVLLM_GPU_PREFETCH_WINDOW).
    "LVLLM_PREFETCH_WINDOW": lambda: int(
        os.environ.get("LVLLM_PREFETCH_WINDOW", "1")),
    # Expert weight compute strategy on load: KEEP | INT4
    # (reference: LVLLM_MOE_USE_WEIGHT, envs.py:236).
    "LVLLM_MOE_USE_WEIGHT": lambda: os.environ.get(
        "LVLLM_MOE_USE_WEIGHT", "KEEP"),
    # Disable the shared-prefix cascade-attention auto-detection
    # (reference: VLLM_DISABLE_CASCADE_ATTN analog).
    "LVLLM_DISABLE_CASCADE": lambda: os.environ.get(
        "LVLLM_DISABLE_CASCADE", "0") in ("1", "true", "True"),
}


def __getattr__(name: str) -> Any:
    if name in _ENV_REGISTRY:
        return _ENV_REGISTRY[name]()
    raise AttributeError(f"module 'lvllm_tpu.envs' has no attribute {name!r}")


def parse_layer_ranges(spec: str) -> set:
    """Parse "0-5,9,12" range syntax into a set of layer indices.

    Mirrors the reference's layer-classification helper syntax
    (``vllm/envs.py:1977+`` is_lk_moe_*_layer helpers).
    """
    out: set = set()
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        if "-" in part:
            lo, hi = part.split("-")
            out.update(range(int(lo), int(hi) + 1))
        else:
            out.add(int(part))
    return out
