"""Sharded-state checkpointing: save/load the POST-PROCESSED params tree.

Counterpart of the reference's sharded_state loader
(``model_executor/model_loader/sharded_state_loader.py``): after the
expensive load pipeline (HF stream → name mapping → quantize-on-load →
column-tile repack), the finished params pytree is serialized so later
boots skip all of it — a direct leaf-for-leaf restore. Leaves are stored
in one .npz per top-level group plus a JSON treedef manifest; quantized
dtypes (int8 packs, fp8) round-trip exactly.

    save_sharded_state(params, "/ckpt/fast")        # once
    LLM(model=..., load_format="sharded_state")     # fast boots
"""

import json
import os
from typing import Any, Dict, Tuple

import numpy as np

from lvllm_tpu.logger import init_logger

logger = init_logger(__name__)

MANIFEST = "lvllm_sharded_state.json"


def _flatten(tree: Any, prefix: str = "") -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = tree
    return out


def _treedef(tree: Any) -> Any:
    if isinstance(tree, dict):
        return {"__kind__": "dict",
                "items": {k: _treedef(v) for k, v in tree.items()}}
    if isinstance(tree, (list, tuple)):
        return {"__kind__": "list",
                "items": [_treedef(v) for v in tree]}
    return {"__kind__": "leaf"}


def _rebuild(defn: Any, leaves: Dict[str, Any], prefix: str = "") -> Any:
    if defn["__kind__"] == "dict":
        return {k: _rebuild(v, leaves, f"{prefix}{k}/")
                for k, v in defn["items"].items()}
    if defn["__kind__"] == "list":
        return [_rebuild(v, leaves, f"{prefix}{i}/")
                for i, v in enumerate(defn["items"])]
    return leaves[prefix[:-1]]


def save_sharded_state(params: Any, out_dir: str,
                       shard_rank: int = 0) -> None:
    """Serialize a params pytree. ``shard_rank`` names the file set so a
    multi-host deployment saves one state per host."""
    import jax
    import ml_dtypes  # noqa: F401  (registers bf16/fp8 numpy dtypes)

    os.makedirs(out_dir, exist_ok=True)
    flat = _flatten(params)
    arrays = {}
    dtypes = {}
    for name, leaf in flat.items():
        a = np.asarray(jax.device_get(leaf))
        dtypes[name] = str(a.dtype)
        if a.dtype == np.dtype("bfloat16") or "float8" in str(a.dtype):
            # npz can't store ml_dtypes directly across versions; bitcast.
            a = a.view(np.uint8)
        arrays[name] = a
    path = os.path.join(out_dir, f"state_rank{shard_rank}.npz")
    np.savez(path, **arrays)
    with open(os.path.join(out_dir, MANIFEST), "w") as f:
        json.dump({"treedef": _treedef(params), "dtypes": dtypes,
                   "ranks": max(shard_rank + 1, 1)}, f)
    logger.info("sharded state saved: %d leaves -> %s", len(arrays), path)


def load_sharded_state(model_dir: str, shard_rank: int = 0,
                       dtype=None) -> Any:
    """Restore the params pytree saved by :func:`save_sharded_state`."""
    import jax.numpy as jnp
    import ml_dtypes

    with open(os.path.join(model_dir, MANIFEST)) as f:
        manifest = json.load(f)
    npz = np.load(os.path.join(model_dir, f"state_rank{shard_rank}.npz"))
    leaves = {}
    for name in npz.files:
        a = npz[name]
        want = manifest["dtypes"][name]
        if a.dtype == np.uint8 and want != "uint8":
            a = a.view(np.dtype(want))
        leaves[name] = jnp.asarray(a)
    logger.info("sharded state restored: %d leaves", len(leaves))
    return _rebuild(manifest["treedef"], leaves)


def has_sharded_state(model_dir: str) -> bool:
    return os.path.exists(os.path.join(model_dir, MANIFEST))
