"""Plugin system: entry-point discovery of out-of-tree extensions.

Counterpart of the reference's ``vllm/plugins/`` (load_general_plugins,
docs/design/plugin_system.md): packages expose entry points in group
``lvllm_tpu.plugins`` — each entry point resolves to a callable invoked
once at engine startup (it may register models via
``lvllm_tpu.models.registry.register_model``, tool/reasoning parsers, or
mutate configs). ``lvllm_tpu.models`` entries resolve directly to model
classes and are registered under their entry-point name.

Environment: ``LVLLM_PLUGINS`` — comma-separated allowlist of plugin names
(unset = load all; empty string = load none), mirroring VLLM_PLUGINS.
"""

import os
from typing import Dict, Optional

from lvllm_tpu.logger import init_logger

logger = init_logger(__name__)

PLUGIN_GROUP = "lvllm_tpu.plugins"
MODEL_GROUP = "lvllm_tpu.models"

_loaded = False


def _allowed() -> Optional[set]:
    env = os.environ.get("LVLLM_PLUGINS")
    if env is None:
        return None       # all
    return {p.strip() for p in env.split(",") if p.strip()}


def _iter_entry_points(group: str):
    from importlib.metadata import entry_points
    try:
        return entry_points(group=group)
    except TypeError:      # py<3.10 dict API
        return entry_points().get(group, [])


def load_plugins(force: bool = False) -> Dict[str, object]:
    """Discover and run plugins; idempotent per process."""
    global _loaded
    if _loaded and not force:
        return {}
    _loaded = True
    allowed = _allowed()
    loaded: Dict[str, object] = {}

    for ep in _iter_entry_points(MODEL_GROUP):
        if allowed is not None and ep.name not in allowed:
            continue
        try:
            from lvllm_tpu.models.registry import _REGISTRY
            _REGISTRY[ep.name] = ep.load()
            loaded[ep.name] = _REGISTRY[ep.name]
            logger.info("registered plugin model %s", ep.name)
        except Exception as e:  # plugin bugs must not kill the engine
            logger.warning("model plugin %s failed to load: %s", ep.name, e)

    for ep in _iter_entry_points(PLUGIN_GROUP):
        if allowed is not None and ep.name not in allowed:
            continue
        try:
            fn = ep.load()
            fn()
            loaded[ep.name] = fn
            logger.info("loaded plugin %s", ep.name)
        except Exception as e:
            logger.warning("plugin %s failed to load: %s", ep.name, e)
    return loaded
