"""Structured logging for lvllm_tpu.

Counterpart of the reference's ``vllm/logger.py``: one configurable root
logger, per-module children, env-controlled level/format.
"""

import logging
import os
import sys

_FORMAT = (
    "%(levelname)s %(asctime)s.%(msecs)03d [%(name)s:%(lineno)d] %(message)s"
)
_DATE_FORMAT = "%m-%d %H:%M:%S"

_root_configured = False


def _configure_root() -> None:
    global _root_configured
    if _root_configured:
        return
    root = logging.getLogger("lvllm_tpu")
    level_name = os.environ.get("LVLLM_LOGGING_LEVEL", "INFO").upper()
    root.setLevel(getattr(logging, level_name, logging.INFO))
    if not root.handlers:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(logging.Formatter(_FORMAT, _DATE_FORMAT))
        root.addHandler(handler)
    root.propagate = False
    _root_configured = True


def init_logger(name: str) -> logging.Logger:
    """Return a child logger under the ``lvllm_tpu`` root."""
    _configure_root()
    if name.startswith("lvllm_tpu"):
        return logging.getLogger(name)
    return logging.getLogger(f"lvllm_tpu.{name}")
