"""RLHF weight push: a trainer streams updated tensors into a serving
engine without restart.

Counterpart of the reference's weight-transfer engines
(``vllm/distributed/weight_transfer/`` — nccl_engine/ipc_engine: the
trainer process pushes parameter updates into the inference engine's
weights in place). TPU reshape: tensors arrive over ZMQ (ipc:// same
host, tcp:// cross host) keyed by *params-tree path* (the
``sharded_state`` flat-key convention, e.g.
``layers/3/self_attn/q_proj/kernel``); the engine applies them with one
``jax.device_put`` per leaf onto the live tree. The in-flight step keeps
its old buffers (functional params), the next step picks up the update —
the same no-restart semantics as the reference's engine.
"""

import pickle
import threading
from typing import Dict, Optional

import numpy as np

from lvllm_tpu.logger import init_logger

logger = init_logger(__name__)


def apply_weight_update(runner, updates: Dict[str, np.ndarray],
                        step_lock=None) -> int:
    """Apply path-keyed tensor updates onto the runner's params tree.
    Paths use '/'-joined keys (list indices as digits). Returns the
    number of leaves applied; unknown paths or shape mismatches raise.

    Two-phase for step consistency: every leaf is first validated and
    materialized on device, then the whole batch is swapped in while
    holding ``step_lock`` (the EngineCore's dispatch lock) — a step
    traced concurrently captures either all-old or all-new leaves, never
    a torn mix (reference weight-transfer engines synchronize the update
    with the forward pass the same way)."""
    import contextlib

    import jax
    import jax.numpy as jnp

    params = runner.params
    prepared = []
    for path, value in updates.items():
        node = params
        keys = path.split("/")
        for kk in keys[:-1]:
            node = node[int(kk)] if kk.isdigit() else node[kk]
        leaf_key = keys[-1]
        leaf_key = int(leaf_key) if leaf_key.isdigit() else leaf_key
        old = node[leaf_key]
        if tuple(old.shape) != tuple(value.shape):
            raise ValueError(
                f"{path}: pushed shape {value.shape} != {old.shape}")
        sharding = getattr(old, "sharding", None)
        arr = jnp.asarray(value, old.dtype)
        if sharding is not None:
            arr = jax.device_put(arr, sharding)
        prepared.append((node, leaf_key, arr))
    lock = step_lock if step_lock is not None else contextlib.nullcontext()
    with lock:
        for node, leaf_key, arr in prepared:
            node[leaf_key] = arr
    return len(prepared)


class WeightPushServer:
    """Engine-side listener: REP socket accepting pickled
    {"tensors": {path: np.ndarray}} messages, applying them to the live
    params and acking with the applied-leaf count."""

    def __init__(self, engine, endpoint: str):
        import zmq

        self.engine = engine
        self.endpoint = endpoint
        self._ctx = zmq.Context()
        self._sock = self._ctx.socket(zmq.REP)
        self._sock.bind(endpoint)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._serve, daemon=True,
                                        name="weight-push")
        self.updates_applied = 0
        self._thread.start()
        logger.info("weight-push listener on %s", endpoint)

    def _serve(self) -> None:
        import zmq
        poller = zmq.Poller()
        poller.register(self._sock, zmq.POLLIN)
        while not self._stop.is_set():
            if not poller.poll(200):
                continue
            msg = pickle.loads(self._sock.recv())
            try:
                core = getattr(self.engine, "core", self.engine)
                n = apply_weight_update(
                    core.runner, msg["tensors"],
                    step_lock=getattr(core, "step_lock", None))
                self.updates_applied += n
                self._sock.send(pickle.dumps({"ok": True, "applied": n}))
            except Exception as e:  # noqa: BLE001
                self._sock.send(pickle.dumps({"ok": False,
                                              "error": repr(e)}))

    def close(self) -> None:
        self._stop.set()
        self._thread.join(timeout=2)
        self._sock.close(0)
        self._ctx.term()


class WeightPushClient:
    """Trainer-side pusher (the nccl_engine analog's send half)."""

    def __init__(self, endpoint: str, timeout_s: float = 60.0):
        import zmq

        self._ctx = zmq.Context()
        self._sock = self._ctx.socket(zmq.REQ)
        self._sock.setsockopt(zmq.RCVTIMEO, int(timeout_s * 1000))
        self._sock.connect(endpoint)

    def push(self, tensors: Dict[str, np.ndarray]) -> int:
        """Push one batch of path-keyed tensors; returns applied count."""
        self._sock.send(pickle.dumps({"tensors": {
            k: np.asarray(v) for k, v in tensors.items()}}))
        reply = pickle.loads(self._sock.recv())
        if not reply.get("ok"):
            raise RuntimeError(f"weight push rejected: {reply.get('error')}")
        return reply["applied"]

    def close(self) -> None:
        self._sock.close(0)
        self._ctx.term()
