"""HBM + host-RAM tiered expert store with prefetch-ahead streaming.

The TPU-native replacement for the reference fork's CPU(NUMA)+GPU hybrid
MoE (lk_moe, SURVEY.md §2.11) and upstream's PrefetchOffloader
(``model_executor/offloader/prefetch.py:127`` — layer-group weights in
pinned CPU RAM, forward hooks prefetching the next group into a rotating
``StaticBufferPool`` on a side stream):

- *Resident* MoE layers keep expert weights in HBM
  (``LVLLM_GPU_RESIDENT_MOE_LAYERS`` range syntax → OffloadConfig).
- *Streamed* layers keep expert weights in host RAM (numpy); a background
  thread ``jax.device_put``s the next ``prefetch_window`` layers while the
  current layer computes on device (JAX async dispatch gives the overlap
  the reference builds with CUDA side streams).
- At most ``num_hbm_buffers + in-flight`` streamed groups hold HBM at once;
  refs are dropped as soon as the consuming stage is dispatched (the arrays
  stay alive inside the in-flight computation, then free).

The runner consumes this via per-layer ``get()`` calls between jitted
stage dispatches — transfers never appear inside a jitted program.
"""

import threading
from concurrent.futures import Future, ThreadPoolExecutor
from typing import Any, Dict, List, Optional, Set

import jax
import numpy as np

from lvllm_tpu.config import OffloadConfig
from lvllm_tpu.logger import init_logger

logger = init_logger(__name__)


class TieredExpertStore:
    """Owns the MoE expert tensors of every layer, split into an HBM tier
    and a host tier with prefetch streaming."""

    def __init__(
        self,
        offload_config: OffloadConfig,
        device: Optional[jax.Device] = None,
        sharding=None,
    ) -> None:
        self.config = offload_config
        self.device = device or jax.devices()[0]
        self.sharding = sharding
        self.resident_layers: Set[int] = offload_config.resident_layer_set()
        # layer -> pytree of device arrays (resident tier).
        self._hbm: Dict[int, Any] = {}
        # layer -> pytree of host numpy arrays (host tier).
        self._host: Dict[int, Any] = {}
        # layer -> Future[pytree of device arrays] (in-flight / arrived).
        self._inflight: Dict[int, Future] = {}
        self._lock = threading.Lock()
        self._executor = ThreadPoolExecutor(max_workers=1,
                                            thread_name_prefix="h2d-prefetch")
        self.stats = {"prefetch_hits": 0, "prefetch_misses": 0,
                      "bytes_streamed": 0}

    # ---- registration (at load time) --------------------------------------

    def register_layer(self, layer_idx: int, expert_tree: Any) -> None:
        """Take ownership of one MoE layer's expert weights.

        Resident layers are placed in HBM now; streamed layers are pulled to
        host numpy (freeing any device copy — the analog of the fork's
        ``clean_weights_after_loading``).
        """
        if self.is_resident(layer_idx):
            self._hbm[layer_idx] = jax.tree.map(self._to_device, expert_tree)
        else:
            self._host[layer_idx] = jax.tree.map(
                lambda a: np.asarray(a), expert_tree)

    def is_resident(self, layer_idx: int) -> bool:
        return layer_idx in self.resident_layers

    @property
    def streamed_layers(self) -> List[int]:
        return sorted(self._host)

    def host_bytes(self) -> int:
        total = 0
        for tree in self._host.values():
            total += sum(a.nbytes for a in jax.tree.leaves(tree))
        return total

    def _to_device(self, a):
        if self.sharding is not None:
            return jax.device_put(a, self.sharding)
        return jax.device_put(a, self.device)

    # ---- streaming ---------------------------------------------------------

    def prefetch(self, layer_idx: int) -> None:
        """Begin async host→HBM transfer of one streamed layer (idempotent).
        Analog of the fork's ``moe_prefetch`` (moe_runner.py:1124)."""
        if layer_idx in self._hbm or layer_idx not in self._host:
            return
        with self._lock:
            if layer_idx in self._inflight:
                return
            host_tree = self._host[layer_idx]
            fut = self._executor.submit(
                lambda: jax.tree.map(self._to_device, host_tree))
            self._inflight[layer_idx] = fut

    def get(self, layer_idx: int) -> Any:
        """Device weights for a layer; waits on the prefetch if needed.
        Analog of ``moe_wait_prefetch`` (moe_runner.py:1090)."""
        if layer_idx in self._hbm:
            return self._hbm[layer_idx]
        with self._lock:
            fut = self._inflight.pop(layer_idx, None)
        if fut is None:
            self.stats["prefetch_misses"] += 1
            host_tree = self._host[layer_idx]
            tree = jax.tree.map(self._to_device, host_tree)
        else:
            self.stats["prefetch_hits"] += 1
            tree = fut.result()
        self.stats["bytes_streamed"] += sum(
            a.nbytes for a in jax.tree.leaves(self._host[layer_idx]))
        return tree

    def advance(self, current_layer: int, moe_layers: List[int]) -> None:
        """Kick prefetches for the next ``prefetch_window`` streamed MoE
        layers after ``current_layer`` (wrapping to the next step's start)."""
        window = self.config.prefetch_window
        upcoming = [l for l in moe_layers if l > current_layer] + moe_layers
        started = 0
        for l in upcoming:
            if started >= window:
                break
            if not self.is_resident(l) and l in self._host:
                self.prefetch(l)
                started += 1

    def shutdown(self) -> None:
        self._executor.shutdown(wait=False)
