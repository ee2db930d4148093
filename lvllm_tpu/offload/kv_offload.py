"""KV-cache offload to host RAM.

Counterpart of the reference's CPU KV offloading (scheduler-side
``CPUOffloadingManager`` ``v1/kv_offload/cpu/manager.py:25`` with LRU
policy + worker-side GPU↔CPU transfer engine ``kv_offload/worker/
cpu_gpu.py``, wired via ``OffloadingConnector``): finished requests' full
KV pages are copied HBM→host keyed by block hash; a later request whose
prefix misses the device cache reloads those pages host→HBM instead of
recomputing prefill.

TPU reshape: transfers are one jitted gather (``kv[:, ids]``) per layer
fetched to numpy, and one donated scatter per layer on load — block-id
lists are padded to power-of-two buckets aimed at the null block so each
direction compiles O(log n) executables, not one per length.
"""

from collections import OrderedDict
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from lvllm_tpu.logger import init_logger

logger = init_logger(__name__)


class KVOffloadManager:
    """Deviceless LRU index of host-resident KV blocks (scheduler side)."""

    def __init__(self, num_blocks: int):
        self.capacity = num_blocks
        # block_hash -> host slot; order = LRU (oldest first).
        self.index: "OrderedDict[bytes, int]" = OrderedDict()
        self.free: List[int] = list(range(num_blocks - 1, -1, -1))
        self.stores = 0
        self.hits = 0

    def lookup(self, hashes: Sequence) -> int:
        """Contiguous-prefix hit count; touches entries (MRU)."""
        n = 0
        for h in hashes:
            key = self._key(h)
            if key not in self.index:
                break
            self.index.move_to_end(key)
            n += 1
        self.hits += n
        return n

    def get_slots(self, hashes: Sequence) -> List[int]:
        return [self.index[self._key(h)] for h in hashes]

    def invalidate_slots(self, slots: Sequence[int]) -> int:
        """Drop index entries backed by ``slots`` (KV-load-failure
        recovery): the slots return to the free list and will never be
        served as hits again."""
        bad = set(slots)
        dead = [h for h, s in self.index.items() if s in bad]
        for h in dead:
            self.free.append(self.index.pop(h))
        return len(dead)

    def prepare_store(self, hashes: Sequence) -> Tuple[List, List[int]]:
        """Pick slots for hashes not yet stored (evicting LRU). Returns
        (hashes_to_store, slots)."""
        todo, slots = [], []
        for h in hashes:
            key = self._key(h)
            if key in self.index:
                self.index.move_to_end(key)
                continue
            if not self.free:
                if not self.index:
                    break
                _, slot = self.index.popitem(last=False)  # evict LRU
                self.free.append(slot)
            slots.append(self.free.pop())
            self.index[key] = slots[-1]
            todo.append(h)
        self.stores += len(todo)
        return todo, slots

    @staticmethod
    def _key(h):
        # BlockHash is a frozen dataclass: hashable, content-equal.
        return h

    def stats(self) -> dict:
        return {"stored_blocks": len(self.index), "capacity": self.capacity,
                "stores": self.stores, "hits": self.hits}


def _bucket(n: int) -> int:
    b = 1
    while b < n:
        b *= 2
    return b


class KVOffloadWorker:
    """Device↔host page mover (worker side). Owns the host buffers."""

    def __init__(self, num_host_blocks: int, num_layers: int,
                 page_shape: Tuple[int, ...], dtype):
        import jax

        # Host tier: per layer [slots, 2, BS, H, D].
        self._host = [np.zeros((num_host_blocks, 2) + page_shape,
                               dtype=np.dtype(dtype))
                      for _ in range(num_layers)]
        self._gather = jax.jit(lambda kv, ids: kv[:, ids])
        self._scatter = jax.jit(
            lambda kv, ids, pages: kv.at[:, ids].set(pages),
            donate_argnums=(0,))

    def host_bytes(self) -> int:
        return sum(b.nbytes for b in self._host)

    def store(self, kv_caches, block_ids: List[int],
              host_slots: List[int]) -> None:
        """Copy device pages (by block id) into host slots, all layers."""
        import jax.numpy as jnp
        n = len(block_ids)
        if n == 0:
            return
        B = _bucket(n)
        ids = np.zeros(B, np.int32)
        ids[:n] = block_ids          # pads gather the null block (harmless)
        ids_dev = jnp.asarray(ids)
        for li, kv in enumerate(kv_caches):
            pages = np.asarray(self._gather(kv, ids_dev))  # [2, B, ...]
            self._host[li][host_slots] = np.moveaxis(pages, 1, 0)[:n]

    def load(self, kv_caches, host_slots: List[int],
             block_ids: List[int]) -> list:
        """Copy host slots into device pages (by block id), all layers.
        Returns the updated kv_caches list (scatter donates)."""
        import jax.numpy as jnp
        n = len(block_ids)
        if n == 0:
            return kv_caches
        B = _bucket(n)
        ids = np.zeros(B, np.int32)   # pads scatter into the null block
        ids[:n] = block_ids
        ids_dev = jnp.asarray(ids)
        out = []
        for li, kv in enumerate(kv_caches):
            pages = np.zeros((2, B) + self._host[li].shape[2:],
                             self._host[li].dtype)
            pages[:, :n] = np.moveaxis(self._host[li][host_slots], 1, 0)
            out.append(self._scatter(kv, ids_dev, jnp.asarray(
                pages, dtype=kv.dtype)))
        return out
