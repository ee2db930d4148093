"""Shared-memory object store for zero-copy tensor IPC.

Counterpart of the reference's shm object storage
(``vllm/distributed/device_communicators/shm_object_storage.py`` — the
SingleWriterShmObjectStorage backing multimodal input transfer between
API processes and the engine core): large numpy tensors are placed in
POSIX shared memory once; only a small handle (name, shape, dtype)
crosses the ZMQ/pickle wire, and the consumer maps the same pages.

    store = ShmObjectStore()                 # producer
    handle = store.put(np_array)
    ... send handle over IPC ...
    arr = ShmObjectStore.get(handle)         # consumer (zero-copy view)
    ShmObjectStore.release(handle)           # consumer frees the segment
"""

import uuid
from dataclasses import dataclass
from multiprocessing import shared_memory
from typing import Dict, Tuple

import numpy as np

from lvllm_tpu.logger import init_logger

logger = init_logger(__name__)


@dataclass(frozen=True)
class ShmHandle:
    name: str
    shape: Tuple[int, ...]
    dtype: str

    @property
    def nbytes(self) -> int:
        return int(np.prod(self.shape)) * np.dtype(self.dtype).itemsize


class ShmObjectStore:
    """Producer-side registry of live segments (so close() can clean up
    anything the consumer never released)."""

    def __init__(self, prefix: str = "lvllm_obj"):
        self.prefix = prefix
        self._live: Dict[str, shared_memory.SharedMemory] = {}

    def put(self, arr: np.ndarray) -> ShmHandle:
        arr = np.ascontiguousarray(arr)
        name = f"{self.prefix}_{uuid.uuid4().hex[:16]}"
        seg = shared_memory.SharedMemory(name=name, create=True,
                                         size=max(arr.nbytes, 1))
        view = np.ndarray(arr.shape, arr.dtype, buffer=seg.buf)
        view[...] = arr
        self._live[name] = seg
        return ShmHandle(name=name, shape=tuple(arr.shape),
                         dtype=str(arr.dtype))

    @staticmethod
    def get(handle: ShmHandle, copy: bool = False) -> np.ndarray:
        seg = shared_memory.SharedMemory(name=handle.name)
        view = np.ndarray(handle.shape, np.dtype(handle.dtype),
                          buffer=seg.buf)
        if copy:
            out = view.copy()
            seg.close()
            return out
        # Keep the mapping alive with the array.
        out = view
        out._shm_segment = seg  # type: ignore[attr-defined]
        return out

    @staticmethod
    def release(handle: ShmHandle) -> None:
        """Consumer-side unlink: frees the segment for everyone once the
        last mapping closes."""
        try:
            seg = shared_memory.SharedMemory(name=handle.name)
            seg.close()
            seg.unlink()
        except FileNotFoundError:
            pass

    def drop(self, handle: ShmHandle) -> None:
        """Producer-side free for handles the consumer never claimed."""
        seg = self._live.pop(handle.name, None)
        if seg is not None:
            seg.close()
            try:
                seg.unlink()
            except FileNotFoundError:
                pass

    def close(self) -> None:
        for name, seg in list(self._live.items()):
            seg.close()
            try:
                seg.unlink()
            except FileNotFoundError:
                pass
        self._live.clear()


def pack_mm_data(store: ShmObjectStore, mm_data: dict,
                 min_bytes: int = 1 << 16) -> dict:
    """Replace large ndarray values with ShmHandles (small ones pickle
    fine). The consumer calls :func:`unpack_mm_data`."""
    if not mm_data:
        return mm_data
    out = {}
    for k, v in mm_data.items():
        a = np.asarray(v)
        if a.nbytes >= min_bytes:
            out[k] = store.put(a)
        else:
            out[k] = v
    return out


def unpack_mm_data(mm_data: dict) -> dict:
    if not mm_data:
        return mm_data
    out = {}
    for k, v in mm_data.items():
        if isinstance(v, ShmHandle):
            out[k] = ShmObjectStore.get(v, copy=True)
            ShmObjectStore.release(v)
        else:
            out[k] = v
    return out
