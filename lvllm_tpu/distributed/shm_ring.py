"""Python binding for the native shared-memory broadcast ring.

Counterpart of the reference's ``MessageQueue``
(``device_communicators/shm_broadcast.py:353``): single-writer broadcast to
N same-host readers, used for scheduler→worker / engine-fanout IPC in
multi-process data-parallel serving. The ring itself is C++
(``csrc/shm_ring.cpp``), bound via ctypes; it auto-builds with the repo
Makefile if the .so is missing and a toolchain exists.
"""

import ctypes
import os
import pickle
import subprocess
from typing import Any, Optional

from lvllm_tpu.logger import init_logger

logger = init_logger(__name__)

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_LIB_PATH = os.path.join(_REPO_ROOT, "build", "libshm_ring.so")

_lib: Optional[ctypes.CDLL] = None


def _load_lib() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        logger.info("building libshm_ring.so")
        subprocess.run(["make", "-C", _REPO_ROOT], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(_LIB_PATH)
    lib.shm_ring_create.restype = ctypes.c_void_p
    lib.shm_ring_create.argtypes = [ctypes.c_char_p, ctypes.c_uint64,
                                    ctypes.c_uint64, ctypes.c_uint32]
    lib.shm_ring_open.restype = ctypes.c_void_p
    lib.shm_ring_open.argtypes = [ctypes.c_char_p]
    lib.shm_ring_chunk_size.restype = ctypes.c_uint64
    lib.shm_ring_chunk_size.argtypes = [ctypes.c_void_p]
    lib.shm_ring_write.restype = ctypes.c_int
    lib.shm_ring_write.argtypes = [ctypes.c_void_p,
                                   ctypes.POINTER(ctypes.c_uint8),
                                   ctypes.c_uint32, ctypes.c_int64]
    lib.shm_ring_read.restype = ctypes.c_int64
    lib.shm_ring_read.argtypes = [ctypes.c_void_p, ctypes.c_uint32,
                                  ctypes.POINTER(ctypes.c_uint8),
                                  ctypes.c_uint64, ctypes.c_int64]
    lib.shm_ring_pending.restype = ctypes.c_uint64
    lib.shm_ring_pending.argtypes = [ctypes.c_void_p, ctypes.c_uint32]
    lib.shm_ring_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


class ShmMessageQueue:
    """Single-writer / N-reader broadcast queue over POSIX shm.

    Writer: ``ShmMessageQueue(name, n_readers=2, create=True)``
    Reader: ``ShmMessageQueue(name, reader_id=0)``
    Messages are arbitrary picklable objects (≤ chunk_size serialized).
    """

    def __init__(self, name: str, n_readers: int = 1, create: bool = False,
                 reader_id: Optional[int] = None,
                 chunk_size: int = 1 << 20, n_chunks: int = 16) -> None:
        self._lib = _load_lib()
        self.name = name if name.startswith("/") else f"/{name}"
        self.reader_id = reader_id
        if create:
            self._h = self._lib.shm_ring_create(
                self.name.encode(), chunk_size, n_chunks, n_readers)
        else:
            assert reader_id is not None, "readers must pass reader_id"
            self._h = self._lib.shm_ring_open(self.name.encode())
        if not self._h:
            raise OSError(f"shm ring {'create' if create else 'open'} "
                          f"failed for {self.name}")
        self.chunk_size = self._lib.shm_ring_chunk_size(self._h)
        self._buf = (ctypes.c_uint8 * self.chunk_size)()

    def put(self, obj: Any, timeout: Optional[float] = None) -> None:
        payload = pickle.dumps(obj, protocol=pickle.HIGHEST_PROTOCOL)
        if len(payload) > self.chunk_size:
            raise ValueError(f"message of {len(payload)}B exceeds chunk "
                             f"size {self.chunk_size}")
        arr = (ctypes.c_uint8 * len(payload)).from_buffer_copy(payload)
        t_us = -1 if timeout is None else int(timeout * 1e6)
        rc = self._lib.shm_ring_write(self._h, arr, len(payload), t_us)
        if rc == -2:
            raise TimeoutError("shm ring full")
        if rc != 0:
            raise OSError(f"shm_ring_write rc={rc}")

    def get(self, timeout: Optional[float] = None) -> Any:
        assert self.reader_id is not None, "writer handle cannot read"
        t_us = -1 if timeout is None else int(timeout * 1e6)
        n = self._lib.shm_ring_read(self._h, self.reader_id, self._buf,
                                    self.chunk_size, t_us)
        if n == -2:
            raise TimeoutError("shm ring empty")
        if n < 0:
            raise OSError(f"shm_ring_read rc={n}")
        return pickle.loads(bytes(self._buf[:n]))

    def pending(self, reader_id: Optional[int] = None) -> int:
        rid = self.reader_id if reader_id is None else reader_id
        return self._lib.shm_ring_pending(self._h, rid or 0)

    def close(self) -> None:
        if self._h:
            self._lib.shm_ring_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:  # noqa: BLE001
            pass
