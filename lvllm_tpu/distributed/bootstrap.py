"""TCP-store bootstrap for stateless cross-host process groups.

Counterpart of the reference's stateless group initialization
(``vllm/distributed/utils.py`` StatelessProcessGroup over a TCPStore):
engines on different hosts rendezvous through one tiny key-value server —
no torch.distributed, no MPI. Used to bootstrap cross-host DP groups and
standby-engine registration; in-slice collectives remain XLA/ICI.

Protocol (newline-framed, length-prefixed values):
    SET <key> <nbytes>\\n<bytes>   -> OK
    GET <key>                      -> VAL <nbytes>\\n<bytes> | MISS
    WAIT <key> <timeout_ms>        -> VAL ... | MISS (on timeout)
    ADD <key> <delta>              -> VAL <int>   (atomic counter)
"""

import socket
import socketserver
import threading
import time
from typing import Dict, List, Optional, Tuple

from lvllm_tpu.logger import init_logger

logger = init_logger(__name__)


class _Store:
    def __init__(self):
        self.kv: Dict[str, bytes] = {}
        self.counters: Dict[str, int] = {}
        self.cond = threading.Condition()

    def set(self, key: str, val: bytes) -> None:
        with self.cond:
            self.kv[key] = val
            self.cond.notify_all()

    def get(self, key: str) -> Optional[bytes]:
        with self.cond:
            return self.kv.get(key)

    def wait(self, key: str, timeout_s: float) -> Optional[bytes]:
        deadline = time.time() + timeout_s
        with self.cond:
            while key not in self.kv:
                left = deadline - time.time()
                if left <= 0:
                    return None
                self.cond.wait(left)
            return self.kv[key]

    def add(self, key: str, delta: int) -> int:
        with self.cond:
            self.counters[key] = self.counters.get(key, 0) + delta
            return self.counters[key]


class TCPStoreServer:
    """One per group (rank-0 host). Threaded; safe for many clients."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        store = self._store = _Store()

        class Handler(socketserver.StreamRequestHandler):
            def handle(self):
                while True:
                    line = self.rfile.readline()
                    if not line:
                        return
                    parts = line.decode().strip().split(" ")
                    cmd = parts[0].upper()
                    if cmd == "SET":
                        key, n = parts[1], int(parts[2])
                        val = self.rfile.read(n)
                        store.set(key, val)
                        self.wfile.write(b"OK\n")
                    elif cmd in ("GET", "WAIT"):
                        key = parts[1]
                        if cmd == "WAIT":
                            val = store.wait(key, int(parts[2]) / 1000.0)
                        else:
                            val = store.get(key)
                        if val is None:
                            self.wfile.write(b"MISS\n")
                        else:
                            self.wfile.write(
                                f"VAL {len(val)}\n".encode() + val)
                    elif cmd == "ADD":
                        v = store.add(parts[1], int(parts[2]))
                        self.wfile.write(f"VAL {v}\n".encode())
                    else:
                        self.wfile.write(b"ERR\n")
                    self.wfile.flush()

        class Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._server = Server((host, port), Handler)
        self.addr = self._server.server_address
        self._thread = threading.Thread(target=self._server.serve_forever,
                                        daemon=True)
        self._thread.start()

    def close(self) -> None:
        self._server.shutdown()
        self._server.server_close()


class TCPStoreClient:
    def __init__(self, host: str, port: int, timeout_s: float = 30.0):
        self._sock = socket.create_connection((host, port),
                                              timeout=timeout_s)
        self._f = self._sock.makefile("rwb")

    def _read_val(self) -> Optional[bytes]:
        head = self._f.readline().decode().strip()
        if head == "MISS":
            return None
        assert head.startswith("VAL "), head
        return self._f.read(int(head.split(" ")[1]))

    def set(self, key: str, val: bytes) -> None:
        self._f.write(f"SET {key} {len(val)}\n".encode() + val)
        self._f.flush()
        assert self._f.readline().strip() == b"OK"

    def get(self, key: str) -> Optional[bytes]:
        self._f.write(f"GET {key}\n".encode())
        self._f.flush()
        return self._read_val()

    def wait(self, key: str, timeout_s: float = 30.0) -> bytes:
        self._f.write(f"WAIT {key} {int(timeout_s * 1000)}\n".encode())
        self._f.flush()
        val = self._read_val()
        if val is None:
            raise TimeoutError(f"store key {key} not set in {timeout_s}s")
        return val

    def add(self, key: str, delta: int = 1) -> int:
        self._f.write(f"ADD {key} {delta}\n".encode())
        self._f.flush()
        head = self._f.readline().decode().strip()
        return int(head.split(" ")[1])

    def close(self) -> None:
        try:
            self._sock.close()
        except OSError:
            pass


def rendezvous(store: TCPStoreClient, group: str, rank: int,
               world_size: int, payload: bytes,
               timeout_s: float = 60.0) -> List[bytes]:
    """Register this rank's payload (e.g. pickled (host, port)) and block
    until every peer has registered. Returns all payloads rank-ordered."""
    store.set(f"{group}/rank{rank}", payload)
    n = store.add(f"{group}/count", 1)
    logger.info("rendezvous %s: rank %d registered (%d/%d)", group, rank,
                n, world_size)
    return [store.wait(f"{group}/rank{r}", timeout_s)
            for r in range(world_size)]
