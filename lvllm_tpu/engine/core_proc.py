"""EngineCoreProc — the engine core in its own process behind ZMQ.

Counterpart of the reference's ``vllm/v1/engine/core.py EngineCoreProc``
(``run_busy_loop``) + ``core_client.py EngineCoreClient``: the frontend
(API server / tokenizer process) talks to the engine over a ZMQ socket
pair instead of sharing a process, so Python-side request handling never
blocks the device step loop, and the frontend can live on another host.

Wire format: pickled tuples (in-cluster transport, same trust model as
the reference's msgpack channel). Input PULL socket receives
``(kind, payload)``; output PUSH emits ``(kind, payload)``:

  in : ("add", (request_id, prompt_token_ids, SamplingParams, mm_data))
       — large mm tensors travel as ShmHandles (zero-copy shared-memory
       object store, distributed/shm_object_store.py; reference:
       SingleWriterShmObjectStorage for multimodal input transfer)
       ("abort", request_id) · ("pause", mode) · ("resume", None)
       ("stats", None) · ("shutdown", None)
  out: ("ready", None) · ("finished", RequestOutput)
       ("stats", dict) · ("stopped", None)

The DP group (``engine/dp.py``) is the multi-rank composition of this
shape; this module is the single-engine remote-core used by frontends.
"""

import pickle
import time
from typing import List, Optional

from lvllm_tpu.config import EngineConfig
from lvllm_tpu.logger import init_logger

logger = init_logger(__name__)


def run_engine_core_proc(config: EngineConfig, input_addr: str,
                         output_addr: str, load_format: str = "auto",
                         force_cpu: bool = False) -> None:
    """Process target: busy loop stepping the engine between input drains
    (reference: EngineCoreProc.run_busy_loop)."""
    if force_cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import zmq

    from lvllm_tpu.engine.llm_engine import LLMEngine

    ctx = zmq.Context.instance()
    sock_in = ctx.socket(zmq.PULL)
    sock_in.bind(input_addr)
    sock_out = ctx.socket(zmq.PUSH)
    sock_out.bind(output_addr)

    engine = LLMEngine(config, load_format=load_format)
    sock_out.send(pickle.dumps(("ready", None)))

    def handle(kind, payload) -> bool:
        if kind == "add":
            from lvllm_tpu.distributed.shm_object_store import \
                unpack_mm_data
            rid, prompt, sp = payload[:3]
            mm = unpack_mm_data(payload[3]) if len(payload) > 3 and \
                payload[3] else None
            engine.add_request(rid, prompt, sp, mm_data=mm)
        elif kind == "abort":
            engine.abort_request([payload])
        elif kind == "pause":
            engine.core.pause(payload or "drain")
        elif kind == "resume":
            engine.core.resume()
        elif kind == "stats":
            sock_out.send(pickle.dumps(("stats", engine.core.get_stats())))
        elif kind == "shutdown":
            sock_out.send(pickle.dumps(("stopped", None)))
            return False
        return True

    running = True
    while running:
        # Drain pending inputs without blocking the step loop.
        while running:
            try:
                msg = sock_in.recv(zmq.NOBLOCK)
            except zmq.Again:
                break
            running = handle(*pickle.loads(msg))
        if not running:
            break
        if engine.has_unfinished_requests():
            for out in engine.step():
                if out.finished:
                    sock_out.send(pickle.dumps(("finished", out)))
        else:
            # Idle: short blocking wait for new work.
            if sock_in.poll(50):
                running = handle(*pickle.loads(sock_in.recv()))


class EngineCoreClient:
    """Frontend handle to a remote EngineCoreProc (reference:
    core_client.py SyncMPClient shape, ZMQ transport)."""

    def __init__(self, config: EngineConfig, load_format: str = "auto",
                 addr_prefix: Optional[str] = None,
                 force_cpu: bool = False):
        import multiprocessing as mp

        import zmq

        self._pending: List = []
        prefix = addr_prefix or f"ipc:///tmp/lvllm_core_{id(self):x}"
        self.input_addr = f"{prefix}_in"
        self.output_addr = f"{prefix}_out"
        ctx = mp.get_context("spawn")
        self.proc = ctx.Process(
            target=run_engine_core_proc,
            args=(config, self.input_addr, self.output_addr, load_format,
                  force_cpu),
            daemon=True)
        self.proc.start()
        zctx = zmq.Context.instance()
        self._sock_in = zctx.socket(zmq.PUSH)
        self._sock_in.connect(self.input_addr)
        self._sock_out = zctx.socket(zmq.PULL)
        self._sock_out.connect(self.output_addr)
        kind, _ = self._recv(timeout_s=300.0)
        assert kind == "ready", kind

    def _send(self, kind: str, payload=None) -> None:
        self._sock_in.send(pickle.dumps((kind, payload)))

    def _recv(self, timeout_s: float = 60.0):
        if not self._sock_out.poll(int(timeout_s * 1000)):
            raise TimeoutError("engine core proc did not respond")
        return pickle.loads(self._sock_out.recv())

    # ---- API mirrored from EngineCore ----------------------------------

    def add_request(self, request_id: str, prompt, sampling_params,
                    mm_data=None) -> None:
        if mm_data:
            from lvllm_tpu.distributed.shm_object_store import (
                ShmObjectStore, pack_mm_data)
            if not hasattr(self, "_obj_store"):
                self._obj_store = ShmObjectStore()
            mm_data = pack_mm_data(self._obj_store, mm_data)
        self._send("add", (request_id, prompt, sampling_params, mm_data))

    def abort_request(self, request_id: str) -> None:
        self._send("abort", request_id)

    def pause(self, mode: str = "drain") -> None:
        self._send("pause", mode)

    def resume(self) -> None:
        self._send("resume")

    def get_stats(self, timeout_s: float = 60.0) -> dict:
        self._send("stats")
        deadline = time.time() + timeout_s
        while time.time() < deadline:
            kind, payload = self._recv(timeout_s)
            if kind == "stats":
                return payload
            self._pending.append((kind, payload))
        raise TimeoutError("no stats reply")

    def collect_finished(self, n: int, timeout_s: float = 120.0) -> List:
        """Block until n finished RequestOutputs arrive."""
        outs = []
        while self._pending and len(outs) < n:
            kind, payload = self._pending.pop(0)
            if kind == "finished":
                outs.append(payload)
        deadline = time.time() + timeout_s
        while len(outs) < n and time.time() < deadline:
            kind, payload = self._recv(timeout_s)
            if kind == "finished":
                outs.append(payload)
        if len(outs) < n:
            raise TimeoutError(f"got {len(outs)}/{n} outputs")
        return outs

    def shutdown(self) -> None:
        try:
            self._send("shutdown")
            self.proc.join(timeout=10)
        finally:
            if self.proc.is_alive():
                self.proc.terminate()
