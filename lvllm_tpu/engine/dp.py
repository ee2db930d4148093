"""Data-parallel engine replicas + coordinator.

Counterpart of the reference's DP stack (SURVEY.md §2.3): one EngineCore
process per DP rank (``DPEngineCoreProc``, core.py:1614), a coordinator
tracking per-rank load for request routing (``DPCoordinator``,
coordinator.py:23), and engine-death detection (multiproc_executor worker
monitor). Transport is multiprocessing pipes for requests and a shared
results queue; the same-host broadcast path can ride the native shm ring
(distributed/shm_ring.py) when fan-out messages grow.

Wave-synchronized stepping (dummy batches keeping EP ranks in lockstep)
applies when expert parallelism spans DP ranks; with per-rank meshes each
engine steps independently, which is the configuration implemented here.
"""

import multiprocessing as mp
import queue as queue_mod
import threading
import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

from lvllm_tpu.config import EngineConfig
from lvllm_tpu.logger import init_logger
from lvllm_tpu.outputs import RequestOutput
from lvllm_tpu.sampling_params import SamplingParams

logger = init_logger(__name__)


def _engine_worker(rank: int, config: EngineConfig, load_format: str,
                   req_queue, out_queue, force_cpu: bool) -> None:
    """One DP rank: owns an LLMEngine, serves requests from its queue.
    (Reference: DPEngineCoreProc.run_busy_loop.)"""
    if force_cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    from lvllm_tpu.engine.llm_engine import LLMEngine

    engine = LLMEngine(config, load_format=load_format)
    out_queue.put(("ready", rank, None))
    pending = True
    while True:
        # Drain the request queue without blocking the step loop.
        while True:
            try:
                msg = req_queue.get_nowait()
            except queue_mod.Empty:
                break
            if msg is None:
                out_queue.put(("stopped", rank, None))
                return
            kind, payload = msg
            if kind == "add":
                rid, prompt, sp = payload
                engine.add_request(rid, prompt, sp)
            elif kind == "abort":
                engine.abort_request([payload])
        if engine.has_unfinished_requests():
            for out in engine.step():
                if out.finished:
                    out_queue.put(("finished", rank, out))
        else:
            # Idle: block briefly for new work.
            try:
                msg = req_queue.get(timeout=0.05)
            except queue_mod.Empty:
                continue
            if msg is None:
                out_queue.put(("stopped", rank, None))
                return
            kind, payload = msg
            if kind == "add":
                rid, prompt, sp = payload
                engine.add_request(rid, prompt, sp)
            elif kind == "abort":
                engine.abort_request([payload])


@dataclass
class _RankState:
    in_flight: int = 0
    total_served: int = 0


class DPCoordinator:
    """Routes requests to the least-loaded rank and tracks stats
    (reference: v1/engine/coordinator.py)."""

    def __init__(self, num_ranks: int):
        self.ranks = [_RankState() for _ in range(num_ranks)]

    def pick_rank(self) -> int:
        return min(range(len(self.ranks)),
                   key=lambda r: (self.ranks[r].in_flight, r))

    def on_dispatch(self, rank: int) -> None:
        self.ranks[rank].in_flight += 1
        self.ranks[rank].total_served += 1

    def on_finished(self, rank: int) -> None:
        self.ranks[rank].in_flight -= 1

    def stats(self) -> List[Dict[str, int]]:
        return [{"in_flight": r.in_flight, "total_served": r.total_served}
                for r in self.ranks]


class DPEngineGroup:
    """N data-parallel engine processes behind one generate() API."""

    def __init__(self, config: EngineConfig, num_ranks: int = 2,
                 load_format: str = "dummy", force_cpu: bool = True,
                 start_timeout_s: float = 120.0):
        ctx = mp.get_context("spawn")
        self.num_ranks = num_ranks
        self.coordinator = DPCoordinator(num_ranks)
        self._req_queues = [ctx.Queue() for _ in range(num_ranks)]
        self._out_queue = ctx.Queue()
        self._procs = [
            ctx.Process(target=_engine_worker,
                        args=(r, config, load_format, self._req_queues[r],
                              self._out_queue, force_cpu), daemon=True)
            for r in range(num_ranks)
        ]
        for p in self._procs:
            p.start()
        self._rank_of: Dict[str, int] = {}
        ready = 0
        deadline = time.time() + start_timeout_s
        while ready < num_ranks:
            try:
                kind, rank, _ = self._out_queue.get(
                    timeout=max(deadline - time.time(), 0.1))
            except queue_mod.Empty:
                self.shutdown()
                raise TimeoutError("DP engines failed to start")
            if kind == "ready":
                ready += 1
        logger.info("DP group up: %d ranks", num_ranks)

    # ---- API ---------------------------------------------------------------

    def generate(self, prompts, sampling_params) -> List[RequestOutput]:
        if isinstance(sampling_params, SamplingParams):
            sampling_params = [sampling_params] * len(prompts)
        order = []
        for i, (p, sp) in enumerate(zip(prompts, sampling_params)):
            rid = f"dp-{i}"
            rank = self.coordinator.pick_rank()
            self.coordinator.on_dispatch(rank)
            self._rank_of[rid] = rank
            self._req_queues[rank].put(("add", (rid, p, sp)))
            order.append(rid)
        finals: Dict[str, RequestOutput] = {}
        # Monitor engine liveness while collecting (reference: worker
        # monitor thread → FailureCallback).
        while len(finals) < len(order):
            for r, proc in enumerate(self._procs):
                if not proc.is_alive():
                    raise RuntimeError(f"DP rank {r} died "
                                       f"(exitcode {proc.exitcode})")
            try:
                kind, rank, out = self._out_queue.get(timeout=1.0)
            except queue_mod.Empty:
                continue
            if kind == "finished":
                finals[out.request_id] = out
                self.coordinator.on_finished(rank)
        return [finals[rid] for rid in order]

    def stats(self) -> List[Dict[str, int]]:
        return self.coordinator.stats()

    def shutdown(self) -> None:
        for q in self._req_queues:
            try:
                q.put(None)
            except Exception:  # noqa: BLE001
                pass
        for p in self._procs:
            p.join(timeout=10)
            if p.is_alive():
                p.terminate()
