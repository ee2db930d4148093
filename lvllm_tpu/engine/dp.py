"""Data-parallel engine replicas + coordinator.

Counterpart of the reference's DP stack (SURVEY.md §2.3): one EngineCore
process per DP rank (``DPEngineCoreProc``, core.py:1614), a coordinator
tracking per-rank load for request routing (``DPCoordinator``,
coordinator.py:23), and engine-death detection (multiproc_executor worker
monitor). Transport is multiprocessing pipes for requests and a shared
results queue; the same-host broadcast path can ride the native shm ring
(distributed/shm_ring.py) when fan-out messages grow.

Two DP planes, mirroring where the reference needs them:

- **In-slice DP+EP** is NOT this module: a single SPMD program over a
  (data, expert) mesh shards experts across the joint group
  (parallel/expert_parallel.py) — wave sync is implicit (every shard runs
  the same program; idle shards carry padding rows, the reference's dummy
  batches). See tests/parallel/test_dp_ep.py.
- **Cross-slice DP** (this module): engine replicas in separate processes.
  ``wave_sync=True`` adds the reference's lockstep protocol
  (``DPEngineCoreProc.run_busy_loop:1731``): all ranks agree each wave
  whether anyone has work; ranks without work execute a dummy step so that
  collective-bearing steps stay aligned across ranks (required when a
  future multi-controller mesh joins the slices over DCN).
"""

import multiprocessing as mp
import os
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


class _ShmReqReader:
    """Rank-addressed reader over the broadcast ring: every rank sees every
    message; those addressed elsewhere are skipped (reference:
    shm_broadcast.py MessageQueue readers)."""

    def __init__(self, name: str, rank: int):
        from lvllm_tpu.distributed.shm_ring import ShmMessageQueue
        self._q = ShmMessageQueue(name, reader_id=rank)
        self._rank = rank

    def _filter(self, msg):
        tgt, payload = msg
        if tgt is None or tgt == self._rank:
            return payload
        return _SKIP

    def get_nowait(self):
        while True:
            try:
                msg = self._q.get(timeout=0)
            except TimeoutError:
                raise queue_mod.Empty from None
            out = self._filter(msg)
            if out is not _SKIP:
                return out

    def get(self, timeout=None):
        deadline = None if timeout is None else time.time() + timeout
        while True:
            left = None if deadline is None else deadline - time.time()
            if left is not None and left <= 0:
                raise queue_mod.Empty
            try:
                msg = self._q.get(timeout=left)
            except TimeoutError:
                raise queue_mod.Empty from None
            out = self._filter(msg)
            if out is not _SKIP:
                return out


_SKIP = object()


class _ShmReqWriter:
    """Per-rank handle over the single-writer ring (parent side)."""

    def __init__(self, ring, rank: int):
        self._ring = ring
        self._rank = rank

    def put(self, payload, timeout: float = 5.0) -> None:
        self._ring.put((self._rank, payload), timeout=timeout)


def _engine_worker(rank: int, config: EngineConfig, load_format: str,
                   req_queue, out_queue, force_cpu: bool,
                   wave_barrier=None, work_flags=None,
                   shm_name: Optional[str] = None) -> None:
    """One DP rank: owns an LLMEngine, serves requests from its queue.
    (Reference: DPEngineCoreProc.run_busy_loop.) With ``wave_barrier`` the
    rank participates in wave-synchronized stepping: each wave begins with
    an all-ranks barrier + shared work flags; a rank with no local work
    executes a dummy step while any peer still decodes (reference:
    execute_dummy_batch, v1/worker/dp_utils.py)."""
    if force_cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    from lvllm_tpu.engine.llm_engine import LLMEngine

    if shm_name is not None:
        req_queue = _ShmReqReader(shm_name, rank)
    engine = LLMEngine(config, load_format=load_format)
    dummy_steps = 0
    out_queue.put(("ready", rank, None))
    stopping = False
    while True:
        # Drain the request queue without blocking the step loop.
        while True:
            try:
                msg = req_queue.get_nowait()
            except queue_mod.Empty:
                break
            if msg is None:
                stopping = True
                break
            kind, payload = msg
            if kind == "add":
                rid, prompt, sp = payload
                engine.add_request(rid, prompt, sp)
            elif kind == "abort":
                engine.abort_request([payload])
            elif kind == "stats":
                out_queue.put(("stats", rank,
                               {"dummy_steps": dummy_steps,
                                **engine.core.get_stats()}))
        if stopping:
            if wave_barrier is not None:
                work_flags[rank] = -1
            out_queue.put(("stopped", rank, None))
            return

        if wave_barrier is not None:
            # Wave sync: publish local work, wait for all ranks, then all
            # ranks act on the SAME wave decision.
            work_flags[rank] = 1 if engine.has_unfinished_requests() else 0
            try:
                wave_barrier.wait(timeout=60.0)
            except threading.BrokenBarrierError:
                out_queue.put(("stopped", rank, None))
                return
            flags = list(work_flags)
            if any(f < 0 for f in flags):
                out_queue.put(("stopped", rank, None))
                return
            if not any(f == 1 for f in flags):
                time.sleep(0.005)   # whole group idle
                continue
            if engine.has_unfinished_requests():
                for out in engine.step():
                    if out.finished:
                        out_queue.put(("finished", rank, out))
            else:
                # Dummy step: peers are mid-decode; on a joined DCN mesh
                # this is where the rank would run the collective-bearing
                # forward over padding rows.
                engine.core.execute_dummy_batch()
                dummy_steps += 1
            continue

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
            elif kind == "stats":
                out_queue.put(("stats", rank,
                               {"dummy_steps": dummy_steps,
                                **engine.core.get_stats()}))


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
                 start_timeout_s: float = 120.0, wave_sync: bool = False,
                 use_shm: Optional[bool] = None, standby_ranks: int = 0):
        ctx = mp.get_context("spawn")
        self.num_ranks = num_ranks
        # Standby engines (reference: elastic EP standby engines /
        # engine-death recovery): fully-booted ranks that take no traffic
        # until a serving rank dies, then are promoted in its place.
        self.num_standby = standby_ranks
        total = num_ranks + standby_ranks
        self._dead: set = set()
        self._standby_pool: List[int] = list(
            range(num_ranks, total))
        self.coordinator = DPCoordinator(num_ranks)
        # Request fan-out: the native single-writer shm broadcast ring
        # (csrc/shm_ring.cpp — the reference's MessageQueue role) when it
        # builds, else per-rank mp queues. use_shm=None means auto.
        self._shm_ring = None
        shm_name = None
        if use_shm or use_shm is None:
            try:
                from lvllm_tpu.distributed.shm_ring import ShmMessageQueue
                shm_name = f"/lvllm_dp_{os.getpid()}_{id(self) & 0xffff}"
                self._shm_ring = ShmMessageQueue(
                    shm_name, n_readers=total, create=True)
            except Exception as e:  # noqa: BLE001
                if use_shm:
                    raise
                logger.info("shm ring unavailable (%s); using mp queues", e)
                shm_name = None
        assert not (wave_sync and standby_ranks), \
            "standby promotion under wave sync TBD"
        if self._shm_ring is not None:
            self._req_queues = [_ShmReqWriter(self._shm_ring, r)
                                for r in range(total)]
        else:
            self._req_queues = [ctx.Queue() for _ in range(total)]
        self._out_queue = ctx.Queue()
        barrier = ctx.Barrier(num_ranks) if wave_sync else None
        flags = ctx.Array("i", num_ranks) if wave_sync else None
        self._procs = [
            ctx.Process(target=_engine_worker,
                        args=(r, config, load_format,
                              None if self._shm_ring is not None
                              else self._req_queues[r],
                              self._out_queue, force_cpu, barrier, flags,
                              shm_name),
                        daemon=True)
            for r in range(total)
        ]
        for p in self._procs:
            p.start()
        # Serving slot -> process index (promotion rebinds a slot to a
        # standby process).
        self._slot_proc: List[int] = list(range(num_ranks))
        self._rank_of: Dict[str, int] = {}
        self._payloads: Dict[str, tuple] = {}
        self._pending_out: List[tuple] = []
        ready = 0
        deadline = time.time() + start_timeout_s
        while ready < total:
            try:
                kind, rank, _ = self._out_queue.get(
                    timeout=max(deadline - time.time(), 0.1))
            except queue_mod.Empty:
                self.shutdown()
                raise TimeoutError("DP engines failed to start")
            if kind == "ready":
                ready += 1
        logger.info("DP group up: %d ranks (+%d standby)", num_ranks,
                    standby_ranks)

    def _promote(self, slot: int) -> None:
        """Rebind a dead serving slot to a standby engine and re-dispatch
        its unfinished requests (reference: engine-death recovery with
        standby engines)."""
        dead_proc = self._slot_proc[slot]
        self._dead.add(dead_proc)
        if not self._standby_pool:
            raise RuntimeError(
                f"DP rank {slot} died (proc {dead_proc}, exitcode "
                f"{self._procs[dead_proc].exitcode}) and no standby "
                f"engines remain")
        new_proc = self._standby_pool.pop(0)
        self._slot_proc[slot] = new_proc
        redo = [rid for rid, r in self._rank_of.items()
                if r == slot and rid in self._payloads]
        logger.warning("DP rank %s died; promoted standby proc %d, "
                       "re-dispatching %d requests", slot, new_proc,
                       len(redo))
        for rid in redo:
            prompt, sp = self._payloads[rid]
            self._req_queues[new_proc].put(("add", (rid, prompt, sp)))

    # ---- API ---------------------------------------------------------------

    def generate(self, prompts, sampling_params) -> List[RequestOutput]:
        if isinstance(sampling_params, SamplingParams):
            sampling_params = [sampling_params] * len(prompts)
        order = []
        for i, (p, sp) in enumerate(zip(prompts, sampling_params)):
            rid = f"dp-{i}"
            slot = self.coordinator.pick_rank()
            self.coordinator.on_dispatch(slot)
            self._rank_of[rid] = slot
            self._payloads[rid] = (p, sp)
            self._req_queues[self._slot_proc[slot]].put(("add",
                                                         (rid, p, sp)))
            order.append(rid)
        finals: Dict[str, RequestOutput] = {}
        # Monitor engine liveness while collecting (reference: worker
        # monitor thread → FailureCallback); dead serving ranks are
        # promoted onto standby engines when available.
        while len(finals) < len(order):
            if self._pending_out:
                kind, rank, out = self._pending_out.pop(0)
            else:
                for slot, proc_idx in enumerate(self._slot_proc):
                    if proc_idx not in self._dead and \
                            not self._procs[proc_idx].is_alive():
                        self._promote(slot)
                try:
                    kind, rank, out = self._out_queue.get(timeout=1.0)
                except queue_mod.Empty:
                    continue
            if kind == "finished":
                if out.request_id in finals:
                    continue            # duplicate after re-dispatch race
                finals[out.request_id] = out
                self._payloads.pop(out.request_id, None)
                slot = self._rank_of.get(out.request_id)
                if slot is not None:
                    self.coordinator.on_finished(slot)
        return [finals[rid] for rid in order]

    def stats(self) -> List[Dict[str, int]]:
        return self.coordinator.stats()

    def rank_stats(self, timeout_s: float = 10.0) -> List[Dict[str, Any]]:
        """Per-rank engine stats (incl. dummy_steps under wave_sync)."""
        for q in self._req_queues:
            q.put(("stats", None))
        got: Dict[int, Dict[str, Any]] = {}
        deadline = time.time() + timeout_s
        while len(got) < self.num_ranks and time.time() < deadline:
            try:
                kind, rank, payload = self._out_queue.get(timeout=0.5)
            except queue_mod.Empty:
                continue
            if kind == "stats":
                got[rank] = payload
            else:
                self._pending_out.append((kind, rank, payload))
        return [got.get(r, {}) for r in range(self.num_ranks)]

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
        if self._shm_ring is not None:
            try:
                self._shm_ring.close()
            except Exception:  # noqa: BLE001
                pass
            self._shm_ring = None
