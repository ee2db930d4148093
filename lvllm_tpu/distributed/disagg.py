"""Cross-process prefill/decode disaggregation over ZMQ.

Counterpart of the reference's KV-transfer connector plane
(``distributed/kv_transfer/kv_connector/v1/nixl_connector.py`` — API
shape, not the RDMA) and the fork's headline "prefill/decode separation"
(``README.md:47``): a dedicated *prefill engine process* computes prompt
KV at full speed while the *decode engine* — possibly running
offload-assisted (expert weights streaming from host RAM) — continues
serving decode traffic untouched.

Transport: ZMQ REQ/REP carrying pickled :class:`KVHandoff` payloads
(prompt, first token, per-layer full-block KV). ``ipc://`` endpoints for
same-host; ``tcp://`` drops in for cross-host (DCN). The decode side
injects transferred blocks through the prefix cache
(``kv_connector.inject_and_decode_request``), so scheduling needs no
special-casing and partial tail blocks recompute locally (the reference's
``kv_load_failure_policy="recompute"`` degradation).

The request pipeline overlaps the planes: prompt i+1's prefill is
dispatched to the remote process *before* prompt i's decode loop runs, so
prefill and decode proceed concurrently in separate processes.
"""

import multiprocessing as mp
import os
import pickle
import tempfile
import time
import uuid
from typing import List, Optional

from lvllm_tpu.config import EngineConfig
from lvllm_tpu.distributed.kv_connector import (KVHandoff,
                                                inject_and_decode_request,
                                                prefill_and_extract)
from lvllm_tpu.logger import init_logger
from lvllm_tpu.outputs import RequestOutput
from lvllm_tpu.sampling_params import SamplingParams

logger = init_logger(__name__)


def _prefill_server(endpoint: str, config: EngineConfig, load_format: str,
                    force_cpu: bool) -> None:
    """Prefill-engine process: serve (prompt, sampling_params) → KVHandoff
    over a ZMQ REP socket (reference: the P-side of a P/D connector)."""
    if force_cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import zmq

    from lvllm_tpu.engine.llm_engine import LLMEngine

    engine = LLMEngine(config, load_format=load_format)
    ctx = zmq.Context()
    sock = ctx.socket(zmq.REP)
    sock.bind(endpoint)
    logger.info("prefill server up on %s", endpoint)
    try:
        while True:
            msg = pickle.loads(sock.recv())
            if msg is None:           # shutdown
                sock.send(pickle.dumps("bye"))
                return
            if msg == "ping":         # readiness probe
                sock.send(pickle.dumps("pong"))
                continue
            prompt, sp, mm = (msg if len(msg) == 3 else (*msg, None))
            try:
                handoff = prefill_and_extract(engine, prompt, sp,
                                              mm_data=mm)
                sock.send(pickle.dumps(handoff))
            except Exception as e:  # noqa: BLE001
                sock.send(pickle.dumps(RuntimeError(str(e))))
    finally:
        sock.close(0)
        ctx.term()


class DisaggregatedEngine:
    """A decode engine plus a remote prefill engine process.

    ``decode_config`` may enable expert offload — the fork's signature
    deployment: decode runs offload-assisted while prefill proceeds at
    full speed in its own process.
    """

    def __init__(self, prefill_config: EngineConfig,
                 decode_config: EngineConfig,
                 load_format: str = "dummy",
                 endpoint: Optional[str] = None,
                 force_cpu: bool = True,
                 start_timeout_s: float = 180.0):
        import zmq

        from lvllm_tpu.engine.llm_engine import LLMEngine

        self.endpoint = endpoint or (
            "ipc://" + os.path.join(tempfile.mkdtemp(prefix="lvllm-disagg-"),
                                    "prefill.sock"))
        ctx_mp = mp.get_context("spawn")
        self._proc = ctx_mp.Process(
            target=_prefill_server,
            args=(self.endpoint, prefill_config, load_format, force_cpu),
            daemon=True)
        self._proc.start()

        self.decode_engine = LLMEngine(decode_config,
                                       load_format=load_format)

        self._zmq = zmq.Context()
        self._sock = self._zmq.socket(zmq.REQ)
        self._sock.connect(self.endpoint)
        # Readiness: first ping waits for the remote engine to load.
        self._sock.setsockopt(zmq.RCVTIMEO, int(start_timeout_s * 1000))
        self._sock.send(pickle.dumps("ping"))
        assert pickle.loads(self._sock.recv()) == "pong"
        self._sock.setsockopt(zmq.RCVTIMEO, -1)
        self._inflight = False
        self.stats = {"handoffs": 0, "kv_bytes_transferred": 0,
                      "prefill_wait_s": 0.0}

    # ---- transfer plane ----------------------------------------------------

    def _send_prefill(self, prompt: List[int], sp: SamplingParams,
                      mm_data=None) -> None:
        assert not self._inflight
        self._sock.send(pickle.dumps((list(prompt), sp, mm_data)))
        self._inflight = True

    def _recv_handoff(self) -> KVHandoff:
        assert self._inflight
        t0 = time.time()
        handoff = pickle.loads(self._sock.recv())
        self.stats["prefill_wait_s"] += time.time() - t0
        self._inflight = False
        if isinstance(handoff, Exception):
            raise handoff
        self.stats["handoffs"] += 1
        self.stats["kv_bytes_transferred"] += handoff.nbytes()
        return handoff

    # ---- API ---------------------------------------------------------------

    def generate(self, prompts, sampling_params,
                 mm_data=None) -> List[RequestOutput]:
        """Pipelined disaggregated generation: prompt i+1 prefills remotely
        while prompt i decodes locally. ``mm_data``: optional per-prompt
        multimodal inputs — encoded on the PREFILL engine (splice-VLM KV
        carries the image; encoder-decoder cross-KV rides the handoff)."""
        if isinstance(sampling_params, SamplingParams):
            sampling_params = [sampling_params] * len(prompts)
        mm_list = mm_data or [None] * len(prompts)
        results: List[RequestOutput] = []
        self._send_prefill(prompts[0], sampling_params[0], mm_list[0])
        for i in range(len(prompts)):
            handoff = self._recv_handoff()
            if i + 1 < len(prompts):
                self._send_prefill(prompts[i + 1], sampling_params[i + 1],
                                   mm_list[i + 1])
            rid = inject_and_decode_request(
                self.decode_engine, handoff, sampling_params[i],
                f"disagg-{uuid.uuid4().hex[:8]}")
            final = None
            while self.decode_engine.has_unfinished_requests():
                for o in self.decode_engine.step():
                    if o.finished and o.request_id == rid:
                        final = o
            # Present the combined stream: prefill's first token + decode.
            final.outputs[0].token_ids = (
                [handoff.first_token_id] + final.outputs[0].token_ids)
            results.append(final)
        return results

    def shutdown(self) -> None:
        try:
            if self._inflight:
                self._sock.recv()
            self._sock.send(pickle.dumps(None))
            self._sock.recv()
        except Exception:  # noqa: BLE001
            pass
        self._sock.close(0)
        self._zmq.term()
        self._proc.join(timeout=10)
        if self._proc.is_alive():
            self._proc.terminate()
