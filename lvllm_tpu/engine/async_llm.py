"""AsyncLLM: asyncio front-end over the engine core.

Counterpart of the reference's ``vllm/v1/engine/async_llm.py`` (AsyncLLM,
``generate():521``): per-request output streams, a background stepping loop,
abort on disconnect. The reference splits frontend and EngineCore into
processes bridged by ZMQ; here the step runs in a thread-pool executor —
JAX dispatch releases the GIL during device execution, giving the same
overlap without the process hop (that boundary returns for DP, §2.3).
"""

import asyncio

import numpy as np
import itertools
from concurrent.futures import ThreadPoolExecutor
from typing import AsyncGenerator, Dict, List, Optional, Union

from lvllm_tpu.config import EngineConfig
from lvllm_tpu.core.request import Request, RequestStatus
from lvllm_tpu.engine.core import EngineCore
from lvllm_tpu.engine.output_processor import OutputProcessor
from lvllm_tpu.logger import init_logger
from lvllm_tpu.outputs import RequestOutput
from lvllm_tpu.sampling_params import SamplingParams

logger = init_logger(__name__)


class AsyncLLM:

    def __init__(self, config: EngineConfig, load_format: str = "auto",
                 tokenizer=None, mesh=None):
        self.config = config
        self.core = EngineCore(config, load_format=load_format, mesh=mesh,
                               tokenizer=tokenizer)
        self.tokenizer = tokenizer
        self.output_processor = OutputProcessor(tokenizer)
        self._req_counter = itertools.count()
        self._queues: Dict[str, asyncio.Queue] = {}
        self._executor = ThreadPoolExecutor(max_workers=1,
                                            thread_name_prefix="engine-step")
        self._new_request_event = asyncio.Event()
        self._loop_task: Optional[asyncio.Task] = None
        self._closed = False

    async def start(self) -> None:
        if self._loop_task is None:
            self._loop_task = asyncio.create_task(self._busy_loop())

    async def stop(self) -> None:
        self._closed = True
        self._new_request_event.set()
        if self._loop_task:
            await self._loop_task
        self._executor.shutdown(wait=False)

    # ---- request intake ----------------------------------------------------

    def _make_request(self, prompt: Union[str, List[int]],
                      sampling_params: SamplingParams,
                      request_id: Optional[str],
                      mm_data: Optional[dict] = None) -> Request:
        if request_id is None:
            request_id = f"req-{next(self._req_counter)}"
        if isinstance(prompt, str):
            if self.tokenizer is None:
                raise ValueError("string prompt requires a tokenizer")
            prompt_token_ids = self.tokenizer.encode(prompt)
            text = prompt
        else:
            prompt_token_ids = list(prompt)
            text = None
        mc = self.config.model_config
        if mm_data is not None and mc.image_token_id is not None:
            # Expand un-expanded placeholders (one <image> per image) to
            # the model's per-image token count (reference: llava input
            # processor image_seq_length expansion). Qwen2-VL grids give a
            # per-image count; fixed-resolution towers a constant.
            if "image_grid_thw" in mm_data:
                merge = (mc.vision_config or {}).get(
                    "spatial_merge_size", 2)
                counts = [int(t * h * w) // (merge * merge)
                          for t, h, w in np.asarray(
                              mm_data["image_grid_thw"]).reshape(-1, 3)]
            else:
                counts = ([self._num_image_tokens()] *
                          np.asarray(mm_data["pixel_values"]).shape[0])
            n_ph = sum(1 for t in prompt_token_ids
                       if t == mc.image_token_id)
            if n_ph == len(counts) and any(c != 1 for c in counts):
                expanded = []
                i = 0
                for t in prompt_token_ids:
                    if t == mc.image_token_id:
                        expanded.extend([t] * counts[i])
                        i += 1
                    else:
                        expanded.append(t)
                prompt_token_ids = expanded
        return Request(request_id=request_id,
                       prompt_token_ids=prompt_token_ids,
                       sampling_params=sampling_params,
                       eos_token_id=self.config.model_config.eos_token_id,
                       prompt=text, mm_data=mm_data)

    def _num_image_tokens(self) -> int:
        vc = self.config.model_config.vision_config or {}
        return (vc.get("image_size", 336) // vc.get("patch_size", 14)) ** 2

    async def generate(
        self,
        prompt: Union[str, List[int]],
        sampling_params: SamplingParams,
        request_id: Optional[str] = None,
        mm_data: Optional[dict] = None,
    ) -> AsyncGenerator[RequestOutput, None]:
        """Stream RequestOutputs for one request until finished."""
        await self.start()
        req = self._make_request(prompt, sampling_params, request_id,
                                 mm_data=mm_data)
        queue: asyncio.Queue = asyncio.Queue()
        self._queues[req.request_id] = queue
        self.core.add_request(req)
        self.output_processor.add_request(req)
        self._new_request_event.set()
        try:
            while True:
                out = await queue.get()
                yield out
                if out.finished:
                    return
        finally:
            self._queues.pop(req.request_id, None)
            if not req.is_finished:
                self.core.abort_requests([req.request_id])
                self.output_processor.abort(req.request_id)

    async def abort(self, request_id: str) -> None:
        self.core.abort_requests([request_id])
        self.output_processor.abort(request_id)
        self._queues.pop(request_id, None)

    # ---- stepping loop -----------------------------------------------------

    async def _busy_loop(self) -> None:
        loop = asyncio.get_running_loop()
        while not self._closed:
            if not self.core.has_unfinished_requests():
                self._new_request_event.clear()
                await self._new_request_event.wait()
                continue
            stepped, logprobs, topk = await loop.run_in_executor(
                self._executor, self.core.step)
            outputs, stop_hits = self.output_processor.process_outputs(
                stepped, logprobs, topk)
            for req in stop_hits:
                self.core.scheduler.finish_request_external(
                    req, RequestStatus.FINISHED_STOPPED)
            for out in outputs:
                q = self._queues.get(out.request_id)
                if q is not None:
                    q.put_nowait(out)

    def get_stats(self) -> dict:
        return self.core.get_stats()
