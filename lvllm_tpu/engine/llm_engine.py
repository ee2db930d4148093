"""Synchronous LLMEngine: in-process EngineCore + output processing.

Counterpart of the reference's ``vllm/v1/engine/llm_engine.py`` over an
InprocClient (``core_client.py:274``).
"""

import itertools
from typing import Dict, List, Optional, Union

from lvllm_tpu.config import EngineConfig
from lvllm_tpu.core.request import Request, RequestStatus
from lvllm_tpu.engine.core import EngineCore
from lvllm_tpu.engine.output_processor import OutputProcessor
from lvllm_tpu.logger import init_logger
from lvllm_tpu.outputs import RequestOutput
from lvllm_tpu.sampling_params import SamplingParams

logger = init_logger(__name__)


class LLMEngine:

    def __init__(self, config: EngineConfig, load_format: str = "auto",
                 tokenizer=None, mesh=None):
        self.config = config
        self.core = EngineCore(config, load_format=load_format, mesh=mesh,
                               tokenizer=tokenizer)
        self.tokenizer = tokenizer
        self.output_processor = OutputProcessor(tokenizer)
        self._req_counter = itertools.count()

    @classmethod
    def from_engine_config(cls, config: EngineConfig, **kw) -> "LLMEngine":
        return cls(config, **kw)

    def add_request(
        self,
        request_id: Optional[str],
        prompt: Union[str, List[int]],
        sampling_params: SamplingParams,
        priority: int = 0,
        mm_data: Optional[dict] = None,
    ) -> str:
        if request_id is None:
            request_id = f"req-{next(self._req_counter)}"
        if isinstance(prompt, str):
            if self.tokenizer is None:
                raise ValueError("string prompt requires a tokenizer")
            prompt_token_ids = self.tokenizer.encode(prompt)
            prompt_text = prompt
        else:
            prompt_token_ids = list(prompt)
            prompt_text = None
        req = Request(
            request_id=request_id,
            prompt_token_ids=prompt_token_ids,
            sampling_params=sampling_params,
            eos_token_id=self.config.model_config.eos_token_id,
            priority=priority,
            prompt=prompt_text,
            mm_data=mm_data,
        )
        self.core.add_request(req)
        self.output_processor.add_request(req)
        return request_id

    def abort_request(self, request_ids: List[str]) -> None:
        self.core.abort_requests(request_ids)
        for rid in request_ids:
            self.output_processor.abort(rid)

    def has_unfinished_requests(self) -> bool:
        return self.core.has_unfinished_requests()

    def step(self) -> List[RequestOutput]:
        stepped, logprobs, topk = self.core.step()
        outputs, stop_hits = self.output_processor.process_outputs(
            stepped, logprobs, topk)
        for req in stop_hits:
            self.core.scheduler.finish_request_external(
                req, RequestStatus.FINISHED_STOPPED)
        return outputs

    def get_stats(self) -> dict:
        return self.core.get_stats()
