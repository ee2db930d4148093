"""Output processing: incremental detokenization, stop strings, streaming
RequestOutput assembly.

Counterpart of the reference's ``vllm/v1/engine/output_processor.py`` +
``detokenizer.py``.
"""

from typing import Dict, List, Optional

from lvllm_tpu.core.request import Request, RequestStatus
from lvllm_tpu.outputs import CompletionOutput, RequestOutput
from lvllm_tpu.logger import init_logger

logger = init_logger(__name__)


class IncrementalDetokenizer:
    """Streaming detokenization with byte-level-safe prefix tracking
    (reference: detokenizer.py's offset approach adapted to HF fast
    tokenizers)."""

    def __init__(self, tokenizer, skip_special_tokens: bool = True):
        self.tokenizer = tokenizer
        self.skip_special_tokens = skip_special_tokens
        self._token_ids: List[int] = []
        self._emitted_text = ""

    def update(self, new_token_ids: List[int]) -> str:
        """Append tokens; return newly stable text delta."""
        if self.tokenizer is None:
            self._token_ids.extend(new_token_ids)
            return ""
        self._token_ids.extend(new_token_ids)
        text = self.tokenizer.decode(
            self._token_ids, skip_special_tokens=self.skip_special_tokens)
        # Hold back a possibly-incomplete UTF-8 tail (replacement char).
        if text.endswith("�"):
            return ""
        delta = text[len(self._emitted_text):]
        self._emitted_text = text
        return delta

    @property
    def text(self) -> str:
        return self._emitted_text


class RequestState:

    def __init__(self, request: Request, tokenizer) -> None:
        self.request = request
        self.detok = IncrementalDetokenizer(
            tokenizer, request.sampling_params.skip_special_tokens)
        self.text = ""
        self.num_streamed_tokens = 0
        self.logprobs: List[float] = []
        self.topk_logprobs: List[dict] = []


class OutputProcessor:
    """Turns per-step scheduler results into streaming RequestOutputs and
    applies text-level stop strings."""

    def __init__(self, tokenizer=None):
        self.tokenizer = tokenizer
        self.states: Dict[str, RequestState] = {}

    def add_request(self, request: Request) -> None:
        self.states[request.request_id] = RequestState(request, self.tokenizer)

    def process_outputs(
        self,
        stepped_requests: List[Request],
        logprobs: Optional[Dict[str, List[float]]] = None,
        topk_logprobs: Optional[Dict[str, List[dict]]] = None,
    ) -> (List[RequestOutput], List[Request]):
        """Returns (outputs for requests with new content, requests that hit
        a stop string and must be finished by the engine)."""
        outputs: List[RequestOutput] = []
        stop_hits: List[Request] = []
        for req in stepped_requests:
            state = self.states.get(req.request_id)
            if state is None:
                continue
            new_tokens = req.output_token_ids[state.num_streamed_tokens:]
            state.num_streamed_tokens = len(req.output_token_ids)
            delta = state.detok.update(new_tokens)
            state.text += delta
            if logprobs and req.request_id in logprobs:
                state.logprobs.extend(logprobs[req.request_id])
            if topk_logprobs and req.request_id in topk_logprobs:
                state.topk_logprobs.extend(topk_logprobs[req.request_id])

            # Stop strings (text-level, like reference check_stop + detok).
            sp = req.sampling_params
            finish_reason = req.get_finished_reason()
            stop_reason = req.stop_reason
            truncate_to = None
            for s in (sp.stop or []):
                pos = state.text.find(s)
                if pos != -1:
                    truncate_to = pos if not sp.include_stop_str_in_output \
                        else pos + len(s)
                    finish_reason = "stop"
                    stop_reason = s
                    if not req.is_finished:
                        stop_hits.append(req)
                    break
            text = state.text if truncate_to is None \
                else state.text[:truncate_to]

            outputs.append(RequestOutput(
                request_id=req.request_id,
                prompt=req.prompt,
                prompt_token_ids=req.prompt_token_ids,
                outputs=[CompletionOutput(
                    index=0,
                    text=text,
                    token_ids=list(req.output_token_ids),
                    cumulative_logprob=(sum(state.logprobs)
                                        if state.logprobs else None),
                    logprobs=(state.topk_logprobs or None),
                    finish_reason=finish_reason,
                    stop_reason=stop_reason,
                )],
                finished=req.is_finished or truncate_to is not None,
                num_cached_tokens=req.num_cached_tokens,
            ))
            if req.is_finished or truncate_to is not None:
                self.states.pop(req.request_id, None)
        return outputs, stop_hits

    def abort(self, request_id: str) -> None:
        self.states.pop(request_id, None)
