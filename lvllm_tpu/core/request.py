"""Request lifecycle state machine.

Counterpart of the reference's ``vllm/v1/request.py`` (Request/RequestStatus)
and the stop-check in ``v1/core/sched/utils.py``.
"""

import enum
import time
from typing import List, Optional

from lvllm_tpu.sampling_params import SamplingParams


class RequestStatus(enum.IntEnum):
    WAITING = 0
    RUNNING = 1
    PREEMPTED = 2
    FINISHED_STOPPED = 3
    FINISHED_LENGTH_CAPPED = 4
    FINISHED_ABORTED = 5
    FINISHED_IGNORED = 6

    @staticmethod
    def is_finished(status: "RequestStatus") -> bool:
        return status >= RequestStatus.FINISHED_STOPPED


_FINISH_REASON = {
    RequestStatus.FINISHED_STOPPED: "stop",
    RequestStatus.FINISHED_LENGTH_CAPPED: "length",
    RequestStatus.FINISHED_ABORTED: "abort",
    RequestStatus.FINISHED_IGNORED: "ignored",
}


class Request:
    """One generation request tracked by the scheduler.

    Mirrors reference ``v1/request.py``: prompt tokens + growing output
    tokens, spec-decode slots, per-request block allocation handled by the
    KVCacheManager keyed on ``request_id``.
    """

    def __init__(
        self,
        request_id: str,
        prompt_token_ids: List[int],
        sampling_params: SamplingParams,
        eos_token_id: Optional[int] = None,
        arrival_time: Optional[float] = None,
        priority: int = 0,
        prompt: Optional[str] = None,
        lora_int_id: Optional[int] = None,
        mm_data: Optional[dict] = None,
    ) -> None:
        self.request_id = request_id
        # Multimodal inputs: {"pixel_values": np [B, 3, S, S]} — encoded
        # once by the runner, spliced at image-token placeholder positions.
        self.mm_data = mm_data
        self.prompt = prompt
        self.prompt_token_ids: List[int] = list(prompt_token_ids)
        self.sampling_params = sampling_params
        self.eos_token_id = eos_token_id
        self.arrival_time = arrival_time if arrival_time is not None else time.time()
        self.priority = priority
        self.lora_int_id = lora_int_id

        self.status = RequestStatus.WAITING
        self.output_token_ids: List[int] = []
        # Tokens whose KV is already computed (on device). During chunked
        # prefill this trails len(prompt); equals num_tokens once decoding.
        self.num_computed_tokens: int = 0
        # Prefix-cache hit length at schedule time (device blocks reused).
        self.num_cached_tokens: int = 0
        # Draft tokens proposed by spec-decode, pending verification.
        self.spec_token_ids: List[int] = []
        # Multi-candidate speculation: all candidate chains (chain 0 is
        # mirrored into spec_token_ids). None => single-chain.
        self.spec_chains: Optional[List[List[int]]] = None
        self.num_preemptions: int = 0
        # Multimodal: encoder tokens (image placeholders) this request
        # needs encoded before its prefill can run (reference: encoder
        # budget, v1/core/sched/scheduler.py:1114).
        self.num_encoder_tokens: int = 0
        # Async scheduling: count of optimistic placeholder tokens (-1)
        # at the tail of output_token_ids awaiting device results.
        self.num_placeholders: int = 0
        self.stop_reason: Optional[object] = None
        # Set by the engine when streaming output.
        self.first_token_time: Optional[float] = None

    # ---- token accounting -------------------------------------------------

    @property
    def num_prompt_tokens(self) -> int:
        return len(self.prompt_token_ids)

    @property
    def num_output_tokens(self) -> int:
        return len(self.output_token_ids)

    @property
    def num_tokens(self) -> int:
        return self.num_prompt_tokens + self.num_output_tokens

    @property
    def num_tokens_with_spec(self) -> int:
        return self.num_tokens + len(self.spec_token_ids)

    @property
    def all_token_ids(self) -> List[int]:
        return self.prompt_token_ids + self.output_token_ids

    @property
    def max_tokens(self) -> int:
        mt = self.sampling_params.max_tokens
        return mt if mt is not None else 2**31

    # ---- state ------------------------------------------------------------

    @property
    def is_finished(self) -> bool:
        return RequestStatus.is_finished(self.status)

    def get_finished_reason(self) -> Optional[str]:
        return _FINISH_REASON.get(self.status)

    def append_output_token_ids(self, token_ids) -> None:
        if isinstance(token_ids, int):
            token_ids = [token_ids]
        self.output_token_ids.extend(token_ids)


PLACEHOLDER_TOKEN = -1


def check_stop(request: Request, num_new_tokens: int = 1) -> bool:
    """Check stop conditions over the ``num_new_tokens`` just appended (can
    be >1 with spec decode); sets the finished status and truncates output
    past the stop point. Mirrors reference ``sched/utils.py check_stop``.

    Stop *strings* are handled downstream by the detokenizer (they need text);
    this handles token-level stops.
    """
    sp = request.sampling_params
    out = request.output_token_ids
    first_new = len(out) - num_new_tokens

    # Token-level stops: find the earliest stopping token among the new ones.
    for i in range(max(first_new, 0), len(out)):
        if i + 1 < sp.min_tokens:
            continue
        tok = out[i]
        if (not sp.ignore_eos and request.eos_token_id is not None
                and tok == request.eos_token_id):
            del out[i + 1:]
            request.status = RequestStatus.FINISHED_STOPPED
            return True
        if tok in (sp.stop_token_ids or ()):
            del out[i + 1:]
            request.status = RequestStatus.FINISHED_STOPPED
            request.stop_reason = tok
            return True
        if i + 1 >= request.max_tokens:
            del out[i + 1:]
            request.status = RequestStatus.FINISHED_LENGTH_CAPPED
            return True
    return False
