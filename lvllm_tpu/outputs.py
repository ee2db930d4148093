"""Request output datatypes.

Counterpart of the reference's ``vllm/outputs.py`` (RequestOutput /
CompletionOutput) and ``vllm/logprobs.py``.
"""

from dataclasses import dataclass, field
from typing import Dict, List, Optional


@dataclass
class Logprob:
    logprob: float
    rank: Optional[int] = None
    decoded_token: Optional[str] = None


# {token_id: Logprob} per generated position.
LogprobsDict = Dict[int, Logprob]


@dataclass
class CompletionOutput:
    """One completion (one of SamplingParams.n) for a request."""

    index: int
    text: str
    token_ids: List[int]
    cumulative_logprob: Optional[float] = None
    logprobs: Optional[List[LogprobsDict]] = None
    finish_reason: Optional[str] = None  # "stop" | "length" | "abort"
    stop_reason: Optional[object] = None

    def finished(self) -> bool:
        return self.finish_reason is not None


@dataclass
class RequestOutput:
    """Aggregated output for a request, streamed incrementally."""

    request_id: str
    prompt: Optional[str]
    prompt_token_ids: List[int]
    outputs: List[CompletionOutput]
    finished: bool
    prompt_logprobs: Optional[List[Optional[LogprobsDict]]] = None
    num_cached_tokens: int = 0
    metrics: Optional[dict] = None

    @property
    def num_generated_tokens(self) -> int:
        return sum(len(o.token_ids) for o in self.outputs)


@dataclass
class PoolingOutput:
    """Embedding/pooling result (reference: vllm/outputs.py PoolingOutput)."""

    request_id: str
    data: object  # np.ndarray embedding
    finished: bool = True
