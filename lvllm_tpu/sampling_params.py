"""Sampling parameters for text generation.

Counterpart of the reference's ``vllm/sampling_params.py`` (944 LoC):
temperature / top-k / top-p / min-p, repetition & presence/frequency
penalties, seeds, logprobs, stop conditions. Kept as a frozen-ish dataclass
so it can be hashed into batch-invariant sampling metadata.
"""

from dataclasses import dataclass, field
from enum import IntEnum
from typing import List, Optional, Union


class SamplingType(IntEnum):
    GREEDY = 0
    RANDOM = 1


@dataclass
class SamplingParams:
    """Per-request sampling configuration.

    Semantics follow the reference (``sampling_params.py``): temperature==0
    means greedy; top_k<=0 disables top-k; top_p==1 disables top-p.
    """

    n: int = 1
    temperature: float = 1.0
    top_p: float = 1.0
    top_k: int = 0
    min_p: float = 0.0
    repetition_penalty: float = 1.0
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    seed: Optional[int] = None
    max_tokens: Optional[int] = 16
    min_tokens: int = 0
    stop: Union[None, str, List[str]] = None
    stop_token_ids: Optional[List[int]] = None
    ignore_eos: bool = False
    logprobs: Optional[int] = None
    prompt_logprobs: Optional[int] = None
    skip_special_tokens: bool = True
    include_stop_str_in_output: bool = False
    detokenize: bool = True
    bad_words: Optional[List[str]] = None
    logit_bias: Optional[dict] = None
    # Structured output (grammar-constrained decoding) hook; backend applied
    # in the sampler via token bitmask like the reference's
    # StructuredOutputManager.grammar_bitmask.
    guided_json: Optional[Union[str, dict]] = None
    guided_regex: Optional[str] = None
    guided_choice: Optional[List[str]] = None
    guided_grammar: Optional[str] = None   # EBNF (GBNF or lark syntax)
    extra_args: dict = field(default_factory=dict)

    def __post_init__(self) -> None:
        if self.temperature < 0.0:
            raise ValueError(f"temperature must be >= 0, got {self.temperature}")
        if not 0.0 < self.top_p <= 1.0:
            raise ValueError(f"top_p must be in (0, 1], got {self.top_p}")
        if self.top_k < 0:
            self.top_k = 0
        if not 0.0 <= self.min_p <= 1.0:
            raise ValueError(f"min_p must be in [0, 1], got {self.min_p}")
        if self.max_tokens is not None and self.max_tokens < 1:
            raise ValueError(f"max_tokens must be >= 1, got {self.max_tokens}")
        if self.stop is None:
            self.stop = []
        elif isinstance(self.stop, str):
            self.stop = [self.stop]
        if self.stop_token_ids is None:
            self.stop_token_ids = []

    @property
    def sampling_type(self) -> SamplingType:
        if self.temperature == 0.0:
            return SamplingType.GREEDY
        return SamplingType.RANDOM

    @property
    def all_stop_token_ids(self) -> List[int]:
        return list(self.stop_token_ids or [])

    def clone(self) -> "SamplingParams":
        from copy import deepcopy

        return deepcopy(self)
