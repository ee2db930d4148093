"""StructuredOutputManager: request grammar lifecycle + per-step bitmask.

Counterpart of the reference's ``v1/structured_output/__init__.py:35``
(StructuredOutputManager.grammar_bitmask:186).
"""

from typing import Dict, List, Optional

import numpy as np

from lvllm_tpu.core.request import Request
from lvllm_tpu.logger import init_logger
from lvllm_tpu.structured_output.grammar import (ChoiceGrammar, JsonGrammar,
                                                 RegexGrammar)

logger = init_logger(__name__)


class StructuredOutputManager:

    def __init__(self, tokenizer, vocab_size: int, eos_token_id: int):
        self.tokenizer = tokenizer
        self.vocab_size = vocab_size
        self.eos_token_id = eos_token_id
        self.grammars: Dict[str, object] = {}

    def maybe_attach(self, request: Request) -> None:
        sp = request.sampling_params
        if sp.guided_choice:
            if self.tokenizer is None:
                raise ValueError("guided_choice requires a tokenizer")
            self.grammars[request.request_id] = ChoiceGrammar(
                sp.guided_choice, self.tokenizer, self.vocab_size,
                self.eos_token_id)
        elif sp.guided_json is not None:
            if self.tokenizer is None:
                raise ValueError("guided_json requires a tokenizer")
            self.grammars[request.request_id] = JsonGrammar(
                self.tokenizer, self.vocab_size, self.eos_token_id)
        elif sp.guided_regex is not None:
            if self.tokenizer is None:
                raise ValueError("guided_regex requires a tokenizer")
            self.grammars[request.request_id] = RegexGrammar(
                sp.guided_regex, self.tokenizer, self.vocab_size,
                self.eos_token_id)

    def has_grammar(self, request_id: str) -> bool:
        return request_id in self.grammars

    def bitmask_for(self, request_id: str) -> Optional[np.ndarray]:
        g = self.grammars.get(request_id)
        if g is None:
            return None
        return g.allowed_token_mask()

    def advance(self, request_id: str, token_ids: List[int]) -> None:
        g = self.grammars.get(request_id)
        if g is None:
            return
        for t in token_ids:
            if not g.advance(t):
                logger.warning("request %s emitted token %d outside its "
                               "grammar", request_id, t)
                break

    def free(self, request_id: str) -> None:
        self.grammars.pop(request_id, None)
