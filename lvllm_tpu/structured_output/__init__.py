"""Structured (grammar-constrained) output.

Counterpart of the reference's ``vllm/v1/structured_output/`` —
StructuredOutputManager computing a per-step token bitmask
(``grammar_bitmask:186``) applied in the sampler, with pluggable backends
(xgrammar/guidance/outlines). None of those libraries exist in this image,
so the backends here are self-contained:

- ``ChoiceGrammar``  — guided_choice: trie over the tokenizations of the
  allowed strings (exact-path constraint).
- ``JsonGrammar``    — guided_json (JSON mode): incremental char-level JSON
  validity automaton; token masks derived from each token's decoded text,
  cached per automaton state signature.

The manager hands the runner a dense bool mask per structured row; the
sampler applies ``logits = where(mask, logits, -inf)`` exactly like the
reference's grammar bitmask.
"""

from lvllm_tpu.structured_output.grammar import (ChoiceGrammar, Grammar,
                                                 JsonGrammar)
from lvllm_tpu.structured_output.manager import StructuredOutputManager

__all__ = ["Grammar", "ChoiceGrammar", "JsonGrammar",
           "StructuredOutputManager"]
