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
            schema = sp.guided_json
            if isinstance(schema, (str, bytes)):
                import json as _json
                try:
                    schema = _json.loads(schema)
                except ValueError:
                    raise ValueError("guided_json is not valid JSON")
            if isinstance(schema, dict) and schema:
                # Schema-enforcing path (reference compiles the schema:
                # backend_xgrammar.py:81): JSON Schema -> EBNF -> Earley
                # token masks. guided_json=True / {} means plain
                # JSON-mode below.
                from lvllm_tpu.structured_output.ebnf import EbnfGrammar
                from lvllm_tpu.structured_output.json_schema import \
                    schema_to_ebnf
                self.grammars[request.request_id] = EbnfGrammar(
                    schema_to_ebnf(schema), self.tokenizer,
                    self.vocab_size, self.eos_token_id)
            else:
                self.grammars[request.request_id] = JsonGrammar(
                    self.tokenizer, self.vocab_size, self.eos_token_id)
        elif sp.guided_regex is not None:
            if self.tokenizer is None:
                raise ValueError("guided_regex requires a tokenizer")
            self.grammars[request.request_id] = RegexGrammar(
                sp.guided_regex, self.tokenizer, self.vocab_size,
                self.eos_token_id)
        elif sp.guided_grammar is not None:
            if self.tokenizer is None:
                raise ValueError("guided_grammar requires a tokenizer")
            from lvllm_tpu.structured_output.ebnf import EbnfGrammar
            self.grammars[request.request_id] = EbnfGrammar(
                sp.guided_grammar, self.tokenizer, self.vocab_size,
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

    def jump_forward(self, request_id: str) -> List[int]:
        """Jump-forward decoding (SGLang-style; the reference's structured
        backends expose the same idea as ``find_jump_forward_string``):
        when the grammar admits exactly one continuation, return its token
        ids — already advanced through the grammar — so the engine can
        append them without sampling steps. Their KV is computed by the
        scheduler's next multi-token catch-up step."""
        g = self.grammars.get(request_id)
        if g is None:
            return []
        if hasattr(g, "forced_tokens"):          # token-trie (choice)
            toks = g.forced_tokens()
            for t in toks:
                if not g.advance(t):             # keeps state consistent
                    return []
            return toks
        fc = getattr(g, "forced_continuation", None)
        if fc is None:
            return []
        text = fc()
        if len(text) < 2:       # a 1-char jump rarely beats one decode step
            return []
        try:
            toks = list(self.tokenizer.encode(text,
                                              add_special_tokens=False))
        except TypeError:
            toks = list(self.tokenizer.encode(text))
        except Exception:  # noqa: BLE001
            return []
        if not toks:
            return []
        # Verify the tokenization round-trips to exactly the forced text
        # and each token advances the grammar (tokenizers may normalize).
        joined = "".join(self.tokenizer.decode([t]) for t in toks)
        if joined != text:
            return []
        for i, t in enumerate(toks):
            if not g.advance(t):
                logger.warning("jump-forward token %d rejected by its own "
                               "grammar for %s", t, request_id)
                return toks[:i]  # already-advanced prefix must be emitted
        return toks
