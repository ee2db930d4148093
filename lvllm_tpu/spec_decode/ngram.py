"""N-gram speculative-decoding proposer.

Counterpart of the reference's ngram proposer
(``vllm/v1/spec_decode/ngram_proposer.py``): propose the continuation that
followed the most recent occurrence of the current suffix n-gram in the
request's own token history. Pure host-side; drafts are verified by the
runner's multi-position sampling step.
"""

from dataclasses import dataclass
from typing import List, Sequence


@dataclass
class NgramConfig:
    num_speculative_tokens: int = 4
    min_ngram: int = 2
    max_ngram: int = 4


class NgramProposer:

    def __init__(self, config: NgramConfig):
        self.config = config

    def propose(self, token_ids: Sequence[int]) -> List[int]:
        """Longest-suffix-match proposal: for n from max_ngram down to
        min_ngram, find the previous occurrence of the last n tokens and
        return the tokens that followed it."""
        c = self.config
        k = c.num_speculative_tokens
        toks = list(token_ids)
        L = len(toks)
        if L < c.min_ngram + 1:
            return []
        for n in range(min(c.max_ngram, L - 1), c.min_ngram - 1, -1):
            suffix = toks[L - n:]
            # Search latest earlier occurrence (excluding the suffix itself).
            for start in range(L - n - 1, -1, -1):
                if toks[start:start + n] == suffix:
                    cont = toks[start + n:start + n + k]
                    if cont:
                        return cont
                    break
        return []
