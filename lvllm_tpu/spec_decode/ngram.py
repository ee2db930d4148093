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

    def propose_chains(self, token_ids: Sequence[int],
                       n_chains: int) -> List[List[int]]:
        """Multi-candidate proposal (tree speculation via row expansion):
        distinct continuations from SEVERAL earlier occurrences of the
        suffix n-gram, most recent first — each becomes a verification
        chain. Reference capability: speculative_token_tree +
        tree_attn.py:32 (the reference branches an EAGLE tree; the n-gram
        analog branches on occurrence sites)."""
        c = self.config
        k = c.num_speculative_tokens
        toks = list(token_ids)
        L = len(toks)
        if L < c.min_ngram + 1:
            return []
        chains: List[List[int]] = []
        seen = set()
        for n in range(min(c.max_ngram, L - 1), c.min_ngram - 1, -1):
            suffix = toks[L - n:]
            for start in range(L - n - 1, -1, -1):
                if toks[start:start + n] == suffix:
                    cont = toks[start + n:start + n + k]
                    key = tuple(cont)
                    if cont and key not in seen:
                        seen.add(key)
                        chains.append(cont)
                        if len(chains) >= n_chains:
                            return chains
            # Fall through to shorter n-gram orders: weaker matches make
            # good hedge chains (longest-match continuation stays chain 0).
        return chains
