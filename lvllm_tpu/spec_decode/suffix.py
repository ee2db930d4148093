"""Suffix decoding: cross-request frequency-weighted suffix-tree drafts.

Behavioral reference: ``/root/reference/vllm/v1/spec_decode/suffix_
decoding.py`` (Arctic suffix-decoding backend): a global suffix tree over
previously completed responses proposes continuations for repetitive
workloads (agentic loops, templated output); each request also matches
against its own history (the ngram fallback).

Host-side, deviceless. The engine verifies drafts by exact match, so a bad
tree only costs acceptance, never correctness.
"""

from dataclasses import dataclass
from typing import Dict, List, Sequence

from lvllm_tpu.spec_decode.ngram import NgramConfig, NgramProposer


@dataclass
class SuffixConfig:
    num_speculative_tokens: int = 4
    max_depth: int = 24          # trie depth (tokens)
    max_suffix: int = 8          # longest suffix used for matching
    min_suffix: int = 2
    max_cached_sequences: int = 512


class _Node(dict):
    __slots__ = ("count",)

    def __init__(self):
        super().__init__()
        self.count = 0


class SuffixProposer:

    def __init__(self, config: SuffixConfig):
        self.config = config
        self.root = _Node()
        self._cached: List[List[int]] = []
        self._ngram = NgramProposer(NgramConfig(
            num_speculative_tokens=config.num_speculative_tokens,
            min_ngram=config.min_suffix, max_ngram=config.max_suffix))

    # ---- tree maintenance ---------------------------------------------

    def _insert(self, seq: Sequence[int]) -> None:
        D = self.config.max_depth
        seq = list(seq)
        for i in range(len(seq)):
            node = self.root
            for tok in seq[i:i + D]:
                node = node.setdefault(tok, _Node())
                node.count += 1

    def _remove(self, seq: Sequence[int]) -> None:
        D = self.config.max_depth
        for i in range(len(seq)):
            node = self.root
            for tok in seq[i:i + D]:
                child = node.get(tok)
                if child is None:
                    break
                child.count -= 1
                if child.count <= 0:
                    del node[tok]
                    break
                node = child

    def observe_finished(self, token_ids: Sequence[int]) -> None:
        """Add a completed request's tokens to the global tree (LRU-bounded
        like the reference's max_cached_requests)."""
        seq = list(token_ids)
        if not seq:
            return
        self._cached.append(seq)
        self._insert(seq)
        while len(self._cached) > self.config.max_cached_sequences:
            self._remove(self._cached.pop(0))

    # ---- proposal -------------------------------------------------------

    def propose(self, token_ids: Sequence[int]) -> List[int]:
        c = self.config
        toks = list(token_ids)
        k = c.num_speculative_tokens
        # Longest suffix that exists in the global tree wins; greedy
        # max-count walk extends it.
        for n in range(min(c.max_suffix, len(toks)), c.min_suffix - 1, -1):
            node = self.root
            ok = True
            for tok in toks[-n:]:
                node = node.get(tok)
                if node is None:
                    ok = False
                    break
            if not ok or not node:
                continue
            drafts: List[int] = []
            while node and len(drafts) < k:
                tok, child = max(node.items(), key=lambda kv: kv[1].count)
                drafts.append(tok)
                node = child
            if drafts:
                return drafts
        # Fallback: self-history ngram match.
        return self._ngram.propose(toks)
