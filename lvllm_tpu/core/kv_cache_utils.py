"""KV block hashing utilities for prefix caching.

Counterpart of the reference's ``vllm/v1/core/kv_cache_utils.py``: each full
block of tokens gets a chain hash ``H(parent_hash, tokens_in_block)`` so a
prompt prefix maps to a unique block chain reusable across requests.
"""

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

# Sentinel parent hash for the first block of a sequence.
NONE_HASH = 0x9E3779B97F4A7C15


@dataclass(frozen=True)
class BlockHash:
    value: int
    # Token ids included, kept for collision-safety comparison (the reference
    # stores token ids alongside the hash for exact matching).
    token_ids: Tuple[int, ...]


def hash_block_tokens(
    parent_hash: int,
    token_ids: Sequence[int],
    extra_key: Optional[object] = None,
) -> BlockHash:
    """Chain-hash one full block of tokens onto its parent.

    ``extra_key`` isolates cache namespaces (e.g. LoRA id, MM hashes) like
    the reference's extra_keys.
    """
    h = hash((parent_hash, tuple(token_ids), extra_key))
    return BlockHash(h, tuple(token_ids))


def hash_request_tokens(
    block_size: int,
    token_ids: Sequence[int],
    extra_key: Optional[object] = None,
) -> List[BlockHash]:
    """Hash all *full* blocks of a token sequence (partial tail excluded)."""
    hashes: List[BlockHash] = []
    parent = NONE_HASH
    for start in range(0, len(token_ids) - block_size + 1, block_size):
        bh = hash_block_tokens(parent, token_ids[start:start + block_size],
                               extra_key)
        hashes.append(bh)
        parent = bh.value
    return hashes
