"""Paged KV cache manager with prefix caching.

Counterpart of the reference's ``vllm/v1/core/kv_cache_manager.py``
(KVCacheManager, ``allocate_slots:264``). Single full-attention KV group for
now; the grouped-spec design (hybrid SWA/mamba pools,
``kv_cache_coordinator.py``) layers on top of the same BlockPool.
"""

from dataclasses import dataclass, field
from typing import Dict, List, Optional

from lvllm_tpu.core.block_pool import BlockPool, KVCacheBlock
from lvllm_tpu.core.kv_cache_utils import BlockHash, hash_request_tokens
from lvllm_tpu.core.request import Request
from lvllm_tpu.logger import init_logger

logger = init_logger(__name__)


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


@dataclass
class KVCacheBlocks:
    """Opaque handle returned to the scheduler (reference:
    kv_cache_manager.py KVCacheBlocks)."""

    blocks: List[KVCacheBlock] = field(default_factory=list)

    def get_block_ids(self) -> List[int]:
        return [b.block_id for b in self.blocks]

    def __add__(self, other: "KVCacheBlocks") -> "KVCacheBlocks":
        return KVCacheBlocks(self.blocks + other.blocks)


class KVCacheManager:

    def __init__(
        self,
        block_size: int,
        num_blocks: int,
        max_model_len: int = 4096,
        enable_caching: bool = True,
        event_publisher=None,
        sliding_window: Optional[int] = None,
    ) -> None:
        self.block_size = block_size
        self.max_model_len = max_model_len
        self.enable_caching = enable_caching
        # Uniform sliding-window attention: blocks that fall fully out of
        # every future window are freed eagerly and replaced by the null
        # block (reference: SlidingWindowManager in
        # single_type_kv_cache_manager.py).
        self.sliding_window = sliding_window
        self._num_swa_freed: Dict[str, int] = {}
        self.block_pool = BlockPool(num_blocks, enable_caching,
                                    event_publisher=event_publisher)
        # request_id -> blocks owned (index i covers tokens
        # [i*block_size, (i+1)*block_size)).
        self.req_to_blocks: Dict[str, List[KVCacheBlock]] = {}
        # request_id -> computed full-block hashes (memoized).
        self.req_to_block_hashes: Dict[str, List[BlockHash]] = {}
        # request_id -> number of its blocks already registered in the cache.
        self.num_cached_block: Dict[str, int] = {}
        # Stats (reference: PrefixCacheStats).
        self.prefix_cache_queries = 0
        self.prefix_cache_hits = 0

    @property
    def usage(self) -> float:
        return self.block_pool.get_usage()

    # ---- prefix cache ----------------------------------------------------

    def get_block_hashes(self, request: Request) -> List[BlockHash]:
        bh = self.req_to_block_hashes.get(request.request_id)
        needed = request.num_tokens // self.block_size
        if bh is None or len(bh) < needed:
            bh = hash_request_tokens(self.block_size, request.all_token_ids)
            self.req_to_block_hashes[request.request_id] = bh
        return bh

    def get_computed_blocks(self, request: Request) -> (KVCacheBlocks, int):
        """Longest cached prefix for a new request → (blocks, num_tokens).

        Truncated so at least one prompt token remains to be computed (the
        model must run to emit the first output token), mirroring the
        reference's full-prompt-hit handling.
        """
        if not self.enable_caching:
            return KVCacheBlocks(), 0
        block_hashes = self.get_block_hashes(request)
        self.prefix_cache_queries += 1
        computed: List[KVCacheBlock] = []
        for bh in block_hashes:
            blk = self.block_pool.get_cached_block(bh)
            if blk is None:
                break
            computed.append(blk)
        # Never reuse the entire prompt: drop the last block if it covers it.
        max_cache_hit = (request.num_prompt_tokens - 1) // self.block_size
        if len(computed) > max_cache_hit:
            computed = computed[:max_cache_hit]
        if computed:
            self.prefix_cache_hits += 1
        return KVCacheBlocks(computed), len(computed) * self.block_size

    # ---- allocation ------------------------------------------------------

    def allocate_slots(
        self,
        request: Request,
        num_new_tokens: int,
        new_computed_blocks: Optional[KVCacheBlocks] = None,
        num_lookahead_tokens: int = 0,
    ) -> Optional[KVCacheBlocks]:
        """Allocate blocks for `num_new_tokens` appended after the request's
        current computed tokens. Returns None if not enough free blocks
        (scheduler then preempts). Reference: kv_cache_manager.py:264."""
        assert num_new_tokens > 0
        new_computed = new_computed_blocks.blocks if new_computed_blocks else []

        req_blocks = self.req_to_blocks.setdefault(request.request_id, [])
        num_computed_tokens = request.num_computed_tokens + \
            len(new_computed) * self.block_size
        total_tokens = num_computed_tokens + num_new_tokens + \
            num_lookahead_tokens
        num_required_blocks = cdiv(total_tokens, self.block_size)
        num_new_blocks = num_required_blocks - len(req_blocks) - \
            len(new_computed)

        if num_new_blocks > self.block_pool.get_num_free_blocks():
            return None

        # Commit the prefix-cache hit blocks.
        if new_computed:
            self.block_pool.touch(new_computed)
            req_blocks.extend(new_computed)
            self.num_cached_block[request.request_id] = \
                self.num_cached_block.get(request.request_id, 0) + \
                len(new_computed)

        new_blocks: List[KVCacheBlock] = []
        if num_new_blocks > 0:
            new_blocks = self.block_pool.get_new_blocks(num_new_blocks)
            req_blocks.extend(new_blocks)

        # Register blocks that become full after this step in the prefix
        # cache (lookahead/spec tokens are not cached — unverified).
        if self.enable_caching and not getattr(request, "mm_data", None):
            # Multimodal requests don't publish blocks to the prefix cache:
            # placeholder token ids don't hash the image content.
            num_full_blocks = (num_computed_tokens + num_new_tokens) // \
                self.block_size
            block_hashes = self.get_block_hashes(request)
            num_full_blocks = min(num_full_blocks, len(block_hashes))
            num_cached = self.num_cached_block.get(request.request_id, 0)
            if num_full_blocks > num_cached:
                self.block_pool.cache_full_blocks(
                    req_blocks, block_hashes, num_cached, num_full_blocks)
                self.num_cached_block[request.request_id] = num_full_blocks

        # Sliding-window eviction: a block whose last token is already
        # outside every future query's window can never be read again —
        # queries at position p attend [p - W + 1, p].
        if self.sliding_window is not None:
            # Conservative: only tokens already outside the window of the
            # CURRENT position (num_computed) — this step's new tokens may
            # roll back under spec-decode rejection.
            horizon = num_computed_tokens - self.sliding_window
            dead = max(horizon // self.block_size, 0)
            start = self._num_swa_freed.get(request.request_id, 0)
            if dead > start:
                null = self.block_pool.null_block
                to_free = []
                for i in range(start, min(dead, len(req_blocks))):
                    if req_blocks[i] is not null:
                        to_free.append(req_blocks[i])
                        req_blocks[i] = null
                if to_free:
                    self.block_pool.free_blocks(to_free)
                self._num_swa_freed[request.request_id] = dead

        return KVCacheBlocks(new_blocks)

    def get_blocks(self, request_id: str) -> List[KVCacheBlock]:
        return self.req_to_blocks.get(request_id, [])

    def get_block_ids(self, request_id: str) -> List[int]:
        return [b.block_id for b in self.get_blocks(request_id)]

    def free(self, request: Request) -> None:
        """Release all blocks of a finished/preempted request. Blocks are
        freed tail-first so eviction order prefers deep suffix blocks."""
        blocks = self.req_to_blocks.pop(request.request_id, [])
        self.num_cached_block.pop(request.request_id, None)
        self._num_swa_freed.pop(request.request_id, None)
        null = self.block_pool.null_block
        self.block_pool.free_blocks(
            [b for b in reversed(blocks) if b is not null])

    def free_block_hashes(self, request: Request) -> None:
        self.req_to_block_hashes.pop(request.request_id, None)

    def reset_prefix_cache(self) -> bool:
        return self.block_pool.reset_prefix_cache()

    def make_prefix_cache_stats(self) -> dict:
        return {
            "queries": self.prefix_cache_queries,
            "hits": self.prefix_cache_hits,
            "usage": self.usage,
        }
