"""Paged KV block pool with prefix-cache reuse and LRU eviction.

Counterpart of the reference's ``vllm/v1/core/block_pool.py`` (BlockPool,
``cache_full_blocks:211``): a fixed set of blocks, a free list ordered by
eviction priority (LRU), and a hash→block map for prefix-cache hits. Freed
blocks keep their hash and stay reusable until re-allocated.
"""

from typing import Dict, List, Optional

from lvllm_tpu.core.kv_cache_utils import BlockHash
from lvllm_tpu.logger import init_logger

logger = init_logger(__name__)


class KVCacheBlock:
    __slots__ = ("block_id", "ref_cnt", "block_hash", "prev_free_block",
                 "next_free_block")

    def __init__(self, block_id: int) -> None:
        self.block_id = block_id
        self.ref_cnt = 0
        self.block_hash: Optional[BlockHash] = None
        # Doubly-linked free-list pointers (None when not free).
        self.prev_free_block: Optional["KVCacheBlock"] = None
        self.next_free_block: Optional["KVCacheBlock"] = None

    def __repr__(self) -> str:
        return (f"KVCacheBlock(id={self.block_id}, ref={self.ref_cnt}, "
                f"hash={'set' if self.block_hash else None})")


class FreeKVCacheBlockQueue:
    """O(1) doubly-linked LRU free queue (reference: kv_cache_utils.py
    FreeKVCacheBlockQueue). Head = least-recently-used = first evicted."""

    def __init__(self, blocks: List[KVCacheBlock]) -> None:
        self.num_free_blocks = 0
        # Sentinel head/tail simplify edge cases.
        self._head = KVCacheBlock(-1)
        self._tail = KVCacheBlock(-2)
        self._head.next_free_block = self._tail
        self._tail.prev_free_block = self._head
        for b in blocks:
            self.append(b)

    def popleft(self) -> KVCacheBlock:
        block = self._head.next_free_block
        if block is self._tail:
            raise ValueError("No free blocks available")
        self.remove(block)
        return block

    def remove(self, block: KVCacheBlock) -> None:
        prev, nxt = block.prev_free_block, block.next_free_block
        assert prev is not None and nxt is not None, \
            f"block {block.block_id} not in free queue"
        prev.next_free_block = nxt
        nxt.prev_free_block = prev
        block.prev_free_block = None
        block.next_free_block = None
        self.num_free_blocks -= 1

    def append(self, block: KVCacheBlock) -> None:
        last = self._tail.prev_free_block
        last.next_free_block = block
        block.prev_free_block = last
        block.next_free_block = self._tail
        self._tail.prev_free_block = block
        self.num_free_blocks += 1

    def get_all_free_blocks(self) -> List[KVCacheBlock]:
        out = []
        cur = self._head.next_free_block
        while cur is not self._tail:
            out.append(cur)
            cur = cur.next_free_block
        return out


class BlockPool:
    """Fixed pool of KV blocks with prefix caching.

    Block 0 is reserved as the *null block* (written by padded slots),
    matching the reference's null_block convention.
    """

    def __init__(self, num_blocks: int, enable_caching: bool = True,
                 event_publisher=None) -> None:
        assert num_blocks > 1
        self.num_blocks = num_blocks
        self.enable_caching = enable_caching
        self.event_publisher = event_publisher
        self.blocks = [KVCacheBlock(i) for i in range(num_blocks)]
        self.null_block = self.blocks[0]
        self.null_block.ref_cnt = 1  # never allocatable
        self.free_block_queue = FreeKVCacheBlockQueue(self.blocks[1:])
        # block-hash value -> {block_id: block} (multiple possible on
        # collision; exact token match checked by caller via BlockHash).
        self.cached_block_hash_to_block: Dict[int, Dict[int, KVCacheBlock]] = {}

    def get_num_free_blocks(self) -> int:
        return self.free_block_queue.num_free_blocks

    def get_usage(self) -> float:
        usable = self.num_blocks - 1
        return 1.0 - self.get_num_free_blocks() / usable

    # ---- prefix cache lookup ---------------------------------------------

    def get_cached_block(self, block_hash: BlockHash) -> Optional[KVCacheBlock]:
        cands = self.cached_block_hash_to_block.get(block_hash.value)
        if not cands:
            return None
        for blk in cands.values():
            if blk.block_hash is not None and \
                    blk.block_hash.token_ids == block_hash.token_ids:
                return blk
        return None

    def touch(self, blocks: List[KVCacheBlock]) -> None:
        """Increase ref count; pull cached-but-free blocks out of the free
        queue (a prefix-cache hit revives an evictable block)."""
        for blk in blocks:
            if blk.ref_cnt == 0 and blk is not self.null_block:
                self.free_block_queue.remove(blk)
            blk.ref_cnt += 1

    # ---- allocation -------------------------------------------------------

    def get_new_blocks(self, num_blocks: int) -> List[KVCacheBlock]:
        if num_blocks > self.get_num_free_blocks():
            raise ValueError(f"Cannot allocate {num_blocks} blocks "
                             f"({self.get_num_free_blocks()} free)")
        out: List[KVCacheBlock] = []
        for _ in range(num_blocks):
            blk = self.free_block_queue.popleft()
            # Evict: drop the stale cache entry of the reused block.
            self._maybe_evict_cached_block(blk)
            blk.ref_cnt = 1
            out.append(blk)
        return out

    def _maybe_evict_cached_block(self, block: KVCacheBlock) -> None:
        bh = block.block_hash
        if bh is None:
            return
        cands = self.cached_block_hash_to_block.get(bh.value)
        if cands is not None:
            cands.pop(block.block_id, None)
            if not cands:
                del self.cached_block_hash_to_block[bh.value]
        if self.event_publisher is not None:
            from lvllm_tpu.core.kv_events import BlockRemoved
            self.event_publisher.publish(BlockRemoved(
                block_hashes=[bh.value]))
        block.block_hash = None

    def cache_full_blocks(
        self,
        blocks: List[KVCacheBlock],
        block_hashes: List[BlockHash],
        num_cached_blocks: int,
        num_full_blocks: int,
    ) -> None:
        """Register newly-full blocks in the prefix cache (reference:
        block_pool.py:211 cache_full_blocks)."""
        if not self.enable_caching:
            return
        stored = []
        for i in range(num_cached_blocks, num_full_blocks):
            blk = blocks[i]
            if blk.block_hash is not None:
                continue  # already cached (shared hit)
            bh = block_hashes[i]
            blk.block_hash = bh
            self.cached_block_hash_to_block.setdefault(bh.value, {})[
                blk.block_id] = blk
            stored.append((i, bh))
        if stored and self.event_publisher is not None:
            from lvllm_tpu.core.kv_events import BlockStored
            from lvllm_tpu.core.kv_cache_utils import NONE_HASH
            first = stored[0][0]
            parent = (block_hashes[first - 1].value if first > 0
                      else None)
            self.event_publisher.publish(BlockStored(
                block_hashes=[bh.value for _, bh in stored],
                parent_block_hash=parent,
                token_ids=[t for _, bh in stored for t in bh.token_ids],
                block_size=len(stored[0][1].token_ids)))

    def free_blocks(self, ordered_blocks: List[KVCacheBlock]) -> None:
        """Decrement refs; fully-freed blocks enter the free queue in the
        given order (callers pass eviction order: tail blocks first)."""
        for blk in ordered_blocks:
            if blk is self.null_block:
                continue
            blk.ref_cnt -= 1
            assert blk.ref_cnt >= 0, f"double free of block {blk.block_id}"
            if blk.ref_cnt == 0:
                self.free_block_queue.append(blk)

    def reset_prefix_cache(self) -> bool:
        """Drop all cached hashes (reference: scheduler reset_prefix_cache).
        Only valid when no request holds blocks."""
        if self.get_num_free_blocks() != self.num_blocks - 1:
            logger.warning("reset_prefix_cache failed: blocks in use")
            return False
        self.cached_block_hash_to_block.clear()
        for blk in self.blocks:
            blk.block_hash = None
        if self.event_publisher is not None:
            from lvllm_tpu.core.kv_events import AllBlocksCleared
            self.event_publisher.publish(AllBlocksCleared())
        return True
