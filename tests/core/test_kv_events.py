"""KV event publication tests (reference: distributed/kv_events.py)."""

from lvllm_tpu.core.kv_cache_manager import KVCacheManager
from lvllm_tpu.core.kv_events import (AllBlocksCleared, BlockRemoved,
                                      BlockStored, KVEventPublisher)
from lvllm_tpu.core.request import Request
from lvllm_tpu.sampling_params import SamplingParams


def test_events_on_store_evict_clear():
    pub = KVEventPublisher()
    events = []
    pub.subscribe(events.append)
    mgr = KVCacheManager(block_size=4, num_blocks=6, enable_caching=True,
                         event_publisher=pub)

    r0 = Request("r0", list(range(9)), SamplingParams())
    mgr.allocate_slots(r0, 9)  # 2 full blocks cached + 1 partial
    stored = [e for e in events if isinstance(e, BlockStored)]
    assert len(stored) == 1
    assert len(stored[0].block_hashes) == 2
    assert stored[0].parent_block_hash is None
    assert stored[0].token_ids == list(range(8))
    assert stored[0].block_size == 4

    # Fill the pool so cached blocks get evicted on reuse.
    mgr.free(r0)
    r1 = Request("r1", list(range(100, 120)), SamplingParams())
    mgr.allocate_slots(r1, 20)
    removed = [e for e in events if isinstance(e, BlockRemoved)]
    assert removed, "eviction should emit BlockRemoved"
    mgr.free(r1)

    mgr.reset_prefix_cache()
    assert any(isinstance(e, AllBlocksCleared) for e in events)
