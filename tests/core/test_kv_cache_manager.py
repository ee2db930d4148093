"""Deviceless KV cache manager tests.

Modeled on the reference's ``tests/v1/core/test_prefix_caching.py`` /
``test_kv_cache_utils.py`` strategy: construct the manager directly with a
synthetic config and drive allocation without any device.
"""

import pytest

from lvllm_tpu.core.kv_cache_manager import KVCacheManager
from lvllm_tpu.core.kv_cache_utils import hash_request_tokens
from lvllm_tpu.core.request import Request
from lvllm_tpu.sampling_params import SamplingParams

pytestmark = pytest.mark.smoke


def make_request(rid, prompt_len, prompt=None):
    tokens = prompt if prompt is not None else list(range(prompt_len))
    return Request(rid, tokens, SamplingParams(max_tokens=8))


def test_basic_alloc_free():
    mgr = KVCacheManager(block_size=16, num_blocks=11, enable_caching=True)
    req = make_request("r0", 48)  # 3 blocks
    blocks = mgr.allocate_slots(req, 48)
    assert blocks is not None
    assert len(blocks.blocks) == 3
    assert mgr.block_pool.get_num_free_blocks() == 10 - 3
    mgr.free(req)
    assert mgr.block_pool.get_num_free_blocks() == 10


def test_alloc_fails_when_full():
    mgr = KVCacheManager(block_size=16, num_blocks=5, enable_caching=True)
    r0 = make_request("r0", 48)
    assert mgr.allocate_slots(r0, 48) is not None
    r1 = make_request("r1", 48)
    assert mgr.allocate_slots(r1, 48) is None  # only 1 free block left


def test_decode_grows_blocks():
    mgr = KVCacheManager(block_size=16, num_blocks=10, enable_caching=True)
    req = make_request("r0", 16)
    assert len(mgr.allocate_slots(req, 16).blocks) == 1
    req.num_computed_tokens = 16
    req.append_output_token_ids(list(range(100, 101)))
    # 17th token needs a second block.
    got = mgr.allocate_slots(req, 1)
    assert len(got.blocks) == 1
    assert len(mgr.get_blocks("r0")) == 2


def test_prefix_cache_hit_after_free():
    mgr = KVCacheManager(block_size=16, num_blocks=10, enable_caching=True)
    prompt = list(range(40))  # 2 full blocks + 8 tokens
    r0 = make_request("r0", 0, prompt)
    blocks0, cached0 = mgr.get_computed_blocks(r0)
    assert cached0 == 0
    mgr.allocate_slots(r0, 40, new_computed_blocks=blocks0)
    ids0 = mgr.get_block_ids("r0")
    mgr.free(r0)

    # Same prompt again: 2-block prefix hit, same physical blocks.
    r1 = Request("r1", prompt, SamplingParams())
    blocks1, cached1 = mgr.get_computed_blocks(r1)
    assert cached1 == 32
    assert [b.block_id for b in blocks1.blocks] == ids0[:2]
    r1.num_computed_tokens = 0
    out = mgr.allocate_slots(r1, 40 - cached1, new_computed_blocks=blocks1)
    assert out is not None
    assert mgr.get_block_ids("r1")[:2] == ids0[:2]


def test_prefix_hit_never_covers_full_prompt():
    mgr = KVCacheManager(block_size=16, num_blocks=10, enable_caching=True)
    prompt = list(range(32))  # exactly 2 full blocks
    r0 = make_request("r0", 0, prompt)
    b, c = mgr.get_computed_blocks(r0)
    mgr.allocate_slots(r0, 32, new_computed_blocks=b)
    mgr.free(r0)

    r1 = Request("r1", prompt, SamplingParams())
    blocks, cached = mgr.get_computed_blocks(r1)
    # Hit truncated to 1 block so the last prompt token is still computed.
    assert cached == 16


def test_shared_prefix_refcount():
    mgr = KVCacheManager(block_size=16, num_blocks=10, enable_caching=True)
    prompt = list(range(33))
    r0 = Request("r0", prompt, SamplingParams())
    b0, c0 = mgr.get_computed_blocks(r0)
    mgr.allocate_slots(r0, 33, new_computed_blocks=b0)

    r1 = Request("r1", prompt + [99], SamplingParams())
    b1, c1 = mgr.get_computed_blocks(r1)
    assert c1 == 32  # both full blocks cached while r0 still holds them
    mgr.allocate_slots(r1, 34 - c1, new_computed_blocks=b1)
    shared = mgr.get_blocks("r1")[0]
    assert shared.ref_cnt == 2
    mgr.free(r0)
    assert shared.ref_cnt == 1


def test_lru_eviction_order():
    mgr = KVCacheManager(block_size=16, num_blocks=4, enable_caching=True)
    r0 = Request("r0", list(range(16)), SamplingParams())
    mgr.allocate_slots(r0, 16)
    r1 = Request("r1", list(range(100, 116)), SamplingParams())
    mgr.allocate_slots(r1, 16)
    mgr.free(r0)
    mgr.free(r1)
    # Allocate 3 blocks: should evict r0's block first (freed earlier).
    r2 = Request("r2", list(range(200, 248)), SamplingParams())
    got = mgr.allocate_slots(r2, 48)
    assert got is not None
    # Now neither old prefix should fully hit (blocks reused), but the
    # manager must not crash on lookup.
    r3 = Request("r3", list(range(16)) + [1, 2], SamplingParams())
    _, cached = mgr.get_computed_blocks(r3)
    assert cached == 0


def test_block_hash_chain():
    h1 = hash_request_tokens(4, [1, 2, 3, 4, 5, 6, 7, 8, 9])
    assert len(h1) == 2
    h2 = hash_request_tokens(4, [1, 2, 3, 4, 5, 6, 7, 99])
    assert h1[0] == h2[0]
    assert h1[1] != h2[1]


def test_reset_prefix_cache():
    mgr = KVCacheManager(block_size=16, num_blocks=6, enable_caching=True)
    r0 = Request("r0", list(range(32)), SamplingParams())
    b, c = mgr.get_computed_blocks(r0)
    mgr.allocate_slots(r0, 32, new_computed_blocks=b)
    assert not mgr.reset_prefix_cache()  # blocks in use
    mgr.free(r0)
    assert mgr.reset_prefix_cache()
    r1 = Request("r1", list(range(32)), SamplingParams())
    _, cached = mgr.get_computed_blocks(r1)
    assert cached == 0
