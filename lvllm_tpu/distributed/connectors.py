"""Composable KV connectors.

Counterpart of the reference's connector composition plane
(``distributed/kv_transfer/kv_connector/v1/multi_connector.py:126`` and
``offloading_connector.py:44``): prefix KV for a request may come from
SEVERAL sources — a P/D handoff from a prefill engine, the decode
engine's own host tier, future remote stores — and the sources stack:
coverage extends block by block through whichever connector can supply
the next block.

TPU-native injection: supplied blocks are materialized as prefix-cache
entries on the decode engine (see ``kv_connector.inject_and_decode_
request``), so the scheduler needs no special-casing regardless of how
many connectors contributed.
"""

from typing import List, Optional, Sequence

import numpy as np

from lvllm_tpu.logger import init_logger

logger = init_logger(__name__)


class KVConnectorBase:
    """One source of full-block prefix KV."""

    name = "base"

    def can_supply(self, block_idx: int, block_hash) -> bool:
        raise NotImplementedError

    def fetch(self, block_idx: int, block_hash) -> List[np.ndarray]:
        """Per-layer [2, BS, H, D] pages for one block."""
        raise NotImplementedError


class HandoffConnector(KVConnectorBase):
    """Blocks carried by a P/D KVHandoff (disagg prefill engine)."""

    name = "p2p_handoff"

    def __init__(self, handoff, block_size: int):
        from lvllm_tpu.core.kv_cache_utils import hash_request_tokens
        self.handoff = handoff
        self.n_blocks = handoff.num_full_block_tokens // block_size
        self.hashes = hash_request_tokens(block_size,
                                          handoff.prompt_token_ids)

    def can_supply(self, block_idx: int, block_hash) -> bool:
        return (block_idx < self.n_blocks
                and block_idx < len(self.hashes)
                and self.hashes[block_idx] == block_hash)

    def fetch(self, block_idx: int, block_hash) -> List[np.ndarray]:
        return [layer[:, block_idx] for layer in self.handoff.kv_blocks]


class HostTierConnector(KVConnectorBase):
    """The engine's own host-RAM KV tier (offload/kv_offload.py) exposed
    through the connector interface — lets host-offloaded prefixes and
    P/D transfers stack for one request chain (reference:
    offloading_connector.py:44)."""

    name = "host_tier"

    def __init__(self, manager, worker):
        self.manager = manager
        self.worker = worker

    def can_supply(self, block_idx: int, block_hash) -> bool:
        return self.manager._key(block_hash) in self.manager.index

    def fetch(self, block_idx: int, block_hash) -> List[np.ndarray]:
        slot = self.manager.index[self.manager._key(block_hash)]
        self.manager.index.move_to_end(self.manager._key(block_hash))
        self.manager.hits += 1
        # [slots, 2, BS, H, D] host layout → per-layer [2, BS, H, D].
        return [host[slot] for host in self.worker._host]


class MultiConnector(KVConnectorBase):
    """Ordered composition: coverage extends while ANY child can supply
    the next block; each block is fetched from the first child that has
    it (reference MultiConnector semantics)."""

    name = "multi"

    def __init__(self, children: Sequence[KVConnectorBase]):
        self.children = [c for c in children if c is not None]
        self.stats = {c.name: 0 for c in self.children}

    def can_supply(self, block_idx: int, block_hash) -> bool:
        return any(c.can_supply(block_idx, block_hash)
                   for c in self.children)

    def fetch(self, block_idx: int, block_hash) -> List[np.ndarray]:
        for c in self.children:
            if c.can_supply(block_idx, block_hash):
                self.stats[c.name] += 1
                return c.fetch(block_idx, block_hash)
        raise KeyError(block_hash)

    def covered_prefix_blocks(self, hashes: Sequence) -> int:
        n = 0
        for i, h in enumerate(hashes):
            if not self.can_supply(i, h):
                break
            n += 1
        return n


def host_tier_connector_for(engine) -> Optional[HostTierConnector]:
    """The engine's host tier as a connector (None when swap space is
    off)."""
    mgr = getattr(engine.core, "kv_offload_manager", None)
    worker = getattr(engine.core, "_kv_offload_worker", None)
    if mgr is None or worker is None:
        return None
    return HostTierConnector(mgr, worker)
