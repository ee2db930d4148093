"""KV cache event publication.

Counterpart of the reference's ``vllm/distributed/kv_events.py``: the block
pool publishes BlockStored / BlockRemoved / AllBlocksCleared events so
external routers (prefix-cache-aware load balancers) can track which
prefixes each engine holds. In-process subscribers get callbacks; the ZMQ
publisher broadcasts msgpack batches on a pub socket like the reference.
"""

import time
from dataclasses import dataclass, field
from typing import Callable, List, Optional

from lvllm_tpu.logger import init_logger

logger = init_logger(__name__)


@dataclass
class BlockStored:
    block_hashes: List[int]
    parent_block_hash: Optional[int]
    token_ids: List[int]
    block_size: int
    ts: float = field(default_factory=time.time)


@dataclass
class BlockRemoved:
    block_hashes: List[int]
    ts: float = field(default_factory=time.time)


@dataclass
class AllBlocksCleared:
    ts: float = field(default_factory=time.time)


class KVEventPublisher:
    """Fan-out of KV cache events to subscribers (and optionally ZMQ)."""

    def __init__(self, zmq_endpoint: Optional[str] = None):
        self._subscribers: List[Callable] = []
        self._zmq_socket = None
        if zmq_endpoint:
            import msgpack
            import zmq
            self._msgpack = msgpack
            ctx = zmq.Context.instance()
            self._zmq_socket = ctx.socket(zmq.PUB)
            self._zmq_socket.bind(zmq_endpoint)
            logger.info("KV events publishing on %s", zmq_endpoint)

    def subscribe(self, fn: Callable) -> None:
        self._subscribers.append(fn)

    def publish(self, event) -> None:
        for fn in self._subscribers:
            fn(event)
        if self._zmq_socket is not None:
            payload = {"type": type(event).__name__, **event.__dict__}
            self._zmq_socket.send(self._msgpack.packb(payload))

    def close(self) -> None:
        if self._zmq_socket is not None:
            self._zmq_socket.close(0)
