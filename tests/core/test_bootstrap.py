"""TCP-store bootstrap tests (reference: StatelessProcessGroup/TCPStore
rendezvous in vllm/distributed/utils.py)."""

import pickle
import threading

from lvllm_tpu.distributed.bootstrap import (TCPStoreClient, TCPStoreServer,
                                             rendezvous)


def test_store_set_get_wait_add():
    srv = TCPStoreServer()
    try:
        c = TCPStoreClient(*srv.addr)
        assert c.get("x") is None
        c.set("x", b"hello")
        assert c.get("x") == b"hello"
        assert c.add("n", 2) == 2
        assert c.add("n", 1) == 3

        got = {}

        def waiter():
            c2 = TCPStoreClient(*srv.addr)
            got["y"] = c2.wait("y", timeout_s=10)
            c2.close()

        t = threading.Thread(target=waiter)
        t.start()
        c.set("y", b"later")
        t.join(timeout=10)
        assert got["y"] == b"later"
        c.close()
    finally:
        srv.close()


def test_rendezvous_collects_all_ranks():
    srv = TCPStoreServer()
    try:
        results = {}

        def member(rank):
            c = TCPStoreClient(*srv.addr)
            peers = rendezvous(c, "g0", rank, 3,
                               pickle.dumps(("host", 9000 + rank)))
            results[rank] = [pickle.loads(p) for p in peers]
            c.close()

        threads = [threading.Thread(target=member, args=(r,))
                   for r in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
        want = [("host", 9000 + r) for r in range(3)]
        assert all(results[r] == want for r in range(3))
    finally:
        srv.close()
