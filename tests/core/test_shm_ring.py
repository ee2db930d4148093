"""Native shm broadcast ring tests (cross-process, like the reference's
shm_broadcast MessageQueue usage)."""

import multiprocessing as mp
import os
import time

import pytest

from lvllm_tpu.distributed.shm_ring import ShmMessageQueue


def test_single_process_roundtrip():
    name = f"lvllm_test_{os.getpid()}_a"
    w = ShmMessageQueue(name, n_readers=1, create=True, n_chunks=4)
    r = ShmMessageQueue(name, reader_id=0)
    w.put({"step": 1, "tokens": list(range(100))})
    msg = r.get(timeout=5)
    assert msg["step"] == 1 and len(msg["tokens"]) == 100
    assert r.pending() == 0
    r.close()
    w.close()


def test_ring_wraps_and_blocks():
    name = f"lvllm_test_{os.getpid()}_b"
    w = ShmMessageQueue(name, n_readers=1, create=True, n_chunks=2)
    r = ShmMessageQueue(name, reader_id=0)
    w.put("m0")
    w.put("m1")
    with pytest.raises(TimeoutError):
        w.put("m2", timeout=0.2)  # ring full
    assert r.get() == "m0"
    w.put("m2", timeout=1.0)      # slot freed
    assert r.get() == "m1"
    assert r.get() == "m2"
    r.close()
    w.close()


def _reader_proc(name, rid, count, out_q):
    q = ShmMessageQueue(name, reader_id=rid)
    got = [q.get(timeout=30) for _ in range(count)]
    out_q.put((rid, got))
    q.close()


def test_broadcast_two_process_readers():
    ctx = mp.get_context("spawn")
    name = f"lvllm_test_{os.getpid()}_c"
    w = ShmMessageQueue(name, n_readers=2, create=True, n_chunks=8)
    out_q = ctx.Queue()
    readers = [ctx.Process(target=_reader_proc, args=(name, i, 50, out_q))
               for i in range(2)]
    for p in readers:
        p.start()
    msgs = [{"i": i, "payload": "x" * 100} for i in range(50)]
    for m in msgs:
        w.put(m, timeout=30)
    results = {}
    for _ in range(2):
        rid, got = out_q.get(timeout=60)
        results[rid] = got
    for p in readers:
        p.join(timeout=30)
        assert p.exitcode == 0
    # Every reader sees every message in order (broadcast semantics).
    for rid in (0, 1):
        assert [m["i"] for m in results[rid]] == list(range(50))
    w.close()


def test_oversized_message_rejected():
    name = f"lvllm_test_{os.getpid()}_d"
    w = ShmMessageQueue(name, n_readers=1, create=True, chunk_size=1024,
                        n_chunks=2)
    with pytest.raises(ValueError):
        w.put("y" * 4096)
    w.close()
