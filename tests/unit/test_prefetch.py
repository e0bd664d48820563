"""DevicePrefetcher: ordering, staging, error/exhaustion propagation
(SURVEY.md §2 #16 "prefetch to device")."""

import threading
import time

import numpy as np
import pytest

from seqrec_tpu.data.prefetch import DevicePrefetcher


def _source(n):
    for i in range(n):
        yield i % 3, {"inputs": np.full((2, 4), i, np.int32)}


def test_order_and_values_preserved():
    staged = []

    def put(b):
        staged.append(int(b["inputs"][0, 0]))
        return {k: v + 100 for k, v in b.items()}

    pf = DevicePrefetcher(_source(7), put, depth=2)
    got = list(pf)
    assert [b for b, _ in got] == [i % 3 for i in range(7)]
    assert [int(d["inputs"][0, 0]) - 100 for _, d in got] == list(range(7))
    assert staged == list(range(7))
    pf.close()


def test_stages_ahead_of_consumer():
    """With depth=3 the feeder should stage batches while the consumer
    sleeps — i.e. put_batch runs ahead of __next__."""
    put_times = []

    def put(b):
        put_times.append(time.perf_counter())
        return b

    pf = DevicePrefetcher(_source(4), put, depth=3)
    deadline = time.perf_counter() + 5.0
    while len(put_times) < 3 and time.perf_counter() < deadline:
        time.sleep(0.01)
    # 3 batches staged before the consumer pulled anything.
    assert len(put_times) >= 3
    assert len(list(pf)) == 4
    pf.close()


def test_source_error_surfaces_in_consumer():
    def bad_source():
        yield 0, {"inputs": np.zeros((1, 1), np.int32)}
        raise RuntimeError("disk on fire")

    pf = DevicePrefetcher(bad_source(), lambda b: b, depth=2)
    next(pf)
    with pytest.raises(RuntimeError, match="disk on fire"):
        next(pf)
    pf.close()


def test_exhaustion_is_stopiteration():
    pf = DevicePrefetcher(_source(2), lambda b: b, depth=4)
    assert len(list(pf)) == 2
    with pytest.raises(StopIteration):
        next(pf)
    pf.close()


def test_close_unblocks_full_queue_feeder():
    """Consumer abandons the stream mid-way; close() must not hang even
    though the feeder is blocked on a full queue."""
    pf = DevicePrefetcher(_source(100), lambda b: b, depth=1)
    next(pf)
    t0 = time.perf_counter()
    pf.close()
    assert time.perf_counter() - t0 < 5.0
    assert not pf._thread.is_alive()


def test_infinite_source_close_from_other_thread():
    def forever():
        i = 0
        while True:
            yield 0, {"inputs": np.full((1,), i, np.int32)}
            i += 1

    pf = DevicePrefetcher(forever(), lambda b: b, depth=2)
    for _ in range(5):
        next(pf)
    closer = threading.Thread(target=pf.close)
    closer.start()
    closer.join(timeout=5.0)
    assert not closer.is_alive()
