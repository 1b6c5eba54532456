"""Host pipelining helpers (utils/threadsafe.py — the reference's
threadsafe_containers analog, SURVEY.md §2.1)."""

import threading
import time

import pytest

from claragenomicsanalysis_tpu.utils.threadsafe import (
    ThreadsafeProducerConsumerQueue, prefetch_map)


def test_queue_multi_consumer_close():
    q = ThreadsafeProducerConsumerQueue(maxsize=4)
    seen = []
    lock = threading.Lock()

    def consumer():
        for item in q:
            with lock:
                seen.append(item)

    threads = [threading.Thread(target=consumer) for _ in range(3)]
    for t in threads:
        t.start()
    for i in range(20):
        q.put(i)
    q.close()
    for t in threads:
        t.join(timeout=5)
    assert sorted(seen) == list(range(20))


def test_prefetch_map_order_and_overlap():
    started = []

    def slow_double(x):
        started.append(x)
        time.sleep(0.01)
        return 2 * x

    out = []
    for v in prefetch_map(slow_double, range(6), depth=2):
        out.append(v)
        # the producer runs ahead: by the time we consume item i, item i+1
        # (at least) has usually started
    assert out == [0, 2, 4, 6, 8, 10]
    assert started == list(range(6))


def test_prefetch_map_propagates_errors():
    def boom(x):
        if x == 3:
            raise ValueError("x3")
        return x

    it = prefetch_map(boom, range(10), depth=2)
    got = [next(it), next(it), next(it)]
    assert got == [0, 1, 2]
    with pytest.raises(ValueError):
        list(it)
