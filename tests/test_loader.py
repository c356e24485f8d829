"""Prefetching loader tests."""

import time

from d3feat_tpu.data.loader import prefetch


def test_prefetch_yields_all_items():
    def make():
        return iter(range(20))

    got = []
    for x in prefetch(make, buffer_size=4, num_threads=1):
        got.append(x)
    assert sorted(got) == list(range(20))


def test_prefetch_two_threads_interleave():
    def make():
        return iter([1, 2, 3])

    got = list(prefetch(make, buffer_size=2, num_threads=2))
    assert sorted(got) == [1, 1, 2, 2, 3, 3]


def test_prefetch_overlaps_production():
    """Consumer latency should hide producer latency."""
    def make():
        def gen():
            for i in range(6):
                time.sleep(0.05)
                yield i
        return gen()

    t0 = time.perf_counter()
    for _ in prefetch(make, buffer_size=4, num_threads=1):
        time.sleep(0.05)  # consumer work
    elapsed = time.perf_counter() - t0
    # serial would be ~0.6s; overlapped ~0.35s
    assert elapsed < 0.52, elapsed


def test_prefetch_early_exit_doesnt_hang():
    def make():
        return iter(range(1000))

    it = prefetch(make, buffer_size=2, num_threads=1)
    for i, _ in enumerate(it):
        if i > 3:
            break
    it.close()
