"""Host-side batch prefetching.

TPU-native replacement for the reference's tf.data machinery
(`num_parallel_calls=8, prefetch(10)`, `datasets/common.py:739-774`): a
thread pool builds upcoming batches (pyramid construction is released-GIL
numpy/C++) while the device executes the current step.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator

_SENTINEL = object()


def prefetch(make_iterator: Callable[[], Iterator], buffer_size: int = 4,
             num_threads: int = 2) -> Iterator:
    """Wrap an iterator factory with background prefetching.

    num_threads > 1 requires the underlying generator to be cheap to call
    concurrently; for the dataset generators here each thread owns its own
    iterator (they are infinite random samplers, so interleaving them
    preserves the distribution).
    """
    q: queue.Queue = queue.Queue(maxsize=buffer_size)
    stop = threading.Event()

    def worker():
        it = make_iterator()
        try:
            for item in it:
                if stop.is_set():
                    return
                q.put(item)
        finally:
            q.put(_SENTINEL)

    threads = [threading.Thread(target=worker, daemon=True)
               for _ in range(max(num_threads, 1))]
    for t in threads:
        t.start()

    finished = 0
    try:
        while finished < len(threads):
            item = q.get()
            if item is _SENTINEL:
                finished += 1
                continue
            yield item
    finally:
        stop.set()
        # drain so workers blocked on put() can exit
        while not q.empty():
            try:
                q.get_nowait()
            except queue.Empty:
                break
