"""Profiling / timing utilities.

Replaces the reference's instrumentation (`utils/tester.py:54-132`
AverageMeter/Timer/TimeLiner chrome-trace merger; per-second EMA step
timings `utils/trainer.py:300-314`):
  * Timer/AverageMeter with the same call surface;
  * `device_timer` — correct wall timing on the axon tunnel backend, where
    `block_until_ready` is a no-op (forces a scalar fetch);
  * `trace` — context manager around `jax.profiler` emitting a TensorBoard-
    loadable trace directory when the backend supports it.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax
import jax.numpy as jnp


class AverageMeter:
    """Running mean/sum of a scalar series (`utils/tester.py:54-73`)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.sq_sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        self.val = val
        self.sum += val * n
        self.sq_sum += val * val * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / max(self.count, 1)

    @property
    def std(self) -> float:
        m = self.avg
        return max(self.sq_sum / max(self.count, 1) - m * m, 0.0) ** 0.5


class Timer:
    """tic/toc accumulator (`utils/tester.py:76-107`)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.total_time = 0.0
        self.calls = 0
        self._t0 = 0.0
        self.diff = 0.0

    def tic(self):
        self._t0 = time.perf_counter()

    def toc(self, average: bool = True) -> float:
        self.diff = time.perf_counter() - self._t0
        self.total_time += self.diff
        self.calls += 1
        return self.avg if average else self.diff

    @property
    def avg(self) -> float:
        return self.total_time / max(self.calls, 1)


def force_ready(tree) -> float:
    """Force completion of a pytree of device arrays and return a checksum.

    On the axon tunnel backend `jax.block_until_ready` returns immediately;
    fetching a scalar reduction is the only reliable barrier.
    """
    leaves = [x for x in jax.tree.leaves(tree)
              if isinstance(x, jax.Array) and jnp.issubdtype(x.dtype,
                                                             jnp.number)]
    if not leaves:
        return 0.0
    return float(sum(jnp.sum(jnp.abs(x[..., :1])) for x in leaves))


@contextlib.contextmanager
def device_timer(out: Optional[list] = None) -> Iterator[None]:
    """Context manager measuring wall time incl. a device barrier."""
    t0 = time.perf_counter()
    holder: list = []
    try:
        yield holder
    finally:
        if holder:
            force_ready(holder)
        dt = time.perf_counter() - t0
        if out is not None:
            out.append(dt)


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """jax.profiler trace (TPU equivalent of the reference's chrome-trace
    TimeLiner); degrades to a no-op where the backend can't profile."""
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception:
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass
