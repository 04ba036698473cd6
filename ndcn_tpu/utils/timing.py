"""Timing / running-average utilities (observability layer).

The reference times with ad-hoc time.time() deltas (heat_dynamics.py:293,381) and
carries an unused RunningAverageMeter (utils_in_learn_dynamics.py:160-178); both
exist here as first-class helpers, plus an optional jax profiler trace context.
"""

from __future__ import annotations

import contextlib
import time


class Timer:
    def __enter__(self):
        self.start = time.perf_counter()
        self.elapsed = 0.0
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self.start
        return False


class RunningAverageMeter:
    """Exponential moving average of a scalar."""

    def __init__(self, momentum: float = 0.99):
        self.momentum = momentum
        self.reset()

    def reset(self):
        self.val = None
        self.avg = 0.0

    def update(self, val: float):
        self.avg = val if self.val is None else (
            self.avg * self.momentum + val * (1.0 - self.momentum))
        self.val = val


@contextlib.contextmanager
def profile_trace(logdir: str | None):
    """jax.profiler trace context; no-op when logdir is None."""
    if logdir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
