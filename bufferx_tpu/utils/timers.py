"""Timing utilities.

``Timer`` / ``AverageMeter`` mirror ``/root/reference/utils/timer.py``;
``DeviceTimer`` replaces the CUDA-event ``GPUTimer``
(``utils/gpu_timer.py:9-33``) with ``block_until_ready`` fencing — on TPU
the accurate protocol is: synchronize, stamp, run, block on outputs, stamp.
"""

from __future__ import annotations

import time

import jax

__all__ = ["Timer", "AverageMeter", "DeviceTimer"]


class Timer:
    def __init__(self):
        self.reset()

    def reset(self):
        self.total_time = 0.0
        self.calls = 0
        self.start_time = 0.0
        self.diff = 0.0
        self.avg = 0.0

    def tic(self):
        self.start_time = time.perf_counter()

    def toc(self, average: bool = True):
        self.diff = time.perf_counter() - self.start_time
        self.total_time += self.diff
        self.calls += 1
        self.avg = self.total_time / self.calls
        return self.avg if average else self.diff


class AverageMeter:
    """Running mean/std/min/max over scalar observations."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.sq_sum = 0.0
        self.count = 0
        self.min = float("inf")
        self.max = float("-inf")

    def update(self, val, n: int = 1):
        val = float(val)
        self.val = val
        self.sum += val * n
        self.sq_sum += val * val * n
        self.count += n
        self.avg = self.sum / self.count
        self.min = min(self.min, val)
        self.max = max(self.max, val)

    @property
    def var(self):
        if self.count < 2:
            return 0.0
        return max(self.sq_sum / self.count - self.avg**2, 0.0)

    @property
    def std(self):
        return self.var**0.5


class DeviceTimer:
    """Accurate device timing via output fencing.

    Usage::

        with DeviceTimer() as t:
            out = fn(*args)
            t.block_on(out)
        elapsed = t.diff
    """

    def __init__(self):
        self.diff = 0.0
        self.total_time = 0.0
        self.calls = 0

    def __enter__(self):
        # fence prior work so we don't attribute it to this interval
        (jax.device_put(0.0) + 0).block_until_ready()
        self._start = time.perf_counter()
        return self

    def block_on(self, out):
        jax.block_until_ready(out)

    def __exit__(self, *exc):
        self.diff = time.perf_counter() - self._start
        self.total_time += self.diff
        self.calls += 1
        return False

    @property
    def avg(self):
        return self.total_time / max(self.calls, 1)
