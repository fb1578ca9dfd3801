"""Profiling / tracing helpers.

Counterpart of the reference's ad-hoc timers (per-phase timing in
``als.py:119-141``, samples/s progress threads ``algo.cc:273-305``,
CUDA TRACE timers ``bpr.cu:367-420``), built on the JAX profiler: one
context manager captures a device trace viewable in TensorBoard /
Perfetto, and a lightweight phase timer reproduces the data-feed vs
update split the reference logs each iteration.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict

from buffalo_tpu.utils import log


@contextlib.contextmanager
def device_trace(logdir: str = "/tmp/buffalo_tpu_trace"):
    """Capture a JAX device trace: view with TensorBoard's profile
    plugin or ui.perfetto.dev."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Accumulate wall time per named phase; log a one-line summary.

    Usage::

        t = PhaseTimer("ALS")
        with t("feed"):   ...
        with t("update"): ...
        t.log()   # ALS phases: feed 0.012s update 0.340s
    """

    def __init__(self, name: str = "train"):
        self.name = name
        self.acc: Dict[str, float] = {}
        self.logger = log.get_logger("PhaseTimer")

    @contextlib.contextmanager
    def __call__(self, phase: str):
        st = time.perf_counter()
        try:
            yield
        finally:
            self.acc[phase] = (self.acc.get(phase, 0.0)
                               + time.perf_counter() - st)

    def log(self, reset: bool = True) -> Dict[str, float]:
        parts = " ".join(f"{k} {v:0.3f}s" for k, v in self.acc.items())
        self.logger.info(f"{self.name} phases: {parts}")
        out = dict(self.acc)
        if reset:
            self.acc.clear()
        return out
