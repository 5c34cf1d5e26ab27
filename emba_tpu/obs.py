"""Observability: profiler traces, NaN-check debug mode, structured logs.

The TPU-native replacement for the reference's aux subsystems (SURVEY.md §5):
``ENABLE_CHRONO`` phase timers -> ``solver.LMStats`` + these helpers;
sanitizers/race detection (none in the reference) -> JAX determinism plus a
NaN-debug mode; glog VLOG -> python logging with structured extras.
"""

from __future__ import annotations

import contextlib
import json
import logging
import time

import jax

log = logging.getLogger("emba_tpu")


@contextlib.contextmanager
def profiler_trace(log_dir: str | None):
    """jax.profiler trace (view in TensorBoard / xprof). No-op if dir None."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def nan_debug(enabled: bool = True):
    """Enable jax_debug_nans within the scope — the moral equivalent of the
    reference's CHECK_* assertions on the numerics."""
    if not enabled:
        yield
        return
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


class PhaseTimer:
    """Accumulating wall-clock phase timer (blocks on device completion),
    mirroring the reference's static chrono accumulators
    (solver.cpp:105-151)."""

    def __init__(self):
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, block_on=None):
        t0 = time.perf_counter()
        yield
        if block_on is not None:
            jax.block_until_ready(block_on)
        self.totals[name] = self.totals.get(name, 0.0) + time.perf_counter() - t0
        self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> dict:
        return {
            name: {
                "total_s": self.totals[name],
                "count": self.counts[name],
                "mean_s": self.totals[name] / max(self.counts[name], 1),
            }
            for name in self.totals
        }

    def dump(self, path: str):
        with open(path, "w") as f:
            json.dump(self.summary(), f, indent=2)


def log_iteration(it: int, lam: float, cost_min: float, cost_new: float, **extra):
    """Structured per-iteration log line (reference VLOG(0) at
    solver.cpp:170-171)."""
    import numpy as np

    log.info(
        "iter #%d: log10(lambda)=%.2f cost_min=%.6g cost_new=%.6g %s",
        it,
        np.log10(lam),
        cost_min,
        cost_new,
        " ".join(f"{k}={v}" for k, v in extra.items()),
    )
