"""Profiling hooks: jax.profiler traces + wall-clock stage timing.

The reference's only profiling is a per-frame decode timer whose running
average feeds back into scheduling (playback.cpp:115-130). anet keeps that
idea (PlaybackPipeline's adaptive timeout) and adds the TPU-native
equivalent (SURVEY.md §5): on-demand XLA profiler traces viewable in
TensorBoard/Perfetto, plus a lightweight stage timer for host code.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional


@contextlib.contextmanager
def device_trace(log_dir: str = "/tmp/anet-trace") -> Iterator[None]:
    """Capture a jax.profiler trace of everything inside the context.

    View with: tensorboard --logdir <log_dir>  (or load the .pb into
    Perfetto). No-ops gracefully if the profiler is unavailable.
    """
    import jax

    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception:  # noqa: BLE001 — profiling must never break the run
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:  # noqa: BLE001
                pass


class StageTimer:
    """Accumulating wall-clock timer for named pipeline stages."""

    def __init__(self) -> None:
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "total_s": round(self.totals[name], 6),
                "count": self.counts[name],
                "mean_ms": round(1e3 * self.totals[name] / self.counts[name], 3),
            }
            for name in self.totals
        }
