"""Profiling hooks and throughput meters.

The reference's observability is wall-clock section timers and a progress
bar (src/logger.cpp:20-48) plus `cudaProfilerStop` at teardown
(src/cuda/cudapolisher.cpp:71).  The TPU-native equivalents here:

  * ``device_trace()`` — a context manager around ``jax.profiler.trace``;
    set ``RACON_TPU_PROFILE=<dir>`` (or pass a directory) to capture an
    XLA/TPU trace viewable in TensorBoard/Perfetto,
  * ``Meter`` — windows/s and bases/s counters emitted per polish phase.
"""

from __future__ import annotations

import contextlib
import os
import sys
import time
from typing import Optional


@contextlib.contextmanager
def device_trace(log_dir: Optional[str] = None):
    """Capture a JAX device profile when enabled, else a no-op.

    Enabled when ``log_dir`` is given or ``RACON_TPU_PROFILE`` is set.
    """
    log_dir = log_dir or os.environ.get("RACON_TPU_PROFILE")
    if not log_dir:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield
    print(f"[racon_tpu::obs] device trace written to {log_dir}",
          file=sys.stderr)


class Meter:
    """Throughput meter: accumulate (windows, bases) and report rates."""

    def __init__(self, name: str):
        self.name = name
        self.t0 = time.monotonic()
        self.windows = 0
        self.bases = 0

    def add(self, windows: int, bases: int) -> None:
        self.windows += windows
        self.bases += bases

    def report(self) -> str:
        dt = max(time.monotonic() - self.t0, 1e-9)
        msg = (f"[racon_tpu::obs] {self.name}: {self.windows} windows in "
               f"{dt:.2f} s ({self.windows / dt:.1f} windows/s, "
               f"{self.bases / dt / 1e6:.2f} Mbases/s)")
        print(msg, file=sys.stderr)
        return msg
