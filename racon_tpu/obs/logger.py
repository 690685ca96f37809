"""Phase timers and progress reporting (reference: src/logger.cpp:20-48)."""

from __future__ import annotations

import sys
import time


class Logger:
    def __init__(self):
        self._time = time.monotonic()
        self._total = 0.0
        self._bar_state = 0

    def reset(self) -> None:
        now = time.monotonic()
        self._total += now - self._time
        self._time = now

    def log(self, message: str = "") -> None:
        elapsed = time.monotonic() - self._time
        if message:
            print(f"{message} {elapsed:.6f} s", file=sys.stderr)
        self.reset()

    def bar(self, message: str) -> None:
        self._bar_state += 1
        percent = self._bar_state * 5
        if percent > 100:
            percent = 100
        print(f"\r{message} [{'=' * (self._bar_state)}>{' ' * (20 - self._bar_state)}] "
              f"{percent}%", file=sys.stderr, end="")
        if self._bar_state >= 20:
            elapsed = time.monotonic() - self._time
            print(f" {elapsed:.6f} s", file=sys.stderr)
            self._bar_state = 0
            self.reset()

    def total(self, message: str) -> None:
        self.reset()
        print(f"{message} {self._total:.6f} s", file=sys.stderr)
