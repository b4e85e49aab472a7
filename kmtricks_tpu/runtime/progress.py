"""Per-stage progress bars (the reference's `indicators` analogue,
task_scheduler.hpp:61-81 / progress.hpp:28-45).

Renders a carriage-return bar on stderr only when stderr is a TTY and the
logger is at INFO or lower; otherwise every tick is a no-op (the existing
per-item log lines remain the record). Thread-safe: `tick` may be called
from the `-t` worker pool."""

from __future__ import annotations

import logging
import sys
import threading

log = logging.getLogger("kmtricks_tpu")

WIDTH = 30


def _enabled() -> bool:
    return (sys.stderr.isatty()
            and log.getEffectiveLevel() <= logging.INFO)


class ProgressBar:
    def __init__(self, label: str, total: int, enabled: bool | None = None):
        self.label = label
        self.total = max(total, 1)
        self.done = 0
        self.enabled = _enabled() if enabled is None else enabled
        self._lock = threading.Lock()
        if self.enabled:
            self._render()

    def _render(self) -> None:
        filled = WIDTH * self.done // self.total
        bar = "#" * filled + "-" * (WIDTH - filled)
        sys.stderr.write(f"\r{self.label:<12} [{bar}] "
                         f"{self.done}/{self.total}")
        sys.stderr.flush()

    def tick(self, n: int = 1) -> None:
        with self._lock:
            self.done += n
            if self.enabled:
                self._render()

    def close(self) -> None:
        if self.enabled:
            self._render()
            sys.stderr.write("\n")
            sys.stderr.flush()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
