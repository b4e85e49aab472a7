"""Shared env-gated wall-clock tracer (KMTRICKS_STREAM_TRACE=1).

One process-wide t0 so marks from the decode/pack/upload threads and the
engine's dispatch loop land on a single timeline (the reference's
equivalent is the per-task timing dump of task_scheduler.hpp).
"""
import os
import time

_T0 = None


def mark(label: str) -> None:
    global _T0
    if not os.environ.get("KMTRICKS_STREAM_TRACE"):
        return
    if _T0 is None:
        _T0 = time.perf_counter()
    print(f"[stream {time.perf_counter() - _T0:7.2f}s] {label}",
          flush=True)
