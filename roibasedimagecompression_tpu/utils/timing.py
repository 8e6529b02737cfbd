"""Lightweight stage tracing: host wall-clock (and CPU) per pipeline stage.

The reference sprinkles `time.time()` prints through the ROI path
(roi.py:539-565 etc.); here a single context-manager timer feeds a global
registry that the bench harness and callers can read, and integrates with
jax.profiler traces when enabled.

CPU seconds use time.process_time() — PROCESS-wide, so per-stage CPU is only
attributable on single-threaded (solo) runs; the bench's solo stage profile
is exactly that.  wall >> cpu inside a stage = device/tunnel wait; wall ~=
cpu = host compute.
"""

from __future__ import annotations

import contextlib
import os
import time
from collections import defaultdict

_STAGES: dict = defaultdict(float)
_CPU: dict = defaultdict(float)
_COUNTS: dict = defaultdict(int)
_VERBOSE = os.environ.get("RHCCQ_TRACE", "") not in ("", "0")


@contextlib.contextmanager
def stage_timer(name: str):
    t0 = time.perf_counter()
    c0 = time.process_time()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        _STAGES[name] += dt
        _CPU[name] += time.process_time() - c0
        _COUNTS[name] += 1
        if _VERBOSE:
            print(f"[rhccq] {name}: {dt*1000:.1f} ms (total {_STAGES[name]*1000:.1f} ms)")


def reset_stages() -> None:
    _STAGES.clear()
    _CPU.clear()
    _COUNTS.clear()


def stage_report() -> dict:
    return {
        k: {"seconds": v, "cpu_seconds": _CPU[k], "calls": _COUNTS[k]}
        for k, v in sorted(_STAGES.items())
    }
