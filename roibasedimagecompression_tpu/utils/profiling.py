"""Device profiling helpers: jax.profiler trace capture around pipeline runs.

Complements utils/timing.py (host wall-clock per stage) with XLA-level traces
viewable in TensorBoard/Perfetto — the TPU-native replacement for the
reference's ad-hoc time.time() prints (SURVEY.md §5).
"""

from __future__ import annotations

import contextlib
import os


@contextlib.contextmanager
def device_trace(log_dir: str | None = None):
    """Capture a jax.profiler trace for the enclosed block.

    Usage:
        with device_trace("/tmp/rhccq_trace"):
            rtc.encode(image)
    View with `tensorboard --logdir /tmp/rhccq_trace` or load the .perfetto
    trace directly.
    """
    import jax

    log_dir = log_dir or os.environ.get("RHCCQ_TRACE_DIR", "/tmp/rhccq_trace")
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (jax.profiler.TraceAnnotation)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
