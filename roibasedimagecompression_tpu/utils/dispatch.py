"""Shared dispatch pool: jitted bucket calls go through daemon threads.

Why: the remote TPU compile service handles CONCURRENT compile requests in
parallel (measured: six distinct score-bucket graphs compiled in threads cost
the wall-clock of one), while a sequential dispatch loop pays them one after
another — on a cold process the bucket loops are a sum of compile/load
latencies instead of a max.  Submitting every bucket's first call through
this pool turns each stage's compile wave into a single parallel wait.

Warm-path cost is negligible: a thread hand-off is ~0.1 ms against the
~32 ms per-launch device round trip, and JAX dispatch is thread-safe (the
jit cache takes a per-executable lock, so concurrent same-shape calls
serialize exactly as they would inline).

The pool is shared process-wide so nested use (encode_stream workers each
running bucket loops) multiplexes onto one bounded thread set.
"""

from __future__ import annotations

import concurrent.futures

_POOL: concurrent.futures.ThreadPoolExecutor | None = None


def _pool() -> concurrent.futures.ThreadPoolExecutor:
    global _POOL
    if _POOL is None:
        _POOL = concurrent.futures.ThreadPoolExecutor(
            max_workers=16, thread_name_prefix="rhccq-dispatch"
        )
    return _POOL


def submit(fn, *args, **kwargs) -> concurrent.futures.Future:
    """Run fn(*args, **kwargs) on the shared pool; returns its Future."""
    from roibasedimagecompression_tpu.utils import flops, warmup

    warmup.record_call(fn, args, kwargs)
    flops.track(fn, args, kwargs)
    return _pool().submit(fn, *args, **kwargs)


def resolve(items):
    """Map a list whose entries may be Futures to their results, in order."""
    return [
        x.result() if isinstance(x, concurrent.futures.Future) else x
        for x in items
    ]
