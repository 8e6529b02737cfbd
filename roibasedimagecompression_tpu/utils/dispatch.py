"""Shared dispatch pool: jitted bucket calls go through daemon threads ONCE
per signature, then inline.

Why a pool at all: the remote TPU compile service handles CONCURRENT compile
requests in parallel (measured: six distinct score-bucket graphs compiled in
threads cost the wall-clock of one), while a sequential dispatch loop pays
them one after another — on a cold process the bucket loops are a sum of
compile/load latencies instead of a max.  Submitting every bucket's FIRST
call through this pool turns each stage's compile wave into a single
parallel wait.

Why not always: JAX dispatch is itself asynchronous — a warm jitted call
returns un-materialized arrays immediately — so once a signature's
executable exists, the pool hand-off (queue put/get, thread wake, future
bookkeeping) is pure overhead on the single host core (~1 ms x ~85
calls/batch, plus GIL bouncing between pool threads and the encode workers).
Warm signatures therefore dispatch INLINE and return a pre-completed
future-like wrapper.

The pool is shared process-wide so nested use (encode_stream workers each
running bucket loops) multiplexes onto one bounded thread set.
"""

from __future__ import annotations

import concurrent.futures
import threading

import numpy as np

_POOL: concurrent.futures.ThreadPoolExecutor | None = None
_WARM: set = set()
_WARM_LOCK = threading.Lock()


def _pool() -> concurrent.futures.ThreadPoolExecutor:
    global _POOL
    if _POOL is None:
        _POOL = concurrent.futures.ThreadPoolExecutor(
            max_workers=16, thread_name_prefix="rhccq-dispatch"
        )
    return _POOL


class _Done:
    """Pre-completed future for inline-dispatched warm calls."""

    __slots__ = ("_value",)

    def __init__(self, value):
        self._value = value

    def result(self, timeout=None):
        return self._value

    def exception(self, timeout=None):
        return None

    def done(self) -> bool:
        return True


def _arg_key(a):
    if isinstance(a, np.ndarray) or type(a).__name__ == "ArrayImpl":
        return (a.shape, str(a.dtype))
    if isinstance(a, np.generic):
        return ("np", str(a.dtype))
    if isinstance(a, (list, dict, set)) or callable(a):
        # Containers/callables (e.g. warmup._fire's (fn, args, kwargs)
        # triple) don't reduce to a shape signature — keying them by type
        # name would alias DIFFERENT payloads to one "warm" key.  Mark the
        # whole call unkeyable so it always takes the pool.
        return None
    # Python scalars are weak-typed traced values (compiled per TYPE); only
    # static kwargs are value-keyed, and those pass through kwargs below.
    return ("lit", type(a).__name__)


def _kw_key(v):
    if isinstance(v, (np.ndarray, np.generic)) or type(v).__name__ == "ArrayImpl":
        return _arg_key(v)
    return ("val", v)  # static kwargs are value-keyed by jit


def _call_key(fn, args, kwargs):
    arg_keys = tuple(_arg_key(a) for a in args)
    if any(k is None for k in arg_keys):
        return None  # unkeyable arg (container/callable): always use the pool
    key = (
        fn,
        arg_keys,
        tuple(sorted((k, _kw_key(v)) for k, v in kwargs.items())),
    )
    try:
        hash(key)
    except TypeError:
        return None  # unhashable static kwarg: always use the pool
    return key


def submit(fn, *args, **kwargs) -> concurrent.futures.Future:
    """Run fn(*args, **kwargs); returns a future-like with .result().

    First call per (function, arg signature, static kwargs) goes through the
    shared pool so concurrent first-calls compile in parallel; repeat
    signatures call inline (JAX dispatch is already async) and return a
    completed wrapper.
    """
    from roibasedimagecompression_tpu.utils import flops, warmup

    warmup.record_call(fn, args, kwargs)
    flops.track(fn, args, kwargs)
    key = _call_key(fn, args, kwargs)
    if key is not None:
        with _WARM_LOCK:
            warm = key in _WARM
        if warm:
            return _Done(fn(*args, **kwargs))
        fut = _pool().submit(fn, *args, **kwargs)

        def _mark(f, key=key):
            if f.exception() is None:
                with _WARM_LOCK:
                    _WARM.add(key)

        fut.add_done_callback(_mark)
        return fut
    return _pool().submit(fn, *args, **kwargs)


def resolve(items):
    """Map a list whose entries may be futures to their results, in order."""
    return [x.result() if hasattr(x, "result") else x for x in items]
