"""Device-FLOP accounting for MFU reporting.

The bench needs an honest flops-vs-peak number (MFU) for the encode: the
codec's device graphs are latency/transfer-bound, and that claim must be
backed by an executed-FLOP count, not hand-waving.  When enabled
(RHCCQ_MFU=1 or enable()), every jitted call routed through
utils/dispatch.submit — plus the direct-call sites that opt in via
track() — looks up its XLA cost analysis (cached per (function, arg
signature)) and accumulates the executable's flop count.  bench.py runs
ONE accounting pass of the solo batch with this on and reports

    mfu = executed_flops / wall_seconds / peak_flops

against the v5e peak.  Accounting is off during timed passes: cost_analysis
triggers a lowering on first sight of a signature (served by the persistent
compile cache, but not free).
"""

from __future__ import annotations

import os
import threading

import numpy as np

_lock = threading.Lock()
_enabled = os.environ.get("RHCCQ_MFU", "") not in ("", "0")
_total_flops = 0.0
_total_bytes = 0.0
_cache: dict = {}

# Peak f32 FLOP/s of one TPU v5e (v5 lite) chip.  The MXU peak is 394
# TFLOP/s bf16 / 197 TFLOP/s f32; the codec pins f32 (HIGHEST) matmuls, so
# f32 peak is the honest denominator.
V5E_PEAK_F32 = 197e12 / 2  # 98.5 TFLOP/s


def enable() -> None:
    global _enabled
    _enabled = True


def disable() -> None:
    global _enabled
    _enabled = False


def enabled() -> bool:
    return _enabled


def reset() -> None:
    global _total_flops, _total_bytes
    with _lock:
        _total_flops = 0.0
        _total_bytes = 0.0


def totals() -> tuple:
    """(executed_flops, transcendentals-excluded bytes accessed)."""
    return _total_flops, _total_bytes


def _sig(fn, args, kwargs):
    parts = [id(fn)]
    for a in args:
        if hasattr(a, "shape") and hasattr(a, "dtype"):
            parts.append((tuple(a.shape), str(np.dtype(a.dtype))))
        else:
            parts.append(repr(a))
    for k in sorted(kwargs):
        v = kwargs[k]
        if hasattr(v, "shape") and hasattr(v, "dtype"):
            parts.append((k, tuple(v.shape), str(np.dtype(v.dtype))))
        else:
            parts.append((k, repr(v)))
    return tuple(parts)


def track(fn, args, kwargs) -> None:
    """Accumulate the cost analysis of one jitted call (no-op when off)."""
    if not _enabled:
        return
    global _total_flops, _total_bytes
    key = _sig(fn, args, kwargs)
    entry = _cache.get(key)
    if entry is None:
        try:
            compiled = fn.lower(*args, **kwargs).compile()
            ca = compiled.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0] if ca else {}
            entry = (
                float(ca.get("flops", 0.0) or 0.0),
                float(ca.get("bytes accessed", 0.0) or 0.0),
            )
        except Exception:
            entry = (0.0, 0.0)
        _cache[key] = entry
    with _lock:
        _total_flops += entry[0]
        _total_bytes += entry[1]
