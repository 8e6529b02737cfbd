"""Compile-manifest warmup: one parallel compile wave instead of a cold walk.

The encode pipeline's device graphs compile stage by stage on first use:
thresholds -> score buckets -> SLIC buckets -> eps-CC buckets -> k-means
split levels.  Each stage's bucket dispatches already compile concurrently
(utils/dispatch.py), but the STAGES are sequential, so a cold process pays
~6 compile waves.  The remote TPU compile service handles concurrent
requests almost perfectly in parallel (measured: six big graphs in threads
cost the wall of one), which makes the fix structural:

  1. RECORD: with RHCCQ_RECORD_MANIFEST set, every jitted call that goes
     through dispatch.submit() logs (function, arg shapes/dtypes, static
     kwargs) here; save() writes the deduplicated manifest JSON.
  2. PREWARM: a fresh process calls prewarm(path) BEFORE encoding; every
     manifest entry is replayed with zero-filled arguments on the shared
     dispatch pool, so all stages' graphs compile in ONE concurrent wave
     while the caller's real work proceeds (same-signature calls block on
     the in-flight compile, not on a fresh one).

Replay correctness does not depend on the zeros: masked means are guarded,
empty problems converge immediately, and results are discarded.  The
manifest at the repo root (warm_manifest.json) was recorded from the bench
stream (32-image Kodak, batches of 8 and 16) — the reference has no compile
cost at all (pure NumPy/OpenCV), so cold-start parity is a first-class goal
(cf. /root/reference/encoder/compression/test.py:77-151 which runs
immediately).
"""

from __future__ import annotations

import json
import os
import threading

import numpy as np

_entries: list = []
_seen: set = set()
_lock = threading.Lock()
_recording = os.environ.get("RHCCQ_RECORD_MANIFEST", "") not in ("", "0")


def enable_recording() -> None:
    global _recording
    _recording = True


def _arg_spec(a):
    import jax

    if isinstance(a, (np.ndarray, jax.Array)) or type(a).__name__ == "ArrayImpl":
        return {"t": "arr", "shape": list(a.shape), "dtype": str(np.dtype(a.dtype))}
    if isinstance(a, bool) or isinstance(a, (int, float, str)) or a is None:
        return {"t": "lit", "v": a}
    if isinstance(a, np.generic):
        return {"t": "np", "dtype": str(a.dtype), "v": float(a)}
    return None


def record_call(fn, args, kwargs) -> None:
    """Log one jitted call's signature (no-op unless recording is enabled)."""
    if not _recording:
        return
    name = getattr(fn, "__module__", None), getattr(fn, "__qualname__", None)
    if not name[0] or not name[1] or "<" in name[1]:
        return  # lambdas / locals are not replayable
    spec = {"fn": f"{name[0]}:{name[1]}", "args": [], "kwargs": {}}
    for a in args:
        s = _arg_spec(a)
        if s is None:
            return
        spec["args"].append(s)
    for k, v in kwargs.items():
        s = _arg_spec(v)
        if s is None:
            return
        spec["kwargs"][k] = s
    key = json.dumps(spec, sort_keys=True)
    with _lock:
        if key not in _seen:
            _seen.add(key)
            _entries.append(spec)


def save(path: str) -> int:
    """Write the recorded manifest; returns the entry count."""
    with _lock:
        with open(path, "w") as f:
            json.dump(_entries, f, indent=0)
        return len(_entries)


def _build(spec):
    if spec["t"] == "arr":
        return np.zeros(tuple(spec["shape"]), np.dtype(spec["dtype"]))
    if spec["t"] == "np":
        return np.dtype(spec["dtype"]).type(spec["v"])
    return spec["v"]


def _resolve(name: str):
    import importlib

    mod, qual = name.split(":", 1)
    obj = importlib.import_module(mod)
    for part in qual.split("."):
        obj = getattr(obj, part)
    return obj


def _fire(fn, args, kwargs):
    import jax

    out = fn(*args, **kwargs)
    jax.block_until_ready(out)


def prewarm(path: str, block: bool = False) -> list:
    """Replay every manifest entry concurrently on the shared dispatch pool.

    Returns the list of futures (callers may ignore them: real encode calls
    with the same signatures join the in-flight compiles).  Entries whose
    function no longer exists are skipped — the manifest is a warm hint,
    never a correctness dependency.
    """
    from roibasedimagecompression_tpu.utils import dispatch

    try:
        with open(path) as f:
            entries = json.load(f)
    except (OSError, ValueError):
        return []
    futs = []
    for e in entries:
        try:
            fn = _resolve(e["fn"])
            args = [_build(s) for s in e["args"]]
            kwargs = {k: _build(s) for k, s in e["kwargs"].items()}
        except Exception:
            continue
        futs.append(dispatch.submit(_fire, fn, args, kwargs))
    if block:
        for f in futs:
            try:
                f.result()
            except Exception:
                pass  # a stale entry must never break the caller
    return futs


def default_manifest_path() -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "warm_manifest.json",
    )


def source_fingerprint() -> str:
    """sha256 over every package .py source plus bench.py — the traced-code
    surface whose changes invalidate the warm pack (the jax cache key hashes
    the HLO, so ANY traced-code edit strands the committed executables).
    Deterministic: files are hashed in sorted relative order."""
    import hashlib

    pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    repo = os.path.dirname(pkg)
    files = []
    for d, _, fs in os.walk(pkg):
        for f in fs:
            if f.endswith((".py", ".cpp")):
                files.append(os.path.join(d, f))
    bench = os.path.join(repo, "bench.py")
    if os.path.exists(bench):
        files.append(bench)
    h = hashlib.sha256()
    for p in sorted(files):
        h.update(os.path.relpath(p, repo).encode())
        with open(p, "rb") as fh:
            h.update(fh.read())
    return h.hexdigest()[:16]


def check_pack_freshness(log=print) -> bool:
    """Compare the committed warm pack's recorded source fingerprint with
    HEAD's.  Returns True when fresh; logs LOUDLY when stale or unstamped —
    a stale pack silently costs ~90 s of dead executable loads per cold
    start (VERDICT r4), so the mismatch must be visible in the bench run."""
    pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    meta_path = os.path.join(
        os.path.dirname(pkg), "warm_cache", "PACK_META.json"
    )
    try:
        with open(meta_path) as fh:
            meta = json.load(fh)
    except (OSError, ValueError):
        log("WARNING: warm pack has no PACK_META.json — rebuild with "
            "scripts/build_warm_cache.py to stamp + refresh it")
        return False
    cur = source_fingerprint()
    if meta.get("source_fingerprint") != cur:
        log(f"WARNING: warm pack is STALE (built for source "
            f"{meta.get('source_fingerprint')}, HEAD is {cur}) — graphs will "
            f"recompile; run scripts/build_warm_cache.py before benching")
        return False
    # Source-fresh is necessary but NOT sufficient: the cache key also
    # covers the backend's compatibility identity (utils/cachekey.py), and
    # a tunnel-worker upgrade re-keys every entry with no source change
    # (measured round 5).  Compare the stable basis when a backend is live.
    packed = meta.get("backend_identity") or {}
    if packed.get("stable_platform"):
        try:
            import sys as _sys

            if "jax" in _sys.modules:
                from roibasedimagecompression_tpu.utils import cachekey

                cur_id = cachekey.identity_report()
                for field in ("stable_platform", "stable_devices"):
                    if cur_id.get(field) != packed.get(field):
                        log(f"WARNING: warm pack is KEY-STALE — backend "
                            f"{field} changed:\n  pack: {packed.get(field)!r}"
                            f"\n  now:  {cur_id.get(field)!r}\n  every "
                            f"packed executable will recompile; rebuild with "
                            f"scripts/build_warm_cache.py --from-live")
                        return False
        except Exception:
            pass  # identity check is advisory; never block the bench
    return True
