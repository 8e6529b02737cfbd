"""utils/dispatch: pooled first-call, inline warm repeats, no key aliasing.

The dispatch pool exists for the cold-compile wave (concurrent first calls
compile in parallel on the remote service); warm signatures must dispatch
inline (JAX dispatch is already async).  Keying bugs here are silent
performance/correctness hazards: two DIFFERENT payloads aliasing to one
"warm" key would serialize a compile wave (warmup._fire) or skip the pool
for a signature that still needs it.
"""

import numpy as np

from roibasedimagecompression_tpu.utils import dispatch


def test_warm_signature_dispatches_inline():
    calls = []

    def fn(x):
        calls.append(x.shape)
        return x + 1

    a = np.zeros((4, 4), np.float32)
    f1 = dispatch.submit(fn, a)
    assert f1.result() is not None
    f2 = dispatch.submit(fn, a)
    # Second call with the same signature returns the pre-completed wrapper.
    assert isinstance(f2, dispatch._Done)
    assert f2.done() and f2.exception() is None
    assert np.array_equal(f2.result(), a + 1)
    assert len(calls) == 2


def test_distinct_shapes_are_distinct_keys():
    def fn(x):
        return x

    a = dispatch.submit(fn, np.zeros((2, 2), np.float32))
    a.result()
    b = dispatch.submit(fn, np.zeros((8, 2), np.float32))
    # New shape -> not warm -> real pool future, not the inline wrapper.
    assert not isinstance(b, dispatch._Done)
    b.result()


def test_container_and_callable_args_never_warm():
    """warmup._fire-style calls (fn, list, dict) must always take the pool:
    keying them by type name would alias every manifest entry to one key."""

    def runner(fn, args, kwargs):
        return fn(*args, **kwargs)

    r1 = dispatch.submit(runner, lambda x: x * 2, [3], {})
    assert r1.result() == 6
    r2 = dispatch.submit(runner, lambda x: x * 5, [3], {})
    assert not isinstance(r2, dispatch._Done)
    assert r2.result() == 15
    assert dispatch._call_key(runner, (lambda x: x, [3], {}), {}) is None


def test_failed_call_does_not_mark_warm():
    boom = []

    def fn(x):
        if not boom:
            boom.append(1)
            raise RuntimeError("first call fails")
        return x

    a = np.zeros(3, np.float32)
    f1 = dispatch.submit(fn, a)
    assert f1.exception() is not None
    f2 = dispatch.submit(fn, a)
    # Failure must not poison the warm set: retry goes through the pool.
    assert not isinstance(f2, dispatch._Done)
    assert f2.result() is a


def test_resolve_mixes_futures_and_values():
    def fn():
        return 41

    items = [dispatch.submit(fn), 1, dispatch.submit(fn)]
    assert dispatch.resolve(items) == [41, 1, 41]
