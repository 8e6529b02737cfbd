"""Wall-clock stack sampling of the threaded stream (all threads).

Samples sys._current_frames() at ~200 Hz during a warm measured pass and
aggregates, per thread-role, the innermost frame inside the package (or the
jax/native boundary it is blocked in).  Separates CPU-ish frames from known
wait sites (Array._value, Condition.wait, thread pool idle) so both the
utilization story and the host hotspots are visible in one histogram.
"""

import collections
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SAMPLES = collections.Counter()
RUNNING = True


def classify(frame):
    """Walk the stack from the leaf outward; return a short label."""
    f = frame
    leaf = None
    stack = []
    while f is not None:
        fn = f.f_code.co_filename
        stack.append((fn, f.f_code.co_name, f.f_lineno))
        f = f.f_back
    # Known wait markers (leaf side)
    for fn, name, line in stack[:6]:
        if name == "_value" and "array.py" in fn:
            mark = "WAIT:device->host _value"
            break
        if name == "wait" and "threading.py" in fn:
            mark = "WAIT:threading"
            break
        if name == "_worker" and "thread.py" in fn:
            return "IDLE:pool"
        if name == "block_until_ready":
            mark = "WAIT:block_until_ready"
            break
    else:
        mark = None
    # Innermost repo frame
    for fn, name, line in stack:
        if "roibasedimagecompression_tpu" in fn:
            rel = fn.split("roibasedimagecompression_tpu/")[-1]
            where = f"{rel}:{name}:{line}"
            return f"{mark} @ {where}" if mark else where
    if mark:
        return mark
    fn, name, line = stack[0]
    short = fn.rsplit("/", 1)[-1]
    return f"other:{short}:{name}"


def sampler(main_ids):
    while RUNNING:
        for tid, frame in sys._current_frames().items():
            if tid == threading.get_ident():
                continue
            SAMPLES[classify(frame)] += 1
        time.sleep(0.005)


def main():
    import jax

    from roibasedimagecompression_tpu import CodecConfig
    from roibasedimagecompression_tpu.io import image_io
    from roibasedimagecompression_tpu.parallel import stream
    from roibasedimagecompression_tpu.utils import warmup

    print(f"backend={jax.default_backend()}", file=sys.stderr)
    kodak = "/root/reference/images/png"
    ids = [3, 5, 6, 7, 8, 11, 12, 13, 1, 2, 14, 16, 20, 21, 22, 24]
    imgs = [image_io.imread_rgb(f"{kodak}/{i}.png") for i in ids]
    all_imgs = (
        imgs
        + [np.ascontiguousarray(im[:, ::-1]) for im in imgs]
        + [np.ascontiguousarray(im[::-1, :]) for im in imgs]
        + [np.ascontiguousarray(im[::-1, ::-1]) for im in imgs]
    )
    cfg = CodecConfig()
    batches = [all_imgs[i : i + 4] for i in range(0, len(all_imgs), 4)]
    warmup.prewarm(warmup.default_manifest_path())
    for _ in range(3):
        t0 = time.perf_counter()
        stream.encode_stream(batches, cfg, workers=8)
        print(f"warm pass {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    global RUNNING
    th = threading.Thread(target=sampler, args=(None,), daemon=True)
    th.start()
    t0 = time.perf_counter()
    stream.encode_stream(batches, cfg, workers=8)
    dt = time.perf_counter() - t0
    RUNNING = False
    th.join()
    total = sum(SAMPLES.values())
    print(f"measured pass {dt:.1f}s, {total} thread-samples")
    for label, n in SAMPLES.most_common(40):
        print(f"{100.0*n/total:6.2f}%  {label}")


if __name__ == "__main__":
    main()
