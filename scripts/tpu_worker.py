"""Persistent TPU experiment worker.

The axon remote backend recompiles every fresh graph shape per process, so
interactive perf work must happen inside ONE warm process.  This worker polls
/tmp/tpuq for job_*.py files, executes each in a shared namespace (jit caches
stay warm), and writes stdout+traceback to <job>.out, then moves the job to
<job>.done.  Drop a file named STOP to exit.

Usage: python scripts/tpu_worker.py  (run in background)
"""

import io
import os
import sys
import time
import traceback
import contextlib

QDIR = "/tmp/tpuq"
os.makedirs(QDIR, exist_ok=True)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NS: dict = {"__name__": "__tpu_worker__"}

# Warm base imports once.
_boot = """
import time, os, sys, numpy as np
import jax, jax.numpy as jnp
print('backend', jax.default_backend(), jax.devices(), flush=True)
"""
exec(compile(_boot, "<boot>", "exec"), NS)

with open(os.path.join(QDIR, "READY"), "w") as f:
    f.write(str(os.getpid()))
print("worker ready", flush=True)

while True:
    if os.path.exists(os.path.join(QDIR, "STOP")):
        print("worker stopping", flush=True)
        break
    jobs = sorted(
        f for f in os.listdir(QDIR) if f.startswith("job_") and f.endswith(".py")
    )
    if not jobs:
        time.sleep(0.5)
        continue
    job = jobs[0]
    path = os.path.join(QDIR, job)
    # Claim atomically BEFORE executing (two workers once grabbed the same
    # job; the loser crashed on the post-run rename).
    claimed = path + ".run"
    try:
        os.rename(path, claimed)
    except FileNotFoundError:
        continue
    with open(claimed) as f:
        src = f.read()
    buf = io.StringIO()
    t0 = time.perf_counter()
    try:
        with contextlib.redirect_stdout(buf):
            exec(compile(src, job, "exec"), NS)
        status = "ok"
    except Exception:
        buf.write(traceback.format_exc())
        status = "err"
    dt = time.perf_counter() - t0
    out = buf.getvalue()
    with open(path + ".out", "w") as f:
        f.write(f"# status={status} wall={dt:.2f}s\n{out}")
    os.rename(claimed, path + ".done")
    print(f"{job}: {status} {dt:.1f}s", flush=True)
