"""Offline cache-key divergence probe (no compiles needed).

Runs the REAL pipeline (stream.encode_many on 4 Kodak images) and the
manifest REPLAY in one process, capturing every compilation-cache key plus
its per-component incremental hashes (jax logs them at DEBUG).  Joins the
two populations by jit module name + computation hash and reports which key
component diverges for signatures whose final keys differ.
"""

import json
import logging
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CALLS = []  # list of dicts: {"ctx":..., "name":..., "components": {...}}
_CUR = None


class _Capture(logging.Handler):
    def emit(self, record):
        msg = record.getMessage()
        # "get_cache_key hash of serialized computation: <hex>"
        if msg.startswith("get_cache_key hash of serialized ") and _CUR is not None:
            rest = msg[len("get_cache_key hash of serialized "):]
            comp, h = rest.rsplit(": ", 1)
            _CUR["components"][comp] = h


def main():
    import jax

    from roibasedimagecompression_tpu.utils import cachekey  # ensure installed

    from jax._src import compilation_cache as cc

    logger = logging.getLogger("jax._src.cache_key")
    logger.setLevel(logging.DEBUG)
    h = _Capture()
    logger.addHandler(h)

    import threading

    ctx = {"label": "?"}
    orig = cc.get_cache_key
    lock = threading.Lock()

    def wrapper(module, devices, compile_options, backend, *a, **k):
        global _CUR
        try:
            from jax._src.lib.mlir import ir
            name = ir.StringAttr(module.operation.attributes["sym_name"]).value
        except Exception:
            name = "?"
        with lock:
            _CUR = {"ctx": ctx["label"], "name": name, "components": {}}
            key = orig(module, devices, compile_options, backend, *a, **k)
            _CUR["key"] = key
            CALLS.append(_CUR)
            _CUR = None
        return key

    cc.get_cache_key = wrapper

    from roibasedimagecompression_tpu import CodecConfig
    from roibasedimagecompression_tpu.io import image_io
    from roibasedimagecompression_tpu.parallel import stream
    from roibasedimagecompression_tpu.utils import warmup

    imgs = [
        image_io.imread_rgb(f"/root/reference/images/png/{i}.png")
        for i in (3, 5, 6, 7)
    ]
    ctx["label"] = "pipeline"
    stream.encode_many(imgs, CodecConfig())
    n_pipe = len(CALLS)
    print(f"pipeline: {n_pipe} key computations", flush=True)

    ctx["label"] = "replay"
    entries = json.load(open(warmup.default_manifest_path()))
    for e in entries:
        try:
            fn = warmup._resolve(e["fn"])
            args = [warmup._build(s) for s in e["args"]]
            kw = {k: warmup._build(s) for k, s in e["kwargs"].items()}
            out = fn(*args, **kw)
            jax.block_until_ready(out)
        except Exception as ex:
            print(f"replay skip {e['fn']}: {ex}", flush=True)
    print(f"replay: {len(CALLS) - n_pipe} key computations", flush=True)

    # join by (name, computation hash): same computation must give same key
    by_comp = {}
    for c in CALLS:
        comp_h = c["components"].get("computation")
        by_comp.setdefault((c["name"], comp_h), []).append(c)
    mismatch = same = 0
    reported = 0
    for (name, comp_h), group in by_comp.items():
        keys = {c["key"] for c in group}
        if len(keys) > 1:
            mismatch += 1
            if reported < 5:
                reported += 1
                print(f"\nDIVERGENT same-computation key: {name}")
                for c in group[:4]:
                    print(f"  ctx={c['ctx']} key={c['key'][-16:]}")
                    for comp, hh in c["components"].items():
                        print(f"    {comp}: {hh[:16]}")
        else:
            same += 1
    print(f"\n(name,computation) groups: {same} consistent, {mismatch} divergent")

    # ALSO: how many replay keys are absent from the pipeline key set for the
    # same module name (different computation hash = the replay traced a
    # DIFFERENT program)?
    pipe_by_name = {}
    for c in CALLS[:n_pipe]:
        pipe_by_name.setdefault(c["name"], set()).add(c["components"].get("computation"))
    diff_prog = 0
    examples = {}
    for c in CALLS[n_pipe:]:
        comps = pipe_by_name.get(c["name"])
        if comps and c["components"].get("computation") not in comps:
            diff_prog += 1
            examples.setdefault(c["name"], 0)
            examples[c["name"]] += 1
    print(f"replay entries whose COMPUTATION differs from every pipeline "
          f"computation of the same module name: {diff_prog}")
    print("by module:", examples)

    with open("/tmp/keydiff_calls.json", "w") as fh:
        json.dump(
            [{"ctx": c["ctx"], "name": c["name"], "key": c["key"]}
             for c in CALLS], fh)
    print("dumped /tmp/keydiff_calls.json")


if __name__ == "__main__":
    main()
