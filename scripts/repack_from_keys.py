"""Repack warm_cache/pack.tar.zst from a key log + the live cache.

Used after a refire pass has persisted previously-missing entries: stages
every `<key>-cache` file named in the key log out of the live cache and
writes the solid pack, without re-running the bench.

Usage: python scripts/repack_from_keys.py /tmp/keys.log [more_logs...]
"""

import glob
import os
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))
sys.path.insert(0, REPO)

import build_warm_cache as BW  # noqa: E402


def main():
    keys = set()
    for path in sys.argv[1:]:
        keys.update(open(path).read().split())
    live = os.path.join(REPO, ".jax_cache")
    roots = [live] + sorted(glob.glob(os.path.join(live, "cpu-*")))
    stage = tempfile.mkdtemp(prefix="rhccq_stage_", dir="/tmp")
    found = missing = 0
    missing_keys = []
    for key in sorted(keys):
        hit = False
        for root in roots:
            p = os.path.join(root, f"{key}-cache")
            if os.path.exists(p):
                rel = os.path.relpath(p, live)
                dst = os.path.join(stage, rel)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                try:
                    os.link(p, dst)
                except OSError:
                    shutil.copyfile(p, dst)
                hit = True
        if hit:
            found += 1
        else:
            missing += 1
            missing_keys.append(key)
    print(f"{len(keys)} keys: {found} staged, {missing} missing from live")
    for k in missing_keys:
        print("  missing:", k)
    out = os.path.join(REPO, "warm_cache")
    os.makedirs(out, exist_ok=True)
    solid = os.path.join(out, "pack.tar.zst")
    BW.write_solid_pack(stage, solid + ".new")
    for d, _, fs in os.walk(out):
        for f in fs:
            if f not in ("pack.tar.zst.new",):
                os.unlink(os.path.join(d, f))
    os.replace(solid + ".new", solid)
    shutil.rmtree(stage)
    BW._stamp_meta(out)
    print(f"pack written: {solid} ({os.path.getsize(solid)/1e6:.1f} MB)")


if __name__ == "__main__":
    main()
