"""Stable persistent-cache keys: path-independent and worker-independent.

Two distinct leaks made jax's compilation-cache keys unstable across
processes in this environment, and either one silently strands the whole
committed warm pack (cold start = a full remote-recompile wave at 43-600+ s
per graph through the tunnel's compile service):

1. **Cache-dir path in the key.**  jax's default
   ``persistent_cache_enable_xla_caches`` writes the compilation-cache
   DIRECTORY PATH into ``debug_options`` (the GPU autotune-cache dir,
   jax/_src/compiler.py:258-280), and compile options are hashed into every
   key — so a pack built under a tmp cache dir can never hit from
   ``.jax_cache``, and vice versa.  The package disables those GPU-only
   sub-caches (``jax_persistent_cache_enable_xla_caches="none"``, no loss
   on TPU), making keys path-independent.  This, not executable-load
   latency, was the dominant root cause of the round-4/5 cold starts.
2. **Session identity in the key.**  The key also hashes
   ``backend.platform_version`` verbatim and the serialized device topology
   (jax/_src/cache_key.py:334-336, 228-242); the tunnel worker's identity
   (build stamp line, endpoint strings) can change between sessions.

The executables themselves stay loadable across either change (verified by
deserializing a pre-drift pack entry on the post-drift worker:
``client.deserialize_executable`` succeeds), so the key should cover the
COMPATIBILITY-relevant identity only:

  - platform name + ``platform_version`` minus the build-stamp line
    ("Built on <date> ... cl/<number>"), KEEPING the
    "SerializedExecutable vN; compile-cache vN; compat cN" markers — a real
    serialization-compatibility bump still re-keys everything;
  - per-device ``(device_kind, coords, core_on_chip)`` instead of the
    serialized topology proto (which can embed per-session endpoint names).

A wrong reuse fails safe: jax catches deserialization errors on cache read
and falls back to a fresh compile with a warning
(jax/_src/compiler.py:761-785).  Opt out with RHCCQ_STABLE_CACHE_KEY=0.

The reference has no analogue (pure NumPy/OpenCV, no compile step); this is
part of matching its instant cold start (encoder/compression/test.py:77-151).
"""

from __future__ import annotations

import os
import re

_BUILD_LINE = re.compile(r"^Built on .*$", re.MULTILINE)


def stable_platform_string(backend) -> str:
    """platform_version with volatile build-stamp lines removed."""
    v = getattr(backend, "platform_version", "")
    return _BUILD_LINE.sub("", v).strip()


def stable_devices_string(devices) -> str:
    parts = []
    for d in devices:
        parts.append(
            str(
                (
                    getattr(d, "device_kind", "?"),
                    tuple(getattr(d, "coords", ()) or ()),
                    getattr(d, "core_on_chip", -1),
                )
            )
        )
    return ";".join(parts)


def _stable_hash_platform(hash_obj, backend):
    from jax._src import cache_key as ck

    ck._hash_string(hash_obj, backend.platform)
    ck._hash_string(hash_obj, stable_platform_string(backend))


def _stable_hash_accelerator_config(hash_obj, accelerators):
    from jax._src import cache_key as ck

    ck._hash_string(hash_obj, stable_devices_string(accelerators.flat))


def install() -> bool:
    """Patch jax's cache-key component hashers with the stable variants.

    Must run before the first compile in the process (the package __init__
    calls it from _enable_compilation_cache).  Returns True when installed.

    Also installs a one-way migration shim: when the stable key has no cache
    entry but the LEGACY (unpatched) key does — entries compiled by this
    very worker before the stable scheme landed — the legacy file is copied
    under the stable name, so the transition costs zero recompiles on a
    machine with a live cache.
    """
    if os.environ.get("RHCCQ_STABLE_CACHE_KEY", "1") == "0":
        return False
    try:
        import threading

        from jax._src import cache_key as ck
        from jax._src import compilation_cache as cc

        if getattr(cc, "_rhccq_stable_keys", False):
            return True
        orig_hash_platform = ck._hash_platform
        orig_hash_accel = ck._hash_accelerator_config
        orig_get_cache_key = cc.get_cache_key
        lock = threading.Lock()

        def _with_legacy_hashers(fn):
            ck._hash_platform = orig_hash_platform
            ck._hash_accelerator_config = orig_hash_accel
            try:
                return fn()
            finally:
                ck._hash_platform = _stable_hash_platform
                ck._hash_accelerator_config = _stable_hash_accelerator_config

        def _with_path_options(compile_options, cache_dir, fn):
            """Re-create the historical compile options that embedded the
            CACHE DIR PATH: jax's default persistent_cache_enable_xla_caches
            ('xla_gpu_per_fusion_autotune_cache_dir') wrote the dir into
            debug_options, so every pre-fix key is specific to the cache
            path it was compiled under (jax/_src/compiler.py:258-280)."""
            import pathlib

            from jax._src.lib import xla_client as xc

            dbg = compile_options.executable_build_options.debug_options
            saved = (
                dbg.xla_gpu_per_fusion_autotune_cache_dir,
                dbg.xla_gpu_experimental_autotune_cache_mode,
            )
            dbg.xla_gpu_per_fusion_autotune_cache_dir = str(
                pathlib.Path(cache_dir) / "xla_gpu_per_fusion_autotune_cache_dir"
            )
            dbg.xla_gpu_experimental_autotune_cache_mode = (
                xc.AutotuneCacheMode.UPDATE
            )
            try:
                return fn()
            finally:
                (
                    dbg.xla_gpu_per_fusion_autotune_cache_dir,
                    dbg.xla_gpu_experimental_autotune_cache_mode,
                ) = saved

        def migrating_get_cache_key(
            module, devices, compile_options, backend, *args, **kwargs
        ):
            # Serialized: the legacy computations below temporarily restore
            # the original hashers / historical compile options, and
            # cache_key.get resolves the hashers as module globals at call
            # time.
            with lock:
                compute = lambda: orig_get_cache_key(  # noqa: E731
                    module, devices, compile_options, backend, *args, **kwargs
                )
                key = compute()
                try:
                    import jax

                    d = jax.config.jax_compilation_cache_dir
                    if d and not os.path.exists(os.path.join(d, f"{key}-cache")):
                        # Three legacy key epochs, newest first: worker-
                        # identity drift (legacy hashers), cache-path-keyed
                        # entries written after the stable hashers landed,
                        # and path-keyed entries from before both fixes.
                        candidates = [
                            _with_legacy_hashers(compute),
                            _with_path_options(compile_options, d, compute),
                            _with_path_options(
                                compile_options, d,
                                lambda: _with_legacy_hashers(compute),
                            ),
                        ]
                        for legacy in candidates:
                            lp = os.path.join(d, f"{legacy}-cache")
                            if legacy != key and os.path.exists(lp):
                                import shutil

                                tmp = os.path.join(
                                    d, f"{key}-cache.tmp-{os.getpid()}"
                                )
                                shutil.copyfile(lp, tmp)
                                os.replace(
                                    tmp, os.path.join(d, f"{key}-cache")
                                )
                                break
                except Exception:
                    pass  # migration is best-effort; a miss just recompiles
                log_path = os.environ.get("RHCCQ_CACHE_LOG")
                if log_path:
                    try:
                        with open(log_path, "a") as fh:
                            fh.write(key + "\n")
                    except OSError:
                        pass
            return key

        # cache_key.get() looks the helpers up as module globals at call
        # time, so rebinding the attributes is sufficient.
        ck._hash_platform = _stable_hash_platform
        ck._hash_accelerator_config = _stable_hash_accelerator_config
        cc.get_cache_key = migrating_get_cache_key
        cc._rhccq_stable_keys = True
        return True
    except Exception:
        return False


def identity_report() -> dict:
    """Current backend identity, split into the stable basis (part of the
    patched cache key) and the volatile remainder — recorded in
    PACK_META.json so the next drift is attributable."""
    import jax

    backend = jax.devices()[0].client
    return {
        "platform": backend.platform,
        "platform_version_raw": getattr(backend, "platform_version", ""),
        "stable_platform": stable_platform_string(backend),
        "stable_devices": stable_devices_string(jax.devices()),
    }
