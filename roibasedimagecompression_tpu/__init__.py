"""roibasedimagecompression_tpu — a TPU-native rebuild of the RHCCQ image codec.

Region-based Hierarchical Clustering Color Quantization (after
Riccardoalfieri2003/ROIBasedImageCompression), re-designed for TPU hardware:
JAX/XLA for the pipeline, Pallas kernels for the hot clustering ops, host-side
zlib for the .rhccq bitstream.

Public API:
    encode(image, config)  -> .rhccq bytes
    decode(path_or_bytes)  -> (h, w, 3) uint8 RGB
    CodecConfig            -> quality preset + pipeline knobs
"""

import os as _os


def _host_fingerprint() -> str:
    """Short hash of the CPU identity (model + ISA flags, not core count).

    Flags alone are NOT enough: two hosts in this fleet report identical
    /proc/cpuinfo flags yet XLA detects different target machines (its
    model-derived scheduling features, e.g. prefer-no-gather, differ), so
    their AOT entries collided under one fingerprint and the loader warned
    of potential SIGILL.  Include the model identity fields too.
    """
    import hashlib

    feats = []
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                key = line.split(":", 1)[0].strip()
                if key in ("vendor_id", "cpu family", "model", "model name",
                           "stepping", "microcode"):
                    feats.append(line.strip())
                elif key == "flags":
                    feats.append(" ".join(sorted(line.split(":", 1)[1].split())))
                    break  # one logical CPU is enough
    except OSError:
        pass
    if not feats:
        import platform

        feats = [platform.processor() or platform.machine()]
    return hashlib.sha256("\n".join(feats).encode()).hexdigest()[:12]


def _unpack_solid_pack(solid: str, target: str) -> None:
    """Unpack warm_cache/pack.tar.zst into the compilation-cache dir.

    The solid pack stores the RAW (zstd-decompressed) cache entries in one
    tar compressed as a single zstd stream: the bench-path executables are
    dozens of shape variants of the same few programs, so cross-entry
    redundancy compresses ~an order of magnitude better solid than the
    per-entry frames JAX writes (and each pack rebuild adds ONE git blob,
    not 140).  On unpack each entry is re-compressed as its own zstd frame —
    jax's decompress_executable is level-agnostic, any frame works.  A
    marker file keyed on the pack's content identity skips re-unpacks.
    """
    import hashlib

    try:
        st = _os.stat(solid)
        with open(solid, "rb") as fh:
            head = fh.read(65536)
    except OSError:
        return
    ident = hashlib.sha256(head + str(st.st_size).encode()).hexdigest()[:16]
    marker = _os.path.join(target, f".pack_seeded-{ident}")
    if _os.path.exists(marker):
        return
    try:
        import zstandard
    except ImportError:
        return  # no zstd runtime: fall back to whatever per-entry files exist
    import tarfile

    try:
        _os.makedirs(target, exist_ok=True)
        cctx = zstandard.ZstdCompressor(level=3)
        dctx = zstandard.ZstdDecompressor(max_window_size=1 << 28)
        # Sweep stale tmp files from seeders killed mid-write (they would
        # otherwise accumulate forever and inflate jax's LRU scan).
        try:
            for name in _os.listdir(target):
                if ".tmp-" in name:
                    try:
                        _os.unlink(_os.path.join(target, name))
                    except OSError:
                        pass
        except OSError:
            pass
        with open(solid, "rb") as fh, dctx.stream_reader(fh) as reader:
            with tarfile.open(fileobj=reader, mode="r|") as tar:
                for m in tar:
                    if not m.isfile():
                        continue
                    name = m.name.lstrip("./")
                    if name.startswith("/") or ".." in name.split("/"):
                        continue  # never extract outside target
                    base = name.rsplit("/", 1)[-1]
                    if (base in ("pack.tar.zst", "pack.tar.zst.new")
                            or base.startswith(".")):
                        continue  # a polluted/hand-built pack is not a cache entry
                    dst = _os.path.join(target, name)
                    if _os.path.exists(dst):
                        continue  # never clobber newer local entries
                    _os.makedirs(_os.path.dirname(dst), exist_ok=True)
                    data = cctx.compress(tar.extractfile(m).read())
                    tmp = f"{dst}.tmp-{_os.getpid()}"
                    try:
                        with open(tmp, "wb") as out:
                            out.write(data)
                        _os.replace(tmp, dst)  # atomic vs concurrent seeders
                    except OSError:
                        try:
                            _os.unlink(tmp)
                        except OSError:
                            pass
                        raise
        with open(marker, "w"):
            pass
    except (OSError, tarfile.TarError, zstandard.ZstdError):
        pass  # a partial seed is still a valid cache


def _seed_from_warm_pack(target: str, pack: str | None = None) -> None:
    """Seed the compilation cache from the committed warm pack (warm_cache/).

    A fresh checkout pays real compiles for every graph — minutes each
    through this environment's remote-compile tunnel, even with the manifest
    prewarm collapsing them into one concurrent wave.  The repo therefore
    ships the bench-path executables themselves (scripts/build_warm_cache.py
    regenerates the pack on the real chip): TPU entries are compiled remotely
    and host-independent; CPU entries are AOT code keyed by a host
    fingerprint (cpu-<hash>/ subdirs) so a different host never loads them
    (cf. the cpu_aot_loader SIGILL hazard documented above).  The pack is a
    single solid archive (pack.tar.zst, see _unpack_solid_pack); loose
    per-entry files beside it are hardlinked when possible.  Neither form
    ever overwrites newer local entries.
    """
    if pack is None:
        repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
        pack = _os.path.join(repo, "warm_cache")
    if not _os.path.isdir(pack) or _os.environ.get("RHCCQ_WARM_PACK") == "0":
        return
    solid = _os.path.join(pack, "pack.tar.zst")
    if _os.path.isfile(solid):
        _unpack_solid_pack(solid, target)
    import shutil

    def _sync(src_dir: str, dst_dir: str) -> None:
        _os.makedirs(dst_dir, exist_ok=True)
        for name in _os.listdir(src_dir):
            if name == "pack.tar.zst":
                continue  # the solid archive itself is not a cache entry
            src = _os.path.join(src_dir, name)
            dst = _os.path.join(dst_dir, name)
            if _os.path.isdir(src):
                _sync(src, dst)
            elif not _os.path.exists(dst):
                try:
                    _os.link(src, dst)
                except OSError:
                    try:
                        shutil.copyfile(src, dst)
                    except OSError:
                        pass  # a partial seed is still a valid cache

    try:
        _sync(pack, target)
    except OSError:
        pass


def _enable_compilation_cache() -> None:
    """Persist XLA executables across processes (opt out: RHCCQ_JAX_CACHE=0).

    Compiles through this environment's remote-compile tunnel cost minutes per
    graph; the on-disk cache makes them one-time.
    """
    target = _os.environ.get("RHCCQ_JAX_CACHE")
    if target == "0":
        return
    if not target:
        # Development checkout: keep the cache beside the repo so every
        # process (tests, CLI, bench, driver hooks) shares it.
        repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
        if _os.path.exists(_os.path.join(repo, "pyproject.toml")):
            target = _os.path.join(repo, ".jax_cache")
        else:
            target = _os.path.join(_os.path.expanduser("~"), ".cache", "rhccq_jax")
    # CPU entries are AOT executables that embed the compiling host's CPU
    # features — loading one written by a different host SIGILLs (observed
    # via the repo-shared cache dir: "Target machine feature
    # +prefer-no-gather is not supported", cpu_aot_loader).  Key the CPU
    # cache by a host fingerprint so each machine reuses only its own
    # entries; TPU entries stay in the shared base dir (compiled remotely,
    # host-independent).
    _seed_from_warm_pack(target)
    # Platform truth order: the in-process jax config (config.update is the
    # documented way to force CPU here — the axon site hook exports
    # JAX_PLATFORMS=axon into every environment, so the env var can be stale),
    # then the env var.
    plat = ""
    import sys as _sys

    if "jax" in _sys.modules:
        try:
            plat = _sys.modules["jax"].config.jax_platforms or ""
        except Exception:
            plat = ""
    if not plat:
        plat = _os.environ.get("JAX_PLATFORMS", "")
    # jax_platforms may be a fallback chain ("axon,cpu"): the PRIMARY entry
    # decides which backend actually compiles.
    primary = plat.split(",")[0].strip().lower()
    if primary == "cpu" or _os.environ.get("RHCCQ_FORCE_CPU") == "1":
        target = _os.path.join(target, f"cpu-{_host_fingerprint()}")
    try:
        import jax

        _os.makedirs(target, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", target)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        # Persist EVERY compile: the 0.4 s threshold silently dropped ~18
        # bench-path graphs whose client-side compile TIMER reads near zero
        # (the tunnel backend resolves compiles lazily, so the wall moves to
        # first execution) — each then recompiled in every fresh process, at
        # whatever latency the remote service was having (43-600+ s
        # observed), which is exactly the cold-start tax the warm pack is
        # supposed to remove.  Through a tunnel even a trivial compile costs
        # a round trip, so there is nothing worth skipping.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        # The GPU-only XLA kernel/autotune sub-caches embed the CACHE DIR
        # PATH into compile options, which are hashed into every cache key —
        # so two processes with different cache dirs (pack builder in a tmp
        # dir vs the bench in .jax_cache) silently compute disjoint keys and
        # a committed warm pack never hits.  Measured round 5; useless on
        # TPU anyway.  utils/cachekey.py migrates path-keyed legacy entries.
        jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
    except Exception:
        pass  # cache flags vary across jax versions; never block import
    # Key cache entries on the backend's COMPATIBILITY identity, not its
    # per-session build/topology identity — otherwise a tunnel-worker
    # restart silently strands every packed executable (utils/cachekey.py).
    from roibasedimagecompression_tpu.utils import cachekey as _cachekey

    _cachekey.install()


_enable_compilation_cache()

if _os.environ.get("RHCCQ_FORCE_CPU") == "1":
    # Env-var platform selection can be overridden by site hooks that
    # pre-register an accelerator plugin; config.update always wins.
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")

from roibasedimagecompression_tpu.config import (
    CodecConfig,
    RoiConfig,
    clustering_params,
    tier2_quality,
    tier3_quality,
)
from roibasedimagecompression_tpu.io.container import (
    Rhccq,
    decode_file,
    load,
    pack,
    save,
    unpack,
)

__version__ = "0.1.0"


def decode(source):
    """Decode a .rhccq file path or bytes to an (h, w, 3) uint8 RGB image."""
    if isinstance(source, (bytes, bytearray)):
        return unpack(bytes(source)).to_rgb()
    return decode_file(source)


def encode(image, config: CodecConfig | None = None) -> bytes:
    """Encode an (h, w, 3) uint8 RGB image to .rhccq bytes."""
    from roibasedimagecompression_tpu.models.codec import encode as _encode

    return _encode(image, config or CodecConfig())


__all__ = [
    "CodecConfig",
    "RoiConfig",
    "Rhccq",
    "clustering_params",
    "tier2_quality",
    "tier3_quality",
    "encode",
    "decode",
    "decode_file",
    "load",
    "pack",
    "save",
    "unpack",
]
