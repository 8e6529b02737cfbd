"""Stable compilation-cache key scheme (utils/cachekey.py).

The volatile backend-identity components (build stamp line, topology proto)
must stay out of the key basis; the compatibility markers must stay in.
"""

import numpy as np

from roibasedimagecompression_tpu.utils import cachekey


class _FakeBackend:
    platform = "tpu"
    platform_version = (
        "PJRT C API\n"
        "axon 0.1.0; SerializedExecutable v9; compile-cache v14; compat c49\n"
        "TFRT TPU v5 lite\n"
        "Built on Nov 12 2025 14:16:36 (1762985796) cl/831091709"
    )


def test_stable_platform_drops_build_stamp_keeps_compat():
    s = cachekey.stable_platform_string(_FakeBackend())
    assert "Built on" not in s
    assert "cl/831091709" not in s
    assert "SerializedExecutable v9" in s
    assert "compile-cache v14" in s
    assert "compat c49" in s
    assert "TFRT TPU v5 lite" in s


def test_stable_platform_differs_on_compat_bump():
    class Bumped(_FakeBackend):
        platform_version = _FakeBackend.platform_version.replace(
            "compat c49", "compat c50"
        )

    assert cachekey.stable_platform_string(
        _FakeBackend()
    ) != cachekey.stable_platform_string(Bumped())


def test_stable_platform_same_across_builds():
    class Redeployed(_FakeBackend):
        platform_version = _FakeBackend.platform_version.replace(
            "Nov 12 2025 14:16:36 (1762985796) cl/831091709",
            "Dec 25 2025 01:02:03 (1766624523) cl/999999999",
        )

    assert cachekey.stable_platform_string(
        _FakeBackend()
    ) == cachekey.stable_platform_string(Redeployed())


def test_install_idempotent_and_key_deterministic():
    import jax
    import jax.numpy as jnp

    assert cachekey.install() in (True, False)
    first = cachekey.install()  # second call must be a no-op success
    assert first is True

    from jax._src import cache_key as ck
    from jax._src import compilation_cache as cc

    # Patched hashers are in place and get_cache_key is wrapped exactly once.
    assert ck._hash_platform is cachekey._stable_hash_platform
    assert getattr(cc, "_rhccq_stable_keys", False)

    # Same lowering -> same key, twice (the migration shim must be pure).
    f = jax.jit(lambda a: a * 2 + 1)
    x = jnp.asarray(np.arange(8, dtype=np.float32))
    lowered = f.lower(x)
    mod = lowered.compiler_ir("stablehlo")
    backend = jax.devices()[0].client
    devices = np.array([[jax.devices()[0]]])
    opts = lowered.compile_args["compile_options"] if hasattr(
        lowered, "compile_args"
    ) else None
    if opts is None:
        return  # internals moved; determinism is still covered by identity
    k1 = cc.get_cache_key(mod, devices, opts, backend)
    k2 = cc.get_cache_key(mod, devices, opts, backend)
    assert k1 == k2


def test_identity_report_shape():
    r = cachekey.identity_report()
    assert set(r) == {
        "platform", "platform_version_raw", "stable_platform", "stable_devices",
    }
    assert isinstance(r["stable_devices"], str) and r["stable_devices"]
