"""Pallas kernel parity (interpret mode on the CPU mesh)."""

import numpy as np
import pytest

import jax.numpy as jnp

from roibasedimagecompression_tpu.ops import cluster as C
from roibasedimagecompression_tpu.ops.pallas import epscc


def _setup(rng, n=700, npad=1024):
    pts = np.unique(rng.integers(0, 256, (n, 3), dtype=np.int32), axis=0).astype(
        np.float32
    )
    m = len(pts)
    P = np.zeros((npad, 3), np.float32)
    P[:m] = pts
    valid = np.zeros(npad, bool)
    valid[:m] = True
    return P, valid, m


@pytest.mark.parametrize("eps", [10.0, 51.2, 102.4])
def test_pallas_eps_cc_matches_xla(rng, eps):
    P, valid, m = _setup(rng)
    ref = np.asarray(
        C.eps_components(jnp.asarray(P), jnp.float32(eps), jnp.asarray(valid), None, chunk=512)
    )
    ours = np.asarray(
        epscc.eps_components_pallas(
            jnp.asarray(P), jnp.float32(eps), jnp.asarray(valid), None, interpret=True
        )
    )
    np.testing.assert_array_equal(ref, ours)


def test_pallas_eps_cc_groups(rng):
    P, valid, m = _setup(rng)
    groups = np.zeros(len(P), np.int32)
    groups[m // 2 :] = 7
    ref = np.asarray(
        C.eps_components(
            jnp.asarray(P), jnp.float32(200.0), jnp.asarray(valid), jnp.asarray(groups), chunk=512
        )
    )
    ours = np.asarray(
        epscc.eps_components_pallas(
            jnp.asarray(P), jnp.float32(200.0), jnp.asarray(valid), jnp.asarray(groups),
            interpret=True,
        )
    )
    np.testing.assert_array_equal(ref, ours)


def test_pallas_via_host_wrapper_env(rng, monkeypatch):
    monkeypatch.setenv("RHCCQ_USE_PALLAS", "1")
    pts = np.unique(rng.integers(0, 256, (300, 3), dtype=np.int32), axis=0).astype(
        np.float32
    )
    a = C.eps_components_host(pts, 51.2)
    monkeypatch.setenv("RHCCQ_USE_PALLAS", "0")
    b = C.eps_components_host(pts, 51.2)
    np.testing.assert_array_equal(a, b)


def test_slic_assign_pallas_matches_xla(rng):
    """The fused assign kernel must agree with the chunked XLA formulation
    (up to d2 rounding ties: the kernel computes (f-c)^2 exactly, XLA uses
    the f^2+c^2-2fc expansion)."""
    import jax.numpy as jnp
    import numpy as np
    from roibasedimagecompression_tpu.ops.pallas import slic_assign as PS

    mp, k = 4096, 64
    feats = rng.random((mp, 5)).astype(np.float32) * 100.0
    centers = rng.random((k, 5)).astype(np.float32) * 100.0
    got = np.asarray(
        PS.slic_assign_pallas(jnp.asarray(feats), jnp.asarray(centers), interpret=True)
    )
    d2 = ((feats[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
    want = d2.argmin(1)
    agree = (got == want).mean()
    assert agree > 0.999, agree
    # Where they differ it must be a tie (equal distances).
    diff = got != want
    if diff.any():
        np.testing.assert_allclose(
            d2[np.arange(mp)[diff], got[diff]], d2[diff].min(1), rtol=1e-6
        )


def test_slic_assign_pallas_invalid_sentinel(rng):
    """1e6-sentinel centers must never win an assignment."""
    import jax.numpy as jnp
    import numpy as np
    from roibasedimagecompression_tpu.ops.pallas import slic_assign as PS

    feats = rng.random((2048, 5)).astype(np.float32)
    centers = np.full((8, 5), 1e6, np.float32)
    centers[:3] = rng.random((3, 5)).astype(np.float32)
    got = np.asarray(
        PS.slic_assign_pallas(jnp.asarray(feats), jnp.asarray(centers), interpret=True)
    )
    assert got.max() < 3
