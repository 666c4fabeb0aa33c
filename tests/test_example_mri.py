"""The MRI gridding example (examples/mri_gridding.py): trajectory and
phantom helpers pinned, plus a scaled-down end-to-end recon — forward
type-2 vs the direct NDFT oracle, density-compensated adjoint and CG
normal-equation recon converging to the phantom."""

import importlib.util
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from webgpufft_tpu import nufft as NU
from webgpufft_tpu.fftapi import ascomplex, asinterleaved


def _load():
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples", "mri_gridding.py")
    spec = importlib.util.spec_from_file_location("mri_example", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def mri():
    return _load()


def test_trajectory_geometry(mri):
    kx, ky, absr = mri.radial_trajectory(10, 64)
    assert kx.shape == ky.shape == absr.shape == (640,)
    r = np.hypot(kx, ky)
    assert r.max() <= np.pi + 1e-12
    np.testing.assert_allclose(r, np.pi * absr, atol=1e-12)


def test_phantom_range(mri):
    img = mri.shepp_logan_lite(64)
    assert img.shape == (64, 64)
    assert 0.9 <= img.max() <= 1.1 and img.min() >= -1e-12


def test_small_recon_end_to_end(mri):
    n, n_spokes, n_read = 32, 56, 64
    img = mri.shepp_logan_lite(n)
    kx, ky, absr = mri.radial_trajectory(n_spokes, n_read)
    fwd = jax.jit(lambda f: NU.nufft2d2(kx, ky, f, isign=-1))
    adj = jax.jit(lambda s: NU.nufft2d1(kx, ky, s, (n, n), isign=1))
    fi = asinterleaved(img.astype(np.complex64))
    data = fwd(fi)

    # oracle pin on a subset
    rng = np.random.default_rng(0)
    sub = rng.choice(kx.size, 100, replace=False)
    p1 = np.arange(-(n // 2), (n + 1) // 2)
    ref = np.einsum("ab,sa,sb->s", img.astype(np.complex128),
                    np.exp(-1j * np.outer(kx[sub], p1)),
                    np.exp(-1j * np.outer(ky[sub], p1)))
    got = ascomplex(np.asarray(data))[sub]
    assert np.max(np.abs(got - ref)) / np.max(np.abs(ref)) < 2e-5

    # density-compensated adjoint lands near the phantom
    drho, dth = 2 * np.pi / n_read, np.pi / n_spokes
    w = np.pi * absr * drho * dth / (2 * np.pi) ** 2
    w[absr == 0] = np.pi * (drho / 2) ** 2 / n_spokes / (2 * np.pi) ** 2
    wi = jnp.asarray(w.astype(np.float32))[:, None]
    grid = ascomplex(np.asarray(adj(jnp.asarray(data) * wi)))
    assert np.sqrt(np.mean((grid.real - img) ** 2)) < 0.12

    # a few CG iterations beat the gridding recon
    AHA = jax.jit(lambda f: adj(fwd(f)))
    b = adj(jnp.asarray(data))
    x = jnp.zeros_like(b)
    r = b - AHA(x)
    p, rs = r, jnp.sum(r * r)
    for _ in range(10):
        Ap = AHA(p)
        alpha = rs / jnp.sum(p * Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        rs_new = jnp.sum(r * r)
        p = r + (rs_new / rs) * p
        rs = rs_new
    cg = ascomplex(np.asarray(x))
    assert np.sqrt(np.mean((cg.real - img) ** 2)) < 0.06


def test_aha_exports_through_generic_aot(mri):
    """The MRI normal operator (type2 -> type1 chain) serves through the
    generic pipeline AOT path: the exported artifact reproduces the live
    result bit-exactly."""
    from webgpufft_tpu.runtime import aot

    rng = np.random.default_rng(1)
    n, m = 16, 40
    kx = rng.uniform(0, 2 * np.pi, m)
    ky = rng.uniform(0, 2 * np.pi, m)

    def aha(f):
        s = NU.nufft2d2(kx, ky, f, eps=1e-6)
        return NU.nufft2d1(kx, ky, s, (n, n), eps=1e-6)

    f0 = jnp.asarray(rng.standard_normal((n, n, 2)).astype(np.float32))
    live = np.asarray(jax.jit(aha)(f0))     # same lowering as the export
    data = aot.export_pipeline(aha, f0)
    served = aot.load_exported_pipeline(data)
    np.testing.assert_array_equal(np.asarray(served(f0)), live)
