"""The Navier-Stokes pseudo-spectral example (examples/navier_stokes2d.py):
Taylor-Green exactness (it solves the FULL nonlinear equations — the TG
advection term vanishes identically, so the analytic solution is exact),
distributed-vs-single-chip trajectory agreement, and physics sanity."""

import importlib.util
import os

import numpy as np
import pytest


def _load():
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples", "navier_stokes2d.py")
    spec = importlib.util.spec_from_file_location("ns2d_example", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ns():
    return _load()


def test_taylor_green_exact(ns):
    n, nu, dt, steps = 32, 1e-2, 1e-2, 20
    w = ns.run(ns.taylor_green(n, 0.0, nu), n, nu, dt, steps)
    ref = ns.taylor_green(n, dt * steps, nu)
    err = np.max(np.abs(w - ref)) / np.max(np.abs(ref))
    assert err < 1e-5, err


def test_distributed_matches_single_chip(ns):
    import jax
    from webgpufft_tpu.parallel import sharded

    n, nu, dt, steps = 32, 5e-3, 5e-3, 10
    rng = np.random.default_rng(3)
    w0 = rng.standard_normal((n, n)).astype(np.float32)
    w0 -= w0.mean()
    single = ns.run(w0, n, nu, dt, steps)
    mesh = sharded.make_mesh({"sp": min(8, jax.device_count())})
    dist = ns.run(w0, n, nu, dt, steps, mesh=mesh)
    err = np.max(np.abs(dist - single)) / np.max(np.abs(single))
    assert err < 1e-4, err


def test_pencil_matches_single_chip(ns):
    import jax
    from webgpufft_tpu.parallel import sharded

    if jax.device_count() < 4:
        pytest.skip("needs >= 4 devices")
    n, nu, dt, steps = 32, 5e-3, 5e-3, 8
    rng = np.random.default_rng(5)
    w0 = rng.standard_normal((n, n)).astype(np.float32)
    w0 -= w0.mean()
    single = ns.run(w0, n, nu, dt, steps)
    pmesh = sharded.make_mesh({"sp1": 2, "sp2": jax.device_count() // 2})
    pencil = ns.run(w0, n, nu, dt, steps, mesh=pmesh,
                    seq_axis=("sp1", "sp2"))
    err = np.max(np.abs(pencil - single)) / np.max(np.abs(single))
    assert err < 1e-4, err


def test_turbulence_decays(ns):
    n = 32
    rng = np.random.default_rng(11)
    w0 = rng.standard_normal((n, n)).astype(np.float32)
    w0 -= w0.mean()
    e0, z0 = ns.energy_enstrophy(w0, n)
    w1 = ns.run(w0, n, 5e-3, 5e-3, 40)
    e1, z1 = ns.energy_enstrophy(w1, n)
    assert z1 < z0                       # viscous enstrophy decay
    assert e1 < e0 * 1.001               # 2-D: energy (near-)conserved/decaying
    assert np.all(np.isfinite(w1))


def test_solver_exports_as_aot_artifact(ns):
    """The FULL nonlinear multi-step solver serializes through the
    generic pipeline AOT export and the loaded artifact reproduces the
    direct run bit-exactly (serve-a-solver story)."""
    import jax
    from webgpufft_tpu.runtime import aot

    n, nu, dt, steps = 32, 1e-2, 1e-2, 5
    step, to_s, to_p = ns.make_stepper(n, nu, dt)
    w_hat = np.asarray(to_s(ns.taylor_green(n, 0.0, nu)))

    def advance(v):
        def body(c, _):
            return step(c), ()
        out, _ = jax.lax.scan(body, v, None, length=steps)
        return out

    art = aot.load_exported_pipeline(aot.export_pipeline(advance, w_hat))
    got = np.asarray(to_p(art(w_hat)))
    ref = ns.run(ns.taylor_green(n, 0.0, nu), n, nu, dt, steps)
    np.testing.assert_array_equal(got, ref)


def test_spectral_grids_conventions(ns):
    for packed_axis, shape in ((1, (16, 9)), (0, (9, 16))):
        kx, ky, inv_k2, mask = ns.spectral_grids(16, packed_axis)
        assert np.broadcast_shapes(kx.shape, ky.shape) == shape
        full = np.broadcast_to(kx * kx + ky * ky, shape)
        inv = np.broadcast_to(inv_k2, shape)
        assert inv[0, 0] == 0.0                      # k=0 gauge
        nz = full > 0
        assert np.allclose(inv[nz], 1.0 / full[nz], rtol=1e-6)
        m = np.broadcast_to(mask, shape)
        assert m[0, 0] == 1.0
        # 2/3 rule: the highest mode is masked
        assert m.min() == 0.0
