"""The 3-D Navier-Stokes pseudo-spectral example
(examples/navier_stokes3d.py): the embedded 2-D Taylor-Green vortex is
an exact solution of the FULL 3-D nonlinear equations whose nonlinear
term is a pure gradient — the Leray projection must cancel it exactly;
the ABC/Beltrami flow decays analytically; slab and pencil distributed
trajectories must match single-chip; physics invariants hold."""

import importlib.util
import os

import numpy as np
import pytest


def _load():
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples", "navier_stokes3d.py")
    spec = importlib.util.spec_from_file_location("ns3d_example", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ns3():
    return _load()


def test_embedded_taylor_green_exact(ns3):
    n, nu, dt, steps = 16, 2e-2, 1e-2, 12
    u = ns3.run3(ns3.taylor_green_embedded(n, 0.0, nu), n, nu, dt, steps)
    ref = ns3.taylor_green_embedded(n, dt * steps, nu)
    err = np.max(np.abs(u - ref)) / np.max(np.abs(ref))
    assert err < 1e-5, err


def test_abc_flow_decay(ns3):
    n, nu, dt, steps = 16, 2e-2, 1e-2, 12
    u = ns3.run3(ns3.abc_flow(n, 0.0, nu), n, nu, dt, steps)
    ref = ns3.abc_flow(n, dt * steps, nu)
    err = np.max(np.abs(u - ref)) / np.max(np.abs(ref))
    assert err < 1e-5, err


def test_turbulence_invariants(ns3):
    n, nu, dt, steps = 16, 2e-2, 1e-2, 10
    rng = np.random.default_rng(0)
    u0 = rng.standard_normal((3, n, n, n)).astype(np.float32)
    u1 = ns3.run3(u0, n, nu, dt, steps)
    e0 = ns3.kinetic_energy(ns3.run3(u0, n, nu, dt, 0))
    e1 = ns3.kinetic_energy(u1)
    assert e1 < e0
    assert ns3.max_divergence(u1, n) < 1e-4


def test_slab_matches_single_chip(ns3):
    import jax
    from webgpufft_tpu.parallel import sharded

    n, nu, dt, steps = 16, 2e-2, 1e-2, 6
    rng = np.random.default_rng(1)
    u0 = rng.standard_normal((3, n, n, n)).astype(np.float32)
    single = ns3.run3(u0, n, nu, dt, steps)
    mesh = sharded.make_mesh({"sp": min(8, jax.device_count())})
    dist = ns3.run3(u0, n, nu, dt, steps, mesh=mesh)
    err = np.max(np.abs(dist - single)) / np.max(np.abs(single))
    assert err < 1e-4, err


def test_solver_exports_as_aot_artifact(ns3):
    """The FULL 3-D nonlinear multi-step solver serializes through the
    generic pipeline AOT export and the loaded artifact reproduces the
    direct run bit-exactly (serve-a-solver story, like NS2D's)."""
    import jax
    from webgpufft_tpu.runtime import aot

    n, nu, dt, steps = 16, 2e-2, 1e-2, 3
    step, to_s, to_p = ns3.make_stepper3(n, nu, dt)
    u_hat = np.asarray(to_s(ns3.taylor_green_embedded(n, 0.0, nu)))

    def advance(v):
        def body(c, _):
            return step(c), ()
        out, _ = jax.lax.scan(body, v, None, length=steps)
        return out

    art = aot.load_exported_pipeline(aot.export_pipeline(advance, u_hat))
    got = np.asarray(to_p(art(u_hat)))
    ref = ns3.run3(ns3.taylor_green_embedded(n, 0.0, nu), n, nu, dt, steps)
    np.testing.assert_array_equal(got, ref)


def test_pencil_matches_single_chip(ns3):
    import jax
    from webgpufft_tpu.parallel import sharded

    if jax.device_count() < 4:
        pytest.skip("needs >= 4 devices")
    n, nu, dt, steps = 16, 2e-2, 1e-2, 6
    rng = np.random.default_rng(2)
    u0 = rng.standard_normal((3, n, n, n)).astype(np.float32)
    single = ns3.run3(u0, n, nu, dt, steps)
    pmesh = sharded.make_mesh({"sp1": 2, "sp2": 2})
    dist = ns3.run3(u0, n, nu, dt, steps, mesh=pmesh,
                    seq_axis=("sp1", "sp2"))
    err = np.max(np.abs(dist - single)) / np.max(np.abs(single))
    assert err < 1e-4, err


def test_bf16_storage_mode_tracks_f32(ns3):
    """precision="bf16-storage" halves the transform storage width; the
    solver state stays f32, so a step's output tracks the f32 step to
    ~dt * transform-rounding (the raw transform rel is ~1e-3 class)."""
    import jax.numpy as jnp

    n, nu, dt = 16, 2e-2, 1e-2
    rng = np.random.default_rng(3)
    u0 = jnp.asarray(rng.standard_normal((3, n, n, n)) * 0.1, jnp.float32)
    step_f, to_s, _ = ns3.make_stepper3(n, nu, dt)
    step_b, _, _ = ns3.make_stepper3(n, nu, dt, precision="bf16-storage")
    u_hat = to_s(u0)
    vf = np.asarray(step_f(u_hat))
    vb = np.asarray(step_b(u_hat))
    rel = np.max(np.abs(vb - vf)) / (np.max(np.abs(vf)) + 1e-30)
    assert rel < 1e-3, rel
