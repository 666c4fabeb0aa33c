#!/usr/bin/env python
"""Example: 2-D incompressible Navier-Stokes, pseudo-spectral, on the
single-chip facade AND the distributed r2c/c2r plans.

Vorticity-streamfunction formulation on the periodic [0, 2pi)^2 torus:

    w_t + u . grad(w) = nu * laplacian(w),   u = (psi_y, -psi_x),
    laplacian(psi) = -w

advanced with a Heun (RK2) step whose viscous factor exp(-nu k^2 dt) is
applied EXACTLY (integrating factor), and 2/3-rule dealiasing.  Each
right-hand side costs one batched inverse c2r (u, v, w_x, w_y in ONE
batch-4 plan exec — one large MXU-friendly dispatch instead of four) and
one forward r2c.

Both transform paths use the PLAN-LAYER r2c convention (packed
half-complex axis FIRST — reference real_complex.js conventions; the
distributed rank-2 r2c also packs axis 0 because the sharded axis
carries the real-input trick, parallel/sharded.py), so one set of
wavenumber grids drives both; the grids stay parametrized by the packed
axis for clarity (and for numpy-style rfft2 oracles, which pack LAST).

The Taylor-Green vortex w = -2 cos(x) cos(y) e^{-2 nu t} is an EXACT
solution of the full nonlinear equations (its advection term vanishes
identically), so the demo validates against the analytic solution, then
runs decaying random turbulence and reports the energy/enstrophy decay.

Run (works on CPU with virtual devices):
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/navier_stokes2d.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def spectral_grids(n: int, packed_axis: int):
    """(KX, KY, inv_k2, dealias) for an n x n grid whose r2c layout packs
    ``packed_axis`` (0 = distributed convention, 1 = facade rfft2)."""
    full = np.fft.fftfreq(n, d=1.0 / n).astype(np.float32)      # integer k
    half = np.arange(n // 2 + 1, dtype=np.float32)
    if packed_axis == 1:
        kx = full[:, None]          # axis 0 = x (full range)
        ky = half[None, :]          # axis 1 = y (packed)
    else:
        kx = half[:, None]          # axis 0 = x (packed)
        ky = full[None, :]          # axis 1 = y (full range)
    k2 = kx * kx + ky * ky
    inv_k2 = np.where(k2 > 0, 1.0 / np.maximum(k2, 1e-30), 0.0)
    kmax = n // 2
    dealias = ((np.abs(kx) <= (2.0 / 3.0) * kmax)
               & (np.abs(ky) <= (2.0 / 3.0) * kmax))
    return (kx.astype(np.float32), ky.astype(np.float32),
            inv_k2.astype(np.float32), dealias.astype(np.float32))


def make_stepper(n: int, nu: float, dt: float, *, mesh=None, seq_axis="sp"):
    """Build (step, to_spectral, to_physical) for an n x n grid.

    ``step(w_hat) -> w_hat`` advances one RK2/integrating-factor step in
    the interleaved spectral representation.  With ``mesh`` the
    transforms are the distributed r2c/c2r plans over ``seq_axis``;
    without, the single-chip facade plans.  Everything jits and scans.
    """
    import jax.numpy as jnp
    import webgpufft_tpu as wft

    if mesh is not None:
        fwd1 = wft.create_distributed_plan(
            type="r2c", shape=[n, n], batch=1, direction="forward",
            normalize="none", mesh=mesh, seq_axis=seq_axis)
        inv1 = wft.create_distributed_plan(
            type="c2r", shape=[n, n], batch=1, direction="inverse",
            normalize="backward", mesh=mesh, seq_axis=seq_axis)
        inv4 = wft.create_distributed_plan(
            type="c2r", shape=[n, n], batch=4, direction="inverse",
            normalize="backward", mesh=mesh, seq_axis=seq_axis)
        packed_axis = 0
    else:
        fwd1 = wft.create_plan(type="r2c", shape=[n, n], batch=1,
                               direction="forward", normalize="none")
        inv1 = wft.create_plan(type="c2r", shape=[n, n], batch=1,
                               direction="inverse", normalize="backward")
        inv4 = wft.create_plan(type="c2r", shape=[n, n], batch=4,
                               direction="inverse", normalize="backward")
        packed_axis = 0

    kx, ky, inv_k2, dealias = spectral_grids(n, packed_axis)
    kx_j = jnp.asarray(kx)[..., None]
    ky_j = jnp.asarray(ky)[..., None]
    invk2_j = jnp.asarray(inv_k2)[..., None]
    mask_j = jnp.asarray(dealias)[..., None]
    visc = jnp.asarray(
        np.exp(-nu * (kx * kx + ky * ky) * dt)[..., None])

    def mul_ik(z, k):
        """i * k * z in interleaved form: (re, im) -> (-k im, k re)."""
        return jnp.stack([-k[..., 0] * z[..., 1],
                          k[..., 0] * z[..., 0]], axis=-1)

    def rhs(w_hat):
        """-dealias(FFT(u . grad w)) from the spectral vorticity."""
        psi = w_hat * invk2_j                    # laplacian(psi) = -w
        fields = jnp.stack([
            mul_ik(psi, ky_j),                   # u  =  psi_y
            -mul_ik(psi, kx_j),                  # v  = -psi_x
            mul_ik(w_hat, kx_j),                 # w_x
            mul_ik(w_hat, ky_j),                 # w_y
        ], axis=0)
        phys = inv4.exec(fields)                 # ONE batch-4 c2r
        adv = phys[0] * phys[2] + phys[1] * phys[3]
        return -mask_j * fwd1.exec(adv[None])[0]

    def step(w_hat):
        """Heun with the exact viscous integrating factor."""
        k1 = rhs(w_hat)
        w_star = visc * (w_hat + dt * k1)
        k2 = rhs(w_star)
        return visc * w_hat + 0.5 * dt * (visc * k1 + k2)

    def to_spectral(w):
        return fwd1.exec(jnp.asarray(w, jnp.float32)[None])[0]

    def to_physical(w_hat):
        return inv1.exec(w_hat[None])[0]

    return step, to_spectral, to_physical


def run(w0, n: int, nu: float, dt: float, steps: int, *, mesh=None,
        seq_axis="sp"):
    """Advance ``w0`` (physical vorticity, n x n) ``steps`` steps; returns
    the final physical vorticity as numpy.  jit + lax.scan over steps.
    ``seq_axis`` may be one mesh axis name or a PAIR for the pencil
    decomposition (both grid axes sharded, each on its own ICI ring)."""
    import jax
    import jax.numpy as jnp

    step, to_spectral, to_physical = make_stepper(n, nu, dt, mesh=mesh,
                                                  seq_axis=seq_axis)
    w_hat0 = to_spectral(w0)

    @jax.jit
    def advance(w_hat):
        def body(carry, _):
            return step(carry), ()
        out, _ = jax.lax.scan(body, w_hat, None, length=steps)
        return out

    return np.asarray(to_physical(advance(w_hat0)))


def taylor_green(n: int, t: float, nu: float):
    """Exact vorticity of the Taylor-Green vortex at time t."""
    x = np.linspace(0.0, 2.0 * np.pi, n, endpoint=False)
    X, Y = np.meshgrid(x, x, indexing="ij")
    return (-2.0 * np.cos(X) * np.cos(Y)
            * np.exp(-2.0 * nu * t)).astype(np.float32)


def energy_enstrophy(w, n: int):
    """Kinetic energy and enstrophy from physical vorticity (spectral)."""
    W = np.fft.rfft2(w) / (n * n)
    kx = np.fft.fftfreq(n, d=1.0 / n)[:, None]
    ky = np.arange(n // 2 + 1)[None, :]
    k2 = kx * kx + ky * ky
    # one-sided spectrum: double every bin except ky = 0 / Nyquist
    wgt = np.full(W.shape, 2.0)
    wgt[:, 0] = 1.0
    if n % 2 == 0:
        wgt[:, -1] = 1.0
    e_spec = np.abs(W) ** 2 * wgt
    with np.errstate(divide="ignore", invalid="ignore"):
        energy = 0.5 * np.sum(np.where(k2 > 0, e_spec / k2, 0.0))
    return float(energy), float(0.5 * np.sum(e_spec))


def main():
    import jax
    if "xla_force_host_platform_device_count" in os.environ.get(
            "XLA_FLAGS", ""):
        jax.config.update("jax_platforms", "cpu")
    from webgpufft_tpu.parallel import sharded

    n, nu, dt, steps = 128, 1e-2, 1e-2, 100
    t_end = dt * steps

    # --- Taylor-Green: exact nonlinear solution, single chip ---
    w_num = run(taylor_green(n, 0.0, nu), n, nu, dt, steps)
    w_ref = taylor_green(n, t_end, nu)
    err = np.max(np.abs(w_num - w_ref)) / np.max(np.abs(w_ref))
    print(f"Taylor-Green {n}x{n}, nu={nu}, t={t_end}: rel err {err:.2e}")
    assert err < 1e-4

    # --- same trajectory on the distributed plans ---
    ndev = min(8, jax.device_count())
    if ndev >= 2:
        mesh = sharded.make_mesh({"sp": ndev})
        w_dist = run(taylor_green(n, 0.0, nu), n, nu, dt, steps, mesh=mesh)
        derr = np.max(np.abs(w_dist - w_num)) / np.max(np.abs(w_num))
        print(f"distributed ({ndev} devices, sp): |dist - single| "
              f"rel {derr:.2e}")
        assert derr < 1e-4
    if ndev >= 4 and ndev % 2 == 0 and n % (ndev // 2) == 0:
        # pencil decomposition: BOTH grid axes sharded, each on its own
        # ICI ring (heFFTe/P3DFFT-style); both mesh factors must divide
        # the grid (ndev=6 would put 3 pencils over a 128-point axis)
        pmesh = sharded.make_mesh({"sp1": 2, "sp2": ndev // 2})
        w_pen = run(taylor_green(n, 0.0, nu), n, nu, dt, steps,
                    mesh=pmesh, seq_axis=("sp1", "sp2"))
        perr = np.max(np.abs(w_pen - w_num)) / np.max(np.abs(w_num))
        print(f"pencil (2x{ndev // 2}): |pencil - single| rel {perr:.2e}")
        assert perr < 1e-4

    # --- decaying random turbulence: physics sanity ---
    rng = np.random.default_rng(7)
    w0 = rng.standard_normal((n, n)).astype(np.float32)
    w0 -= w0.mean()
    e0, z0 = energy_enstrophy(w0, n)
    w1 = run(w0, n, 5e-3, 5e-3, 200)
    e1, z1 = energy_enstrophy(w1, n)
    print(f"turbulence: energy {e0:.4f} -> {e1:.4f}, "
          f"enstrophy {z0:.2f} -> {z1:.2f}")
    assert z1 < z0 and e1 < e0 * 1.001      # enstrophy decays; E nearly conserved
    print("OK")


if __name__ == "__main__":
    main()
