#!/usr/bin/env python
"""Example: 3-D incompressible Navier-Stokes, pseudo-spectral
(rotational form), single-chip AND distributed — slab or pencil
decomposition across an ICI mesh.

Velocity formulation on the periodic [0, 2pi)^3 torus:

    u_t = u x omega - grad(p + |u|^2 / 2) + nu * lap(u),   div(u) = 0

advanced in spectral space with a Heun (RK2) step under the EXACT
viscous integrating factor exp(-nu k^2 dt).  The pressure term is the
Leray projection P(N)_i = N_i - k_i (k . N) / k^2 of the transformed
nonlinear term N = u x omega, with 2/3-rule dealiasing.

Per right-hand side: vorticity = i k x u_hat costs no transforms, ONE
batch-6 inverse c2r brings (u, v, w, wx, wy, wz) to physical space in a
single MXU-friendly dispatch, the cross product runs elementwise, and
ONE batch-3 forward r2c returns N.  All transforms pack the
half-complex axis FIRST (plan-layer r2c convention — reference
real_complex.js:73-201 packing analog); with ``mesh`` they are the
distributed rank-3 r2c/c2r plans: ``seq_axis="sp"`` shards grid axis 0
(slab), ``seq_axis=("sp1", "sp2")`` shards axes 0 and 1 on their own
ICI rings (pencil, heFFTe/P3DFFT-style).

Validation — all of it against the FULL nonlinear solver:
- the 2-D Taylor-Green vortex embedded in 3-D (any 2-D flow solves the
  3-D equations; TG's nonlinear term is a pure gradient, so the Leray
  projection must cancel it EXACTLY for the analytic decay to hold —
  this exercises the projection, which Beltrami flows cannot),
- the ABC/Beltrami flow (omega = u, so u x omega = 0 identically: the
  full solution decays as e^{-nu t}; exercises the spectral curl),
- distributed (slab AND pencil) trajectories == single-chip,
- div(u) = 0 preservation and monotone energy decay on random
  turbulence.

Run (works on CPU with virtual devices):
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/navier_stokes3d.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def spectral_grids3(n: int):
    """(KX, KY, KZ, inv_k2, dealias) for an n^3 grid in the plan-layer
    r2c layout: spectral shape (n//2+1, n, n) with the PACKED
    half-complex axis first (= physical axis 0)."""
    half = np.arange(n // 2 + 1, dtype=np.float32)
    full = np.fft.fftfreq(n, d=1.0 / n).astype(np.float32)
    kx = half[:, None, None]
    ky = full[None, :, None]
    kz = full[None, None, :]
    k2 = kx * kx + ky * ky + kz * kz
    inv_k2 = np.where(k2 > 0, 1.0 / np.maximum(k2, 1e-30), 0.0)
    kmax = n // 2
    lim = (2.0 / 3.0) * kmax
    dealias = ((np.abs(kx) <= lim) & (np.abs(ky) <= lim)
               & (np.abs(kz) <= lim))
    bx, by, bz = np.broadcast_arrays(kx, ky, kz)
    return (bx.astype(np.float32), by.astype(np.float32),
            bz.astype(np.float32), inv_k2.astype(np.float32),
            dealias.astype(np.float32))


def make_stepper3(n: int, nu: float, dt: float, *, mesh=None,
                  seq_axis="sp", precision="f32"):
    """Build (step, to_spectral, to_physical) for an n^3 velocity field.

    ``step(u_hat) -> u_hat`` advances the interleaved spectral velocity
    (3, n//2+1, n, n, 2) one RK2/integrating-factor step.  With ``mesh``
    the transforms are the distributed rank-3 r2c/c2r plans over
    ``seq_axis`` (one mesh axis = slab, a pair = pencil); without, the
    single-chip plan layer.  ``precision="bf16-storage"`` halves every
    transform pass's HBM traffic (f32 accumulate; rel ~1e-3 class —
    the accuracy trade is the caller's; benches/r3_precision_transpose.py
    ladder).  Everything jits and scans."""
    import jax.numpy as jnp
    import webgpufft_tpu as wft

    def plans(batch, kind, direction, normalize):
        if mesh is not None:
            return wft.create_distributed_plan(
                type=kind, shape=[n, n, n], batch=batch,
                direction=direction, normalize=normalize, mesh=mesh,
                seq_axis=seq_axis, precision=precision)
        return wft.create_plan(type=kind, shape=[n, n, n], batch=batch,
                               direction=direction, normalize=normalize,
                               precision=precision)

    fwd3 = plans(3, "r2c", "forward", "none")
    inv3 = plans(3, "c2r", "inverse", "backward")
    inv6 = plans(6, "c2r", "inverse", "backward")

    if precision == "bf16-storage":
        # bf16-storage plans take/return bf16 (the storage dtype); the
        # solver state and pointwise layer stay f32 — the boundary casts
        # fuse into the adjacent elementwise ops, so the TRANSFORM
        # passes (the dominant HBM traffic) move half the bytes while
        # the spectral math keeps f32 arithmetic.
        def _exec(plan):
            def f(x):
                return plan.exec(
                    x.astype(jnp.bfloat16)).astype(jnp.float32)
            return f
    else:
        def _exec(plan):
            return plan.exec
    fwd3_x, inv3_x, inv6_x = _exec(fwd3), _exec(inv3), _exec(inv6)

    kx, ky, kz, inv_k2, dealias = spectral_grids3(n)
    kx_j, ky_j, kz_j = jnp.asarray(kx), jnp.asarray(ky), jnp.asarray(kz)
    invk2_j = jnp.asarray(inv_k2)[..., None]
    mask_j = jnp.asarray(dealias)[..., None]
    visc = jnp.asarray(np.exp(
        -nu * (kx * kx + ky * ky + kz * kz) * dt)[..., None])

    def mul_ik(z, k):
        """i * k * z in interleaved form: (re, im) -> (-k im, k re)."""
        return jnp.stack([-k * z[..., 1], k * z[..., 0]], axis=-1)

    def project(f_hat):
        """Leray projection: remove the gradient part of (3, ..., 2)."""
        dot = (kx_j[..., None] * f_hat[0] + ky_j[..., None] * f_hat[1]
               + kz_j[..., None] * f_hat[2]) * invk2_j
        return f_hat - jnp.stack(
            [kx_j[..., None] * dot, ky_j[..., None] * dot,
             kz_j[..., None] * dot], axis=0)

    def rhs(u_hat):
        """P(dealias(FFT(u x omega))) from the spectral velocity."""
        wx = mul_ik(u_hat[2], ky_j) - mul_ik(u_hat[1], kz_j)
        wy = mul_ik(u_hat[0], kz_j) - mul_ik(u_hat[2], kx_j)
        wz = mul_ik(u_hat[1], kx_j) - mul_ik(u_hat[0], ky_j)
        fields = jnp.concatenate(
            [u_hat, jnp.stack([wx, wy, wz], axis=0)], axis=0)
        u, v, w, ox, oy, oz = inv6_x(fields)      # ONE batch-6 c2r
        cross = jnp.stack([v * oz - w * oy,
                           w * ox - u * oz,
                           u * oy - v * ox], axis=0)
        return project(fwd3_x(cross) * mask_j)

    def step(u_hat):
        """Heun with the exact viscous integrating factor."""
        k1 = rhs(u_hat)
        u_star = visc * (u_hat + dt * k1)
        k2 = rhs(u_star)
        return visc * u_hat + 0.5 * dt * (visc * k1 + k2)

    def to_spectral(u):
        """Physical (3, n, n, n) -> dealiased, projected spectral state.
        The 2/3 mask keeps the initial content inside the band the
        solver evolves (out-of-band modes — incl. Nyquist, where the
        one-sided and two-sided k-sign conventions genuinely differ —
        would otherwise sit frozen in the state); the Leray projection
        then makes the field exactly divergence-free."""
        return project(fwd3_x(jnp.asarray(u, jnp.float32)) * mask_j)

    def to_physical(u_hat):
        return inv3_x(u_hat)

    return step, to_spectral, to_physical


def run3(u0, n: int, nu: float, dt: float, steps: int, *, mesh=None,
         seq_axis="sp"):
    """Advance physical velocity ``u0`` (3, n, n, n) ``steps`` steps;
    returns the final physical velocity as numpy.  jit + lax.scan."""
    import jax
    import jax.numpy as jnp

    step, to_spectral, to_physical = make_stepper3(
        n, nu, dt, mesh=mesh, seq_axis=seq_axis)
    u_hat0 = to_spectral(u0)

    @jax.jit
    def advance(u_hat):
        def body(carry, _):
            return step(carry), ()
        out, _ = jax.lax.scan(body, u_hat, None, length=steps)
        return out

    return np.asarray(to_physical(advance(u_hat0)))


def _grid(n: int):
    x = np.linspace(0.0, 2.0 * np.pi, n, endpoint=False)
    return np.meshgrid(x, x, x, indexing="ij")


def taylor_green_embedded(n: int, t: float, nu: float):
    """The 2-D Taylor-Green vortex as a 3-D velocity field — an exact
    solution of the FULL 3-D equations (its nonlinear term is a pure
    gradient, absorbed by the pressure)."""
    X, Y, _ = _grid(n)
    decay = np.exp(-2.0 * nu * t)
    u = np.cos(X) * np.sin(Y) * decay
    v = -np.sin(X) * np.cos(Y) * decay
    return np.stack([u, v, np.zeros_like(u)], axis=0).astype(np.float32)


def abc_flow(n: int, t: float, nu: float, A=1.0, B=1.0, C=1.0):
    """ABC/Beltrami flow: omega = u, so it decays as e^{-nu t} under the
    full nonlinear equations."""
    X, Y, Z = _grid(n)
    decay = np.exp(-nu * t)
    u = (A * np.sin(Z) + C * np.cos(Y)) * decay
    v = (B * np.sin(X) + A * np.cos(Z)) * decay
    w = (C * np.sin(Y) + B * np.cos(X)) * decay
    return np.stack([u, v, w], axis=0).astype(np.float32)


def kinetic_energy(u):
    return float(0.5 * np.mean(np.sum(np.asarray(u) ** 2, axis=0)))


def max_divergence(u, n: int):
    """max |k . u_hat| / max |u_hat| from the physical velocity (numpy
    oracle layout: packed axis LAST for np.fft.rfftn)."""
    uh = np.stack([np.fft.rfftn(c) for c in np.asarray(u)], axis=0)
    full = np.fft.fftfreq(n, d=1.0 / n)
    kx = full[:, None, None]
    ky = full[None, :, None]
    kz = np.arange(n // 2 + 1)[None, None, :]
    div = kx * uh[0] + ky * uh[1] + kz * uh[2]
    return float(np.max(np.abs(div)) / max(np.max(np.abs(uh)), 1e-30))


def main():
    import jax
    if "xla_force_host_platform_device_count" in os.environ.get(
            "XLA_FLAGS", ""):
        jax.config.update("jax_platforms", "cpu")
    from webgpufft_tpu.parallel import sharded

    n, nu, dt, steps = 32, 2e-2, 1e-2, 50
    t_end = dt * steps

    # --- embedded Taylor-Green: exact nonlinear solution ---
    u_num = run3(taylor_green_embedded(n, 0.0, nu), n, nu, dt, steps)
    u_ref = taylor_green_embedded(n, t_end, nu)
    err = np.max(np.abs(u_num - u_ref)) / np.max(np.abs(u_ref))
    print(f"embedded Taylor-Green {n}^3, nu={nu}, t={t_end}: "
          f"rel err {err:.2e}")
    assert err < 1e-4

    # --- ABC/Beltrami: exact e^{-nu t} decay ---
    a_num = run3(abc_flow(n, 0.0, nu), n, nu, dt, steps)
    a_ref = abc_flow(n, t_end, nu)
    err_abc = np.max(np.abs(a_num - a_ref)) / np.max(np.abs(a_ref))
    print(f"ABC flow {n}^3: rel err {err_abc:.2e}")
    assert err_abc < 1e-4

    # --- random turbulence: invariants ---
    rng = np.random.default_rng(0)
    u0 = rng.standard_normal((3, n, n, n)).astype(np.float32)
    u1 = run3(u0, n, nu, dt, steps)
    e0, e1 = kinetic_energy(run3(u0, n, nu, dt, 0)), kinetic_energy(u1)
    dv = max_divergence(u1, n)
    print(f"decaying turbulence: KE {e0:.4f} -> {e1:.4f}, "
          f"max spectral divergence {dv:.2e}")
    assert e1 < e0 and dv < 1e-4

    # --- distributed: slab, then pencil ---
    ndev = min(8, jax.device_count())
    if ndev >= 2:
        mesh = sharded.make_mesh({"sp": ndev})
        u_s = run3(taylor_green_embedded(n, 0.0, nu), n, nu, dt, 10,
                   mesh=mesh)
        u_1 = run3(taylor_green_embedded(n, 0.0, nu), n, nu, dt, 10)
        d = np.max(np.abs(u_s - u_1)) / np.max(np.abs(u_1))
        print(f"slab ({ndev} devices) vs single-chip: {d:.2e}")
        assert d < 1e-4
    if ndev >= 4 and n % (ndev // 2) == 0:
        pmesh = sharded.make_mesh({"sp1": 2, "sp2": ndev // 2})
        u_p = run3(taylor_green_embedded(n, 0.0, nu), n, nu, dt, 10,
                   mesh=pmesh, seq_axis=("sp1", "sp2"))
        u_1 = run3(taylor_green_embedded(n, 0.0, nu), n, nu, dt, 10)
        d = np.max(np.abs(u_p - u_1)) / np.max(np.abs(u_1))
        print(f"pencil (2 x {ndev // 2}) vs single-chip: {d:.2e}")
        assert d < 1e-4
    print("OK")


if __name__ == "__main__":
    main()
