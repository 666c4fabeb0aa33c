#!/usr/bin/env python
"""Example: non-Cartesian MRI reconstruction on the NUFFT layer.

The classic NUFFT workload: k-space is sampled along RADIAL spokes
(golden-angle-style projection imaging), so the samples sit between
grid points and the uniform-FFT machinery needs the nonuniform bridge:

- forward model (image -> k-space): type-2 NUFFT
      s_j = sum_p  img_p  e^{-i p . k_j}
  with p the pixel/mode index (CMCL order) and k_j the spoke sample
  coordinates in radians;
- gridding reconstruction: RAMP-weighTED adjoint (type-1 NUFFT of the
  density-compensated data — Ram-Lak |k| compensation, the analytic
  Jacobian of polar sampling);
- iterative reconstruction: conjugate gradients on the normal
  equations  A^H A x = A^H y  where A is the type-2 operator and A^H
  is EXACTLY the type-1 operator with the opposite isign (the pair is
  a true adjoint, so CG needs no density compensation at all).

Everything is jitted end to end; the CG loop composes grad-safe NUFFT
calls.  A distributed leg re-runs forward + adjoint with the k-space
POINTS sharded over the mesh ('sp'): type 1 merges per-device fine
grids with one psum, type 2 is collective-free
(parallel/nufft.py; run with
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/mri_gridding.py
to get the 8-virtual-device mesh on CPU).

Validation: the forward samples are pinned against the exact direct
NDFT on a random subset; the distributed legs must match single-chip;
CG must converge to the phantom (the spokes oversample Nyquist).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def shepp_logan_lite(n: int) -> np.ndarray:
    """A few-ellipse phantom (real, [0, 1])."""
    y, x = np.meshgrid(np.linspace(-1, 1, n), np.linspace(-1, 1, n),
                       indexing="ij")
    img = np.zeros((n, n))
    # (cx, cy, a, b, angle_deg, value)
    for cx, cy, a, b, ang, v in [
            (0.0, 0.0, 0.72, 0.95, 0, 1.0),
            (0.0, 0.0, 0.65, 0.87, 0, -0.4),
            (0.22, 0.0, 0.12, 0.31, -18, -0.2),
            (-0.22, 0.0, 0.16, 0.41, 18, -0.2),
            (0.0, 0.35, 0.21, 0.25, 0, 0.3),
            (0.0, -0.48, 0.046, 0.046, 0, 0.4)]:
        t = np.deg2rad(ang)
        xr = (x - cx) * np.cos(t) + (y - cy) * np.sin(t)
        yr = -(x - cx) * np.sin(t) + (y - cy) * np.cos(t)
        img[(xr / a) ** 2 + (yr / b) ** 2 <= 1.0] += v
    return img


def radial_trajectory(n_spokes: int, n_read: int):
    """(kx, ky) in radians for n_spokes equiangular spokes of n_read
    signed-radius samples covering |k| <= pi (the mode count only sets
    how finely the image resolves those frequencies)."""
    r = (np.arange(n_read) - n_read // 2) / (n_read // 2)   # [-1, 1)
    th = np.pi * np.arange(n_spokes) / n_spokes             # [0, pi)
    kx = np.pi * np.outer(np.cos(th), r).ravel()
    ky = np.pi * np.outer(np.sin(th), r).ravel()
    return kx, ky, np.tile(np.abs(r), n_spokes)


def main():
    import jax

    if "xla_force_host_platform_device_count" in os.environ.get(
            "XLA_FLAGS", ""):
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    from webgpufft_tpu import nufft as NU
    from webgpufft_tpu.fftapi import ascomplex, asinterleaved
    from webgpufft_tpu.parallel import nufft as DN
    from webgpufft_tpu.parallel import sharded

    n = 128
    n_spokes, n_read = 200, 256          # ~pi/2 * n spokes: above Nyquist
    img = shepp_logan_lite(n)
    kx, ky, absr = radial_trajectory(n_spokes, n_read)
    m = kx.size
    print(f"phantom {n}x{n}, {n_spokes} spokes x {n_read} = {m} samples")

    fwd = jax.jit(lambda f: NU.nufft2d2(kx, ky, f, eps=1e-6, isign=-1))
    adj = jax.jit(lambda s: NU.nufft2d1(kx, ky, s, (n, n), eps=1e-6,
                                        isign=1))

    fi = asinterleaved(img.astype(np.complex64))
    data = fwd(fi)                                          # k-space

    # --- oracle pin: direct NDFT on a random subset of samples
    rng = np.random.default_rng(0)
    sub = rng.choice(m, 400, replace=False)
    p1 = np.arange(-(n // 2), (n + 1) // 2)
    ph = np.exp(-1j * (np.outer(kx[sub], p1)))              # (sub, n)
    ph2 = np.exp(-1j * (np.outer(ky[sub], p1)))
    ref = np.einsum("ab,sa,sb->s", img.astype(np.complex128), ph, ph2)
    got = ascomplex(np.asarray(data))[sub]
    err = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
    print(f"forward vs direct NDFT (400-sample subset): {err:.2e}")
    assert err < 2e-5

    # --- gridding recon: Ram-Lak density compensation + adjoint
    # img_p = (1/(2pi)^2) int_{[-pi,pi]^2} s(k) e^{+ip.k} d2k with polar
    # d2k = |rho| drho dtheta, drho = 2pi/n_read, dtheta = pi/spokes.
    # The DC sample repeats once per spoke; its cell (disc of radius
    # drho/2) is shared equally.
    drho = 2 * np.pi / n_read
    dth = np.pi / n_spokes
    w = np.pi * absr * drho * dth / (2 * np.pi) ** 2
    w[absr == 0] = np.pi * (drho / 2) ** 2 / n_spokes / (2 * np.pi) ** 2
    wi = jnp.asarray(w.astype(np.float32))[:, None]   # broadcast over re/im
    grid_dev = adj(jnp.asarray(data) * wi)
    recon_grid = ascomplex(np.asarray(grid_dev))
    rmse = np.sqrt(np.mean(np.abs(recon_grid.real - img) ** 2))
    print(f"gridding (ramp-compensated adjoint) RMSE: {rmse:.3f}")
    assert rmse < 0.12

    # --- CG on the normal equations (no density compensation needed)
    def AHA(f):
        return adj(fwd(f))

    AHA_j = jax.jit(AHA)
    b = adj(jnp.asarray(data))

    def dot(a, bb):
        return jnp.sum(a * bb)

    x = jnp.zeros_like(b)
    r = b - AHA_j(x)
    p = r
    rs = dot(r, r)
    for it in range(15):
        Ap = AHA_j(p)
        alpha = rs / dot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        rs_new = dot(r, r)
        p = r + (rs_new / rs) * p
        rs = rs_new
    recon_cg = ascomplex(np.asarray(x))
    rmse_cg = np.sqrt(np.mean(np.abs(recon_cg.real - img) ** 2))
    print(f"CG recon (15 iterations) RMSE: {rmse_cg:.4f}")
    # residual error is the un-sampled k-space corners (radial coverage
    # is the inscribed disc) ringing at the phantom's jumps, not CG
    assert rmse_cg < 0.035

    # --- distributed leg: k-space points sharded over the mesh
    if jax.device_count() < 2:
        print("single device: skipping the distributed leg "
              "(set XLA_FLAGS=--xla_force_host_platform_device_count=8)")
        return
    ndev = min(8, jax.device_count())
    mesh = sharded.make_mesh({"sp": ndev})
    dfwd = jax.jit(DN.build_distributed_nufft_type2(
        (kx, ky), (n, n), mesh, isign=-1))
    dadj = jax.jit(DN.build_distributed_nufft_type1(
        (kx, ky), (n, n), mesh, isign=1))
    ddata = np.asarray(dfwd(fi))
    dgrid = np.asarray(dadj(jnp.asarray(ddata) * wi))
    e1 = np.max(np.abs(ddata - np.asarray(data)))
    e2 = np.max(np.abs(dgrid - np.asarray(grid_dev)))
    scale = max(float(np.max(np.abs(np.asarray(data)))), 1e-9)
    print(f"distributed forward/adjoint vs single-chip: "
          f"{e1 / scale:.2e} / {e2 / np.max(np.abs(dgrid)):.2e} "
          f"({ndev} devices, points sharded)")
    assert e1 / scale < 1e-5
    # the adjoint accumulates 51200 spreads in a different order
    # (8-way psum of per-device grids vs sequential chunks): f32
    # summation-order noise, not a convention difference
    assert e2 / np.max(np.abs(dgrid)) < 5e-5
    print("OK")


if __name__ == "__main__":
    main()
