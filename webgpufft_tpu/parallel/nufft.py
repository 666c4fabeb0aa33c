"""Distributed NUFFT: nonuniform points sharded over an ICI mesh axis.

The single-chip module (webgpufft_tpu.nufft) is compute-bound in the
spreading/interpolation stage — (2*Msp)^d Gaussian taps per nonuniform
point — while the uniform fine grid is comparatively small.  That is
exactly the shape that distributes by POINTS, not by grid:

- **Type 1** (nonuniform -> uniform): each device spreads its local
  point shard onto a full local fine grid; spreading is linear, so ONE
  ``psum`` over the mesh axis merges the partial grids; the fine-grid
  FFT, mode extraction and Gaussian deconvolution then run replicated.
  Comm volume: one all-reduce of the (B, Mr^d, 2) fine grid,
  independent of M — the right trade when M >> N (MRI k-space,
  particle-mesh deposits).
- **Type 2** (uniform -> nonuniform): the deconvolve + fine-grid FFT
  run replicated (the modes are replicated input); each device then
  interpolates only its local point shard.  Zero collectives.

Point-position accuracy without host tap tensors: the builders take
CONCRETE points and precompute, per axis, the integer fine-grid base
index m0 = floor(x/h) (int32) and the RESIDUAL r = x - h*m0 in f64,
stored f32.  Device taps are rebuilt per point-chunk from (m0, r):
the residual is O(h), so its f32 rounding costs ~6e-8*h absolute
position error — N-independent, matching the host-f64 tap path of the
single-chip module — while the per-axis footprint is just two (M,)
vectors instead of the (M, taps) tap tensor.

Batch composes with data-parallel sharding (``batch_axis_name``) the
same way as the other distributed builders.  Strengths may be traced
(jit/grad through c flows normally); the POINTS are builder-time
constants, mirroring how a plan is specialized to its geometry.

The reference is single-device (SURVEY.md §2.9) and has no NUFFT; this
extends the framework's beyond-parity distributed surface.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from .. import fftapi
from ..core import cplx
from ..nufft import (_as_points, _as_strengths, _base_residual, _check_grid,
                     _check_isign, _free_coords, _geometry, _grid_from_modes,
                     _interp_taps, _modes_from_grid, _n_modes_tuple,
                     _phase_rot, _sep_taps_from_base, _spread_taps,
                     _type3_setup)
from ..spec import PlanError

__all__ = ["build_distributed_nufft_type1", "build_distributed_nufft_type2",
           "build_distributed_nufft_type3"]


def _pad_points(arrs, m: int, mp: int):
    return [jnp.concatenate([a, jnp.zeros(mp - m, a.dtype)]) if mp > m else a
            for a in arrs]


def _local_spread(c_loc, pr, hs, taus, msp: int, mrs, total: int):
    """Scatter-add the local strengths onto a full local fine grid,
    chunked over the local points (pr = per-axis m0s then rs).  The
    tap kernel and chunk loop are the single-chip ones
    (nufft._taps_from_base/_spread_taps)."""
    rank = len(mrs)
    m0s, rs = pr[:rank], pr[rank:]
    return _spread_taps(
        c_loc,
        lambda s, e: _sep_taps_from_base(m0s, rs, hs, taus, msp, mrs, s, e),
        (2 * msp) ** rank, total)


def _local_interp(grid_flat, pr, hs, taus, msp: int, mrs):
    """Gather-and-sum the replicated fine grid at the local points."""
    rank = len(mrs)
    m0s, rs = pr[:rank], pr[rank:]
    return _interp_taps(
        grid_flat,
        lambda s, e: _sep_taps_from_base(m0s, rs, hs, taus, msp, mrs, s, e),
        m0s[0].shape[0], (2 * msp) ** rank)


def _check_mesh_axes(mesh: Mesh, axis_name: str, batch_axis_name):
    if axis_name not in mesh.axis_names:
        raise PlanError(f"mesh has no axis {axis_name!r} "
                        f"(axes: {mesh.axis_names})")
    if batch_axis_name is not None and batch_axis_name not in mesh.axis_names:
        raise PlanError(f"mesh has no batch axis {batch_axis_name!r} "
                        f"(axes: {mesh.axis_names})")


def _point_consts(points, hs, mesh: Mesh, axis_name: str):
    """(m, mp, m0s, rs): point count, padded count, and the per-axis
    padded (base-index, residual) device constants (host-f64 split,
    nufft._base_residual)."""
    m = points[0].shape[0]
    ndev = mesh.shape[axis_name]
    mp = -(-m // ndev) * ndev
    pairs = [_base_residual(p, h) for p, h in zip(points, hs)]
    m0s = _pad_points([p[0] for p in pairs], m, mp)
    rs = _pad_points([p[1] for p in pairs], m, mp)
    return m, mp, m0s, rs


def _build_point_spread(points, hs, taus, msp: int, mrs, total: int,
                        mesh: Mesh, axis_name: str, batch_axis_name):
    """apply(ci (B, m, 2)) -> (B, total, 2) replicated flat fine grid:
    per-device spread of the local point shard merged by one psum.
    ``points`` are host-f64 coordinates already inside [0, 2pi)."""
    rank = len(mrs)
    m, mp, m0s, rs = _point_consts(points, hs, mesh, axis_name)

    def local_fn(c_loc, *pr):
        grid = _local_spread(c_loc, pr, hs, taus, msp, mrs, total)
        return jax.lax.psum(grid, axis_name)

    smap = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(batch_axis_name, axis_name, None),)
        + (P(axis_name),) * (2 * rank),
        out_specs=P(batch_axis_name, None, None))

    def apply(ci):
        if mp > m:
            ci = jnp.pad(ci, ((0, 0), (0, mp - m), (0, 0)))
        return smap(ci, *m0s, *rs)
    return apply


def _prep(points, n_modes, mesh: Mesh, axis_name: str, eps: float,
          isign: int, batch_axis_name):
    """Shared builder-time geometry: wrapped points, grid parameters,
    padded per-axis (m0, r) host constants, mesh validation."""
    _check_isign(isign)
    _check_mesh_axes(mesh, axis_name, batch_axis_name)
    if not isinstance(points, (list, tuple)):
        points = (points,)
    rank = len(points)
    if rank not in (1, 2, 3):
        raise PlanError(f"points must be 1-3 coordinate arrays, got {rank}")
    pts = []
    for p in points:
        if isinstance(p, jax.core.Tracer):
            raise PlanError(
                "distributed NUFFT points must be concrete (they are "
                "builder-time constants; only the strengths/modes may be "
                "traced)")
        pts.append(_as_points(np.asarray(p, np.float64)))
    if not all(p.shape == pts[0].shape for p in pts[1:]):
        raise PlanError(
            "point coordinate arrays must have the same number of points")
    m = pts[0].shape[0]
    if m == 0:
        raise PlanError("distributed NUFFT needs at least one point")
    ns = _n_modes_tuple(n_modes, rank)
    msp, mrs, hs, taus, total = _geometry(ns, eps)
    return (rank, m, ns, msp, mrs, hs, taus, total, pts)


def _lead_to_batch(arr, trailing: int):
    """Flatten leading dims before the last ``trailing`` axes to one
    batch dim; returns (reshaped, lead_shape)."""
    lead = arr.shape[:arr.ndim - trailing]
    b = int(np.prod(lead, dtype=np.int64)) if lead else 1
    return arr.reshape((b, *arr.shape[arr.ndim - trailing:])), lead


def build_distributed_nufft_type1(points, n_modes, mesh: Mesh,
                                  axis_name: str = "sp", *,
                                  eps: float = 1e-6, isign: int = 1,
                                  batch_axis_name: Optional[str] = None):
    """Build fn(c) -> (..., *n_modes, 2): type-1 NUFFT with the
    nonuniform points sharded over mesh axis ``axis_name``.

    ``points``: 1-3 concrete coordinate arrays (M,) in radians (any
    reals; wrapped mod 2pi).  ``c``: (..., M) complex or (..., M, 2)
    interleaved strengths; leading dims are batch (shard them over
    ``batch_axis_name`` by passing dp-placed data).  Output modes are
    replicated over ``axis_name``.

    Comm profile: ONE psum of the (B, Mr^d, 2) fine grid (spreading is
    linear); the fine FFT runs replicated.  See the module docstring
    for when this is the right trade.
    """
    (rank, m, ns, msp, mrs, hs, taus, total,
     pts) = _prep(points, n_modes, mesh, axis_name, eps, isign,
                  batch_axis_name)
    spread = _build_point_spread(pts, hs, taus, msp, mrs, total,
                                 mesh, axis_name, batch_axis_name)

    def fn(c):
        ci, lead = _as_strengths(c, m)
        grid = spread(ci)
        out = _modes_from_grid(grid, ns, mrs, hs, taus, isign)
        return out.reshape((*lead, *ns, 2))

    fn.n_modes = ns
    fn.n_points = m
    return fn


def build_distributed_nufft_type2(points, n_modes, mesh: Mesh,
                                  axis_name: str = "sp", *,
                                  eps: float = 1e-6, isign: int = -1,
                                  batch_axis_name: Optional[str] = None):
    """Build fn(f) -> (..., M, 2): type-2 NUFFT evaluating the uniform
    CMCL modes ``f`` (..., *n_modes) at the points, which are sharded
    over mesh axis ``axis_name`` (each device interpolates only its
    shard; zero collectives — the mode input is replicated)."""
    (rank, m, ns, msp, mrs, hs, taus, total,
     pts) = _prep(points, n_modes, mesh, axis_name, eps, isign,
                  batch_axis_name)
    _, mp, m0s, rs = _point_consts(pts, hs, mesh, axis_name)

    def local_fn(grid, *pr):
        return _local_interp(grid, pr, hs, taus, msp, mrs)

    smap = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(batch_axis_name, None, None),)
        + (P(axis_name),) * (2 * rank),
        out_specs=P(batch_axis_name, axis_name, None))

    def fn(f):
        fb = fftapi.asinterleaved(f)
        if fb.shape[-rank - 1:] != (*ns, 2):
            raise PlanError(
                f"uniform modes must have trailing shape {(*ns, 2)} "
                f"(interleaved); got {tuple(np.shape(f))}")
        fb, lead = _lead_to_batch(fb, rank + 1)
        grid = _grid_from_modes(fb, ns, mrs, hs, taus, isign)
        vals = smap(grid, *m0s, *rs)
        return vals[:, :m].reshape((*lead, m, 2))

    fn.n_modes = ns
    fn.n_points = m
    return fn


def build_distributed_nufft_type3(sources, targets, mesh: Mesh,
                                  axis_name: str = "sp", *,
                                  eps: float = 1e-6, isign: int = 1,
                                  batch_axis_name: Optional[str] = None):
    """Build fn(c) -> (..., K, 2): type-3 NUFFT (arbitrary real source
    locations -> arbitrary real target frequencies) with BOTH point sets
    sharded over mesh axis ``axis_name``.

    Same Lee-Greengard reduction as the single-chip path
    (webgpufft_tpu.nufft._type3): pre-phase, spread the source shard
    onto the fine grid (one psum), inner distributed type 2 at the
    rescaled target coordinates (collective-free interpolation of the
    target shard), post-phase + Gaussian deconvolution at the real
    target frequencies.  Total comm: ONE all-reduce of the fine grid —
    the inner type-2 stage (deconvolved embed + replicated fine FFT +
    local interpolation) adds no collectives."""
    _check_isign(isign)
    _check_mesh_axes(mesh, axis_name, batch_axis_name)
    if not isinstance(sources, (list, tuple)):
        sources = (sources,)
    if not isinstance(targets, (list, tuple)):
        targets = (targets,)
    if len(sources) != len(targets):
        raise PlanError(
            f"sources and targets must have the same rank, got "
            f"{len(sources)} vs {len(targets)}")
    rank = len(sources)
    if rank not in (1, 2, 3):
        raise PlanError(f"points must be 1-3 coordinate arrays, got {rank}")
    xs = _free_coords(sources, "source locations")
    ss = _free_coords(targets, "target frequencies")
    m, k = xs[0].shape[0], ss[0].shape[0]
    (msp, nfs, hs, taus, us, thetas,
     pre_angle, post_angle, deconv) = _type3_setup(xs, ss, eps)
    total = _check_grid(nfs)
    spread = _build_point_spread(us, hs, taus, msp, nfs, total,
                                 mesh, axis_name, batch_axis_name)
    inner = build_distributed_nufft_type2(
        thetas, tuple(nfs), mesh, axis_name, eps=eps, isign=isign,
        batch_axis_name=batch_axis_name)
    pre_rot = _phase_rot(isign * pre_angle)
    post_rot = _phase_rot(isign * post_angle, deconv)

    def fn(c):
        ci, lead = _as_strengths(c, m)
        cc = cplx.cmul_t4(ci, pre_rot)
        grid = spread(cc).reshape((ci.shape[0], *nfs, 2))
        vals = inner(grid)
        out = cplx.cmul_t4(vals, post_rot)
        return out.reshape((*lead, k, 2))

    fn.n_points = m
    fn.n_targets = k
    return fn
