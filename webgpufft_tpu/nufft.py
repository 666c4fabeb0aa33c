"""Non-uniform FFT (NUFFT) on the plan layer — finufft-style API.

The uniform-grid ecosystem stops where sampling stops being equispaced;
MRI/radio-astronomy/particle codes reach for finufft/pyNFFT there.  This
module provides types 1, 2 and 3 in one, two and three dimensions with
Gaussian gridding (Dutt-Rokhlin; parameters per Greengard & Lee 2004):

- type 1 (nonuniform -> uniform):  f_k     = sum_j c_j e^{isign i k x_j}
- type 2 (uniform -> nonuniform):  c_j     = sum_k f_k e^{isign i k x_j}
- type 3 (nonuniform -> nonuniform): f_k   = sum_j c_j e^{isign i s_k x_j}

with modes k = -(N//2) .. (N-1)//2 (CMCL/finufft mode ordering) and
points x in radians (any real values; wrapped into [0, 2pi)).  Type 3
takes arbitrary real source locations x_j AND target frequencies s_k
(no wrapping, no grid).  Default isign follows finufft: +1 for types 1
and 3, -1 for type 2.

Algorithm (type 1): spread each point onto a 2x-oversampled fine grid
through a truncated periodized Gaussian e^{-t^2/(4 tau)} (2*Msp taps per
dim), run the fine-grid FFT THROUGH THE PLAN LAYER (facade fft/ifft with
the unscaled norm), then deconvolve by the Gaussian's transform
(h/(2 sqrt(pi tau)) e^{k^2 tau}).  Type 2 is the transpose: deconvolve,
fine-grid inverse, Gaussian interpolation at the points.  Type 3
(Lee & Greengard 2005) reduces to type 2: center/rescale sources into
the fine grid's interior (an Msp-tap margin so no kernel tail wraps —
e^{i omega u} is not periodic at real omega), spread, evaluate the
grid's trig sum at the rescaled targets via the type-2 core, deconvolve
at the REAL target frequencies, restore the centering phases.  tau =
pi*Msp / (N^2 sigma (sigma - 1/2)) with sigma the EFFECTIVE oversampling
Mr/N; Msp from eps via the measured convergence (~0.9 decades per
tap-pair, validated against the direct NDFT oracle in
tests/test_nufft.py: Msp=8 -> ~3e-8 in f64).

TPU notes: spreading/interpolation are data-dependent scatter-add /
gather over (2*Msp)^d offsets per point — the one op class with no dense
reformulation (the indices depend on runtime data).  The tap tensor is
chunked over the point axis so its footprint stays bounded (a 3-D
eps=1e-6 call is 32 KB/point unchunked).  Everything else (fine FFT,
deconvolution) rides the framework's transform kernels.

Accuracy: the device computes in f32.  For CONCRETE point arrays
(numpy / non-traced — the usual case: sample positions are data) the
host computes, per axis, the integer fine-grid base index floor(x/h)
and the O(h) residual in float64; taps are rebuilt on device from that
pair, so position information survives the f32 store (residual rounding
costs ~6e-8*h absolute) and the overall error floats near the f32
spectrum floor (~1e-6 relative) independent of N — while the baked
constants stay at two (M,) vectors per axis instead of an O(M * taps)
tensor.  For TRACED points (inside jit/grad over x) the base/residual
split happens on device in f32, where the f32 representation of x
itself limits phase accuracy to ~N * 6e-8 relative — at N in the
thousands expect ~1e-4, not 1e-6.  All functions are jittable and
differentiable — in c (linear) AND in the point locations x (through
the Gaussian taps; grads over x use the traced path).

The reference has no NUFFT analog; this extends the framework's
beyond-parity surface (docs/PARITY.md).
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from . import fftapi
from .core import cplx
from .plans.transforms import CHUNK_ELEMS
from .spec import PlanError

__all__ = ["nufft1d1", "nufft1d2", "nufft2d1", "nufft2d2",
           "nufft3d1", "nufft3d2", "nufft1d3", "nufft2d3", "nufft3d3"]

_SIGMA = 2          # fine-grid oversampling factor
_CHUNK_TAP_ELEMS = CHUNK_ELEMS  # bound on B * m_chunk * taps elements
_MAX_CHUNKS = 32             # bound on unrolled chunk count under jit


def _msp_for(eps: float) -> int:
    """Taps-per-side from the requested tolerance (measured convergence:
    Msp 4/6/8/10/12 -> 1e-4/2e-6/3e-8/5e-10/7e-12 in f64)."""
    eps = float(eps)
    if not 0 < eps < 1:
        raise PlanError(f"eps must be in (0, 1), got {eps}")
    return max(4, min(14, int(math.ceil(-math.log10(eps))) + 2))


def _grid_params(n: int, msp: int) -> Tuple[int, float, float]:
    """(Mr, h, tau) for n modes: fine grid size (plan-fast), spacing,
    Gaussian variance parameter (Greengard-Lee)."""
    if n < 2:
        raise PlanError(f"n_modes must be >= 2, got {n}")
    mr = fftapi.next_fast_len(max(_SIGMA * n, 2 * msp + 2))
    h = 2.0 * math.pi / mr
    # tau from the EFFECTIVE oversampling mr/n — when the tap floor or
    # next_fast_len raises mr above sigma*n, the nominal-sigma tau loses
    # 5+ digits at small n (measured: n=6, Msp=8: 1e-4 -> 6e-10)
    sig = mr / n
    tau = math.pi * msp / (n * n) / (sig * (sig - 0.5))
    return mr, h, tau


def _n_modes_tuple(n_modes, rank: int) -> Tuple[int, ...]:
    if np.ndim(n_modes) == 0:
        if rank > 1:
            raise PlanError(
                f"n_modes must be a sequence of {rank} ints, got {n_modes!r}")
        ns = (int(n_modes),)
    else:
        ns = tuple(int(v) for v in n_modes)
    if len(ns) != rank:
        raise PlanError(
            f"n_modes must have {rank} entries, got {len(ns)}")
    return ns


def _check_isign(isign: int) -> int:
    if isign not in (1, -1):
        raise PlanError(f"isign must be +1 or -1, got {isign!r}")
    return isign


def _check_grid(mrs) -> int:
    """Total fine-grid cells, validated against the int32 index space the
    flat scatter/gather indices live in."""
    total = int(np.prod([int(m) for m in mrs], dtype=np.int64))
    if total >= 2 ** 31:
        raise PlanError(
            f"fine grid of {total} cells exceeds the int32 index space; "
            "reduce n_modes (the 2x-oversampled grid must stay below 2^31 "
            "cells)")
    return total


def _as_points(x):
    """1-D point array wrapped into [0, 2pi).  Concrete inputs stay on
    the host in float64 (the wrap and later the taps keep full position
    information); traced inputs wrap in their own dtype before any
    downcast."""
    if isinstance(x, jax.core.Tracer):
        if x.ndim != 1:
            raise PlanError(
                f"points must be a 1-D array, got shape {x.shape}")
        return jnp.mod(x, 2.0 * math.pi).astype(jnp.float32)
    xn = np.asarray(x, np.float64)
    if xn.ndim != 1:
        raise PlanError(f"points must be a 1-D array, got shape {xn.shape}")
    return np.mod(xn, 2.0 * math.pi)


def _as_strengths(c, m: int) -> Tuple[jnp.ndarray, Tuple[int, ...]]:
    """Interleaved (B, M, 2) strengths from (..., M) complex/interleaved
    input; returns (array, leading batch shape)."""
    ci = fftapi.asinterleaved(c)
    if ci.shape[-2:] == (m, 2):
        lead = ci.shape[:-2]
        b = int(np.prod(lead, dtype=np.int64)) if lead else 1
        return ci.reshape((b, m, 2)), lead
    raise PlanError(
        f"strengths must have trailing length {m} (one per point); got "
        f"shape {tuple(np.shape(c))}")


def _as_modes(f, rank: int):
    """Interleaved (B, n1..nd, 2) uniform modes from (..., n1..nd)
    complex/interleaved input; returns (array, mode dims, lead shape)."""
    fi = fftapi.asinterleaved(f)
    if fi.ndim < rank + 1:
        raise PlanError(
            f"uniform modes must have at least {rank} mode axes; got "
            f"shape {tuple(np.shape(f))}")
    ns = tuple(int(d) for d in fi.shape[-rank - 1:-1])
    lead = fi.shape[:-rank - 1]
    return fi.reshape((-1, *ns, 2)), ns, lead


def _base_residual(x, h: float):
    """Per-point fine-grid base index m0 = floor(x/h) (int32) and
    residual r = x - h*m0 (f32).  Concrete points compute on the host in
    f64 — the residual is O(h), so its f32 store costs ~6e-8*h absolute
    position error, N-independent (the same accuracy as full host-f64
    taps, but the baked constants are two (M,) vectors instead of the
    O(M * taps) tensor, which at MRI scale — 3-D eps=1e-6, M=1e6 — was
    ~32 GB of jaxpr constants).  Traced points compute on device in f32,
    where x's own f32 representation limits phase accuracy."""
    if isinstance(x, np.ndarray):
        m0 = np.floor(x / h).astype(np.int64)
        r = (x - h * m0).astype(np.float32)
        return jnp.asarray(m0.astype(np.int32)), jnp.asarray(r)
    m0 = jnp.floor(x / jnp.float32(h)).astype(jnp.int32)
    r = x.astype(jnp.float32) - jnp.float32(h) * m0.astype(jnp.float32)
    return m0, r


def _taps_from_base(m0, r, h: float, tau: float, msp: int, mr: int):
    """(indices, weights) of the 2*Msp periodized Gaussian taps from a
    base-index/residual pair: idx (mc, 2*Msp) int32 mod Mr, w
    (mc, 2*Msp) f32, built ON DEVICE (t = h*j - r, so every quantity is
    O(h) and f32-exact to ~1e-7 relative).  The single tap-kernel
    definition — the distributed layer (parallel/nufft.py) feeds it
    sharded (m0, r) shards."""
    offs = jnp.arange(-msp + 1, msp + 1, dtype=jnp.int32)
    idx = jnp.mod(m0[:, None] + offs[None, :], mr)
    t = (jnp.float32(h) * offs.astype(jnp.float32)[None, :]
         - r[:, None])
    w = jnp.exp(-(t * t) / jnp.float32(4.0 * tau))
    return idx, w


def _combine_sep_taps(per_axis, mrs):
    """Combine per-axis (idx, w) taps into flattened separable taps:
    linear row-major indices (mc, T) and weight products (mc, T)."""
    (lin, w) = per_axis[0]
    for (i2, w2), mr in zip(per_axis[1:], mrs[1:]):
        m = lin.shape[0]
        lin = (lin[:, :, None] * mr + i2[:, None, :]).reshape(m, -1)
        w = (w[:, :, None] * w2[:, None, :]).reshape(m, -1)
    return lin, w


def _sep_taps(points: Sequence, hs, taus, msp: int, mrs, s=0, e=None):
    """Flattened separable taps for the point slice [s:e): linear
    fine-grid indices (mc, T) with T = (2*Msp)^rank into the row-major
    (mr1*..*mrd) grid, and the matching weight products (mc, T) f32.
    Called per point-chunk so the O(M*T) tap tensor never materializes
    whole."""
    per_axis = []
    for p, h, tau, mr in zip(points, hs, taus, mrs):
        m0, r = _base_residual(p[s:e], h)
        per_axis.append(_taps_from_base(m0, r, h, tau, msp, mr))
    return _combine_sep_taps(per_axis, mrs)


def _sep_taps_from_base(m0s, rs, hs, taus, msp: int, mrs, s=0, e=None):
    """_sep_taps from precomputed per-axis (m0, r) pairs (the
    distributed layer's device-sharded constants)."""
    per_axis = [
        _taps_from_base(m0[s:e], r[s:e], h, tau, msp, mr)
        for m0, r, h, tau, mr in zip(m0s, rs, hs, taus, mrs)]
    return _combine_sep_taps(per_axis, mrs)


def _point_step(b: int, m: int, t: int) -> int:
    """Point-axis chunk length bounding the (B, step, T) tap tensor to
    ~_CHUNK_TAP_ELEMS elements while keeping the unrolled chunk count
    under _MAX_CHUNKS."""
    step = max(1, _CHUNK_TAP_ELEMS // max(1, b * t))
    min_step = -(-m // _MAX_CHUNKS) if m else 1
    return max(1, min(m, max(step, min_step))) if m else 1


def _spread_taps(ci: jnp.ndarray, taps_fn, t: int,
                 total: int) -> jnp.ndarray:
    """Scatter-add strengths onto the flat fine grid: (B, M, 2) ->
    (B, total, 2), chunked over points with taps built per chunk by
    ``taps_fn(s, e) -> (lin, w)`` so the footprint stays bounded at
    any M (shared with the distributed layer)."""
    b, m, _ = ci.shape
    step = _point_step(b, m, t)
    grid = jnp.zeros((b, total, 2), jnp.float32)
    for s in range(0, m, step):
        e = min(m, s + step)
        lin, w = taps_fn(s, e)
        vals = ci[:, s:e, None, :] * w[None, :, :, None]
        grid = grid.at[:, lin.reshape(-1)].add(vals.reshape(b, -1, 2))
    return grid


def _interp_taps(grid_flat: jnp.ndarray, taps_fn, m: int,
                 t: int) -> jnp.ndarray:
    """Gather-and-sum fine-grid values at the points: (B, total, 2) ->
    (B, M, 2), taps built per chunk by ``taps_fn(s, e)``."""
    b = grid_flat.shape[0]
    step = _point_step(b, m, t)
    outs = []
    for s in range(0, m, step):
        e = min(m, s + step)
        lin, w = taps_fn(s, e)
        vals = grid_flat[:, lin]                 # (B, mc, T, 2)
        outs.append(jnp.sum(vals * w[None, :, :, None], axis=2))
    if not outs:
        return jnp.zeros((b, 0, 2), jnp.float32)
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)


def _spread(ci: jnp.ndarray, points, hs, taus, msp: int, mrs,
            total: int) -> jnp.ndarray:
    return _spread_taps(
        ci, lambda s, e: _sep_taps(points, hs, taus, msp, mrs, s, e),
        (2 * msp) ** len(mrs), total)


def _interp(grid_flat: jnp.ndarray, points, hs, taus, msp: int,
            mrs) -> jnp.ndarray:
    return _interp_taps(
        grid_flat,
        lambda s, e: _sep_taps(points, hs, taus, msp, mrs, s, e),
        points[0].shape[0], (2 * msp) ** len(mrs))


def _mode_slice(mr: int, n: int) -> np.ndarray:
    """Fine-grid bins of the output modes -(n//2)..(n-1)//2 (CMCL)."""
    k = np.arange(-(n // 2), (n + 1) // 2)
    return np.mod(k, mr).astype(np.int32)


def _deconv_1d(n: int, h: float, tau: float) -> np.ndarray:
    k = np.arange(-(n // 2), (n + 1) // 2, dtype=np.float64)
    return (h / (2.0 * math.sqrt(math.pi * tau))
            * np.exp(k * k * tau)).astype(np.float32)


def _fine_dft(grid_i: jnp.ndarray, isign: int, axes=None):
    """Unscaled fine-grid DFT with the e^{isign * i k h m} convention:
    facade ifft (norm='forward', unscaled) realizes e^{+...}, fft
    (norm=None, unscaled) e^{-...}; rank > 1 via the ND entry points."""
    pos = fftapi.ifftn if axes else fftapi.ifft
    neg = fftapi.fftn if axes else fftapi.fft
    kw = {"axes": axes} if axes else {}
    if isign >= 0:
        return pos(grid_i, norm="forward", **kw)
    return neg(grid_i, **kw)


# ------------------------------------------------------------ generic ND

def _mode_ix(ns, mrs):
    """Broadcastable per-axis fine-grid selectors of the CMCL modes."""
    rank = len(ns)
    sels = [_mode_slice(mr, n) for mr, n in zip(mrs, ns)]
    return tuple(s.reshape((1,) * i + (-1,) + (1,) * (rank - 1 - i))
                 for i, s in enumerate(sels))


def _deconv_nd(ns, hs, taus) -> np.ndarray:
    """Separable Gaussian deconvolution weights, broadcast to (*ns,)."""
    rank = len(ns)
    dec = np.float32(1.0)
    for i, (n, h, tau) in enumerate(zip(ns, hs, taus)):
        d = _deconv_1d(n, h, tau)
        dec = dec * d.reshape((1,) * i + (-1,) + (1,) * (rank - 1 - i))
    return dec


def _modes_from_grid(grid, ns, mrs, hs, taus, isign: int):
    """Flat fine grid (B, total, 2) -> deconvolved CMCL modes
    (B, *ns, 2): fine-grid DFT, mode extraction, Gaussian deconvolution
    (the type-1 tail after spreading; shared with the distributed layer)."""
    b = grid.shape[0]
    rank = len(ns)
    grid = grid.reshape((b, *mrs, 2))
    spec = _fine_dft(grid, isign, axes=tuple(range(1, rank + 1))
                     if rank > 1 else None)
    out = spec[(slice(None), *_mode_ix(ns, mrs), slice(None))]
    return out * jnp.asarray(_deconv_nd(ns, hs, taus))[None, ..., None]


def _grid_from_modes(fb, ns, mrs, hs, taus, isign: int):
    """Deconvolved CMCL modes (B, *ns, 2) -> flat fine grid (B, total, 2)
    (the type-2 head before interpolation; shared with the distributed
    layer)."""
    rank = len(ns)
    fine = jnp.zeros((fb.shape[0], *mrs, 2), jnp.float32)
    fine = fine.at[(slice(None), *_mode_ix(ns, mrs), slice(None))].set(
        fb * jnp.asarray(_deconv_nd(ns, hs, taus))[None, ..., None])
    grid = _fine_dft(fine, isign, axes=tuple(range(1, rank + 1))
                     if rank > 1 else None)
    return grid.reshape((fb.shape[0], -1, 2))


def _geometry(ns, eps: float):
    """(msp, mrs, hs, taus, total) for a mode-grid geometry."""
    msp = _msp_for(eps)
    params = [_grid_params(n, msp) for n in ns]
    mrs = [p[0] for p in params]
    hs = [p[1] for p in params]
    taus = [p[2] for p in params]
    return msp, mrs, hs, taus, _check_grid(mrs)


def _type1(points, c, ns, eps: float, isign: int):
    _check_isign(isign)
    msp, mrs, hs, taus, total = _geometry(ns, eps)
    ci, lead = _as_strengths(c, points[0].shape[0])
    grid = _spread(ci, points, hs, taus, msp, mrs, total)
    out = _modes_from_grid(grid, ns, mrs, hs, taus, isign)
    return out.reshape((*lead, *ns, 2))


def _type2(points, f, rank: int, eps: float, isign: int):
    _check_isign(isign)
    fb, ns, lead = _as_modes(f, rank)
    msp, mrs, hs, taus, _ = _geometry(ns, eps)
    grid = _grid_from_modes(fb, ns, mrs, hs, taus, isign)
    out = _interp(grid, points, hs, taus, msp, mrs)
    return out.reshape((*lead, points[0].shape[0], 2)), ns


def _points_nd(*coords):
    pts = [_as_points(p) for p in coords]
    if not all(p.shape == pts[0].shape for p in pts[1:]):
        raise PlanError(
            "point coordinate arrays must have the same number of points")
    return pts


# -------------------------------------------------------------- type 3

def _free_coords(coords, what: str):
    """Host-f64 1-D coordinate arrays for type 3 (no wrapping — source
    locations and target frequencies are free reals).  Type-3 geometry
    (grid sizes) depends on the coordinate RANGES, so traced coordinates
    cannot be supported; strengths may still be traced."""
    out = []
    for p in coords:
        if isinstance(p, jax.core.Tracer):
            raise PlanError(
                f"type-3 {what} must be concrete (the fine-grid geometry "
                "depends on their numeric range); only the strengths may "
                "be traced")
        pn = np.asarray(p, np.float64)
        if pn.ndim != 1:
            raise PlanError(
                f"{what} must be 1-D arrays, got shape {pn.shape}")
        out.append(pn)
    if not all(p.shape == out[0].shape for p in out[1:]):
        raise PlanError(
            f"{what} coordinate arrays must have the same length")
    if out[0].size == 0:
        raise PlanError(f"{what} must be non-empty")
    return out


def _phase_rot(angle: np.ndarray, factor=1.0) -> jnp.ndarray:
    """(..., 2, 2) rotation tensor for cmul_t4: multiply interleaved data
    by factor * e^{i angle} (host-f64 trig, f32 storage)."""
    return jnp.asarray(cplx.to_t4(np.asarray(factor, np.float64)
                                  * np.exp(1j * np.asarray(angle))))


def _type3_setup(xs, ss, eps: float):
    """Host-side type-3 geometry (isign-independent): per-axis fine-grid
    params (nfs, hs, taus), rescaled source coordinates ``us``, inner
    type-2 point coordinates ``thetas``, and the phase/deconvolution
    vectors (multiplied by isign at application).  Shared by the
    single-chip path and the distributed builder."""
    msp = _msp_for(eps)
    nfs, hs, taus = [], [], []
    us, thetas = [], []
    pre_angle = np.zeros(xs[0].shape[0], np.float64)
    post_angle = np.zeros(ss[0].shape[0], np.float64)
    deconv = np.ones(ss[0].shape[0], np.float64)
    for x, s in zip(xs, ss):
        xc = (x.max() + x.min()) / 2.0
        sc = (s.max() + s.min()) / 2.0
        hx = max(np.abs(x - xc).max(), 1e-9)    # source half-extent X
        sx = max(np.abs(s - sc).max(), 1e-9)    # target half-extent S
        # e^{i omega u} is NOT 2pi-periodic in u for real omega, so the
        # spread must never wrap: sources map into [pi - A, pi + A] with
        # an Msp-tap margin A = pi - msp*h on each side.  A depends on h
        # which depends on nf which depends on A — two fixed-point
        # passes settle it (nf only grows through next_fast_len).
        amp = math.pi
        for _ in range(3):
            wband = max(sx * hx / amp, 1.0)     # inner bandwidth W
            n_band = max(int(math.ceil(2.0 * wband)) + 1, 2)
            nf = fftapi.next_fast_len(max(_SIGMA * n_band, 4 * msp + 2))
            h = 2.0 * math.pi / nf
            amp = max(math.pi - msp * h, math.pi / 2.0)
        gam = amp / hx                          # x' -> u scale
        omega = (s - sc) / gam                  # scaled target freqs
        sig = nf / n_band
        tau = math.pi * msp / (n_band * n_band) / (sig * (sig - 0.5))
        nfs.append(nf)
        hs.append(h)
        taus.append(tau)
        us.append((x - xc) * gam + math.pi)     # in [pi-A, pi+A]
        thetas.append(np.mod(omega * h, 2.0 * math.pi))
        pre_angle += sc * (x - xc)
        # e^{isign i theta*c0} (natural->CMCL index shift of the inner
        # type 2) and e^{-isign i pi*omega} (source center shift) —
        # they cancel exactly when nf is even
        post_angle += omega * (h * (nf // 2) - math.pi) + s * xc
        deconv *= (h / (2.0 * math.sqrt(math.pi * tau))
                   * np.exp(omega * omega * tau))
    return (msp, nfs, hs, taus, us, thetas, pre_angle, post_angle, deconv)


def _type3(xs, c, ss, eps: float, isign: int):
    """Generic ND type 3 (Lee & Greengard 2005, reduction to type 2):
    center and rescale sources into [0, 2pi) and targets into fine-grid
    'point' coordinates, Gaussian-spread the (pre-phased) strengths onto
    a fine grid, evaluate the grid's trig sum at the scaled targets via
    the type-2 core, then deconvolve by the spreading Gaussian at the
    REAL target frequencies and restore the centering phases."""
    _check_isign(isign)
    rank = len(xs)
    ci, lead = _as_strengths(c, xs[0].shape[0])
    (msp, nfs, hs, taus, us, thetas,
     pre_angle, post_angle, deconv) = _type3_setup(xs, ss, eps)

    cc = cplx.cmul_t4(ci, _phase_rot(isign * pre_angle))
    grid = _spread(cc, us, hs, taus, msp, nfs, _check_grid(nfs))
    # the natural-order fine grid read as CMCL modes represents
    # coefficients of e^{isign i (m - nf//2) theta}; the index shift is
    # folded into post_angle above
    grid = grid.reshape((cc.shape[0], *nfs, 2))
    inner, _ = _type2(thetas, grid, rank, eps, isign)
    out = cplx.cmul_t4(inner, _phase_rot(isign * post_angle, deconv))
    return out.reshape((*lead, ss[0].shape[0], 2))


def nufft1d3(x, c, s, *, eps: float = 1e-6, isign: int = 1):
    """Type-3 1-D NUFFT: f_k = sum_j c_j e^{isign i s_k x_j} at arbitrary
    real target frequencies ``s`` from arbitrary real source locations
    ``x`` (M,) with strengths ``c`` (..., M) complex or interleaved.
    Returns interleaved (..., K, 2).  Coordinates must be concrete
    (the fine-grid geometry depends on their ranges)."""
    return _type3(_free_coords([x], "source locations"), c,
                  _free_coords([s], "target frequencies"), eps, isign)


def nufft2d3(x, y, c, s, t, *, eps: float = 1e-6, isign: int = 1):
    """Type-3 2-D NUFFT: f_k = sum_j c_j e^{isign i (s_k x_j + t_k y_j)}
    at K arbitrary target frequency pairs (s, t)."""
    return _type3(_free_coords([x, y], "source locations"), c,
                  _free_coords([s, t], "target frequencies"), eps, isign)


def nufft3d3(x, y, z, c, s, t, u, *, eps: float = 1e-6, isign: int = 1):
    """Type-3 3-D NUFFT: f_k = sum_j c_j e^{isign i (s_k x_j + t_k y_j +
    u_k z_j)} at K arbitrary target frequency triples (s, t, u)."""
    return _type3(_free_coords([x, y, z], "source locations"), c,
                  _free_coords([s, t, u], "target frequencies"), eps, isign)


# ------------------------------------------------------------------ 1-D

def nufft1d1(x, c, n_modes: int, *, eps: float = 1e-6, isign: int = 1):
    """Type-1 1-D NUFFT: f_k = sum_j c_j e^{isign i k x_j} for
    k = -(N//2)..(N-1)//2.  ``x`` (M,) radians; ``c`` (..., M) complex or
    interleaved.  Returns interleaved (..., N, 2)."""
    return _type1(_points_nd(x), c, _n_modes_tuple(n_modes, 1),
                  eps, isign)


def nufft1d2(x, f, *, eps: float = 1e-6, isign: int = -1):
    """Type-2 1-D NUFFT: c_j = sum_k f_k e^{isign i k x_j}.  ``f``
    (..., N) complex/interleaved uniform modes in CMCL order; returns
    interleaved (..., M, 2) values at the M points ``x``."""
    out, _ = _type2(_points_nd(x), f, 1, eps, isign)
    return out


# ------------------------------------------------------------------ 2-D

def nufft2d1(x, y, c, n_modes, *, eps: float = 1e-6, isign: int = 1):
    """Type-1 2-D NUFFT onto an (N1, N2) mode grid (CMCL order per
    axis): f_{k1,k2} = sum_j c_j e^{isign i (k1 x_j + k2 y_j)}."""
    return _type1(_points_nd(x, y), c, _n_modes_tuple(n_modes, 2),
                  eps, isign)


def nufft2d2(x, y, f, *, eps: float = 1e-6, isign: int = -1):
    """Type-2 2-D NUFFT: values at (x_j, y_j) of the (..., N1, N2)
    uniform-mode array ``f``: c_j = sum_{k1,k2} f e^{isign i (k1 x + k2 y)}."""
    out, _ = _type2(_points_nd(x, y), f, 2, eps, isign)
    return out


# ------------------------------------------------------------------ 3-D

def nufft3d1(x, y, z, c, n_modes, *, eps: float = 1e-6, isign: int = 1):
    """Type-1 3-D NUFFT onto an (N1, N2, N3) mode grid (CMCL order per
    axis): f_{k1,k2,k3} = sum_j c_j e^{isign i (k1 x_j + k2 y_j + k3 z_j)}.
    Each point spreads (2*Msp)^3 separable Gaussian taps, chunked over
    points so the tap tensor stays within the framework's operand bound
    (the MRI / particle-mesh workhorse; budget-minded callers lower eps)."""
    return _type1(_points_nd(x, y, z), c, _n_modes_tuple(n_modes, 3),
                  eps, isign)


def nufft3d2(x, y, z, f, *, eps: float = 1e-6, isign: int = -1):
    """Type-2 3-D NUFFT: values at the points of the (..., N1, N2, N3)
    uniform-mode array ``f``."""
    out, _ = _type2(_points_nd(x, y, z), f, 3, eps, isign)
    return out
