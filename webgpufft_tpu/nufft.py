"""Non-uniform FFT (NUFFT) on the plan layer — finufft-style API.

The uniform-grid ecosystem stops where sampling stops being equispaced;
MRI/radio-astronomy/particle codes reach for finufft/pyNFFT there.  This
module provides types 1 and 2 in one, two and three dimensions with
Gaussian gridding (Dutt-Rokhlin; parameters per Greengard & Lee 2004):

- type 1 (nonuniform -> uniform):  f_k     = sum_j c_j e^{isign i k x_j}
- type 2 (uniform -> nonuniform):  c_j     = sum_k f_k e^{isign i k x_j}

with modes k = -(N//2) .. (N-1)//2 (CMCL/finufft mode ordering) and
points x in radians (any real values; wrapped into [0, 2pi)).  Default
isign follows finufft: +1 for type 1, -1 for type 2.

Algorithm (type 1): spread each point onto a 2x-oversampled fine grid
through a truncated periodized Gaussian e^{-t^2/(4 tau)} (2*Msp taps per
dim), run the fine-grid FFT THROUGH THE PLAN LAYER (facade fft/ifft with
the unscaled norm), then deconvolve by the Gaussian's transform
(h/(2 sqrt(pi tau)) e^{k^2 tau}).  Type 2 is the transpose: deconvolve,
fine-grid inverse, Gaussian interpolation at the points.  tau =
pi*Msp / (N^2 sigma (sigma - 1/2)) with sigma = 2; Msp from eps via the
measured convergence (~0.9 decades per tap-pair, validated against the
direct NDFT oracle in tests/test_nufft.py: Msp=8 -> ~3e-8 in f64).

TPU notes: spreading/interpolation are data-dependent scatter-add /
gather over 2*Msp offsets per point — the one op class with no dense
reformulation (the indices depend on runtime data).  Everything else
(fine FFT, deconvolution) rides the framework's transform kernels.  The
device computes in f32, so accuracy floors at ~1e-6 relative regardless
of eps; pass float64 host arrays to the ORACLE in tests for the math
bar.  All functions are jittable and differentiable — in c (linear) AND
in the point locations x (through the Gaussian taps), so inverse-NUFFT /
pointwise-calibration problems can run under jax.grad.

The reference has no NUFFT analog; this extends the framework's
beyond-parity surface (docs/PARITY.md).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from . import fftapi
from .spec import PlanError

__all__ = ["nufft1d1", "nufft1d2", "nufft2d1", "nufft2d2",
           "nufft3d1", "nufft3d2"]

_SIGMA = 2          # fine-grid oversampling factor


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


def _as_points(x) -> jnp.ndarray:
    x = jnp.asarray(x, jnp.float32)
    if x.ndim != 1:
        raise PlanError(f"points must be a 1-D array, got shape {x.shape}")
    return jnp.mod(x, 2.0 * math.pi)


def _as_strengths(c, m: int) -> Tuple[jnp.ndarray, Tuple[int, ...]]:
    """Interleaved (B, M, 2) strengths from (..., M) complex/interleaved
    input; returns (array, leading batch shape)."""
    ci = fftapi.asinterleaved(c)
    if ci.shape[-2:] == (m, 2):
        lead = ci.shape[:-2]
        return ci.reshape((-1, m, 2)), lead
    raise PlanError(
        f"strengths must have trailing length {m} (one per point); got "
        f"shape {tuple(np.shape(c))}")


def _taps(x: jnp.ndarray, h: float, tau: float, msp: int, mr: int):
    """(indices, weights) of the 2*Msp periodized Gaussian taps per
    point: idx (M, 2*Msp) int32 mod Mr, w (M, 2*Msp) f32."""
    xi = x / h
    m0 = jnp.floor(xi).astype(jnp.int32)
    offs = jnp.arange(-msp + 1, msp + 1, dtype=jnp.int32)
    m = m0[:, None] + offs[None, :]
    t = h * m.astype(jnp.float32) - x[:, None]
    w = jnp.exp(-(t * t) / jnp.float32(4.0 * tau))
    return jnp.mod(m, mr), w


def _mode_slice(mr: int, n: int) -> np.ndarray:
    """Fine-grid bins of the output modes -(n//2)..(n-1)//2 (CMCL)."""
    k = np.arange(-(n // 2), (n + 1) // 2)
    return np.mod(k, mr).astype(np.int32)


def _deconv_1d(n: int, h: float, tau: float) -> np.ndarray:
    k = np.arange(-(n // 2), (n + 1) // 2, dtype=np.float64)
    return (h / (2.0 * math.sqrt(math.pi * tau))
            * np.exp(k * k * tau)).astype(np.float32)


def _fine_dft(grid_i: jnp.ndarray, isign: int, inverse_to_points: bool,
              axes=None):
    """Unscaled fine-grid DFT with the e^{isign * i k h m} convention:
    facade ifft (norm='forward', unscaled) realizes e^{+...}, fft
    (norm=None, unscaled) e^{-...}; rank > 1 via the ND entry points."""
    pos = fftapi.ifftn if axes else fftapi.ifft
    neg = fftapi.fftn if axes else fftapi.fft
    kw = {"axes": axes} if axes else {}
    if isign >= 0:
        return pos(grid_i, norm="forward", **kw)
    return neg(grid_i, **kw)


# ------------------------------------------------------------------ 1-D

def nufft1d1(x, c, n_modes: int, *, eps: float = 1e-6, isign: int = 1):
    """Type-1 1-D NUFFT: f_k = sum_j c_j e^{isign i k x_j} for
    k = -(N//2)..(N-1)//2.  ``x`` (M,) radians; ``c`` (..., M) complex or
    interleaved.  Returns interleaved (..., N, 2)."""
    x = _as_points(x)
    msp = _msp_for(eps)
    mr, h, tau = _grid_params(int(n_modes), msp)
    ci, lead = _as_strengths(c, x.shape[0])
    idx, w = _taps(x, h, tau, msp, mr)
    flat_idx = idx.reshape(-1)

    def spread(cb):                       # (M, 2) -> (Mr, 2)
        vals = cb[:, None, :] * w[..., None]
        return jnp.zeros((mr, 2), jnp.float32).at[flat_idx].add(
            vals.reshape(-1, 2))

    grid = jax.vmap(spread)(ci)           # (B, Mr, 2)
    spec = _fine_dft(grid, isign, False)
    sel = _mode_slice(mr, int(n_modes))
    out = spec[:, sel, :] * jnp.asarray(
        _deconv_1d(int(n_modes), h, tau))[None, :, None]
    return out.reshape((*lead, int(n_modes), 2))


def nufft1d2(x, f, *, eps: float = 1e-6, isign: int = -1):
    """Type-2 1-D NUFFT: c_j = sum_k f_k e^{isign i k x_j}.  ``f``
    (..., N) complex/interleaved uniform modes in CMCL order; returns
    interleaved (..., M, 2) values at the M points ``x``."""
    x = _as_points(x)
    fi = fftapi.asinterleaved(f)
    n = int(fi.shape[-2])
    msp = _msp_for(eps)
    mr, h, tau = _grid_params(n, msp)
    lead = fi.shape[:-2]
    fb = fi.reshape((-1, n, 2))
    sel = _mode_slice(mr, n)
    dec = jnp.asarray(_deconv_1d(n, h, tau) / np.float32(h))
    fine = jnp.zeros((fb.shape[0], mr, 2), jnp.float32)
    fine = fine.at[:, sel, :].set(fb * dec[None, :, None])
    grid = _fine_dft(fine, isign, True)   # (B, Mr, 2) fine-grid field
    idx, w = _taps(x, h, tau, msp, mr)

    def interp(gb):                       # (Mr, 2) -> (M, 2)
        vals = gb[idx]                    # (M, 2*Msp, 2) gather
        return jnp.float32(h) * jnp.sum(vals * w[..., None], axis=1)

    out = jax.vmap(interp)(grid)
    return out.reshape((*lead, x.shape[0], 2))


# ------------------------------------------------------------------ 2-D

def nufft2d1(x, y, c, n_modes, *, eps: float = 1e-6, isign: int = 1):
    """Type-1 2-D NUFFT onto an (N1, N2) mode grid (CMCL order per
    axis): f_{k1,k2} = sum_j c_j e^{isign i (k1 x_j + k2 y_j)}."""
    x = _as_points(x)
    y = _as_points(y)
    if x.shape != y.shape:
        raise PlanError("x and y must have the same number of points")
    n1, n2 = (int(n_modes[0]), int(n_modes[1]))
    msp = _msp_for(eps)
    mr1, h1, t1 = _grid_params(n1, msp)
    mr2, h2, t2 = _grid_params(n2, msp)
    ci, lead = _as_strengths(c, x.shape[0])
    i1, w1 = _taps(x, h1, t1, msp, mr1)
    i2, w2 = _taps(y, h2, t2, msp, mr2)
    lin = (i1[:, :, None] * mr2 + i2[:, None, :]).reshape(-1)
    wout = (w1[:, :, None] * w2[:, None, :])[..., None]   # (M, 2T, 2T, 1)

    def spread(cb):
        vals = cb[:, None, None, :] * wout
        flat = jnp.zeros((mr1 * mr2, 2), jnp.float32).at[lin].add(
            vals.reshape(-1, 2))
        return flat.reshape(mr1, mr2, 2)

    grid = jax.vmap(spread)(ci)
    spec = _fine_dft(grid, isign, False, axes=(1, 2))
    s1 = _mode_slice(mr1, n1)
    s2 = _mode_slice(mr2, n2)
    out = spec[:, s1[:, None], s2[None, :], :]
    dec = (_deconv_1d(n1, h1, t1)[:, None]
           * _deconv_1d(n2, h2, t2)[None, :])
    out = out * jnp.asarray(dec)[None, :, :, None]
    return out.reshape((*lead, n1, n2, 2))


def nufft2d2(x, y, f, *, eps: float = 1e-6, isign: int = -1):
    """Type-2 2-D NUFFT: values at (x_j, y_j) of the (..., N1, N2)
    uniform-mode array ``f``: c_j = sum_{k1,k2} f e^{isign i (k1 x + k2 y)}."""
    x = _as_points(x)
    y = _as_points(y)
    if x.shape != y.shape:
        raise PlanError("x and y must have the same number of points")
    fi = fftapi.asinterleaved(f)
    n1, n2 = int(fi.shape[-3]), int(fi.shape[-2])
    msp = _msp_for(eps)
    mr1, h1, t1 = _grid_params(n1, msp)
    mr2, h2, t2 = _grid_params(n2, msp)
    lead = fi.shape[:-3]
    fb = fi.reshape((-1, n1, n2, 2))
    s1 = _mode_slice(mr1, n1)
    s2 = _mode_slice(mr2, n2)
    dec = (_deconv_1d(n1, h1, t1)[:, None] / np.float32(h1)
           * _deconv_1d(n2, h2, t2)[None, :] / np.float32(h2))
    fine = jnp.zeros((fb.shape[0], mr1, mr2, 2), jnp.float32)
    fine = fine.at[:, s1[:, None], s2[None, :], :].set(
        fb * jnp.asarray(dec)[None, :, :, None])
    grid = _fine_dft(fine, isign, True, axes=(1, 2))
    i1, w1 = _taps(x, h1, t1, msp, mr1)
    i2, w2 = _taps(y, h2, t2, msp, mr2)
    wprod = w1[:, :, None] * w2[:, None, :]               # (M, 2T, 2T)

    def interp(gb):
        vals = gb[i1[:, :, None], i2[:, None, :]]          # (M,2T,2T,2)
        return jnp.float32(h1 * h2) * jnp.sum(
            vals * wprod[..., None], axis=(1, 2))

    out = jax.vmap(interp)(grid)
    return out.reshape((*lead, x.shape[0], 2))


# ------------------------------------------------------------------ 3-D

def _points3(x, y, z):
    x, y, z = _as_points(x), _as_points(y), _as_points(z)
    if not (x.shape == y.shape == z.shape):
        raise PlanError("x, y and z must have the same number of points")
    return x, y, z


def nufft3d1(x, y, z, c, n_modes, *, eps: float = 1e-6, isign: int = 1):
    """Type-1 3-D NUFFT onto an (N1, N2, N3) mode grid (CMCL order per
    axis): f_{k1,k2,k3} = sum_j c_j e^{isign i (k1 x_j + k2 y_j + k3 z_j)}.
    Each point spreads (2*Msp)^3 separable Gaussian taps (the MRI /
    particle-mesh workhorse; budget-minded callers lower eps)."""
    x, y, z = _points3(x, y, z)
    n1, n2, n3 = (int(n_modes[0]), int(n_modes[1]), int(n_modes[2]))
    msp = _msp_for(eps)
    mr1, h1, t1 = _grid_params(n1, msp)
    mr2, h2, t2 = _grid_params(n2, msp)
    mr3, h3, t3 = _grid_params(n3, msp)
    ci, lead = _as_strengths(c, x.shape[0])
    i1, w1 = _taps(x, h1, t1, msp, mr1)
    i2, w2 = _taps(y, h2, t2, msp, mr2)
    i3, w3 = _taps(z, h3, t3, msp, mr3)
    lin = ((i1[:, :, None, None] * mr2 + i2[:, None, :, None]) * mr3
           + i3[:, None, None, :]).reshape(-1)
    wout = (w1[:, :, None, None] * w2[:, None, :, None]
            * w3[:, None, None, :])[..., None]

    def spread(cb):
        vals = cb[:, None, None, None, :] * wout
        flat = jnp.zeros((mr1 * mr2 * mr3, 2), jnp.float32).at[lin].add(
            vals.reshape(-1, 2))
        return flat.reshape(mr1, mr2, mr3, 2)

    grid = jax.vmap(spread)(ci)
    spec = _fine_dft(grid, isign, False, axes=(1, 2, 3))
    s1, s2, s3 = (_mode_slice(mr1, n1), _mode_slice(mr2, n2),
                  _mode_slice(mr3, n3))
    out = spec[:, s1[:, None, None], s2[None, :, None],
               s3[None, None, :], :]
    dec = (_deconv_1d(n1, h1, t1)[:, None, None]
           * _deconv_1d(n2, h2, t2)[None, :, None]
           * _deconv_1d(n3, h3, t3)[None, None, :])
    out = out * jnp.asarray(dec)[None, ..., None]
    return out.reshape((*lead, n1, n2, n3, 2))


def nufft3d2(x, y, z, f, *, eps: float = 1e-6, isign: int = -1):
    """Type-2 3-D NUFFT: values at the points of the (..., N1, N2, N3)
    uniform-mode array ``f``."""
    x, y, z = _points3(x, y, z)
    fi = fftapi.asinterleaved(f)
    n1, n2, n3 = int(fi.shape[-4]), int(fi.shape[-3]), int(fi.shape[-2])
    msp = _msp_for(eps)
    mr1, h1, t1 = _grid_params(n1, msp)
    mr2, h2, t2 = _grid_params(n2, msp)
    mr3, h3, t3 = _grid_params(n3, msp)
    lead = fi.shape[:-4]
    fb = fi.reshape((-1, n1, n2, n3, 2))
    s1, s2, s3 = (_mode_slice(mr1, n1), _mode_slice(mr2, n2),
                  _mode_slice(mr3, n3))
    dec = (_deconv_1d(n1, h1, t1)[:, None, None] / np.float32(h1)
           * _deconv_1d(n2, h2, t2)[None, :, None] / np.float32(h2)
           * _deconv_1d(n3, h3, t3)[None, None, :] / np.float32(h3))
    fine = jnp.zeros((fb.shape[0], mr1, mr2, mr3, 2), jnp.float32)
    fine = fine.at[:, s1[:, None, None], s2[None, :, None],
                   s3[None, None, :], :].set(
        fb * jnp.asarray(dec)[None, ..., None])
    grid = _fine_dft(fine, isign, True, axes=(1, 2, 3))
    i1, w1 = _taps(x, h1, t1, msp, mr1)
    i2, w2 = _taps(y, h2, t2, msp, mr2)
    i3, w3 = _taps(z, h3, t3, msp, mr3)
    wprod = (w1[:, :, None, None] * w2[:, None, :, None]
             * w3[:, None, None, :])

    def interp(gb):
        vals = gb[i1[:, :, None, None], i2[:, None, :, None],
                  i3[:, None, None, :]]
        return jnp.float32(h1 * h2 * h3) * jnp.sum(
            vals * wprod[..., None], axis=(1, 2, 3))

    out = jax.vmap(interp)(grid)
    return out.reshape((*lead, x.shape[0], 2))
