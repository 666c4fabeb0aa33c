"""scipy.signal B-spline toolbox: smoothing IIR filters with
mirror-symmetric boundaries, spline coefficient prefilters, and spline
evaluation.

Layering follows the framework idiom: the boundary initial conditions
are host f64 table math (truncated geometric/damped-cosine sums over the
concrete signal — the published mirror-condition formulas), while the
forward/backward recursions run on device through filtering.lfilter /
filtering.sosfilt (``lax.scan`` state updates).  Spline evaluation is a
pointwise 4-tap kernel gather on device.

Semantics pinned against scipy.signal in tests/test_splines.py,
including the two distinct boundary-sum conventions scipy ships (the
symiirorder* truncated sums vs cspline1d's full-signal smoothing sums)
and the half-sample-symmetric padding of sepfir2d.
"""

from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp

from .spec import PlanError
from .fftapi import fftconvolve
from .filtering import lfilter, sosfilt

__all__ = [
    "gauss_spline", "cspline1d", "qspline1d", "cspline2d", "qspline2d",
    "cspline1d_eval", "qspline1d_eval", "spline_filter", "sepfir2d",
    "symiirorder1", "symiirorder2",
]


def _default_precision(dtype, precision: float) -> float:
    if 0.0 <= precision < 1.0 and precision > 0.0:
        return float(precision)
    return 1e-6 if dtype in (np.float32, np.complex64) else 1e-11


# -------------------------------------------------- symmetric IIR filters

def _sym1_ic(x, z1: float, precision: float):
    """Mirror-symmetric starting value for the causal first-order section
    1/(1 - z1 z^-1): y[0] = x[0] + z1 * sum_k z1^k x[k], the sum
    truncated once |z1|^k < precision (scipy's convergence contract:
    the tail must decay within the signal length).  The weights are a
    host f64 table; the dot runs in jnp so the whole filter traces
    under a caller's jit."""
    K = x.shape[-1]
    M = int(math.floor(math.log(precision) / math.log(abs(z1)))) + 1
    if M >= K:
        raise PlanError("Sum to find symmetric boundary conditions did "
                        "not converge (signal too short for |z1| and "
                        "precision)")
    pw = jnp.asarray(z1 ** np.arange(M, dtype=np.float64), jnp.float32)
    return x[..., 0] + z1 * (x[..., :M] @ pw)


def symiirorder1(signal, c0: float, z1: float, precision: float = -1.0):
    """Smoothing IIR c0 / ((1 - z1 z^-1)(1 - z1 z)) with mirror-symmetric
    boundaries (scipy.signal.symiirorder1 semantics): a causal first-order
    scan, then an anticausal one over the reversed output, both on device;
    boundary values from the truncated mirror sums."""
    if abs(z1) >= 1:
        raise PlanError("|z1| must be less than 1.0")
    prec = _default_precision(getattr(signal, "dtype", np.float64),
                              precision)
    x = jnp.asarray(signal, jnp.float32)
    if x.ndim > 2:
        raise PlanError("Input must be 1D or 2D")
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None]
    y0 = _sym1_ic(x, z1, prec)
    y1_tail, _ = lfilter([1.0], [1.0, -z1], x[:, 1:],
                         zi=(z1 * y0)[:, None])
    y1 = jnp.concatenate([y0[:, None], y1_tail], axis=-1)
    out_last = (-c0 / (z1 - 1.0)) * y1[:, -1]
    out_rev, _ = lfilter([c0], [1.0, -z1], y1[:, -2::-1],
                         zi=(z1 * out_last)[:, None])
    out = jnp.concatenate([out_rev[:, ::-1], out_last[:, None]], axis=-1)
    return out[0] if squeeze else out


def _hc(k, cs: float, rho: float, omega: float):
    """Causal response of one second-order section:
    cs rho^k sin(omega (k+1)) / sin(omega), zero for k < 0."""
    k = np.asarray(k, dtype=np.float64)
    return np.where(k > -1, cs / math.sin(omega) * rho ** k
                    * np.sin(omega * (k + 1)), 0.0)


def _hs(k, cs: float, rho: float, omega: float):
    """Full symmetric (two-pass) response at lag k: the damped cosine
    c0 rho^|k| (cos(omega |k|) + gamma sin(omega |k|))."""
    c0 = (cs * cs * (1 + rho * rho) / (1 - rho * rho)
          / (1 - 2 * rho * rho * math.cos(2 * omega) + rho ** 4))
    gamma = (1 - rho * rho) / (1 + rho * rho) / math.tan(omega)
    ak = np.abs(np.asarray(k, dtype=np.float64))
    return c0 * rho ** ak * (np.cos(omega * ak) + gamma * np.sin(omega * ak))


def _sym2_run(x: np.ndarray, r: float, omega: float,
              ic_fwd: np.ndarray, ic_bwd: np.ndarray):
    """Device half of the second-order symmetric filter: causal sosfilt
    seeded from ic_fwd = (y[0], y[1]), then anticausal sosfilt over the
    reversed forward output seeded from ic_bwd = (out[K-1], out[K-2])."""
    rsq = r * r
    a2 = 2 * r * math.cos(omega)
    a3 = -rsq
    cs = 1 - a2 + rsq
    sos = np.array([[cs, 0.0, 0.0, 1.0, -a2, -a3]])
    coef = np.array([[a3, a2], [0.0, a3]])

    coefj = jnp.asarray(coef, jnp.float32)

    def seed(ic):
        # direct-form-II-transposed state equivalent to the last two
        # outputs ic = (y[n-1], y[n-2]) of the pure-recursive section
        return (coefj @ ic[..., None])[..., 0]

    ic_fwd = jnp.asarray(ic_fwd, jnp.float32)
    ic_bwd = jnp.asarray(ic_bwd, jnp.float32)
    y_fwd_tail, _ = sosfilt(sos, x[:, 2:], zi=seed(ic_fwd)[None])
    y_fwd = jnp.concatenate([ic_fwd, y_fwd_tail], axis=-1)
    y_rev, _ = sosfilt(sos, y_fwd[:, -3::-1], zi=seed(ic_bwd)[None])
    out = jnp.concatenate([y_rev[:, ::-1], ic_bwd[:, ::-1]], axis=-1)
    return out


def symiirorder2(input, r: float, omega: float, precision: float = -1.0):
    """Smoothing IIR cs^2 / ((1 - a2 z^-1 - a3 z^-2)(1 - a2 z - a3 z^2))
    with mirror-symmetric boundaries (scipy.signal.symiirorder2
    semantics): half-sample-symmetric starting conditions from the
    truncated _hc/_hs sums, recursions on device."""
    if r >= 1.0:
        raise PlanError("r must be less than 1.0")
    prec = _default_precision(getattr(input, "dtype", np.float64),
                              precision)
    x = jnp.asarray(input, jnp.float32)
    if x.ndim > 2:
        raise PlanError("Input must be 1D or 2D")
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None]
    K = x.shape[-1]
    cs = 1 - 2 * r * math.cos(omega) + r * r
    k = np.arange(K, dtype=np.float64)

    def _truncate(terms, squared: bool):
        """scipy's early-stop contract: include terms until the FIRST
        one at m > 0 whose magnitude (or square, for the backward sums)
        drops to <= precision — an oscillating kernel can stop at a
        cosine zero-crossing, and matching scipy means stopping with
        it.  Raises like scipy when the signal is too short."""
        crit = terms * terms if squared else np.abs(terms)
        below = np.flatnonzero(crit[1:] <= prec)
        if below.size == 0:
            raise PlanError("Sum to find symmetric boundary conditions "
                            "did not converge (signal too short for r "
                            "and precision)")
        stop = below[0] + 1
        # backward sums include the stopping term; forward sums do not
        return stop + 1 if squared else stop

    # forward: y[0], y[1] under the half-sample mirror x[-j] = x[j-1]
    # (note the hc(1)*x0 + hc(0)*x1 order for y[1] — this matches the
    # C kernels scipy's symiirorder2 uses, which differ from the
    # hc(0)*x0 + hc(1)*x1 order of its Python _cubic_smooth_coeff path)
    t0 = _hc(k + 1, cs, r, omega)
    t1 = _hc(k + 2, cs, r, omega)
    m0 = _truncate(t0, False)
    m1 = _truncate(t1, False)
    t0j = jnp.asarray(t0[:m0], jnp.float32)
    t1j = jnp.asarray(t1[:m1], jnp.float32)
    ic0 = float(_hc(0, cs, r, omega)) * x[:, 0] + x[:, :m0] @ t0j
    ic1 = (float(_hc(1, cs, r, omega)) * x[:, 0]
           + float(_hc(0, cs, r, omega)) * x[:, 1] + x[:, :m1] @ t1j)
    ic_fwd = jnp.stack([ic0, ic1], axis=-1)
    # backward: out[K-1], out[K-2] from the folded total response
    xr = x[:, ::-1]
    d0 = _hs(k, cs, r, omega) + _hs(k + 1, cs, r, omega)
    d1 = _hs(k - 1, cs, r, omega) + _hs(k + 2, cs, r, omega)
    n0 = _truncate(d0, True)
    n1 = _truncate(d1, True)
    b0 = xr[:, :n0] @ jnp.asarray(d0[:n0], jnp.float32)
    b1 = xr[:, :n1] @ jnp.asarray(d1[:n1], jnp.float32)
    ic_bwd = jnp.stack([b0, b1], axis=-1)
    out = _sym2_run(x, r, omega, ic_fwd, ic_bwd)
    return out[0] if squeeze else out


# -------------------------------------------------- spline coefficients

def gauss_spline(x, n: int):
    """Gaussian approximation to the order-n B-spline basis
    (scipy.signal.gauss_spline: sigma^2 = (n+1)/12)."""
    x = jnp.asarray(x)
    signsq = (n + 1) / 12.0
    return 1 / jnp.sqrt(2 * jnp.pi * signsq) * jnp.exp(-x ** 2
                                                       / (2 * signsq))


def _coeff_smooth(lam: float):
    """Pole radius/angle of the cubic smoothing-spline filter at
    fall-off lam (Unser's root formula, as scipy computes it)."""
    xi = 1 - 96 * lam + 24 * lam * math.sqrt(3 + 144 * lam)
    omega = math.atan2(math.sqrt(144 * lam - 1), math.sqrt(xi))
    rho = (24 * lam - 1 - math.sqrt(xi)) / (24 * lam)
    rho = rho * math.sqrt((48 * lam + 24 * lam
                           * math.sqrt(3 + 144 * lam)) / xi)
    return rho, omega


def _cubic_smooth_coeff(signal: np.ndarray, lamb: float):
    """Cubic smoothing-spline coefficients, scipy's exact boundary
    convention for cspline1d(lamb > 0): FULL-signal mirror sums (not the
    precision-truncated symiirorder2 ones)."""
    rho, omega = _coeff_smooth(lamb)
    cs = 1 - 2 * rho * math.cos(omega) + rho * rho
    sq = signal.ndim == 1
    x = signal[None] if sq else signal
    K = x.shape[-1]
    k = np.arange(K, dtype=np.float64)
    w0 = jnp.asarray(_hc(k + 1, cs, rho, omega), jnp.float32)
    w1 = jnp.asarray(_hc(k + 2, cs, rho, omega), jnp.float32)
    ic0 = float(_hc(0, cs, rho, omega)) * x[:, 0] + x @ w0
    ic1 = (float(_hc(0, cs, rho, omega)) * x[:, 0]
           + float(_hc(1, cs, rho, omega)) * x[:, 1] + x @ w1)
    xr = x[:, ::-1]
    v0 = jnp.asarray(_hs(k, cs, rho, omega)
                     + _hs(k + 1, cs, rho, omega), jnp.float32)
    v1 = jnp.asarray(_hs(k - 1, cs, rho, omega)
                     + _hs(k + 2, cs, rho, omega), jnp.float32)
    b0 = xr @ v0
    b1 = xr @ v1
    out = _sym2_run(x, rho, omega,
                    jnp.stack([ic0, ic1], -1), jnp.stack([b0, b1], -1))
    return out[0] if sq else out


def _prefilter_1d(x, z1: float, gain: float):
    """Exact (untruncated) B-spline interpolation prefilter used by
    cspline1d/qspline1d at lamb == 0: gain / ((1-z1 z^-1)(1-z1 z)) with
    the full-signal mirror starting sum (host f64 weight table, jnp dot
    — traces under jit)."""
    x = jnp.asarray(x, jnp.float32)
    sq = x.ndim == 1
    if sq:
        x = x[None]
    K = x.shape[-1]
    pw = jnp.asarray(z1 ** np.arange(K, dtype=np.float64), jnp.float32)
    y0 = x[:, 0] + z1 * (x @ pw)
    if K == 1:
        # scipy quirk: the single-sample path omits the gain factor
        out = (z1 / (z1 - 1) * y0)[:, None]
        return out[0] if sq else out
    y1_tail, _ = lfilter([1.0], [1.0, -z1], x[:, 1:], zi=(z1 * y0)[:, None])
    y1 = jnp.concatenate([y0[:, None], y1_tail], axis=-1)
    out_last = (z1 / (z1 - 1)) * y1[:, -1]
    # backward: out[k] = z1 (out[k+1] - y1[k])  ==  lfilter([-z1], [1,-z1])
    out_rev, _ = lfilter([-z1], [1.0, -z1], y1[:, -2::-1],
                         zi=(z1 * out_last)[:, None])
    out = jnp.concatenate([out_rev[:, ::-1], out_last[:, None]],
                          axis=-1) * gain
    return out[0] if sq else out


def cspline1d(signal, lamb: float = 0.0):
    """Cubic B-spline coefficients of a rank-1 signal
    (scipy.signal.cspline1d semantics; mirror-symmetric boundaries;
    ``lamb > 0`` smooths)."""
    x = jnp.asarray(signal, jnp.float32)
    if lamb != 0.0:
        return _cubic_smooth_coeff(x, lamb)
    return _prefilter_1d(x, -2 + math.sqrt(3), 6.0)


def qspline1d(signal, lamb: float = 0.0):
    """Quadratic B-spline coefficients (scipy.signal.qspline1d)."""
    if lamb != 0.0:
        raise PlanError("Smoothing quadratic splines not supported yet.")
    return _prefilter_1d(jnp.asarray(signal, jnp.float32),
                         -3 + 2 * math.sqrt(2), 8.0)


def cspline2d(signal, lamb: float = 0.0, precision: float = -1.0):
    """2-D cubic B-spline coefficients (scipy.signal.cspline2d
    semantics): the symmetric prefilter applied separably along the last
    axis then axis 0; smoothing lambda routes to the second-order
    smoothing filter."""
    x = np.asarray(signal, dtype=np.float64)
    if x.ndim != 2:
        raise PlanError("cspline2d expects a 2-D array")
    if precision < 0.0 or precision >= 1.0:
        precision = 1e-3 if np.asarray(signal).dtype in (
            np.float32, np.complex64) else 1e-6
    if lamb <= 1 / 144.0:
        r = -2 + math.sqrt(3.0)
        out = symiirorder1(x, -r * 6.0, r, precision)
        out = symiirorder1(np.asarray(out, np.float64).T, -r * 6.0, r,
                           precision)
        return jnp.transpose(out)
    rho, omega = _coeff_smooth(lamb)
    out = symiirorder2(x, rho, omega, precision)
    out = symiirorder2(np.asarray(out, np.float64).T, rho, omega,
                       precision)
    return jnp.transpose(out)


def qspline2d(signal, lamb: float = 0.0, precision: float = -1.0):
    """2-D quadratic B-spline coefficients (scipy.signal.qspline2d)."""
    x = np.asarray(signal, dtype=np.float64)
    if x.ndim != 2:
        raise PlanError("qspline2d expects a 2-D array")
    if lamb > 0:
        raise PlanError("lambda must be negative or zero")
    if precision < 0.0 or precision >= 1.0:
        precision = 1e-3 if np.asarray(signal).dtype in (
            np.float32, np.complex64) else 1e-6
    r = -3 + 2 * math.sqrt(2.0)
    out = symiirorder1(x, -r * 8.0, r, precision)
    out = symiirorder1(np.asarray(out, np.float64).T, -r * 8.0, r,
                       precision)
    return jnp.transpose(out)


# ----------------------------------------------------- spline evaluation

def _bspline3(x):
    ax = jnp.abs(x)
    return jnp.where(
        ax < 1, 2.0 / 3 - ax * ax + ax ** 3 / 2.0,
        jnp.where(ax < 2, (2.0 - ax) ** 3 / 6.0, 0.0))


def _bspline2(x):
    ax = jnp.abs(x)
    return jnp.where(
        ax < 0.5, 0.75 - ax * ax,
        jnp.where(ax < 1.5, (ax - 1.5) ** 2 / 2.0, 0.0))


def _spline_eval(cj, newx, dx, x0, kernel, jlo_shift: float, taps: int):
    cj = jnp.asarray(cj, jnp.float32)
    N = cj.shape[0]
    # triangular fold onto [0, N-1] (repeated mirror reflection) in host
    # f64 — the fold must not lose grid positions to f32 rounding
    x = (np.asarray(newx, dtype=np.float64) - x0) / float(dx)
    if N > 1:
        period = 2.0 * (N - 1)
        x = np.abs(x) % period
        x = np.minimum(x, period - x)
    else:
        x = np.zeros_like(x)
    x = jnp.asarray(x)
    jlower = jnp.floor(x - jlo_shift).astype(jnp.int32) + 1
    res = jnp.zeros(x.shape, jnp.float32)
    for i in range(taps):
        thisj = jlower + i
        indj = jnp.clip(thisj, 0, N - 1)
        res = res + cj[indj] * kernel(jnp.asarray(x, jnp.float32)
                                      - thisj).astype(jnp.float32)
    return res


def cspline1d_eval(cj, newx, dx: float = 1.0, x0: float = 0):
    """Evaluate a cubic spline from its coefficients at new points
    (scipy.signal.cspline1d_eval semantics: mirror-symmetric extension
    beyond the knots; ``dx``/``x0`` map newx onto the knot grid)."""
    return _spline_eval(cj, newx, dx, x0, _bspline3, 2.0, 4)


def qspline1d_eval(cj, newx, dx: float = 1.0, x0: float = 0):
    """Evaluate a quadratic spline (scipy.signal.qspline1d_eval)."""
    return _spline_eval(cj, newx, dx, x0, _bspline2, 1.5, 3)


# ------------------------------------------------------- 2-D FIR helpers

def sepfir2d(input, hrow, hcol):
    """Separable 2-D FIR with half-sample mirror-symmetric boundaries
    (scipy.signal.sepfir2d semantics; odd-length filters).  Runs as two
    plan-layer FFT convolutions over a symmetric pad."""
    x = jnp.asarray(input, jnp.float32)
    if x.ndim != 2:
        raise PlanError("sepfir2d expects a 2-D array")
    hrow = np.asarray(hrow, dtype=np.float64).ravel()
    hcol = np.asarray(hcol, dtype=np.float64).ravel()
    if hrow.size % 2 != 1 or hcol.size % 2 != 1:
        raise PlanError("hrow and hcol must be odd length")
    pr = hrow.size // 2
    pc = hcol.size // 2
    ext = jnp.pad(x, ((pc, pc), (pr, pr)), mode="symmetric")
    out = fftconvolve(ext, jnp.asarray(hrow, jnp.float32)[None, :],
                      mode="valid")
    out = fftconvolve(out, jnp.asarray(hcol, jnp.float32)[:, None],
                      mode="valid")
    return out


def spline_filter(Iin, lmbda: float = 5.0):
    """Cubic smoothing-spline filter of a rank-2 array
    (scipy.signal.spline_filter semantics: cspline2d coefficients
    re-convolved with the [1, 4, 1]/6 sampling kernel)."""
    hcol = np.array([1.0, 4.0, 1.0]) / 6.0
    ck = cspline2d(np.asarray(Iin, dtype=np.float64), lmbda)
    return sepfir2d(ck, hcol, hcol)
