"""FFT-based linear algebra (scipy.linalg parity): circulant solves,
Toeplitz matvecs and Toeplitz solves on the plan layer.

scipy.linalg has exactly two FFT-backed operations — ``solve_circulant``
(diagonalize the circulant in Fourier space, scipy _basic.py) and
``matmul_toeplitz`` (circulant embedding of the Toeplitz operator) —
plus the Levinson-backed ``solve_toeplitz``; all three are pinned here
against scipy itself (tests/test_linalg.py).  ``solve_toeplitz`` keeps
scipy's semantics but swaps the O(n^2) per-solve Levinson application
for a Gohberg-Semencul factorization: Levinson runs ONCE on the host
(f64, operator data only) to produce the two inverse generators, and
every subsequent right-hand side is applied as four triangular-Toeplitz
convolutions = four batch-fused length-p FFT dispatches on device,
batched over columns.

Design split, following the framework-wide pattern: the OPERATOR data
(circulant kernel c, Toeplitz column/row) is usually concrete — its
spectrum, the near-singularity decision and the reciprocal table are
computed on the host in float64 (the division 1/fc amplifies f32
spectrum error near small bins, same failure mode as minimum_phase's
cepstrum — docs/STATUS_r4.md session 5); the DATA path (b, x) runs
through the facade's device transforms and may be traced/batched.
Traced operator data still works: the spectrum then computes on device
in f32.

The reference has no linalg analog; beyond-parity surface
(docs/PARITY.md).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from . import fftapi
from .spec import PlanError

__all__ = ["solve_circulant", "matmul_toeplitz", "solve_toeplitz"]


def _is_traced(x) -> bool:
    return isinstance(x, jax.core.Tracer)


def _axis_len(name: str, a, axis: int) -> int:
    try:
        return a.shape[axis]
    except IndexError:
        raise ValueError(f"'{name}axis' entry is out of bounds") from None


def _cmul_table(zi: jnp.ndarray, table: np.ndarray) -> jnp.ndarray:
    """Interleaved (..., n, 2) times a broadcastable host complex table
    (..., n): (a+ib)(c+id) with the table's re/im expanded."""
    tr = jnp.asarray(np.real(table).astype(np.float32))[..., None]
    ti = jnp.asarray(np.imag(table).astype(np.float32))[..., None]
    re, im = zi[..., :1], zi[..., 1:]
    return jnp.concatenate([re * tr - im * ti, re * ti + im * tr], axis=-1)


def solve_circulant(c, b, singular: str = "raise", tol=None,
                    caxis: int = -1, baxis: int = 0, outaxis: int = 0):
    """Solve C x = b where C = circulant(c), by Fourier diagonalization
    (scipy.linalg.solve_circulant semantics: same broadcasting over
    ``caxis``/``baxis``/``outaxis``, the matrix_rank-style default tol,
    and ``singular='raise'|'lstsq'``; scipy _basic.py:solve_circulant).

    ``c`` must be concrete (the near-singularity decision is data-
    dependent); its spectrum and the reciprocal table compute on the
    host in f64.  ``b`` may be complex, real, or interleaved (..., 2)
    is NOT inferred here — complex semantics follow scipy, so a real
    ``b`` means a real system.  Returns a real array when both inputs
    are real (f32), else interleaved (..., 2) with the mode axis at
    ``outaxis``."""
    if _is_traced(c):
        raise PlanError(
            "solve_circulant needs concrete c (the near-singular "
            "decision is data-dependent); only b may be traced")
    if singular not in ("raise", "lstsq"):
        raise ValueError(f"singular option {singular!r} not supported")
    c = np.atleast_1d(np.asarray(c))
    b_traced = _is_traced(b)
    if not b_traced:
        b = np.atleast_1d(np.asarray(b))
    nc = _axis_len("c", c, caxis)
    nb = _axis_len("b", b, baxis)
    if nc != nb:
        raise ValueError(
            f"Shapes of c {c.shape} and b {tuple(b.shape)} are "
            "incompatible")

    complex_b = bool(np.iscomplexobj(b))
    if b_traced and complex_b:
        b = fftapi.asinterleaved(b)          # traced complex -> (.., 2)

    # host-f64 operator spectrum + scipy's near-singularity policy
    fc = np.fft.fft(np.moveaxis(c.astype(
        np.complex128 if np.iscomplexobj(c) else np.float64), caxis, -1),
        axis=-1)
    abs_fc = np.abs(fc)
    if tol is None:
        tol = abs_fc.max(axis=-1) * nc * np.finfo(np.float64).eps
        tol = np.asarray(tol)[..., None] if np.ndim(tol) else np.atleast_1d(tol)
    near_zeros = abs_fc <= tol
    if np.any(near_zeros):
        if singular == "raise":
            raise np.linalg.LinAlgError("near singular circulant matrix.")
        fc[near_zeros] = 1.0
    inv_fc = 1.0 / fc
    if np.any(near_zeros):
        inv_fc[near_zeros] = 0.0             # q = fb * 0 == scipy's q[mask]=0

    # device data path (explicit interleaved flags: a trailing dim of 2
    # must never be MISREAD as the complex component pair)
    if b_traced:
        if complex_b:
            bm = jnp.moveaxis(b, baxis if baxis >= 0 else baxis - 1, -2)
            fb = fftapi.fft(bm, interleaved=True)
        else:
            fb = fftapi.fft(jnp.moveaxis(b, baxis, -1), interleaved=False)
    else:
        bm = np.moveaxis(b, baxis, -1)
        fb = fftapi.fft(bm, interleaved=False if not complex_b else None)
    q = _cmul_table(fb, inv_fc)
    x = fftapi.ifft(q, interleaved=True)

    complex_out = complex_b or np.iscomplexobj(c)
    if not complex_out:
        x = x[..., 0]                        # real system: drop imag
        if outaxis != -1:
            x = jnp.moveaxis(x, -1, outaxis)
        return x
    if outaxis != -1:
        lnd = x.ndim - 1                     # logical rank (sans re/im)
        dest = outaxis + lnd if outaxis < 0 else outaxis
        if not 0 <= dest < lnd:
            raise np.exceptions.AxisError(outaxis, lnd)
        x = jnp.moveaxis(x, -2, dest)
    return x


def matmul_toeplitz(c_or_cr, x, check_finite: bool = False, workers=None):
    """Toeplitz matrix-vector/matrix product via circulant embedding
    (scipy.linalg.matmul_toeplitz semantics: ``c_or_cr`` is the first
    column c or the tuple (c, r); a bare c implies r = conj(c); r[0]
    is ignored in favor of c[0]; scipy _basic.py:_matmul_toepltiz).

    ``x``: (n_cols,) or (n_cols, m); returns (n_rows,) or (n_rows, m).
    Real in, real out (f32); complex operands/data return interleaved
    (..., 2).  ``workers`` is accepted for signature parity and ignored
    (XLA owns threading)."""
    if isinstance(c_or_cr, tuple):
        c, r = c_or_cr
    else:
        c = c_or_cr
        r = (jnp.conj(jnp.asarray(c_or_cr)) if _is_traced(c_or_cr)
             else np.conjugate(np.asarray(c_or_cr)))
    traced_op = _is_traced(c) or _is_traced(r)
    if not traced_op:
        c, r = np.atleast_1d(np.asarray(c)), np.atleast_1d(np.asarray(r))
    if c.ndim != 1 or r.ndim != 1:
        raise ValueError("c and r must be one-dimensional")
    if c.size == 0 or r.size == 0:
        raise ValueError("c and r must be nonempty")
    if check_finite and not traced_op:
        if not (np.isfinite(c).all() and np.isfinite(r).all()):
            raise ValueError("array must not contain infs or NaNs")

    n_rows, n_cols = int(c.shape[0]), int(r.shape[0])
    p = n_rows + n_cols - 1

    x_traced = _is_traced(x)
    if not x_traced:
        x = np.asarray(x)
    complex_any = bool(np.iscomplexobj(c) or np.iscomplexobj(r)
                       or np.iscomplexobj(x))
    one_d = x.ndim == 1
    if x.ndim not in (1, 2):
        raise PlanError(
            f"x must be 1-D or 2-D, got shape {tuple(x.shape)}")
    if x.shape[0] != n_cols:
        raise ValueError(
            f"x has {x.shape[0]} rows but the Toeplitz operator has "
            f"{n_cols} columns")
    if check_finite and not x_traced:
        if not np.isfinite(x).all():
            raise ValueError("array must not contain infs or NaNs")

    # circulant embedding spectrum: host f64 when the operator is
    # concrete, device otherwise
    if not traced_op:
        emb = np.concatenate(
            (c.astype(np.complex128 if complex_any else np.float64),
             r[-1:0:-1].astype(np.complex128 if complex_any else np.float64)))
        femb = np.fft.fft(emb)               # (p,) complex host table
    else:
        emb = jnp.concatenate([jnp.asarray(c), jnp.asarray(r)[-1:0:-1]])
        femb = None                          # device path below

    # data path: conv axis last for the facade transforms
    if x_traced and np.iscomplexobj(x):
        xi = fftapi.asinterleaved(x)         # (n, [m,] 2) traced complex
        fx = fftapi.fft(jnp.moveaxis(xi, 0, -2), n=p, interleaved=True)
    elif x_traced:
        fx = fftapi.fft(jnp.moveaxis(jnp.asarray(x), 0, -1), n=p,
                        interleaved=False)
    else:
        fx = fftapi.fft(np.moveaxis(x, 0, -1), n=p,
                        interleaved=False if not np.iscomplexobj(x)
                        else None)           # (..., p, 2)
    if femb is not None:
        prod = _cmul_table(fx, femb)
    else:
        fe = fftapi.fft(fftapi.asinterleaved(emb), interleaved=True)
        re, im = fx[..., :1], fx[..., 1:]
        er, ei = fe[..., :1], fe[..., 1:]
        prod = jnp.concatenate([re * er - im * ei, re * ei + im * er],
                               axis=-1)
    y = fftapi.ifft(prod, interleaved=True)[..., :n_rows, :]
    if not complex_any:
        y = y[..., 0]
        return y if one_d else jnp.moveaxis(y, -1, 0)
    return y if one_d else jnp.moveaxis(y, -2, 0)


def _levinson_generators(c: np.ndarray, r: np.ndarray):
    """General (nonsymmetric) Levinson recursion on the host in
    f64/c128: returns ``u`` solving T u = e_1 and ``g`` solving
    T g = e_n for the Toeplitz matrix with first column ``c`` and first
    row ``r`` (r[0] taken from c[0]).  Raises
    ``numpy.linalg.LinAlgError('Singular principal minor')`` exactly
    where scipy's Levinson does (every leading principal minor must be
    nonsingular)."""
    n = c.shape[0]
    if c[0] == 0:
        raise np.linalg.LinAlgError("Singular principal minor")
    dt = np.complex128 if (np.iscomplexobj(c) or np.iscomplexobj(r)) \
        else np.float64
    c = c.astype(dt)
    r = r.astype(dt)
    f = np.zeros(n, dtype=dt)
    g = np.zeros(n, dtype=dt)
    f[0] = g[0] = 1.0 / c[0]
    for k in range(1, n):
        ef = c[1:k + 1][::-1] @ f[:k]        # new-last-row residual of [f;0]
        eb = r[1:k + 1] @ g[:k]              # new-first-row residual of [0;g]
        denom = 1.0 - ef * eb
        if denom == 0:
            raise np.linalg.LinAlgError("Singular principal minor")
        fk = f[:k + 1].copy()                # old [f; 0], length k+1
        f[1:k + 1] -= ef * g[:k]
        f[:k + 1] /= denom
        g[1:k + 1] = (g[:k] - eb * fk[1:]) / denom
        g[0] = -eb * fk[0] / denom
    return f, g


def solve_toeplitz(c_or_cr, b, check_finite: bool = True):
    """Solve T x = b for Toeplitz T (scipy.linalg.solve_toeplitz
    semantics: ``c_or_cr`` is the first column c or the tuple (c, r),
    bare c implies r = conj(c), r[0] is ignored in favor of c[0], b is
    (n,) or (n, m), LinAlgError('Singular principal minor') when any
    leading principal minor is singular — scipy _basic.py /
    _solve_toeplitz.pyx).

    The operator must be concrete: the Levinson recursion producing the
    Gohberg-Semencul generators is data-dependent and runs on the host
    in f64.  ``b`` may be traced/batched; the application is
        T^{-1} b = (1/u_0) [ L(u) U(g~) - L(g^) U(u^) ] b
    (u = T^{-1}e_1, g = T^{-1}e_n), evaluated as two rounds of circulant
    embedding with host-f64 spectra — four length-p device dispatches
    (the two triangular factors of each round share ONE batch-2
    transform), batched over b's columns.  Real in, real out (f32); any
    complex input returns interleaved (..., 2)."""
    if isinstance(c_or_cr, tuple):
        c, r = c_or_cr
        if _is_traced(c) or _is_traced(r):
            raise PlanError(
                "solve_toeplitz needs a concrete operator (the Levinson "
                "generators are data-dependent); only b may be traced")
        c = np.atleast_1d(np.asarray(c))
        r = np.atleast_1d(np.asarray(r))
    else:
        if _is_traced(c_or_cr):
            raise PlanError(
                "solve_toeplitz needs a concrete operator (the Levinson "
                "generators are data-dependent); only b may be traced")
        c = np.atleast_1d(np.asarray(c_or_cr))
        r = np.conjugate(c)
    b_traced = _is_traced(b)
    if not b_traced:
        b = np.atleast_1d(np.asarray(b))
    if c.ndim != 1 or r.ndim != 1 or c.shape[0] != r.shape[0] \
            or b.shape[0] != c.shape[0] or b.ndim not in (1, 2):
        raise ValueError("Incompatible dimensions.")
    if check_finite:
        if not (np.isfinite(c).all() and np.isfinite(r).all()):
            raise ValueError("array must not contain infs or NaNs")
        if not b_traced and not np.isfinite(b).all():
            raise ValueError("array must not contain infs or NaNs")
    n = int(c.shape[0])
    complex_op = bool(np.iscomplexobj(c) or np.iscomplexobj(r))
    complex_b = bool(np.iscomplexobj(b))
    complex_out = complex_op or complex_b
    one_d = b.ndim == 1

    if n == 0 or (not one_d and b.shape[1] == 0):
        # scipy returns the empty solution for empty systems / RHS sets
        shape = tuple(b.shape) + ((2,) if complex_out else ())
        return jnp.zeros(shape, jnp.float32)

    u, g = _levinson_generators(c, r)
    p = fftapi.next_fast_len(2 * n - 1)

    def _tri_spectrum(col, row):
        """Host-f64 length-p spectrum of the circulant embedding of the
        triangular Toeplitz with first column ``col`` / first row
        ``row`` (matmul_toeplitz's concat(c, r[-1:0:-1]) convention)."""
        emb = np.zeros(p, dtype=np.complex128)
        emb[:n] = col
        if n > 1:
            emb[p - (n - 1):] = row[-1:0:-1]
        return np.fft.fft(emb)

    zeros = np.zeros(n)
    inv_u0 = 1.0 / u[0]
    f1 = _tri_spectrum(u, np.r_[u[0], zeros[1:]]) * inv_u0   # L(u)/u0
    f2 = _tri_spectrum(np.r_[g[-1], zeros[1:]], g[::-1])     # U(g~)
    f3 = _tri_spectrum(np.r_[0.0, g[:-1]], zeros) * inv_u0   # L(g^)/u0
    f4 = _tri_spectrum(zeros, np.r_[0.0, u[:0:-1]])          # U(u^)

    # data path: solve axis last, interleaved (..., p, 2) throughout
    if b_traced and complex_b:
        bi = fftapi.asinterleaved(b)
        fb = fftapi.fft(jnp.moveaxis(bi, 0, -2), n=p, interleaved=True)
    elif b_traced:
        fb = fftapi.fft(jnp.moveaxis(jnp.asarray(b), 0, -1), n=p,
                        interleaved=False)
    else:
        fb = fftapi.fft(np.moveaxis(b, 0, -1), n=p,
                        interleaved=False if not complex_b else None)
    # both pairs ride ONE batch-2 transform each (a leading pair axis):
    # 4 device dispatches total instead of 6 (per-dispatch tunnel
    # overhead dominates at small n — CLAUDE.md)
    nd = fb.ndim - 2                     # extra batch dims beyond (p, 2)

    def _pair(ta, tb):
        return np.stack([ta, tb]).reshape((2,) + (1,) * nd + (p,))

    z = fftapi.ifft(_cmul_table(fb[None], _pair(f2, f4)),
                    interleaved=True)
    # truncate to the n valid rows, then the outer triangular pass
    mask = jnp.asarray(
        np.concatenate([np.ones(n, np.float32),
                        np.zeros(p - n, np.float32)]))[..., None]
    fz = fftapi.fft(z * mask, interleaved=True)
    spec = jnp.sum(_cmul_table(fz, _pair(f1, -f3)), axis=0)
    x = fftapi.ifft(spec, interleaved=True)[..., :n, :]

    if not complex_out:
        x = x[..., 0]
        return x if one_d else jnp.moveaxis(x, -1, 0)
    return x if one_d else jnp.moveaxis(x, -2, 0)
