"""numpy/scipy-style functional API over the plan layer.

The reference exposes only the plan API (createPlan/exec); most scientific
users coming to a TPU FFT library expect the ``numpy.fft`` / ``scipy.fft``
call surface instead.  This module provides it as a thin façade over
``create_plan`` — every call compiles (once, memoized in the default
PlanCache) a plan for the concrete (type, shape, batch, normalize) and
executes it, so repeated same-shape calls run at plan speed.

Complex representation: the TPU backend has no complex dtype, so complex
arrays are **interleaved float32** with a trailing component dim
(``[..., 0]`` = re, ``[..., 1]`` = im) — the package-wide convention
(core/cplx.py).  Inputs may be:

- host complex arrays (numpy complex64/128): converted automatically;
- interleaved float arrays whose last dim is 2: used as-is (pass
  ``interleaved=False`` to force a real array with trailing length-2 axis
  to be treated as real data instead);
- real float arrays: widened with a zero imaginary part.

Outputs of complex-valued transforms are interleaved device arrays; use
``ascomplex(y)`` for a numpy complex view.

Normalization follows numpy: ``norm`` in {None/"backward", "ortho",
"forward"} with the scale on the inverse / split / forward respectively.
DCT/DST ``norm`` in {None, "ortho"} matches ``scipy.fft`` conventions
(verified against scipy in tests/test_fftapi.py).
"""

from __future__ import annotations

import contextlib as _contextlib
import math
from typing import Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .core.cplx import interleave as _np_interleave
from .core.cplx import jnp_conj as _conj
from .core.cplx import uninterleave as _np_uninterleave
from .spec import PlanError
from .utils import factors

__all__ = [
    "fft", "ifft", "fft2", "ifft2", "fftn", "ifftn",
    "rfft", "irfft", "rfft2", "irfft2", "rfftn", "irfftn",
    "hfft", "ihfft", "hfft2", "ihfft2", "hfftn", "ihfftn",
    "prev_fast_len", "set_workers", "get_workers",
    "set_backend", "skip_backend", "set_global_backend",
    "register_backend",
    "dct", "idct", "dst", "idst", "dctn", "idctn", "dstn", "idstn",
    "fftconvolve", "oaconvolve", "convolve", "correlate",
    "convolve2d", "correlate2d",
    "correlation_lags", "deconvolve",
    "stft", "istft", "spectrogram", "welch", "periodogram",
    "csd", "coherence", "lombscargle",
    "resample", "resample_poly", "upfirdn",
    "decimate", "hilbert", "hilbert2",
    "czt", "zoom_fft", "czt_points", "vectorstrength", "envelope",
    "ShortTimeFFT", "closest_STFT_dual_window", "CZT", "ZoomFFT",
    "check_COLA", "check_NOLA", "choose_conv_method",
    "fht", "ifht", "fhtoffset",
    "detrend", "get_window",
    "fftfreq", "rfftfreq", "fftshift", "ifftshift", "next_fast_len",
    "ascomplex", "asinterleaved",
]


# ---------------------------------------------------------------- helpers

def asinterleaved(x, interleaved: Optional[bool] = None):
    """Coerce ``x`` to an interleaved complex array (..., 2) float32."""
    if np.iscomplexobj(x):
        if isinstance(x, jax.core.Tracer):
            # traced complex (CPU-lane jit composition): stay traced
            xc = jnp.asarray(x)
            return jnp.stack([jnp.real(xc).astype(jnp.float32),
                              jnp.imag(xc).astype(jnp.float32)], axis=-1)
        return jnp.asarray(_np_interleave(np.asarray(x)))
    x = jnp.asarray(x)
    if interleaved is None:
        interleaved = x.ndim >= 2 and x.shape[-1] == 2
    x = x.astype(jnp.float32)
    if interleaved:
        if x.ndim < 1 or x.shape[-1] != 2:
            raise PlanError(
                f"interleaved array must have a trailing component dim of "
                f"2, got shape {tuple(x.shape)}")
        return x
    return jnp.stack([x, jnp.zeros_like(x)], axis=-1)


def ascomplex(y) -> np.ndarray:
    """Interleaved device array -> numpy complex128."""
    return _np_uninterleave(np.asarray(y))


# facade transforms whose mathematical result is complex-valued (returned
# interleaved (..., 2) f32 here); the scipy/torch bridges repack these as
# complex dtypes — one shared table so the two cannot drift
COMPLEX_VALUED_FFTS = frozenset({
    "fft", "ifft", "fft2", "ifft2", "fftn", "ifftn",
    "rfft", "rfft2", "rfftn", "ihfft", "ihfft2", "ihfftn",
})


def _real_f32(x):
    x = jnp.asarray(x)
    if np.iscomplexobj(x):
        raise PlanError("expected a real array, got complex input")
    return x.astype(jnp.float32)


def _norm_modes(norm: Optional[str], inverse: bool) -> Tuple[str, float]:
    """numpy norm -> (plan normalize mode, extra post-scale factor-exponent).

    Returns the plan's normalize mode plus the exponent e such that the
    output must additionally be scaled by N**e (0 = no extra pass).
    """
    if norm is None or norm == "backward":
        return ("backward" if inverse else "none"), 0
    if norm == "ortho":
        return "unitary", 0
    if norm == "forward":
        # numpy: 1/N on the FORWARD transform, inverse unscaled
        return ("none", -1) if not inverse else ("none", 0)
    raise PlanError(f"norm must be None|'backward'|'ortho'|'forward', "
                    f"got {norm!r}")


def _is_int(v) -> bool:
    """True for python and numpy integer scalars (numpy accepts both
    for n=/s=/axes= everywhere)."""
    return isinstance(v, (int, np.integer))


def _axes_list(x_cplx_ndim: int, axes, default_all: bool,
               s=None, allow_duplicates: bool = False) -> Tuple[int, ...]:
    """Normalize an axes argument against the COMPLEX rank (component dim
    excluded).  numpy semantics for the s-without-axes form: ``s`` given
    with ``axes=None`` applies to the LAST len(s) axes."""
    if axes is None:
        if s is not None:
            if len(tuple(s)) > x_cplx_ndim:
                # must raise HERE: with allow_duplicates the wrapped-
                # around negative range below would alias real axes
                raise PlanError(f"s has {len(tuple(s))} entries for "
                                f"rank {x_cplx_ndim}")
            axes = tuple(range(x_cplx_ndim - len(tuple(s)), x_cplx_ndim))
        else:
            axes = tuple(range(x_cplx_ndim)) if default_all else (-1,)
    elif _is_int(axes):
        axes = (axes,)
    out = []
    for a in axes:
        a = a + x_cplx_ndim if a < 0 else a
        if not 0 <= a < x_cplx_ndim:
            raise PlanError(f"axis {a} out of range for rank {x_cplx_ndim}")
        out.append(a)
    if not allow_duplicates and len(set(out)) != len(out):
        raise PlanError(f"duplicate axes in {tuple(axes)}")
    return tuple(out)


def _resolve_s(x, sizes, axes):
    """numpy s= semantics: an entry of -1 keeps the current axis length
    (scalar n= does NOT accept -1 — numpy raises there, and so do we via
    _crop_or_pad's validation).  Checks the length BEFORE zipping so a
    too-long s raises like numpy instead of being silently truncated."""
    sizes = tuple(sizes)
    if len(sizes) != len(axes):
        raise PlanError(f"s has {len(sizes)} entries for {len(axes)} axes")
    return tuple(x.shape[a] if m == -1 else m for m, a in zip(sizes, axes))


def _crop_or_pad(x, n: int, axis: int):
    """numpy n=/s= semantics: crop or zero-pad ``axis`` to length n."""
    n = int(n)
    if n < 1:
        raise PlanError(f"invalid number of FFT data points ({n})")
    cur = x.shape[axis]
    if n == cur:
        return x
    if n < cur:
        # static contiguous crop: a slice, not a gather
        return jax.lax.slice_in_dim(x, 0, n, axis=axis)
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, n - cur)
    return jnp.pad(x, pad)


# process-global tuning applied to every plan the facade builds (see
# plan_tuning); empty by default so facade plans keep their default specs
_DEFAULT_TUNING: dict = {}


@_contextlib.contextmanager
def plan_tuning(**tuning):
    """Context manager: apply plan tuning knobs to every transform the
    facade (and therefore the scipy/torch/fftpack bridges) builds inside
    the block — e.g. measured route selection::

        with wfft.plan_tuning(rigor="measure"):
            Y = wfft.fftn(x)          # candidates timed on first build

    Knobs are the create_plan tuning surface (docs/API.md): rigor,
    maxSubLength, largeRoute, impl, matmulPrecision, ...  Process-global
    (not thread-scoped); plans built inside the block cache under their
    tuned spec, so repeated calls reuse them.  Nests: an inner block
    layers its knobs over the outer block's and restores them on exit.
    """
    saved = dict(_DEFAULT_TUNING)
    _DEFAULT_TUNING.update(tuning)
    try:
        yield
    finally:
        _DEFAULT_TUNING.clear()
        _DEFAULT_TUNING.update(saved)


def _plan_tuning_kw() -> dict:
    return {"tuning": dict(_DEFAULT_TUNING)} if _DEFAULT_TUNING else {}


def _exec_nd(x, plan_type: str, shape: Sequence[int], direction: str,
             normalize: str, interleaved_in: bool):
    """Collapse leading dims to batch, run the plan, restore leading dims."""
    from . import create_plan
    comp_in = 1 if interleaved_in else 0
    lead = x.shape[: x.ndim - len(shape) - comp_in]
    batch = int(np.prod(lead)) if lead else 1
    xin = x.reshape(batch, *x.shape[len(lead):])
    plan = create_plan(type=plan_type, shape=list(shape), batch=batch,
                       direction=direction, normalize=normalize,
                       **_plan_tuning_kw())
    y = plan(xin)
    out_shape = y.shape[1:]
    return y.reshape(*lead, *out_shape)


def _move_to_trailing(x, axes: Tuple[int, ...], comp: bool):
    """Move the given complex axes (in order) to the trailing positions
    just before the component dim (if comp)."""
    nd = x.ndim - (1 if comp else 0)
    dest = tuple(range(nd - len(axes), nd))
    if axes == dest:
        return x, None
    x = jnp.moveaxis(x, axes, dest)
    return x, (dest, axes)


def _restore_axes(y, undo, comp: bool):
    if undo is None:
        return y
    dest, axes = undo
    return jnp.moveaxis(y, dest, axes)


# ---------------------------------------------------------------- c2c

def _c2c(x, n, axes, norm, inverse: bool, default_all_axes: bool,
         interleaved):
    x = asinterleaved(x, interleaved)
    nd = x.ndim - 1
    if default_all_axes and _is_int(n):
        # numpy: fftn/fft2 require a sequence s (TypeError there)
        raise PlanError("s must be a sequence of integers, not a bare int")
    s = None if (n is None or _is_int(n)) else tuple(n)
    if (axes is not None and not _is_int(axes)
            and len(set(a + nd if a < 0 else a for a in axes)) != len(tuple(axes))):
        # numpy permits repeated axes in fftn/ifftn: the transform runs
        # once per occurrence (normalization per pass), applied in
        # numpy's _raw_fftnd order — REVERSED over the axes list — with
        # s entries (-1 included) resolved against the ORIGINAL shape
        # before any pass runs (only observable with duplicates + s)
        ax = tuple(a + nd if a < 0 else a for a in axes)
        for a in ax:
            if not 0 <= a < nd:
                raise PlanError(f"axis {a} out of range for rank {nd}")
        sizes = (None,) * len(ax) if s is None else _resolve_s(x, s, ax)
        for a, m in zip(reversed(ax), reversed(sizes)):
            x = _c2c(x, m, (a,), norm, inverse, False, True)
        return x
    axes = _axes_list(nd, axes, default_all_axes, s=s)
    if n is not None:
        sizes = (n,) if _is_int(n) else _resolve_s(x, tuple(n), axes)
        for a, m in zip(axes, sizes):
            x = _crop_or_pad(x, m, a)
    normalize, scale_exp = _norm_modes(norm, inverse)
    x, undo = _move_to_trailing(x, axes, comp=True)
    shape = x.shape[x.ndim - 1 - len(axes): x.ndim - 1]
    y = _exec_nd(x, "c2c", shape, "inverse" if inverse else "forward",
                 normalize, True)
    if scale_exp:
        y = y * jnp.asarray(
            float(np.prod(shape)) ** scale_exp, y.dtype)
    return _restore_axes(y, undo, comp=True)


def fft(x, n: Optional[int] = None, axis: int = -1,
        norm: Optional[str] = None, *, interleaved: Optional[bool] = None):
    """1-D complex FFT along ``axis`` (numpy.fft.fft semantics)."""
    return _c2c(x, n, (axis,), norm, False, False, interleaved)


def ifft(x, n: Optional[int] = None, axis: int = -1,
         norm: Optional[str] = None, *, interleaved: Optional[bool] = None):
    return _c2c(x, n, (axis,), norm, True, False, interleaved)


def fft2(x, s=None, axes=(-2, -1), norm: Optional[str] = None, *,
         interleaved: Optional[bool] = None):
    return _c2c(x, s, axes, norm, False, True, interleaved)


def ifft2(x, s=None, axes=(-2, -1), norm: Optional[str] = None, *,
          interleaved: Optional[bool] = None):
    return _c2c(x, s, axes, norm, True, True, interleaved)


def fftn(x, s=None, axes=None, norm: Optional[str] = None, *,
         interleaved: Optional[bool] = None):
    return _c2c(x, s, axes, norm, False, True, interleaved)


def ifftn(x, s=None, axes=None, norm: Optional[str] = None, *,
          interleaved: Optional[bool] = None):
    return _c2c(x, s, axes, norm, True, True, interleaved)


# ---------------------------------------------------------------- r2c/c2r

def rfft(x, n: Optional[int] = None, axis: int = -1,
         norm: Optional[str] = None):
    """Real FFT along ``axis``: real input -> packed half-spectrum
    (..., n//2+1, 2) interleaved (numpy.fft.rfft semantics)."""
    x = _real_f32(x)
    axes = _axes_list(x.ndim, (axis,), False)
    if n is not None:
        x = _crop_or_pad(x, n, axes[0])
    normalize, scale_exp = _norm_modes(norm, False)
    x, undo = _move_to_trailing(x, axes, comp=False)
    m = x.shape[-1]
    y = _exec_nd(x, "r2c", (m,), "forward", normalize, False)
    if scale_exp:
        y = y * jnp.asarray(float(m) ** scale_exp, y.dtype)
    return _restore_axes(y, undo, comp=True)


def irfft(x, n: Optional[int] = None, axis: int = -1,
          norm: Optional[str] = None, *, interleaved: Optional[bool] = None):
    """Inverse real FFT: packed half-spectrum (..., m, 2) -> real (..., n)
    with n defaulting to 2*(m-1) (numpy.fft.irfft semantics)."""
    x = asinterleaved(x, interleaved)
    nd = x.ndim - 1
    axes = _axes_list(nd, (axis,), False)
    if n is None:
        n = 2 * (x.shape[axes[0]] - 1)
    packed = n // 2 + 1
    x = _crop_or_pad(x, packed, axes[0])
    # every inverse norm mode maps to a plan normalize with no extra pass
    # (_norm_modes returns exponent 0 for inverse transforms)
    normalize, _ = _norm_modes(norm, True)
    x, undo = _move_to_trailing(x, axes, comp=True)
    y = _exec_nd(x, "c2r", (n,), "inverse", normalize, True)
    return _restore_axes(y, undo, comp=False)


def _split_last(axes):
    """(other_axes, last_axis) for the rfftn composition order."""
    return tuple(axes[:-1]), axes[-1]


def rfftn(x, s=None, axes=None, norm: Optional[str] = None):
    """ND real FFT: rfft along the last given axis, then complex FFTs over
    the remaining axes of the packed spectrum (numpy.fft.rfftn semantics:
    the LAST axis in ``axes`` is the packed one)."""
    x = _real_f32(x)
    if _is_int(s):
        raise PlanError("s must be a sequence of integers, not a bare int")
    axes = _axes_list(x.ndim, axes, True, s=s, allow_duplicates=True)
    if len(set(axes)) != len(axes):
        # numpy permits repeated axes here too: s defaults to the
        # ORIGINAL axis lengths (so later passes explicitly resize —
        # observable: rfftn(x, axes=(1,1)) re-pads the packed axis back
        # to x.shape[1]), rfft runs on the LAST entry, then plain ffts
        # over the rest in FORWARD order (numpy applies them 0..n-2)
        sizes = (tuple(x.shape[a] for a in axes) if s is None
                 else _resolve_s(x, tuple(s), axes))
        y = rfft(x, n=int(sizes[-1]), axis=axes[-1], norm=norm)
        for a, m in zip(axes[:-1], sizes[:-1]):
            y = _c2c(y, int(m), (a,), norm, False, False, True)
        return y
    if s is not None:
        s = _resolve_s(x, tuple(s), axes)
        for a, m in zip(axes, s):
            x = _crop_or_pad(x, m, a)
    others, last = _split_last(axes)
    y = rfft(x, axis=last, norm=norm)
    if others:
        y = _c2c(y, None, others, norm, False, True, True)
    return y


def irfftn(x, s=None, axes=None, norm: Optional[str] = None, *,
           interleaved: Optional[bool] = None):
    """ND inverse real FFT (numpy.fft.irfftn semantics)."""
    x = asinterleaved(x, interleaved)
    nd = x.ndim - 1
    if _is_int(s):
        raise PlanError("s must be a sequence of integers, not a bare int")
    axes = _axes_list(nd, axes, True, s=s, allow_duplicates=True)
    if len(set(axes)) != len(axes):
        # numpy permits repeated axes: ifft per leading occurrence in
        # FORWARD order with explicit resizes (s defaults to the current
        # axis lengths), then irfft on the LAST entry (default output
        # length 2*(n_last - 1); an explicit -1 keeps the ORIGINAL axis
        # length instead, like every other -1 entry)
        if s is None:
            sizes = tuple(x.shape[a] for a in axes[:-1]) + (None,)
        else:
            sizes = _resolve_s(x, tuple(s), axes)
        y = x
        for a, m in zip(axes[:-1], sizes[:-1]):
            y = _c2c(y, int(m), (a,), norm, True, False, True)
        n_last = None if sizes[-1] is None else int(sizes[-1])
        return irfft(y, n=n_last, axis=axes[-1], norm=norm)
    others, last = _split_last(axes)
    n_last = None
    if s is not None:
        s = _resolve_s(x, tuple(s), axes)   # -1 keeps the axis length,
        for a, m in zip(others, s[:-1]):    # incl. the packed last axis
            x = _crop_or_pad(x, m, a)
        n_last = s[-1]
    if others:
        x = _c2c(x, None, others, norm, True, True, True)
    return irfft(x, n=n_last, axis=last, norm=norm)


def _hermitian_scale(norm: Optional[str], n: int, inverse: bool) -> float:
    """hfft/ihfft norm factor (numpy folds the 1/n onto ihfft for the
    default 'backward' mode; 'forward' swaps it, 'ortho' splits it)."""
    if norm is None or norm == "backward":
        return 1.0 / n if inverse else 1.0
    if norm == "ortho":
        return 1.0 / math.sqrt(n)
    if norm == "forward":
        return 1.0 if inverse else 1.0 / n
    raise PlanError(f"norm must be None|'backward'|'ortho'|'forward', "
                    f"got {norm!r}")


def hfft(x, n: Optional[int] = None, axis: int = -1,
         norm: Optional[str] = None, *, interleaved: Optional[bool] = None):
    """FFT of a Hermitian-symmetric (real-spectrum) signal -> real output
    (numpy.fft.hfft semantics: hfft(a, n) == irfft(conj(a), n) * n with
    the norm scale on the forward side)."""
    x = _conj(asinterleaved(x, interleaved))
    nd = x.ndim - 1
    axes = _axes_list(nd, (axis,), False)
    if n is None:
        n = 2 * (x.shape[axes[0]] - 1)
    # hfft is a FORWARD transform in numpy's norm accounting
    y = irfft(x, n=n, axis=axis, norm="forward")   # unscaled inverse core
    scale = _hermitian_scale(norm, n, inverse=False)
    return y if scale == 1.0 else y * jnp.asarray(scale, y.dtype)


def ihfft(x, n: Optional[int] = None, axis: int = -1,
          norm: Optional[str] = None):
    """Inverse of hfft: real input -> packed Hermitian half-spectrum
    (numpy.fft.ihfft semantics: conj(rfft(a, n)) / n for the default
    norm)."""
    x = _real_f32(x)
    axes = _axes_list(x.ndim, (axis,), False)
    m = n if n is not None else x.shape[axes[0]]
    y = _conj(rfft(x, n=n, axis=axis, norm=None))
    scale = _hermitian_scale(norm, m, inverse=True)
    return y if scale == 1.0 else y * jnp.asarray(scale, y.dtype)


def rfft2(x, s=None, axes=(-2, -1), norm: Optional[str] = None):
    return rfftn(x, s, axes, norm)


def irfft2(x, s=None, axes=(-2, -1), norm: Optional[str] = None, *,
           interleaved: Optional[bool] = None):
    return irfftn(x, s, axes, norm, interleaved=interleaved)


# ---------------------------------------------------------------- dct/dst

def _trig_ortho_weights(kind: str, eff_type: int, m: int):
    """(pre, post) per-bin sqrt(2) reweightings of scipy's ``orthogonalize``
    flag, keyed by the EFFECTIVE transform being executed (the inverse of a
    type-2 is type-3-based, and inverting a post-weight is the swapped
    type's pre-weight — so one table serves both directions).  Either entry
    may be None (identity).  Types 4 and dst1 have no special bins.

    Pinned empirically against scipy 1.17 (ratio probes over every
    kind x type x norm x direction; see tests/test_fftapi.py).
    """
    r2 = math.sqrt(2.0)
    pre = post = None
    if kind == "dct":
        if eff_type == 1:
            pre = np.ones(m, np.float32)
            pre[0] = pre[-1] = r2
            post = np.ones(m, np.float32)
            post[0] = post[-1] = 1.0 / r2
        elif eff_type == 2:
            post = np.ones(m, np.float32)
            post[0] = 1.0 / r2
        elif eff_type == 3:
            pre = np.ones(m, np.float32)
            pre[0] = r2
    else:
        if eff_type == 2:
            post = np.ones(m, np.float32)
            post[-1] = 1.0 / r2
        elif eff_type == 3:
            pre = np.ones(m, np.float32)
            pre[-1] = r2
    return pre, post


def _scipy_trig(x, kind: str, type: int, n, axis: int,
                norm: Optional[str], inverse: bool,
                orthogonalize: Optional[bool] = None):
    """scipy.fft.dct/dst/idct/idst semantics over the plan layer.

    scipy's inverse is the type-swapped transform (2<->3; 1 and 4 are
    self-inverse) with the normalization folded in; all modes lower to the
    plan layer's 'none' forward transform plus explicit diagonal scalings.
    Normalization is a single scalar derived from the unnormalized
    roundtrip gain G (dct1: 2(m-1), dst1: 2(m+1), else 2m):
    forward 1 | 1/G | 1/sqrt(G) and inverse 1/G | 1 | 1/sqrt(G) for
    norm backward | forward | ortho; ``orthogonalize`` (default: only
    under ortho) additionally applies the per-bin sqrt(2) reweights.
    Validated per (kind, type, norm, direction, orthogonalize) against
    scipy in tests/test_fftapi.py.
    """
    if type not in (1, 2, 3, 4):
        raise PlanError(f"{kind} type must be 1..4, got {type}")
    if norm not in (None, "backward", "ortho", "forward"):
        raise PlanError(
            f"{kind} norm must be None|'backward'|'ortho'|'forward', "
            f"got {norm!r}")
    ortho_w = (norm == "ortho") if orthogonalize is None else bool(orthogonalize)
    x = _real_f32(x)
    axes = _axes_list(x.ndim, (axis,), False)
    if n is not None:
        x = _crop_or_pad(x, n, axes[0])
    m = x.shape[axes[0]]
    inv_type = {1: 1, 2: 3, 3: 2, 4: 4}[type]
    eff_type = inv_type if inverse else type
    if kind == "dct" and type == 1:
        gain, half = 2.0 * (m - 1), 1.0   # plan 'none' dct1 matches scipy
    elif kind == "dst" and type == 1:
        gain, half = 2.0 * (m + 1), 2.0   # plan 'none' is scipy / 2
    else:
        gain, half = 2.0 * m, 2.0
    if norm == "ortho":
        scale = half / math.sqrt(gain)
    elif (norm == "forward") != inverse:   # forward-norm fwd, backward inv
        scale = half / gain
    else:
        scale = half
    pre = post = None
    if ortho_w:
        pre, post = _trig_ortho_weights(kind, eff_type, m)
    x, undo = _move_to_trailing(x, axes, comp=False)
    if pre is not None:
        x = x * jnp.asarray(pre)
    y = _exec_nd(x, f"{kind}{eff_type}", (m,), "forward", "none",
                 False)
    if post is not None:
        y = y * jnp.asarray(post)
    if scale != 1.0:
        y = y * jnp.asarray(scale, y.dtype)
    return _restore_axes(y, undo, comp=False)


def dct(x, type: int = 2, n: Optional[int] = None, axis: int = -1,
        norm: Optional[str] = None, *, orthogonalize: Optional[bool] = None):
    """DCT along ``axis`` (scipy.fft.dct semantics)."""
    return _scipy_trig(x, "dct", type, n, axis, norm, False, orthogonalize)


def idct(x, type: int = 2, n: Optional[int] = None, axis: int = -1,
         norm: Optional[str] = None, *, orthogonalize: Optional[bool] = None):
    return _scipy_trig(x, "dct", type, n, axis, norm, True, orthogonalize)


def dst(x, type: int = 2, n: Optional[int] = None, axis: int = -1,
        norm: Optional[str] = None, *, orthogonalize: Optional[bool] = None):
    """DST along ``axis`` (scipy.fft.dst semantics)."""
    return _scipy_trig(x, "dst", type, n, axis, norm, False, orthogonalize)


def idst(x, type: int = 2, n: Optional[int] = None, axis: int = -1,
         norm: Optional[str] = None, *, orthogonalize: Optional[bool] = None):
    return _scipy_trig(x, "dst", type, n, axis, norm, True, orthogonalize)


def _trig_nd(x, kind: str, type: int, s, axes, norm, inverse: bool,
             orthogonalize: Optional[bool] = None):
    """scipy.fft.dctn-family semantics: the separable 1-D transform applied
    along each requested axis in turn."""
    x = _real_f32(x)
    axes = _axes_list(x.ndim, axes, True, s=s)
    sizes = (None,) * len(axes) if s is None else tuple(s)
    if len(sizes) != len(axes):
        raise PlanError(f"s has {len(sizes)} entries for {len(axes)} axes")
    for a, m in zip(axes, sizes):
        x = _scipy_trig(x, kind, type, m, a, norm, inverse, orthogonalize)
    return x


def dctn(x, type: int = 2, s=None, axes=None, norm: Optional[str] = None, *,
         orthogonalize: Optional[bool] = None):
    """ND DCT (scipy.fft.dctn semantics)."""
    return _trig_nd(x, "dct", type, s, axes, norm, False, orthogonalize)


def idctn(x, type: int = 2, s=None, axes=None, norm: Optional[str] = None, *,
          orthogonalize: Optional[bool] = None):
    return _trig_nd(x, "dct", type, s, axes, norm, True, orthogonalize)


def dstn(x, type: int = 2, s=None, axes=None, norm: Optional[str] = None, *,
         orthogonalize: Optional[bool] = None):
    """ND DST (scipy.fft.dstn semantics)."""
    return _trig_nd(x, "dst", type, s, axes, norm, False, orthogonalize)


def idstn(x, type: int = 2, s=None, axes=None, norm: Optional[str] = None, *,
          orthogonalize: Optional[bool] = None):
    return _trig_nd(x, "dst", type, s, axes, norm, True, orthogonalize)


# ---------------------------------------------------------------- conv

def fftconvolve(in1, in2, mode: str = "full", axes=None, *,
                interleaved: Optional[bool] = None):
    """FFT convolution of two arrays (scipy.signal.fftconvolve semantics).

    Convolves over ``axes`` (default: all); the non-convolved axes must
    match and ride as batch.  Real inputs give a real output; complex
    (or interleaved) inputs give an interleaved output.
    """
    if mode not in ("full", "same", "valid"):
        raise PlanError(f"mode must be full|same|valid, got {mode!r}")
    complex_in = (np.iscomplexobj(in1) or np.iscomplexobj(in2)
                  or (interleaved is True))
    # floats whose trailing dim is 2 are ambiguous here; real data is the
    # overwhelmingly common fftconvolve case, so floats are REAL unless
    # the caller passes interleaved=True
    x = asinterleaved(in1, interleaved if complex_in else False)
    k = asinterleaved(in2, interleaved if complex_in else False)
    nd = x.ndim - 1
    if k.ndim != x.ndim:
        raise PlanError(
            f"fftconvolve inputs must have equal rank, got {nd} and {k.ndim - 1}")
    axes = _axes_list(nd, axes, True)
    for a in range(nd):
        if (a not in axes and x.shape[a] != k.shape[a]
                and k.shape[a] != 1 and x.shape[a] != 1):
            raise PlanError(
                f"non-convolved axis {a} sizes differ: {x.shape[a]} vs "
                f"{k.shape[a]} (a size-1 axis on either input broadcasts, "
                "scipy-style; use the plan API's multi-kernel channel "
                "policy otherwise)")
    boundary = {"full": "linear-full", "same": "linear-same",
                "valid": "linear-valid"}[mode]
    # arrange: batch = non-axes dims of x; kernel batch dims must be 1-like
    x, undo_x = _move_to_trailing(x, axes, comp=True)
    k, _ = _move_to_trailing(k, axes, comp=True)
    shape = x.shape[x.ndim - 1 - len(axes): x.ndim - 1]
    kshape = k.shape[k.ndim - 1 - len(axes): k.ndim - 1]
    if mode == "valid":
        # scipy requires one input to be at least as large everywhere
        if not (all(a >= b for a, b in zip(shape, kshape))
                or all(b >= a for a, b in zip(shape, kshape))):
            raise PlanError(
                "valid mode requires one input to be at least as large as "
                "the other in every convolved dimension")
        if any(b > a for a, b in zip(shape, kshape)):
            x, k = k, x
            shape, kshape = kshape, shape
    from . import create_plan
    klead = k.shape[: k.ndim - 1 - len(axes)]
    lead = x.shape[: x.ndim - 1 - len(axes)]
    if any(d != 1 for d in klead):
        # the kernel slot varies along non-convolved axes (e.g. a batched
        # in1 swapped into it by valid mode): when the data slot is
        # singleton there, run one multi-kernel plan (convolution
        # commutes), matching scipy's broadcast semantics
        if any(d != 1 for d in lead):
            raise PlanError(
                "fftconvolve inputs may not BOTH vary along a non-"
                f"convolved axis (leading shapes {lead} and {klead}); use "
                "the plan API's multi-kernel channel policy for that")
        kc = int(np.prod(klead)) if klead else 1
        plan = create_plan(type="fftconv", shape=list(shape), batch=1,
                           fftConv={"boundary": boundary,
                                    "kernelShape": list(kshape),
                                    "kernelCount": kc},
                           **_plan_tuning_kw())
        y = plan.exec(x.reshape(1, *shape, 2),
                      kernel=k.reshape(kc, *kshape, 2))
        y = y.reshape(*klead, *y.shape[2:])   # kernel-major -> lead dims
        if mode == "same":
            # scipy's 'same' center-crops to in1's FULL shape, non-
            # convolved axes included — in1 is singleton there in this
            # branch, so keep the centered kernel lane only
            idx = tuple(slice((d - 1) // 2, (d - 1) // 2 + 1)
                        for d in klead)
            y = y[idx + (Ellipsis,)]
    else:
        batch = int(np.prod(lead)) if lead else 1
        plan = create_plan(type="fftconv", shape=list(shape), batch=batch,
                           fftConv={"boundary": boundary,
                                    "kernelShape": list(kshape)},
                           **_plan_tuning_kw())
        y = plan.exec(x.reshape(batch, *shape, 2),
                      kernel=k.reshape(*kshape, 2))
        y = y.reshape(*lead, *y.shape[1:])
    y = _restore_axes(y, undo_x, comp=True)
    if not complex_in:
        return y[..., 0]
    return y


def oaconvolve(in1, in2, mode: str = "full", axes=None, *,
               interleaved: Optional[bool] = None):
    """Block-streamed convolution for long-signal/short-kernel workloads
    (scipy.signal.oaconvolve's role).  Same semantics as
    :func:`fftconvolve`; the plan layer auto-selects the overlap-save
    block route whenever it measures faster — 1-D convolved axis,
    kernel <= 4097 taps, n >= 2^14 with n*batch >= 2^16 (the on-chip
    r4_os_gate sweep: 1.03-4.85x wins across that whole region) — so
    this is an alias kept for scipy API familiarity.  ND convolved axes
    run the standard spectrum pipeline."""
    return fftconvolve(in1, in2, mode, axes, interleaved=interleaved)


def convolve(in1, in2, mode: str = "full", method: str = "auto", *,
             interleaved: Optional[bool] = None):
    """ND convolution (scipy.signal.convolve semantics over all axes).

    ``method`` accepts scipy's vocabulary; 'direct' and 'auto' both run
    the FFT route — on TPU the MXU-contraction FFT pipeline IS the fast
    path at every size, so there is no separate direct kernel to pick
    (values match scipy's to float32 precision either way).  Integer
    inputs round to the nearest integer like scipy's fft method."""
    if method not in ("auto", "fft", "direct"):
        raise PlanError(f"method must be auto|fft|direct, got {method!r}")
    int_in = (np.issubdtype(np.asarray(in1).dtype, np.integer)
              and np.issubdtype(np.asarray(in2).dtype, np.integer))
    y = fftconvolve(in1, in2, mode, interleaved=interleaved)
    return jnp.round(y) if int_in else y


def _reverse_conj(x, interleaved):
    """Time-reverse over every data axis and conjugate (the correlate ->
    convolve kernel map)."""
    k = asinterleaved(x, interleaved)
    for a in range(k.ndim - 1):
        k = jnp.flip(k, axis=a)
    return k * jnp.asarray([1.0, -1.0], dtype=k.dtype)


def correlate(in1, in2, mode: str = "full", method: str = "auto", *,
              interleaved: Optional[bool] = None):
    """ND cross-correlation (scipy.signal.correlate semantics):
    convolution of ``in1`` with the reversed conjugate of ``in2``, over
    all axes.  See :func:`convolve` for the ``method`` note."""
    if method not in ("auto", "fft", "direct"):
        raise PlanError(f"method must be auto|fft|direct, got {method!r}")
    complex_in = (np.iscomplexobj(in1) or np.iscomplexobj(in2)
                  or (interleaved is True))
    int_in = (np.issubdtype(np.asarray(in1).dtype, np.integer)
              and np.issubdtype(np.asarray(in2).dtype, np.integer))
    k = _reverse_conj(in2, interleaved if complex_in else False)
    y = fftconvolve(asinterleaved(in1, interleaved if complex_in else False),
                    k, mode, interleaved=True)
    if not complex_in:
        y = y[..., 0]
    return jnp.round(y) if int_in else y


def correlation_lags(in1_len: int, in2_len: int,
                     mode: str = "full") -> np.ndarray:
    """Lag indices for :func:`correlate` (scipy.signal.correlation_lags)."""
    if mode == "full":
        return np.arange(-in2_len + 1, in1_len)
    if mode == "same":
        lags = np.arange(-in2_len + 1, in1_len)
        mid = lags.size // 2
        lo = mid - in1_len // 2
        return lags[lo:lo + in1_len]
    if mode == "valid":
        lag_bound = in1_len - in2_len
        return (np.arange(lag_bound + 1) if lag_bound >= 0
                else np.arange(lag_bound, 1))
    raise PlanError(f"mode must be full|same|valid, got {mode!r}")


def _conv2d_impl(x, k, mode: str, boundary: str, fillvalue, same_off):
    """Shared convolve2d/correlate2d machinery on interleaved 2-D inputs.

    scipy's boundary handling reduces to: extend ``x`` by (K-1) on each
    side with the boundary rule, take the valid convolution (= the
    boundary-aware full result), then crop per ``mode``.  ``same_off``
    gives the same-mode crop offset as a function of the kernel dim
    (convolution uses (K-1)//2, correlation K//2 — pinned empirically
    against scipy, which centers the two differently for even kernels).
    """
    if mode not in ("full", "same", "valid"):
        raise PlanError(f"mode must be full|same|valid, got {mode!r}")
    if boundary not in ("fill", "wrap", "symm"):
        raise PlanError(f"boundary must be fill|wrap|symm, got {boundary!r}")
    if x.ndim != 3 or k.ndim != 3:
        raise PlanError("convolve2d/correlate2d inputs must be 2-D")
    K0, K1 = k.shape[0], k.shape[1]
    if mode == "valid":
        # the kernel never overhangs, so the boundary rule is irrelevant
        # (verified against scipy); fftconvolve's valid route also covers
        # the commuted in2-larger case
        return fftconvolve(x, k, "valid", interleaved=True)
    if boundary == "fill" and fillvalue == 0 and mode == "full":
        return fftconvolve(x, k, "full", interleaved=True)
    fv = complex(fillvalue)
    fvec = jnp.asarray([fv.real, fv.imag], jnp.float32)
    if boundary == "fill" and fv == 0:
        full = fftconvolve(x, k, "full", interleaved=True)
    else:
        pads = ((K0 - 1, K0 - 1), (K1 - 1, K1 - 1), (0, 0))
        if boundary == "fill":
            # per-lane constant: pad (x - fv) with zeros, then add fv back
            xp = jnp.pad(x - fvec, pads) + fvec
        else:
            xp = jnp.pad(x, pads,
                         mode={"wrap": "wrap", "symm": "symmetric"}[boundary])
        full = fftconvolve(xp, k, "valid", interleaved=True)
    if mode == "full":
        return full
    i0, j0 = same_off(K0), same_off(K1)
    return full[i0:i0 + x.shape[0], j0:j0 + x.shape[1]]


def convolve2d(in1, in2, mode: str = "full", boundary: str = "fill",
               fillvalue=0, *, interleaved: Optional[bool] = None):
    """2-D convolution with scipy.signal.convolve2d's boundary modes:
    'fill' (pad with ``fillvalue``), 'wrap' (circular), 'symm'
    (edge-symmetric reflection).  The boundary extension is two free pads
    feeding the framework's fftconv plan — one jitted XLA pipeline."""
    complex_in = (np.iscomplexobj(in1) or np.iscomplexobj(in2)
                  or (interleaved is True) or isinstance(fillvalue, complex))
    x = asinterleaved(in1, interleaved if complex_in else False)
    k = asinterleaved(in2, interleaved if complex_in else False)
    y = _conv2d_impl(x, k, mode, boundary, fillvalue,
                     same_off=lambda K: (K - 1) // 2)
    return y if complex_in else y[..., 0]


def correlate2d(in1, in2, mode: str = "full", boundary: str = "fill",
                fillvalue=0, *, interleaved: Optional[bool] = None):
    """2-D cross-correlation (scipy.signal.correlate2d semantics):
    convolution of ``in1`` with the reversed conjugate of ``in2``, with
    the same boundary modes as :func:`convolve2d`.  Note scipy centers
    correlation's 'same' crop at K//2 (vs convolution's (K-1)//2)."""
    complex_in = (np.iscomplexobj(in1) or np.iscomplexobj(in2)
                  or (interleaved is True) or isinstance(fillvalue, complex))
    x = asinterleaved(in1, interleaved if complex_in else False)
    k = _reverse_conj(in2, interleaved if complex_in else False)
    y = _conv2d_impl(x, k, mode, boundary, fillvalue,
                     same_off=lambda K: K // 2)
    return y if complex_in else y[..., 0]


def deconvolve(signal, divisor):
    """Polynomial long division: (quotient, remainder) with
    signal = convolve(divisor, quotient) + remainder
    (scipy.signal.deconvolve semantics).

    Runs on the HOST in float64: deconvolution is an inherently
    sequential recursion (scipy implements it as an IIR lfilter), not a
    TPU workload — inputs are typically short filter responses."""
    num = np.atleast_1d(np.asarray(signal, np.float64))
    den = np.atleast_1d(np.asarray(divisor, np.float64))
    if num.ndim != 1 or den.ndim != 1:
        raise PlanError("deconvolve takes 1-D signal and divisor")
    if den.size == 0 or den[0] == 0:
        raise PlanError("divisor must have a non-zero leading coefficient")
    N, D = num.size, den.size
    if D > N:
        return np.zeros(1), num.copy()
    quot = np.zeros(N - D + 1)
    rem = num.copy()
    for i in range(N - D + 1):
        q = rem[i] / den[0]
        quot[i] = q
        rem[i:i + D] -= q * den
    return quot, rem


def detrend(data, axis: int = -1, type: str = "linear", bp=0):
    """Remove a constant or per-segment linear trend along ``axis``
    (scipy.signal.detrend semantics, breakpoints included)."""
    if type not in ("linear", "constant", "l", "c"):
        raise PlanError(f"type must be 'linear' or 'constant', got {type!r}")
    x = _real_f32(data)
    ax = _axes_list(x.ndim, (axis,), False)[0]
    n = x.shape[ax]
    if type in ("constant", "c"):
        return x - jnp.mean(x, axis=ax, keepdims=True)
    bps = np.sort(np.unique(np.concatenate(
        [[0], np.atleast_1d(np.asarray(bp, np.int64)).ravel(), [n]])))
    if np.any(bps > n) or np.any(bps < 0):
        raise PlanError("breakpoints must lie within the axis length")
    x = jnp.moveaxis(x, ax, -1)
    parts = []
    for lo, hi in zip(bps[:-1], bps[1:]):
        m = int(hi - lo)
        if m == 0:
            continue
        seg = jax.lax.slice_in_dim(x, int(lo), int(hi), axis=x.ndim - 1)
        t = jnp.arange(m, dtype=jnp.float32)
        tc = t - (m - 1) / 2.0
        denom = float(np.sum((np.arange(m) - (m - 1) / 2.0) ** 2)) or 1.0
        b = jnp.sum(seg * tc, axis=-1, keepdims=True) / denom
        a = jnp.mean(seg, axis=-1, keepdims=True)
        parts.append(seg - (a + b * tc))
    y = jnp.concatenate(parts, axis=-1)
    return jnp.moveaxis(y, -1, ax)


def get_window(window, Nx: int, fftbins: bool = True) -> np.ndarray:
    """Window samples (scipy.signal.get_window semantics: string, (name,
    param) tuple, or a float Kaiser beta; ``fftbins=True`` gives the
    periodic form used by the spectral estimators).  Resolved through
    the framework's own window zoo (webgpufft_tpu.windows, scipy-pinned)
    — no scipy dependency at runtime."""
    from .windows import get_window as _gw
    return np.asarray(_gw(window, int(Nx), fftbins=fftbins), np.float32)


# ---------------------------------------------------------------- stft

def _get_window(window, W: int) -> np.ndarray:
    if isinstance(window, (str, tuple)):
        from .windows import get_window as _gw
        return np.asarray(_gw(window, W), np.float32)
    w = np.asarray(window, np.float32)
    if w.shape != (W,):
        raise PlanError(f"window must have length nperseg ({W}), "
                        f"got {w.shape}")
    return w


def _stft_hop(what: str, nperseg, noverlap) -> Tuple[int, int]:
    """(nperseg, hop) with basic validation.  Any hop sharing a factor
    with nperseg gets the gather-free gcd-block framing; only coprime-ish
    hops fall back to a gather (see _frame_segments)."""
    W = int(nperseg)
    H = W - (int(noverlap) if noverlap is not None else W // 2)
    if H <= 0:
        raise PlanError(
            f"{what} needs noverlap < nperseg (hop={H}, nperseg={W})")
    return W, H


# gcd-block framing bails to the gather when the window spans this many
# blocks (W // gcd(W, H) slice passes each re-reading ~the signal)
_FRAME_MAX_BLOCKS = 64


def _frame_geometry(W: int, H: int):
    """(g, wg, hg, use_blocks): gcd-block framing geometry.  Every hop
    start is a multiple of g = gcd(W, H), so frames decompose into wg
    block-columns, column j a stride-hg slice of the block grid."""
    g = math.gcd(W, H)
    wg, hg = W // g, H // g
    use_blocks = W % H == 0 or (g > 1 and wg <= _FRAME_MAX_BLOCKS)
    return g, wg, hg, use_blocks


def _frame_segments(xp, W: int, H: int, nb: int):
    """(..., L) -> overlapping frames (..., nb, W).

    Framing runs on g = gcd(W, H) sample blocks: every hop start is
    block-aligned, so frame column-block j is a stride-hg slice of the
    block grid — wg = W // g shifted slices + a concat, no gathers (the
    TPU-fast path; H | W is the hg == 1 special case, the original seam
    trick).  Only coprime-ish framings (wg > 64 blocks) fall back to a
    static gather (overlapping-window gathers are 4-7.6x slower on TPU;
    see CLAUDE.md)."""
    lead = xp.shape[:-1]
    g, wg, hg, use_blocks = _frame_geometry(W, H)
    if use_blocks:
        if hg > 1:
            # the stride-hg reshape slices run to (j + nb*hg) blocks; the
            # last hg-1 block groups read past the signal for large j —
            # pad once, the [..., 0, :] selection never keeps the padding
            xp = jnp.pad(xp, [(0, 0)] * (xp.ndim - 1) + [(0, (hg - 1) * g)])
        segs = []
        for j in range(wg):
            s = jax.lax.slice_in_dim(xp, j * g, (j + nb * hg) * g,
                                     axis=xp.ndim - 1)
            s = s.reshape(*lead, nb, hg, g)[..., 0, :]
            segs.append(s)
        return jnp.concatenate(segs, axis=-1)
    idx = (np.arange(nb)[:, None] * H + np.arange(W)[None, :]).reshape(-1)
    out = jnp.take(xp, jnp.asarray(idx.astype(np.int32)), axis=xp.ndim - 1)
    return out.reshape(*lead, nb, W)


def stft(x, fs: float = 1.0, window="hann", nperseg: int = 256,
         noverlap: Optional[int] = None, nfft: Optional[int] = None,
         boundary: str = "zeros", padded: bool = True, axis: int = -1):
    """Short-time Fourier transform of a REAL signal
    (scipy.signal.stft semantics: detrend off, one-sided, 'spectrum'
    scaling — Zxx scaled by 1/win.sum()).

    Returns (f, t, Zxx) with Zxx interleaved (..., nfft//2+1, nb, 2).
    Any hop sharing a factor with nperseg (the defaults, all power-of-two
    overlaps, and e.g. nperseg=256/noverlap=96) frames via gcd-block
    slices + a concat — the TPU-fast path; only coprime-ish hops fall
    back to a gather (correct, but slower on TPU).
    """
    if boundary not in ("zeros", None):
        raise PlanError("stft supports boundary='zeros' or None")
    x = _real_f32(x)
    axes = _axes_list(x.ndim, (axis,), False)
    x, undo = _move_to_trailing(x, axes, comp=False)
    W, H = _stft_hop("stft", nperseg, noverlap)
    m = int(nfft) if nfft is not None else W
    if m < W:
        raise PlanError("nfft must be >= nperseg")
    win = _get_window(window, W)
    n = x.shape[-1]
    lpad = W // 2 if boundary == "zeros" else 0
    L = n + 2 * lpad
    if L < W or padded or (L - W) % H == 0:
        nb = max(-(-(L - W) // H) + 1, 1)     # pad up to frame-aligned
    else:
        nb = (L - W) // H + 1                 # padded=False: truncate tail
    total = (nb - 1) * H + W
    # the boundary pad is lpad on the LEFT only; the right side absorbs
    # the second boundary pad plus frame alignment (or truncates when
    # padded=False leaves a partial tail)
    right = total - n - lpad
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(lpad, max(right, 0))])
    if right < 0:
        xp = jax.lax.slice_in_dim(xp, 0, total, axis=xp.ndim - 1)
    frames = _frame_segments(xp, W, H, nb) * win          # (..., nb, W)
    if m > W:
        frames = jnp.pad(frames, [(0, 0)] * (frames.ndim - 1)
                         + [(0, m - W)])
    Z = rfft(frames, axis=-1) / np.float32(win.sum())     # (..., nb, f, 2)
    Z = jnp.swapaxes(Z, -3, -2)                           # (..., f, nb, 2)
    f = np.fft.rfftfreq(m, 1.0 / fs)
    t = (np.arange(nb) * H + W // 2 - lpad) / fs   # scipy uses the floor
    return f, t, _restore_axes(Z, undo, comp=True)


def istft(Zxx, fs: float = 1.0, window="hann", nperseg: Optional[int] = None,
          noverlap: Optional[int] = None, nfft: Optional[int] = None,
          boundary: bool = True, *, interleaved: Optional[bool] = None):
    """Inverse STFT (scipy.signal.istft semantics for one-sided input
    produced by :func:`stft`): windowed overlap-add with the COLA
    win^2 normalization.  Zxx: (..., f, t[, 2]); returns (t_axis, x).
    """
    Z = asinterleaved(Zxx, interleaved)
    m_bins = Z.shape[-3]
    nb = Z.shape[-2]
    m = int(nfft) if nfft is not None else 2 * (m_bins - 1)
    W, H = _stft_hop("istft", nperseg if nperseg is not None else m,
                     noverlap)
    if W > m:
        raise PlanError(f"nfft ({m}) must be >= nperseg ({W})")
    win = _get_window(window, W)
    Zt = jnp.swapaxes(Z, -3, -2)                          # (..., nb, f, 2)
    frames = irfft(Zt, n=m, axis=-1) * np.float32(win.sum())
    frames = frames[..., :W] * win                        # (..., nb, W)
    lead = frames.shape[:-2]
    total_out = (nb - 1) * H + W
    w2 = win.astype(np.float64) ** 2
    # steady-state overlap profile built from the window alone (the
    # H-periodic sum every interior sample sees with unbounded frames) —
    # independent of nb, so short signals with a valid hop are not
    # false-positived and every hop phase is checked (NOLA gate below)
    full = np.array([w2[p::H].sum() for p in range(H)])
    g, wg, hg, use_blocks = _frame_geometry(W, H)
    if use_blocks:
        # overlap-add on g = gcd(W, H) blocks — the inverse of the
        # _frame_segments slicing: frame m's column-block j lands at
        # output block m*hg + j, so each column scatters as a zero-pad
        # interleave + shift (no scatter-add; H | W is the hg == 1
        # special case, the original inverse seam trick)
        out_blocks = (nb - 1) * hg + wg
        acc = jnp.zeros((*lead, out_blocks, g), frames.dtype)
        for j in range(wg):
            seg = frames[..., j * g:(j + 1) * g]          # (..., nb, g)
            if hg > 1:
                seg = jnp.pad(seg[..., :, None, :],
                              [(0, 0)] * (len(lead) + 1)
                              + [(0, hg - 1), (0, 0)])    # (..., nb, hg, g)
            seg = seg.reshape(*lead, nb * hg, g)
            content = (nb - 1) * hg + 1   # trailing interleave blocks are 0
            if hg > 1:
                seg = jax.lax.slice_in_dim(seg, 0, content, axis=len(lead))
            pad = [(0, 0)] * len(lead) + [
                (j, out_blocks - j - content), (0, 0)]
            acc = acc + jnp.pad(seg, pad)
        y = acc.reshape(*lead, out_blocks * g)
        # COLA win^2 normalization: interior output blocks see the
        # hg-periodic steady-state block profile; only the first wg-1
        # and last wg-1 blocks differ — O(wg^2 g) host work regardless
        # of signal length
        w2b = w2.reshape(wg, g)
        ss = np.zeros((hg, g))
        for j in range(wg):
            ss[j % hg] += w2b[j]
        norm_blocks = np.tile(ss, (-(-out_blocks // hg), 1))[:out_blocks]
        edge = sorted(set(range(min(wg - 1, out_blocks)))
                      | set(range(min(nb * hg, out_blocks), out_blocks)))
        for p in edge:
            tot = np.zeros(g)
            for j in range(p % hg, min(wg, p + 1), hg):
                if 0 <= (p - j) // hg < nb:
                    tot += w2b[j]
            norm_blocks[p] = tot
        norm = norm_blocks.reshape(-1)
    else:
        # coprime-ish framing: scatter-add fallback (correct everywhere;
        # pick a hop sharing a factor with nperseg for hot loops)
        idx = (np.arange(nb)[:, None] * H
               + np.arange(W)[None, :]).reshape(-1).astype(np.int32)
        y = jnp.zeros((*lead, total_out), frames.dtype).at[
            ..., jnp.asarray(idx)].add(frames.reshape(*lead, nb * W))
        norm = np.zeros(total_out)
        np.add.at(norm, idx, np.tile(w2, nb))
    lpad = W // 2 if boundary else 0
    n_out = total_out - 2 * lpad
    # NOLA gate on the STEADY-STATE overlap profile (`full` — what every
    # interior hop sees, scipy check_NOLA's criterion): a window/hop whose
    # win^2 overlap-add vanishes there cannot be inverted — raise instead
    # of quietly dividing by 1 and returning garbage.  Edge blocks are
    # legitimately partial (tapered reconstruction, like scipy's).
    if full.min() <= 1e-10 * max(full.max(), 1e-30):
        raise PlanError(
            f"istft: window/hop fails the NOLA constraint (steady-state "
            f"win^2 overlap-add has zeros; nperseg={W}, hop={H}) — "
            "reconstruction is impossible for this framing")
    norm = np.where(norm > 1e-10, norm, 1.0).astype(np.float32)
    y = y / norm
    y = jax.lax.slice_in_dim(y, lpad, lpad + n_out, axis=y.ndim - 1) \
        if lpad else y
    t = np.arange(y.shape[-1]) / fs
    return t, y


def _segment_spectra(x, fs, window, nperseg, noverlap, nfft, scaling,
                     axis, what):
    """Windowed mean-detrended segment rffts for the Welch estimators.

    Returns (Z, scale_vec, undo, f): Z interleaved (..., nb, f, 2), the
    one-sided PSD scale vector (doubling folded in), the axis-restore
    token, and the frequency grid.
    """
    if scaling not in ("density", "spectrum"):
        raise PlanError("scaling must be 'density' or 'spectrum'")
    x = _real_f32(x)
    axes = _axes_list(x.ndim, (axis,), False)
    x, undo = _move_to_trailing(x, axes, comp=False)
    W, H = _stft_hop(what, nperseg, noverlap)
    m = int(nfft) if nfft is not None else W
    if m < W:
        raise PlanError("nfft must be >= nperseg")
    win = _get_window(window, W)
    n = x.shape[-1]
    if n < W:
        raise PlanError(f"signal shorter than nperseg ({n} < {W})")
    nb = (n - W) // H + 1                 # scipy: trailing partial dropped
    total = (nb - 1) * H + W
    xp = (x if total == n
          else jax.lax.slice_in_dim(x, 0, total, axis=x.ndim - 1))
    frames = _frame_segments(xp, W, H, nb)
    frames = frames - jnp.mean(frames, axis=-1, keepdims=True)  # detrend
    frames = frames * win
    if m > W:
        frames = jnp.pad(frames, [(0, 0)] * (frames.ndim - 1)
                         + [(0, m - W)])
    Z = rfft(frames, axis=-1)                          # (..., nb, f, 2)
    # one-sided doubling (all bins except DC and, for even m, Nyquist)
    dbl = np.full(m // 2 + 1, 2.0, np.float32)
    dbl[0] = 1.0
    if m % 2 == 0:
        dbl[-1] = 1.0
    if scaling == "density":
        s = 1.0 / (fs * float(np.sum(win.astype(np.float64) ** 2)))
    else:
        s = 1.0 / float(np.sum(win.astype(np.float64))) ** 2
    return Z, dbl * np.float32(s), undo, np.fft.rfftfreq(m, 1.0 / fs)


def spectrogram(x, fs: float = 1.0, window=("tukey", 0.25),
                nperseg: int = 256, noverlap: Optional[int] = None,
                nfft: Optional[int] = None, scaling: str = "density",
                axis: int = -1):
    """Per-segment PSD spectrogram of a REAL signal
    (scipy.signal.spectrogram semantics, mode='psd': Welch scaling but
    NOT averaged over segments; scipy's noverlap default nperseg//8).

    Returns (f, t, Sxx) with Sxx (..., f, nb) real.
    """
    if noverlap is None:
        noverlap = int(nperseg) // 8
    Z, sv, undo, f = _segment_spectra(x, fs, window, nperseg, noverlap,
                                      nfft, scaling, axis, "spectrogram")
    S = (Z[..., 0] ** 2 + Z[..., 1] ** 2) * sv         # (..., nb, f)
    S = jnp.swapaxes(S, -2, -1)                        # (..., f, nb)
    W = int(nperseg)
    H = W - int(noverlap)
    nb = Z.shape[-3]
    t = (np.arange(nb) * H + W / 2) / fs
    return f, t, _restore_axes(S, undo, comp=True)


def welch(x, fs: float = 1.0, window="hann", nperseg: int = 256,
          noverlap: Optional[int] = None, nfft: Optional[int] = None,
          scaling: str = "density", axis: int = -1):
    """Welch power-spectral-density estimate of a REAL signal
    (scipy.signal.welch semantics with detrend='constant'): averaged
    one-sided periodograms of overlapping windowed segments.

    Returns (f, Pxx).  Built on the stft framing (hop | nperseg applies).
    """
    Z, sv, undo, f = _segment_spectra(x, fs, window, nperseg, noverlap,
                                      nfft, scaling, axis, "welch")
    P = jnp.mean(Z[..., 0] ** 2 + Z[..., 1] ** 2, axis=-2) * sv
    return f, _restore_axes(P, undo, comp=False)


def _pair_spectra(x, y, fs, window, nperseg, noverlap, nfft, scaling,
                  axis, what):
    """Segment spectra of a signal pair on one common framing (scipy
    zero-pads the shorter input to the longer along the axis)."""
    x = _real_f32(x)
    y = _real_f32(y)
    ax = _axes_list(x.ndim, (axis,), False)[0]
    if x.shape[ax] != y.shape[ax]:
        n = max(x.shape[ax], y.shape[ax])
        x = _crop_or_pad(x, n, ax)
        y = _crop_or_pad(y, n, ax)
    Zx, sv, undo, f = _segment_spectra(x, fs, window, nperseg, noverlap,
                                       nfft, scaling, axis, what)
    Zy, _, _, _ = _segment_spectra(y, fs, window, nperseg, noverlap,
                                   nfft, scaling, axis, what)
    if Zx.shape != Zy.shape:
        raise PlanError(
            f"{what} inputs must frame identically, got spectra "
            f"{tuple(Zx.shape)} vs {tuple(Zy.shape)}")
    return Zx, Zy, sv, undo, f


def _cross_mean(Zx, Zy, sv):
    """(Pxy_re, Pxy_im) = segment-averaged conj(X)*Y, scaled."""
    xr, xi = Zx[..., 0], Zx[..., 1]
    yr, yi = Zy[..., 0], Zy[..., 1]
    pr = jnp.mean(xr * yr + xi * yi, axis=-2)          # Re(conj(X) Y)
    pi = jnp.mean(xr * yi - xi * yr, axis=-2)          # Im(conj(X) Y)
    return pr * sv, pi * sv


def csd(x, y, fs: float = 1.0, window="hann", nperseg: int = 256,
        noverlap: Optional[int] = None, nfft: Optional[int] = None,
        scaling: str = "density", axis: int = -1):
    """Cross-spectral density of two REAL signals
    (scipy.signal.csd semantics: Pxy = averaged conj(X)*Y of the
    windowed segments, Welch scaling, shorter input zero-padded).
    Returns (f, Pxy) with Pxy interleaved (..., f, 2) — ``ascomplex``
    for a numpy complex view.
    """
    Zx, Zy, sv, undo, f = _pair_spectra(x, y, fs, window, nperseg,
                                        noverlap, nfft, scaling, axis,
                                        "csd")
    pr, pi = _cross_mean(Zx, Zy, sv)
    return f, _restore_axes(jnp.stack([pr, pi], axis=-1), undo, comp=True)


def coherence(x, y, fs: float = 1.0, window="hann", nperseg: int = 256,
              noverlap: Optional[int] = None, nfft: Optional[int] = None,
              axis: int = -1):
    """Magnitude-squared coherence Cxy = |Pxy|^2 / (Pxx * Pyy)
    (scipy.signal.coherence semantics).  Returns (f, Cxy).  Pxx/Pyy are
    computed from the same segment spectra as Pxy — one framing + FFT
    pass per signal, not two."""
    Zx, Zy, sv, undo, f = _pair_spectra(x, y, fs, window, nperseg,
                                        noverlap, nfft, "density", axis,
                                        "coherence")
    pr, pi = _cross_mean(Zx, Zy, sv)
    Pxx = jnp.mean(Zx[..., 0] ** 2 + Zx[..., 1] ** 2, axis=-2) * sv
    Pyy = jnp.mean(Zy[..., 0] ** 2 + Zy[..., 1] ** 2, axis=-2) * sv
    C = (pr ** 2 + pi ** 2) / (Pxx * Pyy)
    return f, _restore_axes(C, undo, comp=False)


def periodogram(x, fs: float = 1.0, window="boxcar",
                nfft: Optional[int] = None, scaling: str = "density",
                axis: int = -1):
    """Single-segment PSD estimate (scipy.signal.periodogram semantics
    with detrend='constant'): Welch with one full-length segment.
    ``nfft`` shorter than the signal crops the signal to ``nfft`` first
    (scipy's behavior), longer zero-pads the spectrum."""
    x = _real_f32(x)
    n = x.shape[axis]
    if nfft is not None and int(nfft) < n:
        n = int(nfft)
        x = jax.lax.slice_in_dim(x, 0, n, axis=axis)
        nfft = None
    if window == "boxcar":
        window = np.ones(n, np.float32)
    return welch(x, fs=fs, window=window, nperseg=n, noverlap=0,
                 nfft=nfft, scaling=scaling, axis=axis)


def czt(x, m: Optional[int] = None, w=None, a=1 + 0j, *, axis: int = -1,
        interleaved: Optional[bool] = None):
    """Chirp-Z transform along ``axis`` (scipy.signal.czt semantics):
    X[k] = sum_n x[n] a^{-n} w^{nk} for k < m, evaluated via the
    Bluestein convolution at a smooth padded length — the general form
    of the spiral-contour z-transform (the FFT is the w=exp(-2j pi/n),
    a=1 special case).  Returns interleaved (..., m, 2).

    Accuracy note: unit-modulus contours (|w| = 1, the zoom-FFT case)
    match scipy at float32 precision (~1e-7 rel).  Decaying/growing
    spirals make the chirp tables span orders of magnitude, which the
    float32 device math resolves to ~1e-3 rel — use scipy on the host
    if you need f64 spirals.
    """
    x = asinterleaved(x, interleaved)
    nd = x.ndim - 1
    axes = _axes_list(nd, (axis,), False)
    x, undo = _move_to_trailing(x, axes, comp=True)
    n = x.shape[-2]
    m = int(m) if m is not None else n
    if m < 1:
        raise PlanError("czt m must be >= 1")
    w = complex(w) if w is not None else np.exp(-2j * np.pi / m)
    a = complex(a)
    # Bluestein: w^{nk} = w^{(n^2 + k^2 - (k-n)^2)/2}, so the transform
    # is a pre-chirp multiply, a linear convolution with w^{-j^2/2}, and
    # a post-chirp multiply — all host-precomputed tables (float64)
    from .core.cplx import cmul_const, const_pair
    k2 = np.arange(max(m, n), dtype=np.float64) ** 2 / 2.0
    ypre = np.power(a, -np.arange(n, dtype=np.float64)) * np.power(w, k2[:n])
    L = factors.next_smooth_at_least(m + n - 1)
    v = np.zeros(L, np.complex128)
    v[:m] = np.power(w, -k2[:m])
    v[L - n + 1:] = np.power(w, -k2[1:n][::-1])
    pa, pb = const_pair(ypre)
    va, vb = const_pair(np.fft.fft(v))
    oa, ob = const_pair(np.power(w, k2[:m]))
    y = cmul_const(x, jnp.asarray(pa), jnp.asarray(pb))
    pads = [(0, 0)] * (y.ndim - 2) + [(0, L - n), (0, 0)]
    y = jnp.pad(y, pads)
    Y = cmul_const(fft(y, axis=-1), jnp.asarray(va), jnp.asarray(vb))
    g = ifft(Y, axis=-1)
    g = jax.lax.slice_in_dim(g, 0, m, axis=g.ndim - 2)
    out = cmul_const(g, jnp.asarray(oa), jnp.asarray(ob))
    return _restore_axes(out, undo, comp=True)


def zoom_fft(x, fn, m: Optional[int] = None, *, fs: float = 2.0,
             axis: int = -1, interleaved: Optional[bool] = None):
    """Zoomed FFT over the band [fn[0], fn[1]] (scipy.signal.zoom_fft
    semantics, endpoint=False; scalar fn means [0, fn]): frequencies
    f1 + (f2-f1)*k/m for k < m."""
    if np.isscalar(fn):
        f1, f2 = 0.0, float(fn)
    else:
        f1, f2 = float(fn[0]), float(fn[1])
    xx = asinterleaved(x, interleaved)
    n = xx.shape[_axes_list(xx.ndim - 1, (axis,), False)[0]]
    m = int(m) if m is not None else n
    w = np.exp(-2j * np.pi * (f2 - f1) / (fs * m))
    a = np.exp(2j * np.pi * f1 / fs)
    return czt(xx, m=m, w=w, a=a, axis=axis, interleaved=True)


def resample(x, num: int, axis: int = -1):
    """Fourier-method resampling of a REAL signal to ``num`` samples
    (scipy.signal.resample semantics: crop or zero-pad the spectrum,
    with the Nyquist-bin split/merge scipy applies)."""
    x = _real_f32(x)
    axes = _axes_list(x.ndim, (axis,), False)
    x, undo = _move_to_trailing(x, axes, comp=False)
    n = x.shape[-1]
    num = int(num)
    if num < 1:
        raise PlanError("resample num must be >= 1")
    X = rfft(x, axis=-1)                        # (..., n//2+1, 2)
    nb_in, nb_out = n // 2 + 1, num // 2 + 1
    if nb_out <= nb_in:
        Y = jax.lax.slice_in_dim(X, 0, nb_out, axis=X.ndim - 2)
        # downsampling onto an even num: the new Nyquist bin aggregates
        # the symmetric pair, which for the packed form means doubling
        # its real part and dropping its imaginary part... scipy keeps
        # X[num/2] real by adding the conjugate: 2*Re for interior bins,
        # but only when the source bin is NOT the source Nyquist
        if num % 2 == 0 and nb_out - 1 < nb_in - 1 + (n % 2):
            # the new Nyquist bin aggregates its conjugate pair: double
            # the real part, drop the imaginary (scipy's merge; the
            # enclosing guard already excludes a source-Nyquist passthrough)
            mask = np.ones((nb_out, 2), np.float32)
            mask[-1, 0] = 2.0
            mask[-1, 1] = 0.0
            Y = Y * mask
    else:
        pads = [(0, 0)] * (X.ndim - 2) + [(0, nb_out - nb_in), (0, 0)]
        if n % 2 == 0:
            # the source Nyquist bin splits into a conjugate pair:
            # scipy halves it before padding
            mask = np.ones((nb_in, 2), np.float32)
            mask[-1] = 0.5
            X = X * mask
        Y = jnp.pad(X, pads)
    y = irfft(Y, n=num, axis=-1) * np.float32(num / n)
    return _restore_axes(y, undo, comp=False)


def _upfirdn_len(len_h: int, n_in: int, up: int, down: int) -> int:
    """Output length of upfirdn (scipy's _output_len)."""
    return ((n_in - 1) * up + len_h + down - 1) // down


_UPFIRDN_PAD = {"symmetric": "symmetric", "reflect": "reflect",
                "edge": "edge", "wrap": "wrap"}


def upfirdn(h, x, up: int = 1, down: int = 1, axis: int = -1,
            mode: str = "constant", cval=0, *,
            interleaved: Optional[bool] = None):
    """Upsample, FIR filter, downsample (scipy.signal.upfirdn semantics).

    TPU formulation: the zero-stuff is a free stack+reshape, the FIR is
    the framework's FFT convolution (mathematically identical to the
    polyphase form), and the downsample a strided slice — one jitted XLA
    pipeline.  Signal extension modes: 'constant' (cval), 'symmetric',
    'reflect', 'edge', 'wrap' (scipy's remaining modes are host-side
    spline fits and raise)."""
    up, down = int(up), int(down)
    if up < 1 or down < 1:
        raise PlanError("up and down must be >= 1")
    if mode != "constant" and mode not in _UPFIRDN_PAD:
        raise PlanError(
            f"upfirdn mode {mode!r} unsupported; available: constant, "
            f"{', '.join(sorted(_UPFIRDN_PAD))}")
    complex_in = (np.iscomplexobj(x) or np.iscomplexobj(h)
                  or isinstance(cval, complex) or (interleaved is True))
    hv = asinterleaved(h, False)       # complex dtype interleaves itself
    if hv.ndim != 2:
        raise PlanError("upfirdn filter h must be 1-D")
    xv = asinterleaved(x, interleaved if complex_in else False)
    nd = xv.ndim - 1
    axes = _axes_list(nd, (axis,), False)
    xv, undo = _move_to_trailing(xv, axes, comp=True)
    n_in = xv.shape[-2]
    len_h = hv.shape[0]
    # signal extension: K original samples cover the filter's reach
    K = 0
    if not (mode == "constant" and cval == 0):
        K = -(-(len_h - 1) // up)
        pads = [(0, 0)] * (xv.ndim - 2) + [(K, K), (0, 0)]
        if mode == "constant":
            fv = complex(cval)
            fvec = jnp.asarray([fv.real, fv.imag], jnp.float32)
            xv = jnp.pad(xv - fvec, pads) + fvec
        else:
            if K >= n_in and mode in ("symmetric", "reflect"):
                raise PlanError(
                    f"{mode} extension needs signal length > filter reach")
            xv = jnp.pad(xv, pads, mode=_UPFIRDN_PAD[mode])
    # zero-stuff by up: (..., n, 2) -> (..., n, up, 2) -> (..., n*up, 2)
    if up > 1:
        ns = xv.shape[-2]
        z = jnp.zeros(xv.shape[:-1] + (up - 1, 2), xv.dtype)
        xv = jnp.concatenate([xv[..., None, :], z], axis=-2)
        xv = xv.reshape(*xv.shape[:-3], ns * up, 2)
    kshape = (1,) * (nd - 1) + (len_h,)
    y = fftconvolve(xv, hv.reshape(*kshape, 2), "full", axes=nd - 1,
                    interleaved=True)
    L = (n_in - 1) * up + len_h
    y = jax.lax.slice_in_dim(y, K * up, K * up + L, axis=nd - 1)
    y = y[..., ::down, :]
    y = _restore_axes(y, undo, comp=True)
    return y if complex_in else y[..., 0]


def resample_poly(x, up: int, down: int, axis: int = 0,
                  window=("kaiser", 5.0), padtype: str = "constant",
                  cval=None, *, interleaved: Optional[bool] = None):
    """Polyphase resampling (scipy.signal.resample_poly semantics): the
    signal is upsampled by ``up``, low-pass filtered by a zero-phase FIR
    (designed via firwin unless ``window`` is a precomputed array), and
    downsampled by ``down``.  padtype 'constant' (cval) plus the
    background-subtraction types mean/median/maximum/minimum and the
    pad-mode types symmetric/reflect/edge/wrap."""
    up, down = int(up), int(down)
    if up < 1 or down < 1:
        raise PlanError("up and down must be >= 1")
    if cval is not None and padtype != "constant":
        raise PlanError("cval has no effect unless padtype is 'constant'")
    g = math.gcd(up, down)
    up //= g
    down //= g
    complex_in = np.iscomplexobj(x) or (interleaved is True)
    xv = asinterleaved(x, interleaved if complex_in else False)
    if up == down == 1:
        return xv if complex_in else xv[..., 0]
    nd = xv.ndim - 1
    ax = axis % nd
    n_in = xv.shape[ax]
    n_out = n_in * up // down + bool((n_in * up) % down)
    if isinstance(window, list) or hasattr(window, "ndim"):
        h = np.asarray(window, np.float64)
        if h.ndim != 1:
            raise PlanError("window array must be 1-D")
        h = h.copy()
        half_len = (h.size - 1) // 2
    else:
        # linear-phase low-pass FIR (scipy's design: cutoff 1/max_rate,
        # half length 10*max_rate)
        max_rate = max(up, down)
        half_len = 10 * max_rate
        try:
            from scipy.signal import firwin
        except ImportError:
            raise PlanError(
                "resample_poly window design needs scipy; pass a "
                "precomputed 1-D window array instead") from None
        h = firwin(2 * half_len + 1, 1.0 / max_rate, window=window)
    h = h * up
    n_pre_pad = down - half_len % down
    n_post_pad = 0
    n_pre_remove = (half_len + n_pre_pad) // down
    while _upfirdn_len(h.size + n_pre_pad + n_post_pad, n_in,
                       up, down) < n_out + n_pre_remove:
        n_post_pad += 1
    h = np.concatenate([np.zeros(n_pre_pad), h, np.zeros(n_post_pad)])
    h = h.astype(np.float32)
    bg = None
    kw = {"mode": "constant", "cval": 0}
    stats = {"mean": jnp.mean, "median": jnp.median,
             "minimum": jnp.min, "maximum": jnp.max}
    if padtype in stats:
        bg = stats[padtype](xv, axis=ax, keepdims=True)
        xv = xv - bg
    elif padtype == "constant":
        kw["cval"] = cval if cval is not None else 0
    elif padtype in _UPFIRDN_PAD:
        kw = {"mode": padtype}
    else:
        raise PlanError(
            f"padtype {padtype!r} unsupported; available: constant, "
            f"mean, median, maximum, minimum, "
            f"{', '.join(sorted(_UPFIRDN_PAD))}")
    y = upfirdn(h, xv, up, down, axis=ax, interleaved=True, **kw)
    y = jax.lax.slice_in_dim(y, n_pre_remove, n_pre_remove + n_out,
                             axis=ax)
    if bg is not None:
        y = y + bg
    return y if complex_in else y[..., 0]


def decimate(x, q: int, n: Optional[int] = None, ftype: str = "iir",
             axis: int = -1, zero_phase: bool = True, *,
             interleaved: Optional[bool] = None):
    """Downsample after an anti-aliasing filter
    (scipy.signal.decimate's FIR path: ftype='fir', hamming-window
    firwin design, zero-phase via resample_poly).

    ftype='iir' (scipy's default) is an order-8 Chebyshev RECURSION —
    an inherently sequential op that does not map to the TPU; call with
    ftype='fir' (values then match scipy's FIR path to f32)."""
    q = int(q)
    if q < 1:
        raise PlanError("q must be >= 1")
    if ftype == "iir":
        raise PlanError(
            "decimate ftype='iir' is a sequential IIR recursion (not a "
            "TPU workload); use ftype='fir' for the firwin/upfirdn path")
    if ftype != "fir":
        raise PlanError(f"ftype must be 'fir' (got {ftype!r})")
    if n is None:
        n = 2 * (10 * q)
    try:
        from scipy.signal import firwin
    except ImportError:
        raise PlanError("decimate filter design needs scipy") from None
    b = firwin(n + 1, 1.0 / q, window="hamming")
    complex_in = np.iscomplexobj(x) or (interleaved is True)
    xv = asinterleaved(x, interleaved if complex_in else False)
    nd = xv.ndim - 1
    ax = axis % nd
    if zero_phase:
        y = resample_poly(xv, 1, q, axis=ax, window=b, interleaved=True)
    else:
        n_out = xv.shape[ax] // q + bool(xv.shape[ax] % q)
        y = upfirdn(b, xv, 1, q, axis=ax, interleaved=True)
        y = jax.lax.slice_in_dim(y, 0, n_out, axis=ax)
    return y if complex_in else y[..., 0]


def hilbert(x, axis: int = -1):
    """Analytic signal via the frequency-domain method
    (scipy.signal.hilbert semantics).  Returns interleaved (..., 2):
    real part = x, imaginary part = its Hilbert transform."""
    x = _real_f32(x)
    axes = _axes_list(x.ndim, (axis,), False)
    x, undo = _move_to_trailing(x, axes, comp=False)
    n = x.shape[-1]
    X = fft(x, axis=-1, interleaved=False)      # (..., n, 2)
    h = _hilbert_step(n)
    y = ifft(X * h[:, None], axis=-1)
    return _restore_axes(y, undo, comp=True)


def _hilbert_step(n: int) -> np.ndarray:
    """The frequency-domain analytic-signal weights (1, 2...2, [1])."""
    h = np.zeros(n, np.float32)
    h[0] = 1.0
    if n % 2 == 0:
        h[n // 2] = 1.0
        h[1:n // 2] = 2.0
    else:
        h[1:(n + 1) // 2] = 2.0
    return h


def hilbert2(x, N=None, axes=(-2, -1)):
    """2-D analytic signal (scipy.signal.hilbert2 semantics): the
    "single-orthant" transform — the 2-D FFT weighted per axis by
    (1, 2, ..., 2, 0, ..., 0), doubling bins 1:(n+1)//2 and zeroing the
    rest (unlike the 1-D :func:`hilbert`, an even-n Nyquist bin is
    ZEROED).  ``N`` (int or 2-tuple) crops-or-pads the FFT shape along
    ``axes``; extra dimensions ride as batch.  Returns interleaved
    (..., 2)."""
    x = _real_f32(x)
    if x.ndim < 2:
        raise PlanError("hilbert2 needs an at-least-2-D real array")
    if len(axes) != 2 or (axes[0] % x.ndim) == (axes[1] % x.ndim):
        raise PlanError("axes must be two distinct axes")
    ax = tuple(a % x.ndim for a in axes)
    if N is None:
        s = (x.shape[ax[0]], x.shape[ax[1]])
    elif isinstance(N, int):
        s = (N, N)
    else:
        s = tuple(int(n) for n in N)
        if len(s) != 2:
            raise PlanError("N must be an int or a 2-tuple")
    if any(n < 1 for n in s):
        raise PlanError("N must be positive")
    X = fft2(x, s=s, axes=ax, interleaved=False)
    for a, n in zip(ax, s):
        h = np.zeros(n, np.float32)
        h[0] = 1.0
        h[1:(n + 1) // 2] = 2.0
        shape = [1] * X.ndim
        shape[a] = n
        X = X * h.reshape(shape)
    return ifft2(X, axes=ax)


# ---------------------------------------------------------------- FFTLog

_LN2 = float(np.log(2.0))


def _fht_special():
    try:
        from scipy.special import loggamma, poch
    except ImportError as e:  # pragma: no cover
        raise PlanError("fht/ifht/fhtoffset need scipy (install the "
                        "'signal' extra) for the log-gamma tables") from e
    return loggamma, poch


def _fht_coeff(n: int, dln: float, mu: float, offset: float, bias: float,
               inverse: bool) -> np.ndarray:
    """FFTLog kernel coefficients u_m = (k_c r_c)^{-2iy_m} U_mu(q + 2iy_m)
    with U_mu(x) = 2^x Gamma((mu+1+x)/2) / Gamma((mu+1-x)/2) and
    y_m = pi m / (n dln)  (Hamilton 2000 eq. 16-19; semantics pinned to
    scipy.fft's fhtcoeff incl. the pole and singular-transform fixups)."""
    loggamma, poch = _fht_special()
    lnkr, q = float(offset), float(bias)
    xp_ = (mu + 1 + q) / 2
    xm = (mu + 1 - q) / 2
    y = np.linspace(0.0, np.pi * (n // 2) / (n * dln), n // 2 + 1)
    with np.errstate(invalid="ignore", divide="ignore", over="ignore"):
        lg = loggamma(xp_ + 1j * y) - np.conj(loggamma(xm + 1j * y))
        u = np.exp(lg + q * _LN2 + 2j * (_LN2 - lnkr) * y)
    if n % 2 == 0:
        u.imag[-1] = 0.0
    if not np.isfinite(u[0]):
        # u_0 = 2^q Gamma(xp)/Gamma(xm); poch() covers the gamma poles
        u[0] = 2.0 ** q * poch(xm, xp_ - xm)
    if np.isinf(u[0]) and not inverse:
        import warnings
        warnings.warn("singular transform; consider changing the bias",
                      stacklevel=3)
        u = u.copy()
        u[0] = 0.0
    elif u[0] == 0 and inverse:
        import warnings
        warnings.warn("singular inverse transform; consider changing the "
                      "bias", stacklevel=3)
        u = u.copy()
        u[0] = np.inf
    return u


def _fht_core(a, dln: float, mu: float, offset: float, bias: float,
              inverse: bool):
    from .core.cplx import to_t4, cmul_t4
    a = _real_f32(a)
    n = a.shape[-1]
    dln = float(dln)
    j = np.arange(n, dtype=np.float64)
    j_c = (n - 1) / 2
    if bias != 0:
        # power-law bias of the input sequence (a_q(r) = a(r) (r/r_c)^{-q};
        # the inverse biases by (k/k_c)^{+q} (k_c r_c)^{+q})
        pre = (np.exp(bias * ((j - j_c) * dln + offset)) if inverse
               else np.exp(-bias * (j - j_c) * dln))
        a = a * jnp.asarray(pre.astype(np.float32))
    u = _fht_coeff(n, dln, mu, offset, bias, inverse)
    with np.errstate(invalid="ignore", divide="ignore"):
        mult = (1.0 / np.conj(u)) if inverse else u
    X = rfft(a, axis=-1)                         # (..., n//2+1, 2)
    Y = cmul_t4(X, jnp.asarray(to_t4(mult)))
    y = jnp.flip(irfft(Y, n, axis=-1), axis=-1)  # real (..., n)
    if bias != 0:
        post = (np.exp(bias * (j - j_c) * dln) if inverse
                else np.exp(-bias * ((j - j_c) * dln + offset)))
        y = y * jnp.asarray(post.astype(np.float32))
    return y


def fht(a, dln: float, mu: float, offset: float = 0.0, bias: float = 0.0):
    """Fast Hankel transform of a logarithmically spaced periodic sequence
    over the last axis (FFTLog algorithm; scipy.fft.fht semantics, pinned
    in tests/test_fftapi.py).  Runs as bias-table multiply -> framework
    rfft -> kernel-coefficient complex multiply -> irfft -> flip, all on
    device."""
    return _fht_core(a, dln, mu, offset, bias, inverse=False)


def ifht(A, dln: float, mu: float, offset: float = 0.0, bias: float = 0.0):
    """Inverse fast Hankel transform (scipy.fft.ifht semantics): the
    inverse of :func:`fht`, dividing the spectrum by conj(u)."""
    return _fht_core(A, dln, mu, offset, bias, inverse=True)


def fhtoffset(dln: float, mu: float, initial: float = 0.0,
              bias: float = 0.0) -> float:
    """Optimal low-ringing offset for :func:`fht`
    (scipy.fft.fhtoffset semantics; Hamilton 2000 eq. 20)."""
    loggamma, _ = _fht_special()
    lnkr, q = float(initial), float(bias)
    xp_ = (mu + 1 + q) / 2
    xm = (mu + 1 - q) / 2
    y = np.pi / (2 * float(dln))
    arg = ((_LN2 - lnkr) / float(dln)
           + (loggamma(xp_ + 1j * y).imag + loggamma(xm + 1j * y).imag)
           / np.pi)
    return lnkr + (arg - np.round(arg)) * float(dln)


# ---------------------------------------------------------------- utilities

def fftfreq(n: int, d: float = 1.0):
    return np.fft.fftfreq(n, d)


def rfftfreq(n: int, d: float = 1.0):
    return np.fft.rfftfreq(n, d)


def _shift(x, axes, sign: int, interleaved):
    x = asinterleaved(x, interleaved) if np.iscomplexobj(x) else jnp.asarray(x)
    # same heuristic as asinterleaved: a 1-D length-2 real vector is DATA,
    # not an interleaved scalar
    comp = x.ndim >= 2 and x.shape[-1] == 2 and interleaved is not False
    nd = x.ndim - (1 if comp else 0)
    axes = _axes_list(nd, axes, True)
    for a in axes:
        n = x.shape[a]
        sh = (n // 2) if sign > 0 else -(n // 2)
        x = jnp.roll(x, sh, axis=a)
    return x


def fftshift(x, axes=None, *, interleaved: Optional[bool] = None):
    """Shift the zero-frequency bin to the center (complex axes only —
    the trailing component dim of interleaved arrays is never shifted)."""
    return _shift(x, axes, 1, interleaved)


def ifftshift(x, axes=None, *, interleaved: Optional[bool] = None):
    return _shift(x, axes, -1, interleaved)


def next_fast_len(n: int) -> int:
    """Smallest radix-supported (smooth) length >= n
    (scipy.fft.next_fast_len analog over the framework's radix set)."""
    return factors.next_smooth_at_least(max(int(n), 1))


# ---------------------------------------------------------------------------
# Lomb-Scargle periodogram (unevenly-sampled spectral estimation)
# ---------------------------------------------------------------------------

def lombscargle(x, y, freqs, *, precenter: bool = False,
                normalize=False, weights=None,
                floating_mean: bool = False):
    """Lomb-Scargle periodogram of UNEVENLY sampled data
    (scipy.signal.lombscargle semantics, including the generalized
    weighted / floating-mean form and the three ``normalize`` modes).

    TPU formulation: the (nsamples, nfreqs) trig grids are host f64
    tables (large phases w*t destroy f32 trig), and every reduction over
    samples is a device einsum riding the MXU — the tau rotation reuses
    the same grids through the angle-addition identity instead of a
    second trig evaluation.  ``normalize='amplitude'`` returns the
    best-fit complex amplitudes as an interleaved (nfreqs, 2) array
    (``ascomplex`` for a complex view); other modes return (nfreqs,)
    real power.
    """
    x = np.asarray(x, dtype=np.float64)
    y_in = y
    freqs = np.asarray(freqs, dtype=np.float64)
    if weights is None:
        w_np = np.ones(x.shape, dtype=np.float64)
    else:
        w_np = np.asarray(weights, dtype=np.float64)
    if not (x.ndim == 1 and x.size > 0
            and x.shape == np.shape(y_in) == w_np.shape):
        raise PlanError("x, y, weights must be 1-D arrays of equal "
                        "non-zero length")
    if freqs.ndim != 1 or freqs.size == 0:
        raise PlanError("freqs must be a non-empty 1-D array")
    if not (np.all(w_np >= 0) and w_np.sum() > 0):
        raise PlanError("weights must be non-negative and sum > 0")
    if isinstance(normalize, bool):
        normalize = "normalize" if normalize else "power"
    if normalize not in ("power", "normalize", "amplitude"):
        raise PlanError("normalize must be False/'power', "
                        "True/'normalize', or 'amplitude'")
    w_np = w_np / w_np.sum()

    y = jnp.asarray(np.asarray(y_in), jnp.float32)
    if precenter:
        y = y - jnp.mean(y)
    wj = jnp.asarray(w_np.astype(np.float32))
    if floating_mean:
        # the floating-mean model is shift-invariant in y, so centering
        # by the weighted mean changes nothing mathematically — but it
        # makes Y ~ 0, removing the f32 cancellation in YC - Y*C
        y = y - jnp.sum(wj * y)
    wy = wj * y

    # host f64 trig tables of the phase grid (N, F)
    phase = x[:, None] * freqs[None, :]
    C = jnp.asarray(np.cos(phase).astype(np.float32))
    S = jnp.asarray(np.sin(phase).astype(np.float32))
    hi = jax.lax.Precision.HIGHEST

    def wdot(v, M):
        return jnp.einsum("n,nf->f", v, M, precision=hi)

    Y = jnp.sum(wy)
    CC = wdot(wj, C * C)
    CS = wdot(wj, C * S)
    SS = 1.0 - CC
    if floating_mean:
        Cm = wdot(wj, C)
        Sm = wdot(wj, S)
        CC = CC - Cm * Cm
        SS = SS - Sm * Sm
        CS = CS - Cm * Sm
    tau = 0.5 * jnp.arctan2(2.0 * CS, CC - SS)
    ct, st = jnp.cos(tau), jnp.sin(tau)
    # angle addition: cos(p - tau), sin(p - tau) from the same tables
    Ct = C * ct + S * st
    St = S * ct - C * st
    if floating_mean:
        Cm = wdot(wj, Ct)
        Sm = wdot(wj, St)
        # YC - Y*Cm == Sum wy (Ct - Cm) exactly; the centered form avoids
        # the subtraction of two separately-rounded reductions
        YC = wdot(wy, Ct - Cm)
        YS = wdot(wy, St - Sm)
        # centered second moments Sum w (Ct - Cm)^2: algebraically equal
        # to CC - Cm^2 but free of its f32 cancellation where the
        # variance is small (low-frequency bins)
        CC = wdot(wj, (Ct - Cm) ** 2)
        SS = wdot(wj, (St - Sm) ** 2)
    else:
        YC = wdot(wy, Ct)
        YS = wdot(wy, St)
        CC = wdot(wj, Ct * Ct)
        SS = 1.0 - CC
    eps = jnp.asarray(np.finfo(np.float32).epsneg, jnp.float32)
    CC = jnp.maximum(CC, eps)
    SS = jnp.maximum(SS, eps)
    a = YC / CC
    b = YS / SS
    if normalize == "amplitude":
        # (a + ib) e^(i tau)
        return jnp.stack([a * ct - b * st, a * st + b * ct], -1)
    pgram = 2.0 * (a * YC + b * YS)
    if normalize == "power":
        return pgram * (x.shape[0] / 4.0)
    YY = jnp.sum(wy * y)
    if floating_mean:
        YY = YY - Y * Y
    return pgram * (0.5 / YY)


def czt_points(m: int, w=None, a=1 + 0j):
    """The m points on the spiral z-plane contour a * w^-k that
    :func:`czt` evaluates (scipy.signal.czt_points semantics; default w
    walks the unit circle)."""
    m = int(m)
    if m < 1:
        raise PlanError("Invalid number of CZT data points (m <= 0)")
    k = np.arange(m)
    a = 1.0 * a
    if w is None:
        return a * np.exp(2j * np.pi * k / m)
    return a * (1.0 * w) ** -k


def vectorstrength(events, period):
    """Vector strength of event times against one or more periods
    (scipy.signal.vectorstrength semantics): project each event onto the
    unit circle at angle 2*pi*event/period; the resultant's magnitude is
    the strength, its angle the preferred phase.  Runs as a device
    reduction on the VPU."""
    events = jnp.asarray(events, jnp.float32)
    period_arr = np.atleast_1d(np.asarray(period, dtype=np.float64))
    if events.ndim > 1 or period_arr.ndim > 1:
        raise PlanError("events and period must be one-dimensional")
    if np.any(period_arr <= 0):
        raise PlanError("periods must be positive")
    scalar = np.ndim(period) == 0
    ang = (2 * np.pi) * events[None, :] / jnp.asarray(period_arr,
                                                      jnp.float32)[:, None]
    re = jnp.mean(jnp.cos(ang), axis=-1)
    im = jnp.mean(jnp.sin(ang), axis=-1)
    strength = jnp.sqrt(re * re + im * im)
    phase = jnp.arctan2(im, re)
    if scalar:
        return strength[0], phase[0]
    return strength, phase


def envelope(z, bp_in=(1, None), *, n_out: Optional[int] = None,
             squared: bool = False, residual: Optional[str] = "lowpass",
             axis: int = -1):
    """Bandpass envelope + residual split (scipy.signal.envelope
    semantics, mirrored structurally): real input works on the rfft
    half-spectrum with NO hermitian mirror — in-band bins are doubled
    (DC never), the band is cut out as a contiguous slice (fftshift when
    it straddles 0) and ifft'd at ``n_out`` (scipy's truncate/zero-pad
    resampling), and the residual is what remains after zeroing the band
    ('lowpass' additionally zeroes [bp1, (n+1)//2), which leaves an even
    n's Nyquist bin in the residual — scipy's quirk), rebuilt by irfft
    with the min(n, n_out)/2 bin correction.  Complex input uses the
    full spectrum with crop/split Fourier resampling.

    Runs on the plan-layer FFTs.  Returns the envelope alone for
    ``residual=None``, else the stacked ``(2, ...)`` [envelope,
    residual]; real input gives a real residual, complex input
    interleaved outputs.
    """
    if residual not in ("lowpass", "all", None):
        raise PlanError("residual must be 'lowpass', 'all' or None")
    if np.iscomplexobj(z):
        real_in = False
        x = asinterleaved(z)
        ax = axis if axis >= 0 else x.ndim - 1 + axis
        x = jnp.moveaxis(x, ax, -2)
        n = x.shape[-2]
    else:
        real_in = True
        x = jnp.asarray(z, jnp.float32)
        x = jnp.moveaxis(x, axis, -1)
        n = x.shape[-1]
    bp0 = -(n // 2) if bp_in[0] is None else int(bp_in[0])
    bp1 = (n + 1) // 2 if bp_in[1] is None else int(bp_in[1])
    if not -(n // 2) <= bp0 < bp1 <= (n + 1) // 2:
        raise PlanError(f"bp_in={bp_in!r} invalid for n={n}: need "
                        f"-n//2 <= bp_in[0] < bp_in[1] <= (n+1)//2")
    nout = int(n_out) if n_out is not None else n
    fak = nout / n
    straddle = bp0 <= 0 < bp1

    if real_in:
        Xh = rfft(x, axis=-1)                       # (..., n//2+1, 2)
        Z = jnp.concatenate(
            [Xh, jnp.zeros(Xh.shape[:-2] + (n - Xh.shape[-2], 2),
                           Xh.dtype)], axis=-2)     # upper half zero
        w2 = np.ones(n, np.float32)
        if bp0 > 0:
            w2[bp0:bp1] = 2.0
        elif bp1 > 0:
            w2[1:bp1] = 2.0
        Z = Z * w2[:, None]
    else:
        Z = fft(x, axis=-1)                         # logical last axis

    # ---- envelope: contiguous band slice -> ifft at n_out
    if not straddle:
        band = Z[..., slice(bp0, bp1), :]           # python slicing
    else:
        Zs = jnp.roll(Z, n // 2, axis=-2)           # fftshift
        band = Zs[..., bp0 + n // 2:bp1 + n // 2, :]
    blen = band.shape[-2]
    if blen < nout:
        band = jnp.concatenate(
            [band, jnp.zeros(band.shape[:-2] + (nout - blen, 2),
                             band.dtype)], axis=-2)
    elif blen > nout:
        band = band[..., :nout, :]
    z_bb = ifft(band, axis=-1) * fak
    env = z_bb[..., 0] ** 2 + z_bb[..., 1] ** 2
    if not squared:
        env = jnp.sqrt(env)
    if residual is None:
        return jnp.moveaxis(env, -1, axis)

    # ---- residual: zero the band, then the lowpass cut
    keep = np.ones(n, np.float32)
    idx = np.arange(n)
    if not straddle:
        keep[idx[slice(bp0, bp1)]] = 0.0
    else:
        keep[:bp1] = 0.0
        keep[idx[slice(bp0, None)]] = 0.0
    if residual == "lowpass":
        if bp1 > 0:
            keep[bp1:(n + 1) // 2] = 0.0
        else:
            keep[idx[slice(bp0, None)]] = 0.0
            keep[0:(n + 1) // 2] = 0.0
    Zr = Z * keep[:, None]
    if real_in:
        m = min(n, nout)
        if nout != n and m % 2 == 0:
            corr = np.ones(n, np.float32)
            corr[m // 2] = 2.0 if nout < n else 0.5
            Zr = Zr * corr[:, None]
        half = nout // 2 + 1
        if half <= n:
            Zh = Zr[..., :half, :]
        else:
            Zh = jnp.concatenate(
                [Zr, jnp.zeros(Zr.shape[:-2] + (half - n, 2), Zr.dtype)],
                axis=-2)
        res = irfft(Zh, n=nout, axis=-1) * fak
        out = jnp.stack([env, res], axis=0)
        return jnp.moveaxis(out, -1, axis if axis < 0 else axis + 1)
    # complex residual: crop/split Fourier resampling (resample
    # domain='freq' semantics)
    if nout != n:
        bins = (np.arange(n) + n // 2) % n - n // 2
        wts = np.ones(n, np.float32)
        keepable = (bins >= -(nout // 2)) & (bins <= nout // 2)
        wts[~keepable] = 0.0
        if nout > n and n % 2 == 0:
            wts[bins == -(n // 2)] = 0.5
        Zr2 = Zr * jnp.asarray(wts, jnp.float32)[:, None]
        dest = np.where(keepable, bins % nout, 0)
        placed = jnp.zeros(Zr2.shape[:-2] + (nout, 2), Zr2.dtype)
        placed = placed.at[..., dest, :].add(
            Zr2 * jnp.asarray(keepable, jnp.float32)[:, None])
        if nout > n and n % 2 == 0:
            placed = placed.at[..., n // 2, :].add(
                Zr2[..., np.flatnonzero(bins == -(n // 2))[0], :])
        Zr = placed * fak
        res_c = ifft(Zr, axis=-1)
    else:
        res_c = ifft(Zr, axis=-1)
    out = jnp.stack([jnp.stack([env, jnp.zeros_like(env)], -1), res_c],
                    axis=0)
    return jnp.moveaxis(out, -2, axis - 1 if axis < 0 else axis + 1)


def _check_window_f64(window, nperseg: int) -> np.ndarray:
    """f64 window for the COLA/NOLA checks — the 1e-10 tolerances are
    finer than the f32 device window tables."""
    if isinstance(window, (str, tuple)):
        from .windows import get_window as _gw
        return np.asarray(_gw(window, nperseg), dtype=np.float64)
    win = np.asarray(window, dtype=np.float64)
    if win.ndim != 1 or win.size != nperseg:
        raise PlanError("window must be 1-D with length nperseg")
    return win


def check_COLA(window, nperseg: int, noverlap: int,
               tol: float = 1e-10) -> bool:
    """Constant-overlap-add check (scipy.signal.check_COLA semantics):
    the hop-shifted window copies must sum to a constant."""
    nperseg = int(nperseg)
    noverlap = int(noverlap)
    if nperseg < 1:
        raise PlanError("nperseg must be a positive integer")
    if not 0 <= noverlap < nperseg:
        raise PlanError("noverlap must be less than nperseg.")
    win = _check_window_f64(window, nperseg)
    step = nperseg - noverlap
    binsums = np.sum([win[ii * step:(ii + 1) * step]
                      for ii in range(nperseg // step)], axis=0)
    if nperseg % step != 0:
        binsums[:nperseg % step] += win[-(nperseg % step):]
    return bool(np.max(np.abs(binsums - np.median(binsums))) < tol)


def check_NOLA(window, nperseg: int, noverlap: int,
               tol: float = 1e-10) -> bool:
    """Nonzero-overlap-add check (scipy.signal.check_NOLA semantics):
    the hop-aliased win^2 profile must stay above tol everywhere."""
    nperseg = int(nperseg)
    noverlap = int(noverlap)
    if nperseg < 1:
        raise PlanError("nperseg must be a positive integer")
    if not 0 <= noverlap < nperseg:
        raise PlanError("noverlap must be less than nperseg")
    win = _check_window_f64(window, nperseg)
    step = nperseg - noverlap
    w2 = win * win
    binsums = np.sum([w2[ii * step:(ii + 1) * step]
                      for ii in range(nperseg // step)], axis=0)
    if nperseg % step != 0:
        binsums[:nperseg % step] += w2[-(nperseg % step):]
    return bool(np.min(binsums) > tol)


def choose_conv_method(in1, in2, mode: str = "full",
                       measure: bool = False):
    """Pick 'fft' or 'direct' like scipy.signal.choose_conv_method.

    On this framework every convolution executes through the FFT plan
    layer regardless; this exists so ported code keeps working.  The
    big-O crossover (direct n*m flops vs (n+m) log(n+m)) approximates
    scipy's fitted constants; exact-integer inputs always pick 'direct'
    like scipy (FFT rounding would break exactness).  ``measure=True``
    times both scipy paths on the HOST oracle (the device has no direct
    path to race)."""
    x1 = np.asarray(in1)
    x2 = np.asarray(in2)
    if measure:
        import timeit
        from scipy.signal import convolve as _sconv
        times = {}
        for method in ("fft", "direct"):
            times[method] = timeit.timeit(
                lambda m=method: _sconv(x1, x2, mode=mode, method=m),
                number=1)
        chosen = "fft" if times["fft"] < times["direct"] else "direct"
        return chosen, times
    if x1.dtype.kind in "ui" and x2.dtype.kind in "ui" or \
            x1.dtype.kind == "b" or x2.dtype.kind == "b":
        return "direct"
    n1, n2 = x1.size, x2.size
    if n1 == 0 or n2 == 0:
        return "direct"
    big, small = max(n1, n2), min(n1, n2)
    direct_cost = big * small
    L = n1 + n2
    fft_cost = 6.0 * L * np.log2(max(L, 2))
    return "fft" if direct_cost > fft_cost else "direct"


class CZT:
    """Precomputed chirp z-transform operator
    (scipy.signal.CZT semantics): ``CZT(n, m, w, a)(x)`` evaluates the
    length-n transform at m spiral points; plans build once per input
    shape through the framework cache."""

    def __init__(self, n: int, m: Optional[int] = None, w=None,
                 a=1 + 0j):
        self.n = int(n)
        if self.n < 1:
            raise PlanError("Invalid number of CZT data points (n <= 0)")
        self.m = self.n if m is None else int(m)
        if self.m < 1:
            raise PlanError("Invalid number of CZT output points (m <= 0)")
        self.w = w
        self.a = a

    def __call__(self, x, *, axis: int = -1):
        return czt(x, self.m, self.w, self.a, axis=axis)

    def points(self) -> np.ndarray:
        """The spiral evaluation points (scipy.signal.CZT.points)."""
        return czt_points(self.m, self.w, self.a)


class ZoomFFT(CZT):
    """Precomputed zoom-FFT operator (scipy.signal.ZoomFFT semantics):
    band [f1, f2] of the length-n spectrum at m points."""

    def __init__(self, n: int, fn, m: Optional[int] = None, *,
                 fs: float = 2, endpoint: bool = False):
        n = int(n)
        fn_arr = np.atleast_1d(np.asarray(fn, dtype=np.float64))
        if fn_arr.size == 2:
            f1, f2 = float(fn_arr[0]), float(fn_arr[1])
        elif fn_arr.size == 1:
            f1, f2 = 0.0, float(fn_arr[0])
        else:
            raise PlanError("fn must be a scalar or a length-2 sequence")
        self.f1, self.f2, self.fs = f1, f2, float(fs)
        m = n if m is None else int(m)
        scale = ((f2 - f1) * m) / (self.fs * (m - 1)) if endpoint \
            else (f2 - f1) / self.fs
        a = np.exp(2j * np.pi * f1 / self.fs)
        wp = np.exp(-2j * np.pi * scale / m)
        super().__init__(n, m=m, w=wp, a=a)


# the modern STFT class lives in shorttime.py (late import: it builds on
# this module's framing/transform machinery)
from .shorttime import ShortTimeFFT, closest_STFT_dual_window  # noqa: E402


def prev_fast_len(n: int, real: bool = False) -> int:
    """Largest radix-supported (smooth) length <= n
    (scipy.fft.prev_fast_len analog over the framework's radix set —
    like :func:`next_fast_len`, sizes are plan-fast lengths here, which
    include 13; ``real`` is accepted for signature parity, the r2c path
    supports the same set)."""
    n = int(n)
    if n < 1:
        raise PlanError("n must be a positive integer")
    m = n
    while m > 1 and not factors.is_smooth(m):
        m -= 1
    return m


def hfft2(x, s=None, axes=(-2, -1), norm=None, *,
          interleaved: Optional[bool] = None):
    """2-D FFT of a Hermitian-symmetric (real-spectrum) signal
    (scipy.fft.hfft2 semantics).  Returns a real array."""
    return hfftn(x, s=s, axes=axes, norm=norm, interleaved=interleaved)


def ihfft2(x, s=None, axes=(-2, -1), norm=None):
    """Inverse of :func:`hfft2` (scipy.fft.ihfft2)."""
    return ihfftn(x, s=s, axes=axes, norm=norm)


def hfftn(x, s=None, axes=None, norm=None, *,
          interleaved: Optional[bool] = None):
    """N-D Hermitian FFT: the real spectrum of a Hermitian-symmetric
    complex signal (scipy.fft.hfftn semantics) — irfftn of the
    conjugate, scaled by the norm-mode factor."""
    z = asinterleaved(x, interleaved)
    # scipy rejects duplicate axes for the hermitian family (irfftn
    # underneath would follow numpy's transform-per-occurrence instead);
    # this also validates the range and the s-vs-rank length
    ax_list = _axes_list(z.ndim - 1, axes, True, s=s)
    zc = z.at[..., 1].multiply(-1.0) if hasattr(z, "at") \
        else jnp.concatenate([z[..., :1], -z[..., 1:]], axis=-1)
    y = irfftn(zc, s=s, axes=ax_list, norm="backward")
    # total length along the transformed axes of the OUTPUT
    N = 1
    for a in ax_list:
        N *= y.shape[a]
    if norm in (None, "backward"):
        return y * np.float32(N)
    if norm == "ortho":
        return y * np.float32(math.sqrt(N))
    if norm == "forward":
        return y
    raise PlanError(f"invalid norm {norm!r}")


def ihfftn(x, s=None, axes=None, norm=None):
    """Inverse N-D Hermitian FFT (scipy.fft.ihfftn semantics):
    conj(rfftn(x)) with the inverse norm factor.  Returns interleaved
    (..., 2)."""
    xr = jnp.asarray(x, jnp.float32)
    # scipy rejects duplicate axes here (rfftn underneath follows numpy);
    # resolve -1 entries in s against the input BEFORE the norm divisor
    ax_list = _axes_list(xr.ndim, axes, True, s=s)
    if s is not None:
        s = _resolve_s(xr, tuple(s), ax_list)
    Y = rfftn(xr, s=s, axes=ax_list, norm="backward")
    N = 1
    for pos, a in enumerate(ax_list):
        N *= int(s[pos]) if s is not None else xr.shape[a]
    if norm in (None, "backward"):
        fac = 1.0 / N
    elif norm == "ortho":
        fac = 1.0 / math.sqrt(N)
    elif norm == "forward":
        fac = 1.0
    else:
        raise PlanError(f"invalid norm {norm!r}")
    Yc = Y.at[..., 1].multiply(-1.0)
    return Yc * np.float32(fac)


# ------------------------------------------------- scipy.fft compat shims

class _WorkersCtx:
    def __init__(self, n):
        self._n = n

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


def set_workers(workers: int):
    """scipy.fft.set_workers-compatible context manager.  The XLA plan
    layer owns its own parallelism (one device program), so the worker
    count is accepted and ignored."""
    return _WorkersCtx(int(workers))


def get_workers() -> int:
    """scipy.fft.get_workers analog: the plan layer presents a single
    logical execution stream."""
    return 1


def set_backend(backend, coerce: bool = False, only: bool = False):
    """scipy.fft.set_backend-compatible no-op context manager: this
    framework has exactly one FFT backend (the TPU plan layer)."""
    return _WorkersCtx(0)


def skip_backend(backend):
    """scipy.fft.skip_backend-compatible no-op context manager."""
    return _WorkersCtx(0)


def set_global_backend(backend, coerce=False, only=False,
                       try_last=False):
    """scipy.fft.set_global_backend analog — accepted and ignored (one
    backend exists)."""


def register_backend(backend):
    """scipy.fft.register_backend analog — accepted and ignored."""


# ------------------------- oracle signature compatibility (kwargs shims)

def _oracle_kwargs(fn, npos: int):
    """Widen a transform's signature with the oracle libraries' control
    kwargs so mechanically migrated scipy.fft / numpy.fft call sites run
    unmodified: ``overwrite_x`` and ``workers`` are accepted and ignored
    (the plan layer never mutates inputs and XLA owns threading — same
    policy as the uarray backend, scipy_backend.py) — positionally too,
    in scipy.fft's layout, where they sit right after the ``npos``
    leading params (x/n-or-s/axis-or-axes/norm, plus type for the trig
    family).  A non-None ``plan`` raises scipy.fft's own
    NotImplementedError; a non-None ``out`` raises NotImplementedError
    (device outputs cannot alias a caller buffer; numpy.fft's out=
    contract cannot be honored silently)."""
    import functools

    @functools.wraps(fn)
    def wrapper(*args, overwrite_x: bool = False, workers=None,
                plan=None, out=None, **kwargs):
        if len(args) > npos:
            extra = args[npos:]
            if len(extra) > 2:
                raise TypeError(
                    f"{fn.__name__}() takes at most {npos + 2} "
                    f"positional arguments but {len(args)} were given")
            overwrite_x = extra[0]          # scipy.fft positional layout
            if len(extra) == 2:
                workers = extra[1]
            args = args[:npos]
        if plan is not None:
            raise NotImplementedError(
                "Passing a precomputed plan is not yet supported by "
                "scipy.fft functions")
        if out is not None:
            raise NotImplementedError(
                "out= is not supported: transform outputs are device "
                "arrays and cannot alias a caller-provided buffer")
        del overwrite_x, workers
        return fn(*args, **kwargs)

    return wrapper


for _name in ("fft", "ifft", "fft2", "ifft2", "fftn", "ifftn",
              "rfft", "irfft", "rfft2", "irfft2", "rfftn", "irfftn",
              "hfft", "ihfft", "hfft2", "ihfft2", "hfftn", "ihfftn"):
    globals()[_name] = _oracle_kwargs(globals()[_name], npos=4)
for _name in ("dct", "idct", "dst", "idst",
              "dctn", "idctn", "dstn", "idstn"):
    globals()[_name] = _oracle_kwargs(globals()[_name], npos=5)
del _name
