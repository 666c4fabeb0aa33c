"""scipy.ndimage Fourier-filter facade (webgpufft_tpu.ndimage).

Oracle is scipy.ndimage itself — every filter/parameter combination is
pinned against the upstream call on the same data.
"""

import numpy as np
import pytest

import scipy.ndimage as ndi

from webgpufft_tpu import ndimage as N
from webgpufft_tpu import PlanError
from webgpufft_tpu.fftapi import ascomplex


def _close(a, b, tol=3e-5, label=""):
    a = np.asarray(a)
    b = np.asarray(b)
    if np.iscomplexobj(b) and not np.iscomplexobj(a):
        a = ascomplex(a)
    assert a.shape == b.shape, (label, a.shape, b.shape)
    err = np.max(np.abs(a - b)) / max(np.max(np.abs(b)), 1e-12)
    assert err < tol, (label, err)


@pytest.fixture()
def zc(rng):
    return rng.standard_normal((8, 10)) + 1j * rng.standard_normal((8, 10))


@pytest.mark.parametrize("sigma", [1.5, (1.0, 2.5), 0.0])
def test_fourier_gaussian(zc, sigma):
    _close(N.fourier_gaussian(zc, sigma), ndi.fourier_gaussian(zc, sigma),
           label=f"gauss {sigma}")


@pytest.mark.parametrize("size", [3, (4, 2.5)])
def test_fourier_uniform(zc, size):
    _close(N.fourier_uniform(zc, size), ndi.fourier_uniform(zc, size),
           label=f"unif {size}")


@pytest.mark.parametrize("shift", [1.5, (2.0, -3.5)])
def test_fourier_shift(zc, shift):
    _close(N.fourier_shift(zc, shift), ndi.fourier_shift(zc, shift),
           label=f"shift {shift}")


def test_fourier_ellipsoid_ranks(rng):
    x1 = rng.standard_normal(16) + 1j * rng.standard_normal(16)
    _close(N.fourier_ellipsoid(x1, 5), ndi.fourier_ellipsoid(x1, 5),
           label="ellip r1")
    x2 = rng.standard_normal((8, 10)) + 1j * rng.standard_normal((8, 10))
    _close(N.fourier_ellipsoid(x2, 4), ndi.fourier_ellipsoid(x2, 4),
           label="ellip r2")
    x3 = rng.standard_normal((6, 8, 10)) + 1j * rng.standard_normal((6, 8, 10))
    _close(N.fourier_ellipsoid(x3, (3, 4, 5)),
           ndi.fourier_ellipsoid(x3, (3, 4, 5)), label="ellip r3")
    x4 = rng.standard_normal((2, 3, 4, 5)) + 0j
    with pytest.raises(PlanError):
        N.fourier_ellipsoid(x4, 2)


@pytest.mark.parametrize("axis", [-1, 0])
def test_rfft_domain_n(rng, axis):
    """n >= 0: the input along `axis` comes from an rfft of length n."""
    xr = rng.standard_normal((8, 6))
    X = np.fft.rfft(xr, axis=axis)
    n = xr.shape[axis]
    _close(N.fourier_gaussian(X, (1.0, 2.0), n=n, axis=axis),
           ndi.fourier_gaussian(X, (1.0, 2.0), n=n, axis=axis),
           label=f"rfft gauss ax{axis}")
    _close(N.fourier_shift(X, (1.5, -0.5), n=n, axis=axis),
           ndi.fourier_shift(X, (1.5, -0.5), n=n, axis=axis),
           label=f"rfft shift ax{axis}")
    _close(N.fourier_uniform(X, 3, n=n, axis=axis),
           ndi.fourier_uniform(X, 3, n=n, axis=axis),
           label=f"rfft unif ax{axis}")


def test_real_input_stays_real(rng):
    """Real-valued filters on a real array return a real array (scipy
    returns float for float input); fourier_shift widens to complex."""
    xr = rng.standard_normal((8, 10))
    got = N.fourier_gaussian(xr, 1.0)
    assert not (got.ndim == 3)  # real out, no component dim
    _close(got, ndi.fourier_gaussian(xr, 1.0), label="real gauss")
    got_s = np.asarray(N.fourier_shift(xr, 1.0))
    assert got_s.shape == (8, 10, 2)
    _close(got_s, ndi.fourier_shift(xr, 1.0), label="real shift")


def test_interleaved_roundtrip(zc):
    """Interleaved input -> interleaved output, matching the complex path."""
    xi = np.stack([zc.real, zc.imag], -1).astype(np.float32)
    _close(N.fourier_gaussian(xi, 1.2), ndi.fourier_gaussian(zc, 1.2),
           label="interleaved gauss")


def test_shift_then_ifft_shifts_signal(rng):
    """End-to-end: fft -> fourier_shift -> ifft performs a circular shift."""
    from webgpufft_tpu import fftapi as F
    x = rng.standard_normal(32)
    X = F.fft(x)
    y = F.ifft(N.fourier_shift(X, 5))
    _close(np.asarray(y)[..., 0], np.roll(x, 5), label="roll")


def test_param_validation(zc):
    with pytest.raises(PlanError):
        N.fourier_gaussian(zc, (1.0, 2.0, 3.0))
    with pytest.raises(PlanError):
        N.fourier_shift(zc, 1.0, axis=5)
