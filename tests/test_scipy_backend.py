"""scipy.fft uarray backend (webgpufft_tpu/scipy_backend.py).

Oracle is scipy.fft itself: inside ``scipy.fft.set_backend(ours)`` every
multimethod must dispatch to the plan layer and agree with scipy's own
result; anything we decline must fall back to scipy transparently.
"""

import numpy as np
import pytest
import scipy.fft as sf

import webgpufft_tpu as W


@pytest.fixture(scope="module")
def backend():
    return W.scipy_fft_backend()


def _dispatched(y):
    """Our backend marks its work by the f32-precision dtypes."""
    return y.dtype in (np.complex64, np.float32)


# every scipy.fft uarray multimethod, with representative args
_COMPLEX_IN = {"ifft", "ifft2", "ifftn", "irfft", "irfft2", "irfftn",
               "hfft", "hfft2", "hfftn"}
_ND = {"fft2", "ifft2", "fftn", "ifftn", "rfft2", "irfft2", "rfftn",
       "irfftn", "hfft2", "ihfft2", "hfftn", "ihfftn",
       "dctn", "idctn", "dstn", "idstn"}
_ALL_MULTIMETHODS = [
    "fft", "ifft", "fft2", "ifft2", "fftn", "ifftn",
    "rfft", "irfft", "rfft2", "irfft2", "rfftn", "irfftn",
    "hfft", "ihfft", "hfft2", "ihfft2", "hfftn", "ihfftn",
    "dct", "idct", "dst", "idst", "dctn", "idctn", "dstn", "idstn",
    "fht", "ifht",
]


@pytest.mark.parametrize("name", _ALL_MULTIMETHODS)
def test_every_multimethod_dispatches_and_matches(backend, name, rng):
    if name in ("fht", "ifht"):
        x = rng.standard_normal(32)
        args = (x, 0.05, 1.0)
    else:
        shape = (4, 8, 6) if name in _ND else (3, 16)
        x = rng.standard_normal(shape)
        if name in _COMPLEX_IN:
            x = x + 1j * rng.standard_normal(shape)
        args = (x,)
    want = getattr(sf, name)(*args)
    with sf.set_backend(backend):
        got = getattr(sf, name)(*args)
    assert _dispatched(got), f"{name} did not dispatch to our backend"
    err = np.max(np.abs(got - want)) / max(np.max(np.abs(want)), 1e-12)
    assert err < 3e-5, (name, err)


def test_scipy_positional_calling_convention(backend, rng):
    """scipy's full positional form incl. overwrite_x / workers slots."""
    z = rng.standard_normal(24) + 1j * rng.standard_normal(24)
    want = sf.fft(z, 16, -1, "ortho")
    with sf.set_backend(backend):
        got = sf.fft(z, 16, -1, "ortho", True, 4)   # overwrite_x, workers
    assert got.dtype == np.complex64
    assert np.allclose(got, want, atol=1e-4)


def test_trig_kwargs_roundtrip(backend, rng):
    x = rng.standard_normal(15)
    for norm in (None, "forward", "ortho"):
        for o in (True, False, None):
            want = sf.idct(x, type=3, norm=norm, orthogonalize=o)
            with sf.set_backend(backend):
                got = sf.idct(x, type=3, norm=norm, orthogonalize=o)
            assert _dispatched(got)
            assert np.allclose(got, want, atol=1e-4), (norm, o)


def test_foreign_plan_falls_back(backend, rng):
    """A precomputed foreign ``plan`` is declined at the uarray level
    (scipy's own pocketfft also refuses plans, so dispatch surfaces
    scipy's NotImplementedError — the declining is ours to get right)."""
    z = rng.standard_normal(8) + 0j
    r = backend.__ua_function__(sf.fft, (z,), {"plan": object()})
    assert r is NotImplemented
    with sf.set_backend(backend):
        with pytest.raises(NotImplementedError):
            sf.fft(z, plan=object())


def test_duplicate_axes_keep_scipy_semantics(backend, rng):
    """The facade follows numpy for repeated axes; through scipy's
    dispatch the backend declines them so scipy's own error surfaces."""
    x = rng.standard_normal((4, 6))
    with sf.set_backend(backend):
        with pytest.raises(ValueError):
            sf.fftn(x, axes=(1, 1))
        # mixed-sign duplicates must be caught too (normalize before
        # the set comparison): (1, -1) on a 2-D input is the same axis
        with pytest.raises(ValueError):
            sf.fftn(x, axes=(1, -1))
        # ...while distinct mixed-sign axes still dispatch to the facade
        y = sf.fftn(x, axes=(0, -1))
        np.testing.assert_allclose(y, np.fft.fftn(x, axes=(0, 1)),
                                   atol=1e-4)


def test_planerror_degrades_to_notimplemented(backend):
    """A facade PlanError must surface as uarray NotImplemented (fallback),
    never as an exception through scipy's dispatch."""
    r = backend.__ua_function__(sf.dct, (np.zeros(4), 7), {})
    assert r is NotImplemented


def test_coerce_and_only_modes(backend, rng):
    x = rng.standard_normal(20)
    with sf.set_backend(backend, coerce=True):
        y = sf.irfft(sf.rfft(x))
    assert np.allclose(y, x, atol=1e-4)
    with sf.set_backend(backend, only=True):
        y2 = sf.dstn(rng.standard_normal((4, 6)))
    assert _dispatched(y2)


def test_jax_flavor_returns_device_arrays(rng):
    import jax
    b = W.scipy_fft_backend(as_numpy=False)
    z = rng.standard_normal(16) + 1j * rng.standard_normal(16)
    with sf.set_backend(b):
        y = sf.fft(z)
    # facade-native output: device array, interleaved (..., 2) f32
    assert isinstance(y, jax.Array) and y.shape == (16, 2)
    got = np.asarray(y)[..., 0] + 1j * np.asarray(y)[..., 1]
    assert np.allclose(got, np.fft.fft(z), atol=1e-4)
    # the two flavors are distinct cached singletons
    assert W.scipy_fft_backend() is W.scipy_fft_backend(True)
    assert W.scipy_fft_backend(False) is b


def test_backend_accelerates_scipy_signal(backend, rng):
    """scipy.signal routes its internal FFTs through scipy.fft's dispatch,
    so installing the backend accelerates unmodified scipy.signal code."""
    import scipy.signal as ss
    x = rng.standard_normal(2048)
    k = np.ones(32) / 32
    want_f, want_p = ss.welch(x, nperseg=256)
    want_c = ss.fftconvolve(x, k)
    with sf.set_backend(backend):
        f, p = ss.welch(x, nperseg=256)
        c = ss.fftconvolve(x, k)
    assert c.dtype == np.float32          # proof our backend did the FFTs
    assert np.allclose(f, want_f)
    assert np.max(np.abs(p - want_p)) / np.max(np.abs(want_p)) < 1e-5
    assert np.max(np.abs(c - want_c)) / np.max(np.abs(want_c)) < 1e-5


def test_global_install_uninstall(rng):
    z = rng.standard_normal(12) + 1j * rng.standard_normal(12)
    try:
        W.install_scipy_fft_backend()
        assert sf.fft(z).dtype == np.complex64
    finally:
        W.uninstall_scipy_fft_backend()
    assert sf.fft(z).dtype == np.complex128
