"""Surface-parity meta-tests: every PUBLIC name of the installed
numpy.fft / scipy.fft / scipy.signal has a framework counterpart, so the
parity claims in docs/PARITY.md are asserted against the live oracle
libraries rather than a hand-maintained list (and break loudly if a
scipy upgrade adds names)."""

import types

import numpy.fft as nf
import pytest
import scipy.fft as sf
import scipy.signal as ss

import webgpufft_tpu as W
import webgpufft_tpu.fftapi as F
import webgpufft_tpu.shorttime as _shorttime

# scipy's bundled test runner is not a signal-processing API
_NON_API = {"test"}


def _public(mod):
    return [n for n in dir(mod) if not n.startswith("_")
            and n not in _NON_API
            and not isinstance(getattr(mod, n), types.ModuleType)]


@pytest.mark.parametrize("oracle", [nf, sf], ids=["numpy.fft", "scipy.fft"])
def test_fft_namespaces_complete(oracle):
    missing = [n for n in _public(oracle) if not hasattr(F, n)]
    assert not missing, f"fftapi lacks {missing}"


def test_scipy_signal_surface_complete():
    mods = [W, W.fftapi, W.filtering, W.iirdesign, W.ltisys, W.peaks,
            W.splines, W.waveforms, W.windows, _shorttime]
    missing = [n for n in _public(ss)
               if not any(hasattr(m, n) for m in mods)]
    assert not missing, f"scipy.signal parity gap: {missing}"


def test_pyfftw_interfaces_cover_their_namespaces():
    from webgpufft_tpu import pyfftw as pf

    for ns, names in ((pf.interfaces.numpy_fft, pf._NUMPY_FFT_NAMES),
                      (pf.interfaces.scipy_fft, pf._SCIPY_FFT_NAMES)):
        missing = [n for n in names if not hasattr(ns, n)]
        assert not missing, missing


def test_oracle_control_kwargs_accepted():
    """Mechanically migrated scipy.fft / numpy.fft call sites pass
    overwrite_x/workers (ignored) and plan/out (scipy's own
    NotImplementedError; out cannot alias a device buffer) — fftapi's
    _oracle_kwargs shim, applied to every transform family."""
    import numpy as np

    x = np.arange(8.0)
    for fn, args in ((F.fft, ()), (F.rfft, ()), (F.hfft, ()),
                     (F.dct, ()), (F.dstn, ()), (F.irfftn, ())):
        arg = x if fn is not F.irfftn else np.ones((5, 2))
        fn(arg, *args, overwrite_x=True, workers=4)   # accepted, ignored
    with pytest.raises(NotImplementedError, match="precomputed plan"):
        F.fft(x, plan=object())
    with pytest.raises(NotImplementedError, match="out="):
        F.ifft(x, out=np.zeros(8, complex))
    # results are unchanged by the ignored kwargs
    a = np.asarray(F.fft(x, workers=2))
    b = np.asarray(F.fft(x))
    np.testing.assert_array_equal(a, b)
    # scipy.fft also allows overwrite_x/workers POSITIONALLY
    np.testing.assert_array_equal(
        np.asarray(F.fft(x, None, -1, None, True, 4)), b)
    c = np.asarray(F.dct(x, 2, None, -1, None, True, 4))
    np.testing.assert_array_equal(c, np.asarray(F.dct(x)))
    with pytest.raises(TypeError, match="positional"):
        F.fft(x, None, -1, None, True, 4, "extra")
