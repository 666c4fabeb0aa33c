"""scipy.signal filtering facade (webgpufft_tpu.filtering).

Oracle is scipy.signal itself: design tables must match to f64 rounding,
device filtering to f32 precision.
"""

import numpy as np
import pytest

import scipy.signal as ss

from webgpufft_tpu import filtering as FL
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


# ------------------------------------------------------------- FIR design

class TestFirwin:
    @pytest.mark.parametrize("numtaps,cutoff,kw", [
        (31, 0.3, {}),
        (30, 0.3, {}),
        (31, [0.2, 0.5], {"pass_zero": False}),
        (31, [0.1, 0.3, 0.6], {"pass_zero": True}),
        (31, 0.4, {"window": "blackman"}),
        (31, 0.4, {"scale": False}),
        (64, 1000.0, {"fs": 8000.0}),
        (29, 0.35, {"width": 0.08}),
        (31, 0.3, {"pass_zero": "highpass"}),
        (32, [0.2, 0.6], {"pass_zero": "bandpass"}),
    ])
    def test_matches_scipy(self, numtaps, cutoff, kw):
        got = FL.firwin(numtaps, cutoff, **kw)
        want = ss.firwin(numtaps, cutoff, **kw)
        assert np.allclose(got, want, atol=1e-12), (numtaps, cutoff, kw)

    def test_validation(self):
        with pytest.raises(PlanError):
            FL.firwin(30, 0.3, pass_zero=False)  # even numtaps pass nyq
        with pytest.raises(PlanError):
            FL.firwin(31, 1.5)
        with pytest.raises(PlanError):
            FL.firwin(31, [0.5, 0.2])

    def test_kaiser_helpers(self):
        assert np.isclose(FL.kaiser_beta(65.0), ss.kaiser_beta(65.0))
        assert np.isclose(FL.kaiser_beta(30.0), ss.kaiser_beta(30.0))
        assert np.isclose(FL.kaiser_atten(81, 0.04), ss.kaiser_atten(81, 0.04))


class TestFirwin2:
    @pytest.mark.parametrize("numtaps,freq,gain,kw", [
        (41, [0.0, 0.5, 1.0], [1.0, 1.0, 0.0], {}),
        (40, [0.0, 0.5, 1.0], [1.0, 1.0, 0.0], {}),
        (41, [0.0, 0.3, 0.3, 1.0], [1.0, 1.0, 0.0, 0.0], {}),
        (41, [0.0, 0.5, 1.0], [0.0, 1.0, 0.0], {"antisymmetric": True}),
        (40, [0.0, 0.5, 1.0], [0.0, 1.0, 1.0], {"antisymmetric": True}),
        (33, [0.0, 1000.0, 4000.0], [1.0, 0.5, 0.0], {"fs": 8000.0}),
    ])
    def test_matches_scipy(self, numtaps, freq, gain, kw):
        got = FL.firwin2(numtaps, freq, gain, **kw)
        want = ss.firwin2(numtaps, freq, gain, **kw)
        assert np.allclose(got, want, atol=1e-10), (numtaps, kw)

    def test_validation(self):
        with pytest.raises(PlanError):
            FL.firwin2(40, [0.0, 0.5, 1.0], [1.0, 1.0, 1.0])  # type II nyq
        with pytest.raises(PlanError):
            FL.firwin2(41, [0.0, 0.3, 0.3, 0.3, 1.0], [1, 1, 0.5, 0, 0])


# ------------------------------------------------------- frequency response

class TestFreqz:
    def test_fir_int_worN(self):
        b = ss.firwin(31, 0.4)
        for kw in [{}, {"whole": True}, {"worN": 256},
                   {"worN": 128, "include_nyquist": True},
                   {"fs": 100.0, "worN": 64}]:
            w0, h0 = ss.freqz(b, 1, **kw)
            w1, h1 = FL.freqz(b, 1, **kw)
            assert np.allclose(w0, w1, atol=1e-9), kw
            _close(h1, h0, label=f"freqz {kw}")

    def test_iir_and_array_worN(self):
        b, a = ss.butter(4, 0.3)
        w0, h0 = ss.freqz(b, a, worN=512)
        w1, h1 = FL.freqz(b, a, worN=512)
        assert np.allclose(w0, w1)
        _close(h1, h0, label="freqz iir", tol=2e-4)
        grid = np.linspace(0.1, 3.0, 17)
        w0, h0 = ss.freqz(b, a, worN=grid)
        w1, h1 = FL.freqz(b, a, worN=grid)
        assert np.allclose(w0, w1)
        _close(h1, h0, label="freqz grid", tol=2e-4)

    def test_sosfreqz(self):
        sos = ss.butter(6, 0.25, output="sos")
        w0, h0 = ss.sosfreqz(sos, worN=256)
        w1, h1 = FL.sosfreqz(sos, worN=256)
        assert np.allclose(w0, w1)
        _close(h1, h0, label="sosfreqz", tol=2e-4)


# ------------------------------------------------------------- application

class TestLfilter:
    def test_fir_path(self, rng):
        b = ss.firwin(17, 0.3)
        x = rng.standard_normal((3, 128))
        _close(FL.lfilter(b, 1.0, x), ss.lfilter(b, [1.0], x),
               label="fir lfilter")

    def test_fir_axis0(self, rng):
        b = ss.firwin(9, 0.4)
        x = rng.standard_normal((64, 3))
        _close(FL.lfilter(b, 1.0, x, axis=0), ss.lfilter(b, [1.0], x, axis=0),
               label="fir axis0")

    def test_fir_zi(self, rng):
        b = ss.firwin(9, 0.4)
        x = rng.standard_normal((2, 50))
        zi = rng.standard_normal((2, 8))
        y0, zf0 = ss.lfilter(b, [1.0], x, zi=zi)
        y1, zf1 = FL.lfilter(b, 1.0, x, zi=zi)
        _close(y1, y0, label="fir zi y")
        _close(zf1, zf0, label="fir zi zf")

    def test_iir(self, rng):
        b, a = ss.butter(4, 0.2)
        x = rng.standard_normal((2, 200))
        _close(FL.lfilter(b, a, x), ss.lfilter(b, a, x), label="iir",
               tol=2e-4)

    def test_iir_zi_and_continuity(self, rng):
        b, a = ss.butter(3, 0.3)
        x = rng.standard_normal(120)
        zi = ss.lfilter_zi(b, a) * x[0]
        y0, zf0 = ss.lfilter(b, a, x, zi=zi)
        y1, zf1 = FL.lfilter(b, a, x, zi=zi)
        _close(y1, y0, label="iir zi y", tol=2e-4)
        _close(zf1, zf0, label="iir zi zf", tol=2e-4)
        # streaming: two halves with carried state == one shot
        ya, za = FL.lfilter(b, a, x[:60], zi=zi)
        yb, _ = FL.lfilter(b, a, x[60:], zi=za)
        _close(np.concatenate([np.asarray(ya), np.asarray(yb)]), y0,
               label="stream", tol=2e-4)

    def test_complex_data(self, rng):
        b, a = ss.butter(2, 0.4)
        x = rng.standard_normal(80) + 1j * rng.standard_normal(80)
        _close(FL.lfilter(b, a, x), ss.lfilter(b, a, x), label="complex",
               tol=2e-4)

    def test_scalar_filter(self, rng):
        x = rng.standard_normal(10)
        _close(FL.lfilter([2.0], [4.0], x), ss.lfilter([2.0], [4.0], x),
               label="scalar")

    def test_lfilter_zi(self):
        for b, a in [ss.butter(5, 0.25), ss.cheby1(4, 1, 0.3),
                     (np.array([1.0, 0.5]), np.array([1.0]))]:
            got = FL.lfilter_zi(b, a)
            want = ss.lfilter_zi(b, a)
            assert np.allclose(got, want, atol=1e-10)


class TestFiltfilt:
    @pytest.mark.parametrize("padtype", ["odd", "even", "constant", None])
    def test_matches_scipy(self, rng, padtype):
        b, a = ss.butter(3, 0.25)
        x = rng.standard_normal((2, 300))
        got = FL.filtfilt(b, a, x, padtype=padtype)
        want = ss.filtfilt(b, a, x, padtype=padtype)
        _close(got, want, label=f"filtfilt {padtype}", tol=5e-4)

    def test_fir_and_padlen(self, rng):
        b = ss.firwin(11, 0.3)
        x = rng.standard_normal(200)
        _close(FL.filtfilt(b, [1.0], x, padlen=40),
               ss.filtfilt(b, [1.0], x, padlen=40), label="filtfilt fir",
               tol=5e-4)

    def test_padlen_validation(self, rng):
        b, a = ss.butter(3, 0.25)
        with pytest.raises(PlanError):
            FL.filtfilt(b, a, np.zeros(10))


class TestSos:
    def test_sosfilt(self, rng):
        sos = ss.butter(6, 0.2, output="sos")
        x = rng.standard_normal((2, 150))
        _close(FL.sosfilt(sos, x), ss.sosfilt(sos, x), label="sosfilt",
               tol=2e-4)

    def test_sosfilt_zi(self):
        sos = ss.butter(5, 0.3, output="sos")
        assert np.allclose(FL.sosfilt_zi(sos), ss.sosfilt_zi(sos),
                           atol=1e-10)

    def test_sosfilt_with_zi(self, rng):
        sos = ss.butter(4, 0.25, output="sos")
        x = rng.standard_normal(100)
        zi = ss.sosfilt_zi(sos) * x[0]
        y0, zf0 = ss.sosfilt(sos, x, zi=zi)
        y1, zf1 = FL.sosfilt(sos, x, zi=zi)
        _close(y1, y0, label="sos zi y", tol=2e-4)
        _close(zf1, zf0, label="sos zi zf", tol=2e-4)

    def test_sosfiltfilt(self, rng):
        sos = ss.butter(4, 0.2, output="sos")
        x = rng.standard_normal((2, 250))
        _close(FL.sosfiltfilt(sos, x), ss.sosfiltfilt(sos, x),
               label="sosfiltfilt", tol=5e-4)

    @pytest.mark.parametrize("order", [3, 5, 7])
    def test_sosfiltfilt_odd_order_padlen(self, rng, order):
        # Odd-order designs carry a first-order section with a trailing
        # zero tap; scipy's default padlen discounts those sections
        # (3 * (2*ns + 1 - min(#b2==0, #a2==0))) and the transient
        # genuinely depends on the extension length.
        sos = ss.butter(order, 0.23, output="sos")
        x = rng.standard_normal(300)
        _close(FL.sosfiltfilt(sos, x), ss.sosfiltfilt(sos, x),
               label=f"sosfiltfilt order={order}", tol=5e-5)


# --------------------------------------------------------- Savitzky-Golay

class TestSavgol:
    @pytest.mark.parametrize("deriv,delta", [(0, 1.0), (1, 1.0), (2, 0.5)])
    def test_coeffs(self, deriv, delta):
        got = FL.savgol_coeffs(11, 3, deriv=deriv, delta=delta)
        want = ss.savgol_coeffs(11, 3, deriv=deriv, delta=delta)
        assert np.allclose(got, want, atol=1e-10)
        got = FL.savgol_coeffs(10, 3, deriv=deriv, delta=delta)
        want = ss.savgol_coeffs(10, 3, deriv=deriv, delta=delta)
        assert np.allclose(got, want, atol=1e-10)

    @pytest.mark.parametrize("mode", ["interp", "mirror", "constant",
                                      "nearest", "wrap"])
    def test_filter_modes(self, rng, mode):
        x = rng.standard_normal((2, 100))
        got = FL.savgol_filter(x, 11, 3, mode=mode)
        want = ss.savgol_filter(x, 11, 3, mode=mode)
        _close(got, want, label=f"savgol {mode}", tol=1e-4)

    @pytest.mark.parametrize("deriv", [1, 2])
    def test_filter_deriv(self, rng, deriv):
        x = np.cumsum(rng.standard_normal(80))
        got = FL.savgol_filter(x, 15, 4, deriv=deriv, delta=0.25)
        want = ss.savgol_filter(x, 15, 4, deriv=deriv, delta=0.25)
        _close(got, want, label=f"savgol deriv{deriv}", tol=1e-3)

    def test_filter_axis0(self, rng):
        x = rng.standard_normal((60, 3))
        _close(FL.savgol_filter(x, 9, 2, axis=0),
               ss.savgol_filter(x, 9, 2, axis=0), label="savgol axis0",
               tol=1e-4)


# ------------------------------------------------------------------ Wiener

class TestWiener:
    def test_1d(self, rng):
        x = rng.standard_normal(100)
        _close(FL.wiener(x, 5), ss.wiener(x, 5), label="wiener 1d",
               tol=1e-4)

    def test_2d_default_and_noise(self, rng):
        im = rng.standard_normal((24, 32))
        _close(FL.wiener(im), ss.wiener(im), label="wiener 2d", tol=1e-4)
        _close(FL.wiener(im, (3, 5), noise=0.5),
               ss.wiener(im, (3, 5), noise=0.5), label="wiener noise",
               tol=1e-4)


class TestGroupDelay:
    def test_int_worN(self):
        b, a = ss.butter(4, 0.2)
        w_g, gd_g = FL.group_delay((b, a), 512)
        w_e, gd_e = ss.group_delay((b, a), w=512)
        assert np.allclose(w_g, w_e)
        assert np.allclose(gd_g, gd_e, atol=1e-10)

    def test_array_w_and_fs(self):
        b, a = ss.cheby1(5, 1, 0.3)
        w_g, gd_g = FL.group_delay((b, a), w=[0.1, 0.5, 1.0], fs=8.0)
        w_e, gd_e = ss.group_delay((b, a), w=[0.1, 0.5, 1.0], fs=8.0)
        assert np.allclose(w_g, w_e) and np.allclose(gd_g, gd_e, atol=1e-10)

    def test_whole_and_fir(self):
        b = ss.firwin(31, 0.4)
        w_g, gd_g = FL.group_delay((b, 1.0), 128, whole=True)
        w_e, gd_e = ss.group_delay((b, 1.0), w=128, whole=True)
        assert np.allclose(w_g, w_e) and np.allclose(gd_g, gd_e, atol=1e-8)

    def test_singular_warns(self):
        # pole on the unit circle at w=0 -> singular group delay there
        import warnings
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            _, gd = FL.group_delay(([1.0], [1.0, -1.0]), w=[0.0])
        assert gd[0] == 0 and any("singular" in str(r.message) for r in rec)


class TestFreqzZpk:
    def test_matches_scipy(self):
        z, p, k = ss.butter(4, 0.3, output="zpk")
        w_g, h_g = FL.freqz_zpk(z, p, k, 128)
        w_e, h_e = ss.freqz_zpk(z, p, k, worN=128)
        assert np.allclose(w_g, w_e)
        _close(h_g, h_e, label="freqz_zpk")

    def test_worN_array_whole_fs(self):
        z, p, k = ss.ellip(3, 1, 30, 0.2, output="zpk")
        w_g, h_g = FL.freqz_zpk(z, p, k, worN=[0.2, 0.4, 1.1],
                                whole=True, fs=4.0)
        w_e, h_e = ss.freqz_zpk(z, p, k, worN=[0.2, 0.4, 1.1],
                                whole=True, fs=4.0)
        assert np.allclose(w_g, w_e)
        _close(h_g, h_e, label="freqz_zpk worN")


class TestFirls:
    @pytest.mark.parametrize("numtaps,bands,desired,kw", [
        (31, [0, 0.2, 0.3, 1.0], [1, 1, 0, 0], {}),
        (25, [0, 0.1, 0.15, 0.4, 0.45, 1], [1, 1, 0, 0, 0.5, 0.5],
         {"weight": [1, 10, 3]}),
        (11, [0, 1, 2, 4], [1, 1, 0, 0], {"fs": 8}),
        (7, [0, 0.3, 0.5, 1.0], [1, 0.5, 0.2, 0.0], {}),
    ])
    def test_matches_scipy(self, numtaps, bands, desired, kw):
        got = FL.firls(numtaps, bands, desired, **kw)
        want = ss.firls(numtaps, bands, desired, **kw)
        assert np.allclose(got, want, atol=1e-9), (numtaps, bands)

    def test_validation(self):
        with pytest.raises(PlanError):
            FL.firls(30, [0, 0.2, 0.3, 1], [1, 1, 0, 0])   # even numtaps
        with pytest.raises(PlanError):
            FL.firls(31, [0, 0.2, 0.3], [1, 1, 0])          # odd edges
        with pytest.raises(PlanError):
            FL.firls(31, [0, 0.4, 0.3, 1], [1, 1, 0, 0])    # overlap
        with pytest.raises(PlanError):
            FL.firls(31, [0, 0.2, 0.3, 1.5], [1, 1, 0, 0])  # > nyquist
        with pytest.raises(PlanError):
            FL.firls(31, [0, 0.2, 0.3, 1], [1, 1, 0, 0], weight=[1])


class TestMinimumPhase:
    def test_homomorphic(self):
        h = ss.remez(151, [0, 0.2, 0.3, 1.0], [1, 0], fs=2.0)
        got = FL.minimum_phase(h, method="homomorphic")
        want = ss.minimum_phase(h, method="homomorphic")
        assert np.allclose(got, want, atol=1e-9)

    def test_homomorphic_full_length(self):
        h = ss.firwin(99, 0.4)
        got = FL.minimum_phase(h, method="homomorphic", half=False)
        want = ss.minimum_phase(h, method="homomorphic", half=False)
        assert got.shape == want.shape
        assert np.allclose(got, want, atol=1e-9)

    def test_hilbert(self):
        h = ss.remez(151, [0, 0.2, 0.3, 1.0], [1, 0], fs=2.0)
        got = FL.minimum_phase(h, method="hilbert", n_fft=2 ** 12)
        want = ss.minimum_phase(h, method="hilbert", n_fft=2 ** 12)
        assert np.allclose(got, want, atol=1e-9)

    def test_even_length(self):
        h = ss.firwin(100, 0.3)
        got = FL.minimum_phase(h)
        want = ss.minimum_phase(h)
        assert got.shape == want.shape
        assert np.allclose(got, want, atol=1e-9)

    def test_validation(self):
        h = ss.firwin(31, 0.4)
        with pytest.raises(PlanError):
            FL.minimum_phase(h, method="cepstral")
        with pytest.raises(PlanError):
            FL.minimum_phase(h, n_fft=16)
        with pytest.raises(PlanError):
            FL.minimum_phase(h, method="hilbert", half=False)
        with pytest.raises(PlanError):
            FL.minimum_phase(np.zeros((2, 4)))
        with pytest.raises(PlanError):
            FL.minimum_phase(h.astype(complex))
        import warnings
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            FL.minimum_phase(np.array([1.0, 2.0, 4.0, 8.0]))
        assert any("symmetric" in str(r.message) for r in rec)


class TestRemez:
    """Parks-McClellan designs pinned tap-for-tap against scipy.signal.remez
    (both implement the McClellan-Parks-Rabiner exchange; the optimum is
    unique, so taps agree to f64 rounding)."""

    @pytest.mark.parametrize("numtaps,bands,desired,kw", [
        (51, [0, 0.2, 0.3, 1.0], [1, 0], {"fs": 2.0}),
        (64, [0, 0.2, 0.3, 1.0], [1, 0], {"fs": 2.0}),
        (73, [0, 0.1, 0.15, 0.4, 0.45, 0.5], [0, 1, 0],
         {"weight": [10, 1, 10]}),
        (21, [0.05, 0.45], [1], {"type": "hilbert"}),
        (32, [0.05, 0.45], [1], {"type": "hilbert"}),
        (25, [0.05, 0.45], [1], {"type": "differentiator"}),
        (24, [0.05, 0.45], [1], {"type": "differentiator"}),
        (35, [0, 1000, 1500, 4000], [1, 0], {"fs": 8000.0}),
        (55, [0, 0.15, 0.2, 0.45, 0.5, 0.5], [0, 1, 0],
         {"grid_density": 32}),
    ])
    def test_matches_scipy(self, numtaps, bands, desired, kw):
        got = FL.remez(numtaps, bands, desired, **kw)
        want = ss.remez(numtaps, bands, desired, **kw)
        _close(got, want, tol=1e-9, label=f"remez{numtaps}")

    def test_equiripple_property(self):
        """The design is equiripple: passband and stopband deviation sit
        at one level (up to the ~0.5% between-grid overshoot scipy's own
        designs show on a dense freqz probe) and hit the expected ripple."""
        h = FL.remez(51, [0, 0.2, 0.3, 1.0], [1, 0], fs=2.0)
        w, H = ss.freqz(h, worN=8192)
        f = w / np.pi
        A = np.abs(H)
        pass_dev = np.max(np.abs(A[f <= 0.2] - 1))
        stop_dev = np.max(A[f >= 0.3])
        assert abs(pass_dev - stop_dev) < 1e-2 * max(pass_dev, stop_dev)
        assert stop_dev < 0.01

    def test_at_least_as_good_as_scipy(self):
        """A many-tap three-band design where the two dense-grid optima
        differ in the last digits: require OUR band deviations to be no
        worse than scipy's (this config's scipy result is in fact the
        looser of the two)."""
        spec = (101, [0, 0.1, 0.15, 0.35, 0.4, 0.5], [0, 1, 0])
        got = FL.remez(*spec)
        want = ss.remez(*spec)
        w, Hg = ss.freqz(np.asarray(got), worN=8192)
        _, He = ss.freqz(want, worN=8192)
        f = w / (2 * np.pi)
        for lo, hi, d in [(0, 0.1, 0), (0.15, 0.35, 1), (0.4, 0.5, 0)]:
            m = (f >= lo) & (f <= hi)
            dev_g = np.max(np.abs(np.abs(Hg[m]) - d))
            dev_e = np.max(np.abs(np.abs(He[m]) - d))
            assert dev_g <= dev_e * 1.01, (lo, hi, dev_g, dev_e)

    def test_validation(self):
        with pytest.raises(PlanError):
            FL.remez(2, [0, 0.4, 0.5, 1.0], [1, 0], fs=2.0)
        with pytest.raises(PlanError):
            FL.remez(11, [0, 0.5, 0.4, 1.0], [1, 0], fs=2.0)   # nonmonotone
        with pytest.raises(PlanError):
            FL.remez(11, [0, 0.4, 0.5], [1, 0], fs=2.0)        # odd edges
        with pytest.raises(PlanError):
            FL.remez(11, [0, 0.4, 0.5, 1.0], [1], fs=2.0)      # n desired
        with pytest.raises(PlanError):
            FL.remez(11, [0, 0.4], [1], type="spline")
        with pytest.raises(PlanError):
            FL.remez(21, [0.05, 0.5], [1], type="hilbert",
                     weight=[1, 2])                            # n weight
        with pytest.raises(PlanError):
            # antisymmetric with nonzero response at f=0
            FL.remez(21, [0, 0.45], [1], type="hilbert")


class TestKaiserord:
    @pytest.mark.parametrize("ripple,width", [
        (60, 0.1), (30, 0.05), (80, 0.2), (21, 0.3), (8.1, 0.01)])
    def test_matches_scipy(self, ripple, width):
        n_g, b_g = FL.kaiserord(ripple, width)
        n_e, b_e = ss.kaiserord(ripple, width)
        assert n_g == n_e
        assert abs(b_g - b_e) < 1e-12

    def test_design_chain(self):
        """kaiserord -> firwin(kaiser) meets the spec it was sized for."""
        n, beta = FL.kaiserord(60, 0.1)
        taps = FL.firwin(n + (n % 2 == 0), 0.5, window=("kaiser", beta))
        w, H = ss.freqz(np.asarray(taps), worN=4096)
        f = w / np.pi
        assert np.max(np.abs(np.abs(H[f < 0.42]) - 1)) < 10 ** (-60 / 20)
        assert np.max(np.abs(H[f > 0.58])) < 10 ** (-60 / 20)

    def test_validation(self):
        with pytest.raises(PlanError):
            FL.kaiserord(5, 0.1)


class TestOrderFilters:
    """Order-statistic filters return exact input elements, so the pin
    against scipy is equality (f32 inputs)."""

    @pytest.mark.parametrize("ks", [3, 5, 9, [7]])
    def test_medfilt_1d(self, rng, ks):
        x = rng.standard_normal(101).astype(np.float32)
        assert np.array_equal(np.asarray(FL.medfilt(x, ks)),
                              ss.medfilt(x, ks))

    @pytest.mark.parametrize("ks", [3, [3, 7], [5, 3]])
    def test_medfilt_2d(self, rng, ks):
        im = rng.standard_normal((37, 29)).astype(np.float32)
        assert np.array_equal(np.asarray(FL.medfilt(im, ks)),
                              ss.medfilt(im, ks))

    def test_medfilt2d_and_3d(self, rng):
        im = rng.standard_normal((24, 31)).astype(np.float32)
        assert np.array_equal(np.asarray(FL.medfilt2d(im, 5)),
                              ss.medfilt2d(im, 5))
        vol = rng.standard_normal((9, 11, 13)).astype(np.float32)
        assert np.array_equal(np.asarray(FL.medfilt(vol)), ss.medfilt(vol))

    @pytest.mark.parametrize("rank", [0, 2, 4])
    def test_order_filter_cross_domain(self, rng, rank):
        im = rng.standard_normal((20, 17)).astype(np.float32)
        dom = np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]])
        assert np.array_equal(np.asarray(FL.order_filter(im, dom, rank)),
                              ss.order_filter(im, dom, rank))

    def test_order_filter_1d_min_max(self, rng):
        x = rng.standard_normal(64).astype(np.float32)
        dom = np.ones(5)
        for rank in (0, 4):
            assert np.array_equal(np.asarray(FL.order_filter(x, dom, rank)),
                                  ss.order_filter(x, dom, rank))

    def test_jit_composes(self, rng):
        import jax
        x = rng.standard_normal(128).astype(np.float32)
        got = jax.jit(lambda v: FL.medfilt(v, 5))(x)
        assert np.array_equal(np.asarray(got), ss.medfilt(x, 5))

    def test_validation(self):
        with pytest.raises(PlanError):
            FL.medfilt(np.zeros(10), 4)                  # even kernel
        with pytest.raises(PlanError):
            FL.medfilt(np.zeros(10), [3, 3])             # rank mismatch
        with pytest.raises(PlanError):
            FL.medfilt2d(np.zeros((3, 3, 3)))            # not 2-D
        with pytest.raises(PlanError):
            FL.order_filter(np.zeros(10), np.ones(3), 3)  # rank >= nnz
        with pytest.raises(PlanError):
            FL.order_filter(np.zeros(10), np.zeros(3), 0)  # empty domain
        with pytest.raises(PlanError):
            FL.order_filter(np.zeros(10), np.ones((3, 3)), 0)


class TestNamespaceComplete:
    def test_every_advertised_name_is_bound(self):
        """Regression: the re-export list once advertised names in
        __all__ that were not module attributes (stale explicit import)."""
        missing = [n for n in FL.__all__ if not hasattr(FL, n)]
        assert not missing, missing

    def test_scipy_signal_surface_coverage(self):
        """Every public scipy.signal name has a framework counterpart."""
        import webgpufft_tpu as W
        have = set()
        for mod in (W.fft, W.filtering, W.iirdesign, W.peaks, W.ltisys,
                    W.waveforms, W.splines, W.ndimage, W.windows):
            have |= set(getattr(mod, "__all__", []))
        have |= {"ShortTimeFFT", "windows"}
        missing = [n for n in ss.__all__ if n not in have]
        assert not missing, missing


class TestAssociativeIirRoute:
    """The log-depth parallel-prefix IIR formulation must be an exact
    reordering of the sequential scan (gate currently off pending the
    on-chip A/B; see filtering.IIR_ASSOC_MIN_N)."""

    @pytest.mark.parametrize("K,n,batch", [
        (2, 100, 1), (2, 4000, 3), (4, 7000, 2), (3, 3300, 1)])
    def test_assoc_matches_scipy(self, rng, K, n, batch):
        b, a = ss.butter(K, 0.25)
        x = rng.standard_normal((batch, n)).astype(np.float32)
        zi = (rng.standard_normal((batch, K)) * 0.1).astype(np.float32)
        from webgpufft_tpu.filtering import _iir_assoc
        y, zf = _iir_assoc(b, a, x, zi)
        yref, zref = ss.lfilter(b, a, x, zi=zi)
        scale = max(np.max(np.abs(yref)), 1e-9)
        assert np.max(np.abs(np.asarray(y) - yref)) / scale < 1e-5
        assert np.max(np.abs(np.asarray(zf) - zref)) < 1e-5 * max(
            np.max(np.abs(zref)), 1)

    def test_gated_route_consistency(self, rng):
        """Flipping the gate routes lfilter through the assoc path with
        unchanged results."""
        import webgpufft_tpu.filtering as FLmod
        b, a = ss.butter(2, 0.3)
        x = rng.standard_normal(2048).astype(np.float32)
        y_seq = np.asarray(FLmod.lfilter(b, a, x))
        old = FLmod.IIR_ASSOC_MIN_N
        try:
            FLmod.IIR_ASSOC_MIN_N = 64
            y_assoc = np.asarray(FLmod.lfilter(b, a, x))
        finally:
            FLmod.IIR_ASSOC_MIN_N = old
        scale = max(np.max(np.abs(y_seq)), 1e-9)
        assert np.max(np.abs(y_assoc - y_seq)) / scale < 1e-5
