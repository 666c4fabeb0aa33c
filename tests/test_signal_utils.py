"""Signal-utility batch vs scipy: envelope, vectorstrength, czt_points,
max_len_seq, tf2sos, abcd_normalize."""

import numpy as np
import pytest

import scipy.signal as ss

from webgpufft_tpu import fft as wfft
from webgpufft_tpu import waveforms as WV
from webgpufft_tpu import iirdesign as D
from webgpufft_tpu import ltisys as L
from webgpufft_tpu import PlanError
from webgpufft_tpu.fftapi import ascomplex


@pytest.fixture
def rng():
    return np.random.default_rng(3)


def _close(a, b, tol=2e-5, label=""):
    a = np.asarray(a)
    b = np.asarray(b)
    assert a.shape == b.shape, (label, a.shape, b.shape)
    err = np.max(np.abs(a - b)) / max(np.max(np.abs(b)), 1e-30)
    assert err < tol, (label, err)


def _mod_signal(rng, n=64):
    t = np.arange(n)
    return (np.cos(2 * np.pi * 8 * t / n)
            * (1 + 0.5 * np.cos(2 * np.pi * 2 * t / n)) + 0.3
            + 0.2 * np.cos(2 * np.pi * 1 * t / n)
            + 0.05 * rng.standard_normal(n))


class TestEnvelope:
    @pytest.mark.parametrize("kw", [
        {},
        {"squared": True},
        {"residual": None},
        {"residual": "all"},
        {"bp_in": (3, 20)},
        {"n_out": 32},
        {"n_out": 48},
        {"n_out": 128},
        {"bp_in": (3, 20), "n_out": 32},
        {"bp_in": (3, 20), "n_out": 32, "residual": "all"},
        {"bp_in": (3, 20), "n_out": 96, "residual": "all"},
    ])
    def test_real_matches_scipy(self, rng, kw):
        x = _mod_signal(rng)
        _close(wfft.envelope(x, **kw), ss.envelope(x, **kw), label=str(kw))

    def test_odd_length(self, rng):
        x = rng.standard_normal(63)
        _close(wfft.envelope(x), ss.envelope(x))
        _close(wfft.envelope(x, n_out=32), ss.envelope(x, n_out=32))
        _close(wfft.envelope(x, n_out=127), ss.envelope(x, n_out=127))

    def test_batch_and_axis(self, rng):
        x2 = rng.standard_normal((3, 64))
        _close(wfft.envelope(x2), ss.envelope(x2))
        x3 = rng.standard_normal((64, 3))
        _close(wfft.envelope(x3, axis=0), ss.envelope(x3, axis=0))
        _close(wfft.envelope(x3, axis=0, residual=None),
               ss.envelope(x3, axis=0, residual=None))

    def test_complex(self, rng):
        z = rng.standard_normal(64) + 1j * rng.standard_normal(64)
        for kw in [{"bp_in": (-5, 20)}, {"bp_in": (-5, 20), "n_out": 32},
                   {"bp_in": (-32, 10), "residual": "all"}]:
            g = wfft.envelope(z, **kw)
            w = ss.envelope(z, **kw)
            _close(np.asarray(g[0])[..., 0], np.abs(w[0]), label="env")
            _close(ascomplex(np.asarray(g[1])), w[1], label="res")
        _close(wfft.envelope(z, (-5, 20), residual=None),
               ss.envelope(z, (-5, 20), residual=None))

    def test_validation(self):
        with pytest.raises(PlanError):
            wfft.envelope(np.zeros(16), (5, 3))
        with pytest.raises(PlanError):
            wfft.envelope(np.zeros(16), (0, 100))
        with pytest.raises(PlanError):
            wfft.envelope(np.zeros(16), residual="bandpass")


class TestVectorstrength:
    def test_scalar_and_array_period(self, rng):
        ev = rng.uniform(0, 100, 400)
        for per in [10.0, [7.5, 10.0, 13.3]]:
            gs, gp = wfft.vectorstrength(ev, per)
            ws, wp = ss.vectorstrength(ev, per)
            _close(gs, ws, tol=3e-6)
            _close(gp, wp, tol=1e-5)

    def test_perfect_locking(self):
        ev = np.arange(20) * 4.0
        s, p = wfft.vectorstrength(ev, 4.0)
        assert abs(float(np.asarray(s)) - 1.0) < 1e-6

    def test_validation(self):
        with pytest.raises(PlanError):
            wfft.vectorstrength(np.zeros((2, 2)), 1.0)
        with pytest.raises(PlanError):
            wfft.vectorstrength(np.zeros(4), -1.0)


class TestCztPoints:
    def test_matches_scipy(self):
        assert np.allclose(wfft.czt_points(9), ss.czt_points(9))
        w = 0.98 * np.exp(1j * 0.1)
        assert np.allclose(wfft.czt_points(7, w, 1.5),
                           ss.czt_points(7, w, 1.5))

    def test_consistent_with_czt(self, rng):
        """czt evaluates X(z) at exactly czt_points."""
        x = rng.standard_normal(16)
        w = 0.99 * np.exp(-1j * 2 * np.pi / 20)
        pts = wfft.czt_points(10, w, 1.1)
        got = ascomplex(np.asarray(wfft.czt(x, 10, w, 1.1)))
        want = np.array([np.sum(x * p ** -np.arange(16)) for p in pts])
        _close(got, want, tol=1e-4)

    def test_validation(self):
        with pytest.raises(PlanError):
            wfft.czt_points(0)


class TestMaxLenSeq:
    @pytest.mark.parametrize("nbits", [2, 3, 4, 5, 8, 10])
    def test_default(self, nbits):
        g, gs = WV.max_len_seq(nbits)
        w, ws = ss.max_len_seq(nbits)
        assert np.array_equal(g, w)
        assert np.array_equal(gs, ws)

    def test_state_length_taps(self):
        st = np.array([0, 1, 0, 1, 1])
        g, gs = WV.max_len_seq(5, state=st.copy(), length=40)
        w, ws = ss.max_len_seq(5, state=st.copy(), length=40)
        assert np.array_equal(g, w) and np.array_equal(gs, ws)
        g, gs = WV.max_len_seq(6, taps=[5, 1], length=100)
        w, ws = ss.max_len_seq(6, taps=[5, 1], length=100)
        assert np.array_equal(g, w) and np.array_equal(gs, ws)

    def test_mls_property(self):
        """An MLS has a near-ideal periodic autocorrelation."""
        seq, _ = WV.max_len_seq(8)
        s = 2.0 * seq - 1
        n = s.size
        ac = np.fft.ifft(np.abs(np.fft.fft(s)) ** 2).real / n
        assert abs(ac[0] - 1.0) < 1e-9
        assert np.max(np.abs(ac[1:])) < 1.0 / n + 1e-9

    def test_validation(self):
        with pytest.raises(PlanError):
            WV.max_len_seq(33)
        with pytest.raises(PlanError):
            WV.max_len_seq(4, state=np.zeros(4))
        with pytest.raises(PlanError):
            WV.max_len_seq(4, state=np.ones(3))


class TestTf2Sos:
    def test_matches_scipy(self):
        for ba in [ss.butter(6, 0.3), ss.cheby1(5, 1, 0.4),
                   ss.ellip(4, 1, 40, [0.2, 0.6], btype="bandpass")]:
            assert np.allclose(D.tf2sos(*ba), ss.tf2sos(*ba), atol=1e-10)
        ba = ss.butter(3, 5, analog=True)
        assert np.allclose(D.tf2sos(*ba, analog=True),
                           ss.tf2sos(*ba, analog=True), atol=1e-10)


class TestAbcdNormalize:
    def test_fill_missing(self):
        A = [[1.0, 2.0], [3.0, 4.0]]
        B = [[1.0], [0.0]]
        C = [[1.0, 0.0]]
        D_ = [[0.0]]
        for args in [(A, B, C, D_), (A, B, None, D_), (None, B, C, None),
                     (A, None, C, D_)]:
            got = L.abcd_normalize(*args)
            want = ss.abcd_normalize(*args)
            for g, w in zip(got, want):
                assert np.array_equal(g, w)

    def test_validation(self):
        with pytest.raises(PlanError):
            L.abcd_normalize(A=[[1.0, 2.0], [3.0, 4.0]])
        with pytest.raises(PlanError):
            L.abcd_normalize(A=np.eye(2), B=np.ones((3, 1)),
                             C=np.ones((1, 2)), D=np.ones((1, 1)))


class TestColaNola:
    @pytest.mark.parametrize("win,W,O", [
        ("hann", 8, 4), ("hann", 8, 5), ("hann", 8, 3), ("boxcar", 10, 0),
        ("blackman", 64, 32), ("hann", 256, 96)])
    def test_matches_scipy(self, win, W, O):
        assert wfft.check_COLA(win, W, O) == ss.check_COLA(win, W, O)
        assert wfft.check_NOLA(win, W, O) == ss.check_NOLA(win, W, O)

    def test_array_window_and_validation(self):
        w = np.ones(7)
        assert wfft.check_COLA(w, 7, 3) == ss.check_COLA(w, 7, 3)
        with pytest.raises(PlanError):
            wfft.check_COLA("hann", 8, 8)
        with pytest.raises(PlanError):
            wfft.check_NOLA("hann", 0, 0)


class TestChooseConvMethod:
    def test_far_from_boundary(self):
        for a, b in [(5, 3), (100, 10), (100000, 9000), (50, 40)]:
            assert wfft.choose_conv_method(np.ones(a), np.ones(b)) == \
                ss.choose_conv_method(np.ones(a), np.ones(b)), (a, b)

    def test_integer_exactness(self):
        assert wfft.choose_conv_method(np.arange(10), np.arange(3)) \
            == "direct"

    def test_measure(self):
        method, times = wfft.choose_conv_method(
            np.ones(256), np.ones(64), measure=True)
        assert method in ("fft", "direct")
        assert set(times) == {"fft", "direct"}


class TestCztZoomClasses:
    def test_czt_class(self, rng):
        x = rng.standard_normal(37)
        w = 0.995 * np.exp(-1j * 0.07)
        got = ascomplex(np.asarray(wfft.CZT(37, 11, w, 1.1)(x)))
        want = ss.CZT(37, 11, w, 1.1)(x)
        assert np.allclose(got, want, atol=1e-4)
        assert np.allclose(wfft.CZT(37, 11, w, 1.1).points(),
                           ss.CZT(37, 11, w, 1.1).points())

    @pytest.mark.parametrize("endpoint", [False, True])
    def test_zoomfft_class(self, rng, endpoint):
        x = rng.standard_normal(37)
        got = ascomplex(np.asarray(
            wfft.ZoomFFT(37, [2, 9], 23, fs=20, endpoint=endpoint)(x)))
        want = ss.ZoomFFT(37, [2, 9], 23, fs=20, endpoint=endpoint)(x)
        assert np.allclose(got, want, atol=1e-4)

    def test_validation(self):
        with pytest.raises(PlanError):
            wfft.CZT(0)
        with pytest.raises(PlanError):
            wfft.ZoomFFT(16, [1, 2, 3])


class TestLfiltic:
    def test_matches_scipy(self):
        b, a = ss.butter(3, 0.3)
        for y, x in [([1., 2., 3.], [4., 5., 6.]), ([1., 2., 3.], None),
                     ([1.], [2.])]:
            from webgpufft_tpu import filtering as FL
            assert np.allclose(FL.lfiltic(b, a, y, x),
                               ss.lfiltic(b, a, y, x), atol=1e-12)

    def test_feeds_lfilter(self, rng):
        from webgpufft_tpu import filtering as FL
        b, a = ss.butter(2, 0.4)
        past_y = [0.3, -0.1]
        past_x = [1.0, 0.5]
        zi = FL.lfiltic(b, a, past_y, past_x)
        x = rng.standard_normal(50)
        got, _ = FL.lfilter(b, a, x, zi=zi)
        want, _ = ss.lfilter(b, a, x, zi=ss.lfiltic(b, a, past_y, past_x))
        assert np.allclose(np.asarray(got), want, atol=1e-4)


class TestTfTransformsAndBandStopObj:
    def test_lp2_tf_forms(self):
        from webgpufft_tpu import iirdesign as DD
        proto = ss.butter(4, 1, analog=True)
        for fn_g, fn_s, args in [
            (DD.lp2lp, ss.lp2lp, (*proto, 2.0)),
            (DD.lp2hp, ss.lp2hp, (*proto, 3.0)),
            (DD.lp2bp, ss.lp2bp, (*proto, 3.0, 1.5)),
            (DD.lp2bs, ss.lp2bs, (*proto, 3.0, 1.5)),
        ]:
            bg, ag = fn_g(*args)
            be, ae = fn_s(*args)
            bg, be = np.atleast_1d(bg), np.atleast_1d(be)
            if bg.size < be.size:
                bg = np.pad(bg, (be.size - bg.size, 0))
            assert np.allclose(bg, be, atol=1e-8, rtol=1e-8), fn_s.__name__
            assert np.allclose(ag, ae, atol=1e-8, rtol=1e-8), fn_s.__name__

    def test_band_stop_obj(self):
        from webgpufft_tpu import iirdesign as DD
        passb = np.array([0.1, 0.6]) * np.pi
        stopb = np.array([0.2, 0.5]) * np.pi
        for t in ("butter", "cheby", "ellip"):
            g = DD.band_stop_obj(0.18, 0, passb, stopb, 1, 40, t)
            w = ss.band_stop_obj(0.18, 0, passb, stopb, 1, 40, t)
            assert np.isclose(g, w), t


class TestFreqzSos:
    def test_alias(self):
        from webgpufft_tpu import filtering as FL
        sos = ss.butter(6, 0.25, output="sos")
        w0, h0 = ss.freqz_sos(sos, worN=128)
        w1, h1 = FL.freqz_sos(sos, worN=128)
        assert np.allclose(w0, w1)
        assert np.allclose(ascomplex(np.asarray(h1)) if np.asarray(h1).ndim > 1 else h1,
                           h0, atol=1e-5)


class TestGammatone:
    @pytest.mark.parametrize("freq,fs", [(440, 16000), (1000, 44100),
                                         (0.3, 2)])
    def test_iir_and_fir(self, freq, fs):
        bg, ag = D.gammatone(freq, "iir", fs=fs)
        be, ae = ss.gammatone(freq, "iir", fs=fs)
        assert np.allclose(bg, be, atol=1e-18, rtol=1e-10)
        assert np.allclose(ag, ae, atol=1e-14, rtol=1e-10)
        bg, ag = D.gammatone(freq, "fir", fs=fs)
        be, ae = ss.gammatone(freq, "fir", fs=fs)
        assert np.allclose(bg, be, atol=1e-15)

    def test_fir_custom_order(self):
        bg, _ = D.gammatone(440, "fir", order=6, numtaps=64, fs=16000)
        be, _ = ss.gammatone(440, "fir", order=6, numtaps=64, fs=16000)
        assert np.allclose(bg, be, atol=1e-15)

    def test_validation(self):
        with pytest.raises(PlanError):
            D.gammatone(9000, "fir", fs=16000)      # past nyquist
        with pytest.raises(PlanError):
            D.gammatone(440, "butter", fs=16000)
        with pytest.raises(PlanError):
            D.gammatone(440, "fir", order=30, fs=16000)
        with pytest.warns(UserWarning):
            D.gammatone(440, "iir", order=4, fs=16000)


class TestFirwin2d:
    def test_separable_and_circular(self):
        from webgpufft_tpu import filtering as FL
        h = FL.firwin_2d((5, 7), ("hann", "hamming"), fc=0.3)
        assert np.allclose(h, ss.firwin_2d((5, 7), ("hann", "hamming"),
                                           fc=0.3), atol=1e-14)
        hc = FL.firwin_2d((9, 9), "hann", fc=0.4, circular=True)
        assert np.allclose(hc, ss.firwin_2d((9, 9), "hann", fc=0.4,
                                            circular=True), atol=1e-14)
        hk = FL.firwin_2d((8, 8), (("kaiser", 5.0), ("kaiser", 5.0)),
                          fc=1000, fs=8000)
        assert np.allclose(hk, ss.firwin_2d(
            (8, 8), (("kaiser", 5.0), ("kaiser", 5.0)), fc=1000, fs=8000),
            atol=1e-14)

    def test_validation(self):
        from webgpufft_tpu import filtering as FL
        with pytest.raises(PlanError):
            FL.firwin_2d((5,), ("hann", "hann"), fc=0.3)
        with pytest.raises(PlanError):
            FL.firwin_2d((5, 5), "hann", fc=0.3)       # needs 2 windows
        with pytest.raises(PlanError):
            FL.firwin_2d((5, 5), "hann", circular=True)  # fc missing


class TestClosestDualWindow:
    def test_matches_scipy(self):
        from webgpufft_tpu import fft as wf
        w = ss.windows.gaussian(8, 2)
        for scaled in (True, False):
            for dd in (None, np.ones(8),
                       ss.windows.hann(8, sym=False) + 0.1):
                g, ga = wf.closest_STFT_dual_window(w, 3, dd,
                                                    scaled=scaled)
                e, ea = ss.closest_STFT_dual_window(w, 3, dd,
                                                    scaled=scaled)
                assert np.allclose(g, e, atol=1e-13)
                assert np.isclose(ga, ea)

    def test_is_valid_dual(self):
        """The result reconstructs: use it as ShortTimeFFT dual_win."""
        from webgpufft_tpu import ShortTimeFFT, fft as wf
        w = ss.windows.gaussian(8, 2)
        d, _ = wf.closest_STFT_dual_window(w, 3, np.ones(8))
        A = ShortTimeFFT(w, hop=3, fs=1, dual_win=np.asarray(d))
        x = np.random.default_rng(0).standard_normal(40)
        S = A.stft(x)
        xr = A.istft(np.asarray(S), k1=40, interleaved=True)
        assert np.max(np.abs(np.asarray(xr) - x)) < 1e-4

    def test_validation(self):
        from webgpufft_tpu import fft as wf
        with pytest.raises(PlanError):
            wf.closest_STFT_dual_window(np.ones(8), 0)
        with pytest.raises(PlanError):
            wf.closest_STFT_dual_window(np.ones(8), 3, np.ones(7))


class TestFindPeaksCwt:
    def _sig(self):
        rng = np.random.default_rng(0)
        x = np.zeros(200)
        for c in (40, 90, 160):
            x[c] = 1
        return np.convolve(x, ss.windows.gaussian(25, 4), "same") \
            + 0.02 * rng.standard_normal(200)

    @pytest.mark.parametrize("kw", [
        {}, {"min_snr": 2}, {"noise_perc": 15}, {"gap_thresh": 3},
        {"window_size": 15}, {"min_length": 3}])
    def test_matches_scipy(self, kw):
        import warnings as _w
        from webgpufft_tpu import peaks as P
        sig = self._sig()
        with _w.catch_warnings():
            _w.simplefilter("ignore")
            want = ss.find_peaks_cwt(sig, np.arange(1, 12), **kw)
        got = P.find_peaks_cwt(sig, np.arange(1, 12), **kw)
        assert np.array_equal(got, want), kw

    @pytest.mark.parametrize("seed", range(4))
    def test_random_signals(self, seed):
        import warnings as _w
        from webgpufft_tpu import peaks as P
        r2 = np.random.default_rng(seed)
        s2 = np.cumsum(r2.standard_normal(300)) * 0.1 \
            + np.sin(np.arange(300) / 10)
        with _w.catch_warnings():
            _w.simplefilter("ignore")
            want = ss.find_peaks_cwt(s2, np.arange(2, 20))
        got = P.find_peaks_cwt(s2, np.arange(2, 20))
        assert np.array_equal(got, want)

    def test_validation(self):
        from webgpufft_tpu import peaks as P
        with pytest.raises(PlanError):
            P.find_peaks_cwt(np.zeros(50), [5, 6], max_distances=[1])


class TestEnvelopeCornerBands:
    """Round-3 review regressions: real-input bands touching/below DC."""

    @pytest.mark.parametrize("bp", [(0, 20), (-3, 20), (None, None),
                                    (-32, 10)])
    def test_real_low_bands(self, rng, bp):
        x = _mod_signal(rng)
        _close(wfft.envelope(x, bp), ss.envelope(x, bp), label=str(bp))

    def test_low_band_with_resample(self, rng):
        x = _mod_signal(rng)
        _close(wfft.envelope(x, (0, 20), n_out=48),
               ss.envelope(x, (0, 20), n_out=48))
        _close(wfft.envelope(x, (-3, 20), residual="all"),
               ss.envelope(x, (-3, 20), residual="all"))

    def test_odd_length_low_band(self, rng):
        x = rng.standard_normal(63)
        _close(wfft.envelope(x, (0, 20)), ss.envelope(x, (0, 20)))
