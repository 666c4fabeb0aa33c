"""ShortTimeFFT (webgpufft_tpu.shorttime) vs scipy.signal.ShortTimeFFT.

Geometry/window tables must match scipy exactly (host f64); the device
f32 transforms are pinned at ~2e-5 relative.
"""

import numpy as np
import pytest

import scipy.signal as ss

from webgpufft_tpu import ShortTimeFFT
from webgpufft_tpu import PlanError
from webgpufft_tpu.fftapi import ascomplex


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _close(a, b, tol=2e-5, label=""):
    a = np.asarray(a)
    b = np.asarray(b)
    if np.iscomplexobj(b) and not np.iscomplexobj(a):
        a = ascomplex(a)
    assert a.shape == b.shape, (label, a.shape, b.shape)
    err = np.max(np.abs(a - b)) / max(np.max(np.abs(b)), 1e-30)
    assert err < tol, (label, err)


def _pair(**kw):
    w = ss.windows.gaussian(8, std=2, sym=True)
    return (ShortTimeFFT(w, hop=3, fs=10, **kw),
            ss.ShortTimeFFT(w, hop=3, fs=10, **kw))


class TestGeometry:
    @pytest.mark.parametrize("m,hop", [
        (8, 3), (8, 4), (7, 3), (9, 5), (8, 8), (16, 4), (12, 6), (5, 2)])
    def test_index_algebra(self, m, hop):
        w = np.hanning(m) + 0.1
        A = ShortTimeFFT(w, hop=hop, fs=7)
        B = ss.ShortTimeFFT(w, hop=hop, fs=7)
        assert (A.p_min, A.k_min, A.m_num, A.m_num_mid, A.f_pts) == \
            (B.p_min, B.k_min, B.m_num, B.m_num_mid, B.f_pts)
        assert A.lower_border_end == B.lower_border_end
        for n in (20, 21, 24, 33):
            assert A.p_max(n) == B.p_max(n)
            assert A.k_max(n) == B.k_max(n)
            assert A.p_num(n) == B.p_num(n)
            assert A.upper_border_begin(n) == B.upper_border_begin(n)
            assert np.allclose(A.t(n), B.t(n))
        assert np.allclose(A.f, B.f)
        assert np.allclose(A.dual_win, B.dual_win)

    def test_grid_and_extent(self):
        A, B = _pair()
        assert np.allclose(A.extent(50), B.extent(50))
        assert np.allclose(A.extent(50, "ft", True), B.extent(50, "ft", True))
        assert A.delta_t == B.delta_t and A.delta_f == B.delta_f
        assert A.T == B.T
        assert A.nearest_k_p(10) == B.nearest_k_p(10)
        assert A.nearest_k_p(10, left=False) == B.nearest_k_p(10, left=False)
        assert A.invertible and B.invertible

    def test_scaling_factors(self):
        A, B = _pair()
        assert np.isclose(A.fac_magnitude, B.fac_magnitude)
        assert np.isclose(A.fac_psd, B.fac_psd)
        A.scale_to("psd")
        B.scale_to("psd")
        assert np.allclose(A.win, B.win)
        assert np.allclose(A.dual_win, B.dual_win)
        assert A.scaling == B.scaling == "psd"


class TestStft:
    def test_basic(self, rng):
        A, B = _pair()
        x = rng.standard_normal(50)
        _close(A.stft(x), B.stft(x), label="stft")

    @pytest.mark.parametrize("padding", ["edge", "even", "odd"])
    def test_padding(self, rng, padding):
        A, B = _pair()
        x = rng.standard_normal(50)
        _close(A.stft(x, padding=padding), B.stft(x, padding=padding),
               label=padding)

    def test_p0_p1_k_offset(self, rng):
        A, B = _pair()
        x = rng.standard_normal(50)
        _close(A.stft(x, p0=2, p1=7), B.stft(x, p0=2, p1=7))
        _close(A.stft(x, k_offset=5), B.stft(x, k_offset=5))

    @pytest.mark.parametrize("mode", ["twosided", "centered"])
    def test_modes_and_complex_input(self, rng, mode):
        w = ss.windows.gaussian(8, std=2, sym=True)
        A = ShortTimeFFT(w, hop=3, fs=10, fft_mode=mode)
        B = ss.ShortTimeFFT(w, hop=3, fs=10, fft_mode=mode)
        x = rng.standard_normal(50)
        _close(A.stft(x), B.stft(x), label=mode)
        z = x + 1j * rng.standard_normal(50)
        _close(A.stft(z), B.stft(z), label=f"{mode} cplx")

    @pytest.mark.parametrize("sc", ["magnitude", "psd"])
    def test_onesided2X(self, rng, sc):
        w = ss.windows.gaussian(8, std=2, sym=True)
        A = ShortTimeFFT(w, hop=3, fs=10, fft_mode="onesided2X",
                         scale_to=sc)
        B = ss.ShortTimeFFT(w, hop=3, fs=10, fft_mode="onesided2X",
                            scale_to=sc)
        x = rng.standard_normal(50)
        _close(A.stft(x), B.stft(x), label=f"2X {sc}")

    @pytest.mark.parametrize("ps", [None, 0, 2, -3])
    def test_mfft_phase_shift(self, rng, ps):
        w = ss.windows.gaussian(8, std=2, sym=True)
        A = ShortTimeFFT(w, hop=3, fs=10, mfft=16, phase_shift=ps)
        B = ss.ShortTimeFFT(w, hop=3, fs=10, mfft=16, phase_shift=ps)
        x = rng.standard_normal(50)
        _close(A.stft(x), B.stft(x), label=f"ps {ps}")

    def test_batched_and_axis(self, rng):
        A, B = _pair()
        x = rng.standard_normal((3, 50))
        _close(A.stft(x), B.stft(x), label="batch")
        xt = np.ascontiguousarray(x.T)
        _close(A.stft(xt, axis=0), B.stft(xt, axis=0), label="axis0")

    def test_detrend(self, rng):
        A, B = _pair()
        x = rng.standard_normal(50) + 3.0
        for d in ("constant", "linear"):
            _close(A.stft_detrend(x, d), B.stft_detrend(x, d), label=d)

    def test_spectrogram(self, rng):
        A, B = _pair()
        x = rng.standard_normal(50)
        y = rng.standard_normal(50)
        _close(A.spectrogram(x), B.spectrogram(x), label="auto")
        _close(A.spectrogram(x, y), B.spectrogram(x, y), label="cross")

    def test_validation(self, rng):
        A, _ = _pair()
        x = rng.standard_normal(50)
        with pytest.raises(PlanError):
            A.stft(x + 1j * x)                      # onesided + complex
        with pytest.raises(PlanError):
            A.stft(x, p0=-10)
        with pytest.raises(PlanError):
            A.stft(x, padding="wrap")
        with pytest.raises(PlanError):
            ShortTimeFFT(np.ones(8), hop=0, fs=1.0)
        with pytest.raises(PlanError):
            ShortTimeFFT(np.ones(8), hop=2, fs=1.0, mfft=4)
        with pytest.raises(PlanError):
            ShortTimeFFT(np.ones(8), hop=2, fs=1.0,
                         fft_mode="onesided2X")     # needs scaling


class TestIstft:
    def test_roundtrip(self, rng):
        A, B = _pair()
        x = rng.standard_normal(50)
        S = A.stft(x)
        xr = A.istft(S, k1=50)
        _close(xr, x, tol=1e-4, label="roundtrip")

    def test_matches_scipy(self, rng):
        A, B = _pair()
        x = rng.standard_normal(50)
        S = B.stft(x).astype(np.complex64)
        _close(A.istft(S, k1=50), B.istft(B.stft(x), k1=50))
        _close(A.istft(S), B.istft(B.stft(x)), label="default k1")
        # scipy's istft itself crashes on an interior (k0, k1) crop
        # (a scipy bug at _short_time_fft.py:1535); pin the crop as a
        # slice of the full reconstruction instead
        full = np.asarray(A.istft(S, k1=50))
        _close(A.istft(S, k0=5, k1=40), full[5:40], tol=1e-6,
               label="crop")

    @pytest.mark.parametrize("mode", ["twosided", "centered"])
    def test_modes(self, rng, mode):
        w = ss.windows.gaussian(8, std=2, sym=True)
        A = ShortTimeFFT(w, hop=3, fs=10, fft_mode=mode)
        B = ss.ShortTimeFFT(w, hop=3, fs=10, fft_mode=mode)
        x = rng.standard_normal(50)
        got = np.asarray(A.istft(B.stft(x).astype(np.complex64), k1=50))
        want = B.istft(B.stft(x), k1=50)
        _close(got[..., 0], want.real, label=f"{mode} re")
        assert np.max(np.abs(got[..., 1])) < 1e-4

    def test_batched(self, rng):
        A, B = _pair()
        x = rng.standard_normal(50)
        X = B.stft(np.stack([x, 2 * x])).astype(np.complex64)
        xr = A.istft(X, k1=50)
        _close(xr[1], 2 * x, tol=1e-4)

    def test_validation(self, rng):
        A, B = _pair()
        x = rng.standard_normal(50)
        S = np.asarray(A.stft(x))
        with pytest.raises(PlanError):
            A.istft(S[:-1], interleaved=True)       # wrong f_pts
        with pytest.raises(PlanError):
            A.istft(S, k0=-100, interleaved=True)


class TestConstructors:
    def test_from_window(self, rng):
        x = rng.standard_normal(50)
        A = ShortTimeFFT.from_window(("kaiser", 5), 100, 16, 12)
        B = ss.ShortTimeFFT.from_window(("kaiser", 5), 100, 16, 12)
        assert np.allclose(A.win, B.win) and A.hop == B.hop
        _close(A.stft(x), B.stft(x), label="fw stft")
        As = ShortTimeFFT.from_window("hann", 100, 16, 12,
                                      symmetric_win=True)
        Bs = ss.ShortTimeFFT.from_window("hann", 100, 16, 12,
                                         symmetric_win=True)
        assert np.allclose(As.win, Bs.win)

    def test_from_dual(self):
        w = ss.windows.gaussian(8, std=2, sym=True)
        d = ss.ShortTimeFFT(w, hop=3, fs=10).dual_win
        A = ShortTimeFFT.from_dual(d, 3, 10)
        B = ss.ShortTimeFFT.from_dual(d, 3, 10)
        assert np.allclose(A.win, B.win)
        assert np.allclose(A.dual_win, B.dual_win)

    def test_from_win_equals_dual(self, rng):
        w = ss.windows.gaussian(8, std=2, sym=True)
        for sc in (None, "unitary"):
            A = ShortTimeFFT.from_win_equals_dual(w, 3, 10, scale_to=sc)
            B = ss.ShortTimeFFT.from_win_equals_dual(w, 3, 10, scale_to=sc)
            assert np.allclose(A.win, B.win)
            assert np.allclose(A.dual_win, B.dual_win)
        x = rng.standard_normal(50)
        _close(A.stft(x), B.stft(x), label="unitary stft")

    def test_non_invertible(self):
        w = np.zeros(8)
        w[:2] = 1.0
        A = ShortTimeFFT(w, hop=4, fs=1)
        assert not A.invertible
        with pytest.raises(PlanError):
            _ = A.dual_win


class TestReviewRegressions:
    """Round-3 review findings."""

    @pytest.mark.parametrize("m,hop,n", [(7, 3, 41), (9, 5, 37),
                                         (5, 2, 23)])
    def test_istft_default_k1_odd_window(self, rng, m, hop, n):
        w = np.hanning(m) + 0.1
        A = ShortTimeFFT(w, hop=hop, fs=7)
        B = ss.ShortTimeFFT(w, hop=hop, fs=7)
        x = rng.standard_normal(n)
        _close(A.istft(B.stft(x).astype(np.complex64)),
               B.istft(B.stft(x)), label=f"m{m}h{hop}")

    def test_istft_k1_bound_clean_error(self, rng):
        A, _ = _pair()
        S = np.asarray(A.stft(rng.standard_normal(50)))
        with pytest.raises(PlanError):
            A.istft(S, k1=60, interleaved=True)
        # the true end of the overlap-add IS reachable
        q = S.shape[-2]
        k_hi = A.k_min + (q - 1) * A.hop + A.m_num
        A.istft(S, k0=k_hi - 5, k1=k_hi, interleaved=True)

    def test_short_signal_pads_like_scipy(self, rng):
        A, B = _pair()
        xs = rng.standard_normal(5)
        _close(A.stft(xs), B.stft(xs), label="short")

    def test_negative_sum_window_magnitude_scaling(self, rng):
        w = -ss.windows.gaussian(8, std=2, sym=True)
        A = ShortTimeFFT(w, hop=3, fs=10, scale_to="magnitude")
        B = ss.ShortTimeFFT(w, hop=3, fs=10, scale_to="magnitude")
        assert np.isclose(A.fac_magnitude, B.fac_magnitude)
        x = rng.standard_normal(50)
        _close(A.stft(x), B.stft(x), label="neg win")


class TestPhaseShiftModulo:
    """Deep-fuzz regression: the FFT-input roll is
    (phase_shift + m_num_mid) mod m_num (the WINDOW length, not mfft) —
    negative shifts with odd windows diverged before."""

    @pytest.mark.parametrize("m,mfft,ps", [
        (3, 6, -2), (3, 6, 4), (5, 7, -3), (4, 8, 6), (5, 12, -4)])
    def test_matches_scipy(self, rng, m, mfft, ps):
        w = rng.uniform(0.2, 1.0, m)
        x = rng.standard_normal(60)
        A = ShortTimeFFT(w, hop=1, fs=3, fft_mode="twosided", mfft=mfft,
                         phase_shift=ps)
        B = ss.ShortTimeFFT(w, hop=1, fs=3, fft_mode="twosided",
                            mfft=mfft, phase_shift=ps)
        _close(A.stft(x), B.stft(x), label=f"m{m} mfft{mfft} ps{ps}")
