"""Peak finding (webgpufft_tpu.peaks) vs scipy.signal.

Host analysis math: indices and every property array must match scipy
EXACTLY (same filter order, same plateau handling, same interpolation).
"""

import warnings

import numpy as np
import pytest

import scipy.signal as ss

from webgpufft_tpu import peaks as P
from webgpufft_tpu import PlanError


@pytest.fixture
def rng():
    return np.random.default_rng(3)


SIGNALS = {
    "noise": lambda r: r.standard_normal(500),
    "sine": lambda r: np.sin(np.linspace(0, 20 * np.pi, 1000))
    + 0.3 * r.standard_normal(1000),
    "plateau": lambda r: np.array([0, 1, 1, 1, 0, 2, 2, 0, 3, 0, 1, 0],
                                  float),
    "steps": lambda r: np.repeat(r.standard_normal(30), 3),
    "edge": lambda r: np.array([5, 1, 2, 1, 5.0]),
    "short": lambda r: np.array([1.0, 2.0]),
}

CONDITIONS = [
    {},
    {"height": 0.5},
    {"height": (0.1, 1.5)},
    {"threshold": 0.2},
    {"distance": 5},
    {"prominence": 0.5},
    {"width": 2},
    {"prominence": 0.3, "wlen": 21},
    {"plateau_size": 1},
    {"plateau_size": (2, None)},
    {"height": 0, "threshold": 0.05, "distance": 3, "prominence": 0.2,
     "width": (1, 30), "rel_height": 0.7},
]


class TestFindPeaks:
    @pytest.mark.parametrize("sig", list(SIGNALS))
    @pytest.mark.parametrize("cond", range(len(CONDITIONS)))
    def test_matches_scipy(self, rng, sig, cond):
        x = SIGNALS[sig](rng)
        kw = CONDITIONS[cond]
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            gp, gd = P.find_peaks(x, **kw)
            wp, wd = ss.find_peaks(x, **kw)
        assert np.array_equal(gp, wp), (sig, kw)
        assert set(gd) == set(wd)
        for k in wd:
            assert np.allclose(gd[k], wd[k], atol=1e-12), (sig, kw, k)

    def test_array_valued_bounds(self, rng):
        x = SIGNALS["sine"](rng)
        hmin = np.full(x.size, 0.4)
        gp, gd = P.find_peaks(x, height=hmin)
        wp, wd = ss.find_peaks(x, height=hmin)
        assert np.array_equal(gp, wp)
        assert np.allclose(gd["peak_heights"], wd["peak_heights"])

    def test_validation(self):
        with pytest.raises(PlanError):
            P.find_peaks(np.zeros((3, 3)))
        with pytest.raises(PlanError):
            P.find_peaks(np.zeros(10), distance=0.5)
        with pytest.raises(PlanError):
            P.find_peaks(np.zeros(10), prominence=1, wlen=1)


class TestProminencesWidths:
    @pytest.mark.parametrize("wlen", [None, 15, 40.5])
    def test_prominences(self, rng, wlen):
        x = SIGNALS["sine"](rng)
        pk = ss.find_peaks(x)[0]
        got = P.peak_prominences(x, pk, wlen)
        want = ss.peak_prominences(x, pk, wlen)
        for a, b in zip(got, want):
            assert np.allclose(a, b, atol=1e-12)

    @pytest.mark.parametrize("rel_height", [0.5, 0.3, 1.0])
    def test_widths(self, rng, rel_height):
        x = SIGNALS["sine"](rng)
        pk = ss.find_peaks(x)[0]
        got = P.peak_widths(x, pk, rel_height=rel_height)
        want = ss.peak_widths(x, pk, rel_height=rel_height)
        for a, b in zip(got, want):
            assert np.allclose(a, b, atol=1e-12)

    def test_zero_prominence_warns(self):
        # a monotone ramp index is not a real peak -> prominence 0,
        # which scipy reports with a warning
        x = np.arange(5, dtype=float)
        with pytest.warns(UserWarning):
            got = P.peak_prominences(x, np.array([2]))
        with pytest.warns(Warning):
            want = ss.peak_prominences(x, np.array([2]))
        for a, b in zip(got, want):
            assert np.allclose(a, b)

    def test_validation(self):
        with pytest.raises(PlanError):
            P.peak_prominences(np.zeros(5), np.array([9]))
        with pytest.raises(PlanError):
            P.peak_prominences(np.zeros(5), np.array([1.5]))
        with pytest.raises(PlanError):
            P.peak_widths(np.zeros(5), np.array([2]), rel_height=-1)


class TestArgrel:
    @pytest.mark.parametrize("axis", [0, 1])
    @pytest.mark.parametrize("order", [1, 3])
    @pytest.mark.parametrize("mode", ["clip", "wrap"])
    def test_minmax_2d(self, rng, axis, order, mode):
        m = rng.standard_normal((40, 30))
        for fg, fs in [(P.argrelmax, ss.argrelmax),
                       (P.argrelmin, ss.argrelmin)]:
            got = fg(m, axis=axis, order=order, mode=mode)
            want = fs(m, axis=axis, order=order, mode=mode)
            for a, b in zip(got, want):
                assert np.array_equal(a, b)

    def test_extrema_custom_comparator(self, rng):
        m = rng.standard_normal((25, 25))
        got = P.argrelextrema(m, np.greater_equal, axis=1, order=2)
        want = ss.argrelextrema(m, np.greater_equal, axis=1, order=2)
        for a, b in zip(got, want):
            assert np.array_equal(a, b)

    def test_validation(self):
        with pytest.raises(PlanError):
            P.argrelmax(np.zeros(10), order=0)


class TestNamespace:
    def test_reexported_in_filtering(self):
        from webgpufft_tpu import filtering as FL
        assert FL.find_peaks is P.find_peaks
        assert "find_peaks" in FL.__all__

    def test_device_chain(self, rng):
        """welch on device -> find_peaks on host: the canonical workflow."""
        from webgpufft_tpu import fft as wfft
        t = np.arange(2048) / 1000.0
        x = (np.sin(2 * np.pi * 100 * t) + 0.5 * np.sin(2 * np.pi * 270 * t)
             + 0.1 * rng.standard_normal(t.size)).astype(np.float32)
        f, Pxx = wfft.welch(x, fs=1000.0, nperseg=512)
        pk, props = P.find_peaks(np.asarray(Pxx), prominence=1e-3)
        freqs = np.asarray(f)[pk]
        assert np.any(np.abs(freqs - 100.0) < 4)
        assert np.any(np.abs(freqs - 270.0) < 4)
