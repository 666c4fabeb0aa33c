"""Window zoo (webgpufft_tpu.windows) vs scipy.signal.windows.

Host f64 tables: every window must match scipy value-for-value (the
framework's STFT/FIR/spectral machinery resolves windows through this
module, with scipy reduced to the test oracle).
"""

import warnings

import numpy as np
import pytest

import scipy.signal as ss
import scipy.signal.windows as sw

from webgpufft_tpu import windows as W
from webgpufft_tpu import PlanError

PLAIN = [
    "boxcar", "triang", "parzen", "bohman", "blackman", "nuttall",
    "blackmanharris", "flattop", "bartlett", "barthann", "hamming",
    "hann", "cosine", "lanczos",
]


class TestPlainWindows:
    @pytest.mark.parametrize("name", PLAIN)
    @pytest.mark.parametrize("M", [0, 1, 2, 8, 9, 16, 17])
    @pytest.mark.parametrize("sym", [True, False])
    def test_matches_scipy(self, name, M, sym):
        got = getattr(W, name)(M, sym=sym)
        want = getattr(sw, name)(M, sym=sym)
        assert got.shape == want.shape
        if got.size:
            assert np.max(np.abs(got - want)) < 1e-13, (name, M, sym)


class TestParametricWindows:
    @pytest.mark.parametrize("M", [8, 9, 16, 1])
    @pytest.mark.parametrize("sym", [True, False])
    def test_matches_scipy(self, M, sym):
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            cases = [
                (W.kaiser(M, 8.6, sym), sw.kaiser(M, 8.6, sym)),
                (W.gaussian(M, 2.5, sym), sw.gaussian(M, 2.5, sym)),
                (W.general_gaussian(M, 1.5, 3, sym),
                 sw.general_gaussian(M, 1.5, 3, sym)),
                (W.general_hamming(M, 0.7, sym),
                 sw.general_hamming(M, 0.7, sym)),
                (W.general_cosine(M, [0.4, 0.4, 0.2], sym),
                 sw.general_cosine(M, [0.4, 0.4, 0.2], sym)),
                (W.chebwin(M, 80, sym), sw.chebwin(M, 80, sym)),
                (W.tukey(M, 0.4, sym), sw.tukey(M, 0.4, sym)),
                (W.taylor(M, 5, 40, True, sym),
                 sw.taylor(M, 5, 40, norm=True, sym=sym)),
                (W.exponential(M, None, 2.0, sym),
                 sw.exponential(M, None, 2.0, sym)),
            ]
        for i, (got, want) in enumerate(cases):
            assert got.shape == want.shape
            if got.size:
                assert np.max(np.abs(got - want)) < 1e-12, (i, M, sym)

    def test_tukey_degenerate(self):
        assert np.array_equal(W.tukey(8, 0.0), sw.tukey(8, 0.0))
        assert np.allclose(W.tukey(8, 1.5), sw.tukey(8, 1.5))

    def test_kbd(self):
        for M in (8, 16):
            assert np.allclose(W.kaiser_bessel_derived(M, 8.6),
                               sw.kaiser_bessel_derived(M, 8.6),
                               atol=1e-13)
        with pytest.raises(PlanError):
            W.kaiser_bessel_derived(9, 8.6)
        with pytest.raises(PlanError):
            W.kaiser_bessel_derived(8, 8.6, sym=False)

    def test_exponential_center_asym_only(self):
        assert np.allclose(W.exponential(9, 2.0, 1.5, sym=False),
                           sw.exponential(9, 2.0, 1.5, sym=False))
        with pytest.raises(PlanError):
            W.exponential(9, 2.0, 1.5, sym=True)

    def test_taylor_unnormalized(self):
        assert np.allclose(W.taylor(16, 4, 30, norm=False),
                           sw.taylor(16, 4, 30, norm=False), atol=1e-12)


class TestDpss:
    @pytest.mark.parametrize("norm", [2, "approximate", "subsample"])
    @pytest.mark.parametrize("M,NW,K", [(64, 3, 4), (33, 2.5, 3)])
    def test_matches_scipy(self, M, NW, K, norm):
        got = W.dpss(M, NW, K, norm=norm)
        want = sw.dpss(M, NW, K, norm=norm)
        assert np.max(np.abs(got - want)) < 1e-10

    def test_ratios_and_singleton(self):
        got, rg = W.dpss(64, 3, 4, return_ratios=True)
        want, rw = sw.dpss(64, 3, 4, return_ratios=True)
        assert np.max(np.abs(rg - rw)) < 1e-10
        assert np.max(np.abs(W.dpss(64, 3) - sw.dpss(64, 3))) < 1e-10
        assert np.max(np.abs(W.dpss(64, 3, sym=False)
                             - sw.dpss(64, 3, sym=False))) < 1e-10

    def test_validation(self):
        with pytest.raises(PlanError):
            W.dpss(16, 9)           # NW >= M/2
        with pytest.raises(PlanError):
            W.dpss(16, 3, 0)        # Kmax < 1
        with pytest.raises(PlanError):
            W.dpss(16, 3, norm="bad")


class TestGetWindow:
    SPECS = ["hann", "hamming", "blackmanharris", ("kaiser", 8.6),
             ("tukey", 0.3), 7.2, ("chebwin", 60), ("gaussian", 2.0),
             ("exponential", None, 1.5), ("dpss", 3), "flattop",
             ("general_hamming", 0.7)]

    @pytest.mark.parametrize("spec", range(len(SPECS)))
    def test_matches_scipy(self, spec):
        s = self.SPECS[spec]
        got = W.get_window(s, 32)
        want = ss.get_window(s, 32)
        assert got.shape == want.shape
        assert np.max(np.abs(got - want)) < 1e-12
        got = W.get_window(s, 33, fftbins=False)
        want = ss.get_window(s, 33, fftbins=False)
        assert np.max(np.abs(got - want)) < 1e-12

    def test_aliases(self):
        for alias, canon in [("han", "hann"), ("ham", "hamming"),
                             ("blk", "blackman"), ("bart", "bartlett")]:
            assert np.allclose(W.get_window(alias, 16),
                               W.get_window(canon, 16))

    def test_validation(self):
        with pytest.raises(PlanError):
            W.get_window("nosuchwindow", 16)
        with pytest.raises(PlanError):
            W.get_window(("kaiser",), 16)       # missing param
        with pytest.raises(PlanError):
            W.get_window(("hann", 1.0), 16)     # unexpected param

    def test_framework_resolution_uses_this_module(self):
        """fftapi.get_window (what stft/welch/firwin consume) resolves
        through this zoo."""
        from webgpufft_tpu.fftapi import get_window as fa_gw
        assert np.allclose(fa_gw(("kaiser", 5.0), 24),
                           W.get_window(("kaiser", 5.0), 24).astype(
                               np.float32))
