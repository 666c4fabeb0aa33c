"""B-spline toolbox (webgpufft_tpu.splines) vs scipy.signal.

The boundary ICs are host f64 (must match scipy's truncated mirror sums,
including the early-stop-at-zero-crossing quirk of the C kernels); the
recursions run on device in f32, so results are pinned at ~1e-4.
"""

import numpy as np
import pytest

import scipy.signal as ss

from webgpufft_tpu import splines as SP
from webgpufft_tpu import PlanError


@pytest.fixture
def rng():
    return np.random.default_rng(1)


def _close(a, b, tol=1e-4, label=""):
    a = np.asarray(a)
    b = np.asarray(b)
    assert a.shape == b.shape, (label, a.shape, b.shape)
    err = np.max(np.abs(a - b)) / max(np.max(np.abs(b)), 1e-30)
    assert err < tol, (label, err)


class TestGaussSpline:
    def test_matches_scipy(self):
        x = np.linspace(-3, 3, 41)
        for n in (1, 3, 5):
            _close(SP.gauss_spline(x, n), ss.gauss_spline(x, n), tol=1e-6)


class TestPrefilters:
    def test_cspline1d(self, rng):
        x = rng.standard_normal(80)
        _close(SP.cspline1d(x), ss.cspline1d(x), tol=1e-5)

    def test_qspline1d(self, rng):
        x = rng.standard_normal(80)
        _close(SP.qspline1d(x), ss.qspline1d(x), tol=1e-5)

    @pytest.mark.parametrize("lamb", [0.5, 2.0])
    def test_cspline1d_smoothing(self, rng, lamb):
        x = rng.standard_normal(80)
        _close(SP.cspline1d(x, lamb), ss.cspline1d(x, lamb), tol=1e-5)

    def test_single_sample(self):
        _close(SP.cspline1d(np.array([2.5])), ss.cspline1d(np.array([2.5])),
               tol=1e-6)

    def test_qspline1d_smoothing_unsupported(self):
        with pytest.raises(PlanError):
            SP.qspline1d(np.zeros(10), 0.5)


class TestSymiir:
    @pytest.mark.parametrize("c0,z1", [(2.0, 0.4), (1.5, -0.3), (6.0, 0.73)])
    def test_order1(self, rng, c0, z1):
        x = rng.standard_normal(120)
        _close(SP.symiirorder1(x, c0, z1), ss.symiirorder1(x, c0, z1),
               tol=1e-5)

    def test_order1_batched(self, rng):
        x = rng.standard_normal((3, 100))
        _close(SP.symiirorder1(x, 1.5, -0.3), ss.symiirorder1(x, 1.5, -0.3),
               tol=1e-5)

    @pytest.mark.parametrize("r,omega", [
        (0.5, 0.3), (0.35, 1.1), (0.7, 2.0)])
    def test_order2(self, rng, r, omega):
        x = rng.standard_normal(100)
        _close(SP.symiirorder2(x, r, omega), ss.symiirorder2(x, r, omega),
               tol=1e-5)

    def test_order2_explicit_precision(self, rng):
        x = rng.standard_normal(100)
        _close(SP.symiirorder2(x, 0.5, 0.3, 1e-6),
               ss.symiirorder2(x, 0.5, 0.3, 1e-6), tol=1e-5)

    def test_validation(self):
        with pytest.raises(PlanError):
            SP.symiirorder1(np.zeros(10), 1.0, 1.5)     # |z1| >= 1
        with pytest.raises(PlanError):
            SP.symiirorder2(np.zeros(10), 1.5, 0.3)     # r >= 1
        with pytest.raises(PlanError):
            SP.symiirorder1(np.zeros(4), 1.0, 0.9)      # too short


class Test2D:
    def test_cspline2d(self, rng):
        im = rng.standard_normal((40, 50))
        _close(SP.cspline2d(im), ss.cspline2d(im), tol=1e-5)

    @pytest.mark.parametrize("lamb", [1.0, 3.0])
    def test_cspline2d_smoothing(self, rng, lamb):
        im = rng.standard_normal((40, 50))
        _close(SP.cspline2d(im, lamb), ss.cspline2d(im, lamb), tol=1e-4)

    def test_qspline2d(self, rng):
        im = rng.standard_normal((40, 50))
        _close(SP.qspline2d(im), ss.qspline2d(im), tol=1e-5)

    def test_spline_filter(self, rng):
        im = rng.standard_normal((40, 50))
        _close(SP.spline_filter(im, 0.1), ss.spline_filter(im, 0.1),
               tol=1e-4)
        _close(SP.spline_filter(im), ss.spline_filter(im), tol=1e-4)

    def test_validation(self):
        with pytest.raises(PlanError):
            SP.cspline2d(np.zeros(10))
        with pytest.raises(PlanError):
            SP.qspline2d(np.zeros((30, 30)), 0.5)   # lamb > 0


class TestEval:
    def test_cspline1d_eval(self, rng):
        x = rng.standard_normal(80)
        cj = ss.cspline1d(x)
        newx = np.array([-5.3, -0.2, 0.0, 3.7, 40.1, 78.9, 79.0, 85.4,
                         160.2])
        _close(SP.cspline1d_eval(cj, newx), ss.cspline1d_eval(cj, newx),
               tol=1e-5)

    def test_qspline1d_eval(self, rng):
        x = rng.standard_normal(80)
        qj = ss.qspline1d(x)
        newx = np.linspace(-10, 90, 73)
        _close(SP.qspline1d_eval(qj, newx), ss.qspline1d_eval(qj, newx),
               tol=1e-5)

    def test_dx_x0(self, rng):
        cj = ss.cspline1d(rng.standard_normal(40))
        newx = np.array([1.0, 2.5, 7.25])
        _close(SP.cspline1d_eval(cj, newx, dx=0.5, x0=1.0),
               ss.cspline1d_eval(cj, newx, dx=0.5, x0=1.0), tol=1e-5)

    def test_interpolation_property(self, rng):
        """At the knots, the cubic spline reproduces the signal."""
        x = rng.standard_normal(50)
        cj = SP.cspline1d(x)
        knots = np.arange(50, dtype=np.float64)
        _close(SP.cspline1d_eval(cj, knots), x, tol=1e-4,
               label="knot reproduction")


class TestSepfir2d:
    def test_matches_scipy(self, rng):
        im = rng.standard_normal((6, 7))
        h3 = np.array([1.0, 2.0, 1.0]) / 4
        h5 = np.array([1, 4, 6, 4, 1.0]) / 16
        _close(SP.sepfir2d(im, h3, h3), ss.sepfir2d(im, h3, h3), tol=1e-5)
        _close(SP.sepfir2d(im, h5, h3), ss.sepfir2d(im, h5, h3), tol=1e-5)

    def test_validation(self):
        with pytest.raises(PlanError):
            SP.sepfir2d(np.zeros((4, 4)), np.ones(2), np.ones(3))
        with pytest.raises(PlanError):
            SP.sepfir2d(np.zeros(4), np.ones(3), np.ones(3))


class TestNamespace:
    def test_reexported_in_filtering(self):
        from webgpufft_tpu import filtering as FL
        assert FL.cspline1d is SP.cspline1d
        assert "symiirorder2" in FL.__all__
