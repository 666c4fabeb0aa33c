"""jit-composition of the DSP device paths + the plan-cache tracer
regression.

The critical contract: a plan built LAZILY INSIDE a caller's jit trace
(facade calls compose under jit, so this happens whenever the first
call for a shape is jitted) must not capture tracers in the long-lived
plan cache — the next eager exec used to die with
UnexpectedTracerError.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import scipy.signal as ss

from webgpufft_tpu import filtering as FL
from webgpufft_tpu import ShortTimeFFT
from webgpufft_tpu import fft as wfft


@pytest.fixture
def x256():
    return np.random.default_rng(0).standard_normal(256).astype(np.float32)


class TestPlanCacheTracerRegression:
    def test_jit_first_then_eager(self, x256):
        """Build the plan inside a jit trace, then run eagerly."""
        # a shape no other test uses, so the jitted call builds the plan
        x = x256[:251]
        f = jax.jit(lambda v: wfft.rfft(v, n=251))
        yj = f(x)
        y = wfft.rfft(x, n=251)                 # must not raise
        assert np.allclose(np.asarray(y), np.asarray(yj), atol=1e-5)

    def test_shorttimefft_jit_then_eager(self, x256):
        A = ShortTimeFFT(ss.windows.gaussian(16, 4), hop=4, fs=10)
        Sj = jax.jit(A.stft)(x256)
        S = np.asarray(A.stft(x256))
        assert np.max(np.abs(np.asarray(Sj) - S)) < 1e-5
        xr = jax.jit(lambda s: A.istft(s, k1=256, interleaved=True))(S)
        xe = A.istft(S, k1=256, interleaved=True)
        assert np.max(np.abs(np.asarray(xr) - np.asarray(xe))) < 1e-5


class TestJitCompose:
    def test_sosfilt(self, x256):
        sos = ss.butter(4, 0.3, output="sos")
        yj = jax.jit(lambda v: FL.sosfilt(sos, v))(x256)
        ye = FL.sosfilt(sos, x256)
        assert np.allclose(np.asarray(yj), np.asarray(ye), atol=1e-6)

    def test_lfilter_fir(self, x256):
        b = ss.firwin(17, 0.3)
        yj = jax.jit(lambda v: FL.lfilter(b, 1.0, v))(x256)
        assert np.allclose(np.asarray(yj),
                           np.asarray(FL.lfilter(b, 1.0, x256)), atol=1e-5)

    def test_envelope(self, x256):
        yj = jax.jit(lambda v: wfft.envelope(v, residual=None))(x256)
        ye = wfft.envelope(x256, residual=None)
        assert np.allclose(np.asarray(yj), np.asarray(ye), atol=1e-5)

    def test_medfilt_and_splines(self, x256):
        yj = jax.jit(lambda v: FL.medfilt(v, 5))(x256)
        assert np.array_equal(np.asarray(yj),
                              np.asarray(FL.medfilt(x256, 5)))
        cj = jax.jit(FL.cspline1d)(x256)
        assert np.allclose(np.asarray(cj), np.asarray(FL.cspline1d(x256)),
                           atol=1e-5)

    def test_grad_through_device_paths(self, x256):
        """The device scans/filters differentiate."""
        sos = ss.butter(2, 0.3, output="sos")

        def loss(v):
            return jnp.sum(FL.sosfilt(sos, v) ** 2)

        g = jax.grad(loss)(jnp.asarray(x256))
        assert np.all(np.isfinite(np.asarray(g)))
        eps = 1e-3
        d = np.zeros_like(x256)
        d[100] = 1.0
        num = (loss(jnp.asarray(x256 + eps * d))
               - loss(jnp.asarray(x256 - eps * d))) / (2 * eps)
        assert abs(float(num) - float(np.asarray(g)[100])) < 1e-1
