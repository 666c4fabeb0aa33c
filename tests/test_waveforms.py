"""Waveform generators (webgpufft_tpu.waveforms) vs scipy.signal.

Oracle is scipy.signal itself.  Concrete inputs take the host-f64 phase
path (pinned to f32 rounding of the f64 result); traced inputs take the
jnp path (pinned looser — f32 phase accumulation).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import scipy.signal as ss

from webgpufft_tpu import waveforms as W
from webgpufft_tpu import PlanError
from webgpufft_tpu.fftapi import ascomplex


def _close(a, b, tol=1e-5, label=""):
    a = np.asarray(a)
    b = np.asarray(b)
    if np.iscomplexobj(b) and not np.iscomplexobj(a):
        a = ascomplex(a)
    assert a.shape == b.shape, (label, a.shape, b.shape)
    err = np.max(np.abs(a - b)) / max(np.max(np.abs(b)), 1e-12)
    assert err < tol, (label, err)


class TestChirp:
    @pytest.mark.parametrize("method", [
        "linear", "quadratic", "logarithmic", "hyperbolic"])
    def test_methods(self, method):
        t = np.linspace(0, 10, 3001)
        _close(W.chirp(t, 1.5, 10, 25, method=method, phi=30),
               ss.chirp(t, 1.5, 10, 25, method=method, phi=30),
               label=method)

    def test_vertex_zero_false(self):
        t = np.linspace(0, 10, 2001)
        _close(W.chirp(t, 1.5, 10, 25, method="quadratic",
                       vertex_zero=False),
               ss.chirp(t, 1.5, 10, 25, method="quadratic",
                        vertex_zero=False))

    def test_complex_analytic(self):
        t = np.linspace(0, 10, 2001)
        got = W.chirp(t, 1.5, 10, 25, complex=True)
        assert got.shape == (2001, 2)
        _close(got, ss.chirp(t, 1.5, 10, 25, complex=True))

    def test_descending_and_negative_sweeps(self):
        t = np.linspace(0, 4, 801)
        _close(W.chirp(t, 25, 4, 1.5, method="logarithmic"),
               ss.chirp(t, 25, 4, 1.5, method="logarithmic"))
        _close(W.chirp(t, -2, 4, -10, method="hyperbolic"),
               ss.chirp(t, -2, 4, -10, method="hyperbolic"))

    def test_equal_endpoints(self):
        t = np.linspace(0, 4, 801)
        for method in ("logarithmic", "hyperbolic"):
            _close(W.chirp(t, 5, 4, 5, method=method),
                   ss.chirp(t, 5, 4, 5, method=method), label=method)

    def test_traced_path(self):
        t = np.linspace(0, 1, 257)
        f = jax.jit(lambda tv: W.chirp(tv, 2.0, 1.0, 8.0))
        _close(f(jnp.asarray(t, jnp.float32)),
               ss.chirp(t, 2.0, 1.0, 8.0), tol=2e-4, label="traced")

    def test_validation(self):
        t = np.linspace(0, 1, 65)
        with pytest.raises(PlanError):
            W.chirp(t, -1, 1, 2, method="logarithmic")
        with pytest.raises(PlanError):
            W.chirp(t, 0, 1, 2, method="hyperbolic")
        with pytest.raises(PlanError):
            W.chirp(t, 1, 1, 2, method="cubic")


class TestSweepPoly:
    def test_poly1d_and_coeffs(self):
        t = np.linspace(0, 10, 2001)
        p = np.poly1d([0.05, -0.75, 2.5, 1.0])
        _close(W.sweep_poly(t, p, phi=20), ss.sweep_poly(t, p, phi=20))
        _close(W.sweep_poly(t, [0.1, 1.0]), ss.sweep_poly(t, [0.1, 1.0]))

    def test_traced(self):
        t = np.linspace(0, 1, 129)
        f = jax.jit(lambda tv: W.sweep_poly(tv, [0.5, 2.0]))
        _close(f(jnp.asarray(t, jnp.float32)),
               ss.sweep_poly(t, [0.5, 2.0]), tol=2e-4)


class TestGausspulse:
    def test_default(self):
        t = np.linspace(-0.01, 0.01, 2001)
        _close(W.gausspulse(t, fc=1000), ss.gausspulse(t, fc=1000))

    def test_quad_env(self):
        t = np.linspace(-0.01, 0.01, 2001)
        got = W.gausspulse(t, fc=1000, retquad=True, retenv=True)
        exp = ss.gausspulse(t, fc=1000, retquad=True, retenv=True)
        for g, e, nm in zip(got, exp, ("i", "q", "env")):
            _close(g, e, label=nm)

    def test_bw_bwr(self):
        t = np.linspace(-0.01, 0.01, 1001)
        _close(W.gausspulse(t, fc=1000, bw=0.8, bwr=-3),
               ss.gausspulse(t, fc=1000, bw=0.8, bwr=-3))

    def test_cutoff(self):
        assert np.isclose(W.gausspulse("cutoff", fc=500, tpr=-40),
                          ss.gausspulse("cutoff", fc=500, tpr=-40))

    def test_validation(self):
        with pytest.raises(PlanError):
            W.gausspulse(np.zeros(4), fc=-1)
        with pytest.raises(PlanError):
            W.gausspulse(np.zeros(4), bw=0)
        with pytest.raises(PlanError):
            W.gausspulse(np.zeros(4), bwr=1)
        with pytest.raises(PlanError):
            W.gausspulse("middle")
        with pytest.raises(PlanError):
            W.gausspulse("cutoff", tpr=3)


class TestPeriodicWaves:
    @pytest.mark.parametrize("width", [1.0, 0.0, 0.5, 0.3])
    def test_sawtooth(self, width):
        t = np.linspace(0, 20, 4001)
        _close(W.sawtooth(t, width), ss.sawtooth(t, width),
               label=f"width={width}")

    @pytest.mark.parametrize("duty", [0.5, 0.2, 1.0, 0.0])
    def test_square(self, duty):
        t = np.linspace(0, 20, 4001)
        _close(W.square(t, duty), ss.square(t, duty),
               label=f"duty={duty}")

    def test_invalid_params_nan(self):
        t = np.linspace(0, 5, 33)
        assert np.all(np.isnan(np.asarray(W.sawtooth(t, 1.5))))
        assert np.all(np.isnan(np.asarray(W.square(t, -0.1))))

    def test_traced(self):
        t = np.linspace(0, 20, 801)
        f = jax.jit(lambda tv: W.square(tv, 0.3))
        _close(f(jnp.asarray(t, jnp.float32)), ss.square(t, 0.3),
               tol=1e-6)


class TestUnitImpulse:
    def test_shapes_and_idx(self):
        assert np.array_equal(W.unit_impulse(7), ss.unit_impulse(7))
        assert np.array_equal(W.unit_impulse((5, 5), "mid"),
                              ss.unit_impulse((5, 5), "mid"))
        assert np.array_equal(W.unit_impulse(9, 4), ss.unit_impulse(9, 4))
        assert np.array_equal(W.unit_impulse((4, 6), (1, 2)),
                              ss.unit_impulse((4, 6), (1, 2)))
        assert np.array_equal(W.unit_impulse((3, 3), 1),
                              ss.unit_impulse((3, 3), 1))

    def test_dtype(self):
        assert W.unit_impulse(5, dtype=int).dtype == jnp.asarray(
            np.zeros(1, int)).dtype
