"""Legacy scipy.fftpack namespace (webgpufft_tpu/fftpack.py).

Oracle is scipy.fftpack itself: the packed real-FFT format, the
unnormalized legacy idct/idst, the shape= ND params, and the
pseudo-differential operator family with fftpack's per-kernel Nyquist
conventions (diff zeroes the bin for every order; shift applies both
its cos and sin kernels there; imaginary-kernel operators zero it).
"""

import numpy as np
import pytest
import scipy.fftpack as fp

from webgpufft_tpu import fftpack as W


def _close(got, want, tol=3e-5, label=""):
    got = np.asarray(got)
    want = np.asarray(want)
    assert got.shape == want.shape, (label, got.shape, want.shape)
    e = np.max(np.abs(got - want)) / max(np.max(np.abs(want)), 1e-12)
    assert e < tol, (label, e)


@pytest.mark.parametrize("n", [7, 8, 15, 16])
def test_packed_rfft_irfft(rng, n):
    x = rng.standard_normal(n)
    _close(W.rfft(x), fp.rfft(x), label="rfft")
    _close(W.irfft(fp.rfft(x)), x, label="irfft-roundtrip")
    _close(W.irfft(W.rfft(x)), x, label="own-roundtrip")


def test_packed_rfft_axis_and_n(rng):
    x = rng.standard_normal((10, 3))
    _close(W.rfft(x, axis=0), fp.rfft(x, axis=0), label="axis0")
    _close(W.irfft(fp.rfft(x, axis=0), axis=0), x, label="iaxis0")
    y = rng.standard_normal((3, 10))
    _close(W.rfft(y, n=6), fp.rfft(y, n=6), label="crop")
    _close(W.rfft(y, n=14), fp.rfft(y, n=14), label="pad")


def test_packed_rfftfreq():
    _close(W.rfftfreq(7, 0.5), fp.rfftfreq(7, 0.5))
    _close(W.rfftfreq(8, 2.0), fp.rfftfreq(8, 2.0))


@pytest.mark.parametrize("type", [1, 2, 3, 4])
def test_legacy_trig_scaling(rng, type):
    """fftpack's norm=None idct/idst are UNNORMALIZED inverses."""
    x = rng.standard_normal(9)
    _close(W.dct(x, type=type), fp.dct(x, type=type), label="dct")
    _close(W.idct(x, type=type), fp.idct(x, type=type), label="idct")
    _close(W.dst(x, type=type), fp.dst(x, type=type), label="dst")
    _close(W.idst(x, type=type), fp.idst(x, type=type), label="idst")
    _close(W.idct(x, type=type, norm="ortho"),
           fp.idct(x, type=type, norm="ortho"), label="idct-ortho")


def test_nd_shape_param(rng):
    v = rng.standard_normal((4, 6))
    got = np.asarray(W.fftn(v, shape=(4, 4)))
    want = fp.fftn(v, shape=(4, 4))
    _close(got[..., 0] + 1j * got[..., 1], want, label="fftn-shape")
    _close(W.idctn(v), fp.idctn(v), label="idctn")
    _close(W.dstn(v, shape=(4, 4)), fp.dstn(v, shape=(4, 4)), label="dstn")


@pytest.mark.parametrize("n", [15, 16])
def test_pseudo_diff_family(rng, n):
    x = rng.standard_normal(n)
    x -= x.mean()
    for order in (1, 2, 3, 4):
        _close(W.diff(x, order), fp.diff(x, order), label=f"diff{order}")
        _close(W.diff(x, order, period=3.7), fp.diff(x, order, period=3.7),
               label=f"diff{order}-p")
    _close(W.hilbert(x), fp.hilbert(x), label="hilbert")
    _close(W.ihilbert(x), fp.ihilbert(x), label="ihilbert")
    _close(W.tilbert(x, 0.9), fp.tilbert(x, 0.9), label="tilbert")
    _close(W.itilbert(x, 0.9), fp.itilbert(x, 0.9), label="itilbert")
    _close(W.sc_diff(x, 0.5, 1.1), fp.sc_diff(x, 0.5, 1.1), label="sc")
    _close(W.cs_diff(x, 0.5, 1.1), fp.cs_diff(x, 0.5, 1.1), label="cs")
    _close(W.cc_diff(x, 0.5, 1.1), fp.cc_diff(x, 0.5, 1.1), label="cc")
    _close(W.ss_diff(x, 0.5, 1.1), fp.ss_diff(x, 0.5, 1.1), label="ss")
    for a in (0.6, 1.3):
        _close(W.shift(x, a), fp.shift(x, a), label=f"shift{a}")
        _close(W.shift(x, a, period=5.0), fp.shift(x, a, period=5.0),
               label=f"shift{a}-p")


def test_pseudo_diff_inverses(rng):
    # odd length: even n loses the Nyquist bin through these operators
    # (exactly as scipy.fftpack's do), so identity only holds for odd n
    x = rng.standard_normal(15)
    x -= x.mean()
    _close(W.itilbert(W.tilbert(x, 1.1), 1.1), x, tol=1e-4, label="tilbert-inv")
    _close(W.ihilbert(W.hilbert(x)), x - x.mean(), tol=1e-4,
           label="hilbert-inv")
    _close(W.diff(W.diff(x, 1), -1), x, tol=1e-4, label="antideriv")


def test_legacy_shape_minus_one_and_rank_mismatch(rng):
    """Review regressions: -1 shape entries keep the axis length; a
    shape/axes rank mismatch raises like legacy scipy (scipy.fft would
    silently take the last len(shape) axes)."""
    v = rng.standard_normal((3, 4, 6))
    got = np.asarray(W.fftn(v, shape=(-1, 4, 6)))
    want = fp.fftn(v, shape=(-1, 4, 6))
    _close(got[..., 0] + 1j * got[..., 1], want, label="shape-minus1")
    with pytest.raises(ValueError, match="same length"):
        W.fftn(v, shape=(4, 4))
    with pytest.raises(ValueError, match="same length"):
        fp.fftn(v, shape=(4, 4))          # oracle agrees
    with pytest.raises(ValueError, match="same length"):
        W.dctn(v, shape=(4, 4))
    _close(W.dctn(v, shape=(-1, 4), axes=(0, 2)),
           fp.dctn(v, shape=(-1, 4), axes=(0, 2)), label="dctn-minus1")


def test_duplicate_axes_raise_like_scipy(rng):
    """scipy.fftpack raises 'all axes must be unique' (the facade
    underneath follows numpy's transform-per-occurrence); mixed-sign
    duplicates count."""
    v = rng.standard_normal((3, 4)) + 1j * rng.standard_normal((3, 4))
    for axes in ((1, 1), (1, -1)):
        with pytest.raises(ValueError, match="unique"):
            W.fftn(v, axes=axes)
        with pytest.raises(ValueError, match="unique"):
            fp.fftn(v, axes=axes)         # oracle agrees
        with pytest.raises(ValueError, match="unique"):
            W.dctn(v.real, axes=axes)
    got = np.asarray(W.fftn(v, axes=(0, -1)))   # distinct mixed-sign fine
    _close(got[..., 0] + 1j * got[..., 1], fp.fftn(v, axes=(0, -1)),
           label="mixed-sign distinct")
    # review regression: the guard must normalize against the COMPLEX
    # rank for interleaved (..., 2) inputs — (1, -2) is the distinct
    # (1, 0) there, while (1, -1) is a true duplicate
    zi = np.stack([v.real, v.imag], -1).astype(np.float32)
    got = np.asarray(W.fft2(zi, axes=(1, -2)))
    _close(got[..., 0] + 1j * got[..., 1],
           fp.fft2(v, axes=(1, -2)), label="interleaved mixed-sign")
    with pytest.raises(ValueError, match="unique"):
        W.fft2(zi, axes=(1, -1))
    # second review pass: shape= length-validation and -1 resolution
    # must also use the COMPLEX rank for interleaved inputs
    got = np.asarray(W.fftn(zi, shape=(3, 4)))
    _close(got[..., 0] + 1j * got[..., 1], fp.fftn(v, shape=(3, 4)),
           label="interleaved shape=")
    got = np.asarray(W.fft2(zi, shape=(-1, -1), axes=(-2, -1)))
    _close(got[..., 0] + 1j * got[..., 1],
           fp.fft2(v, shape=(-1, -1), axes=(-2, -1)),
           label="interleaved shape=-1")


def test_packed_irfft_n_crop_pad(rng):
    """Legacy irfft n= crops/pads the packed spectrum."""
    x = rng.standard_normal(10)
    _close(W.irfft(x, n=6), fp.irfft(x, n=6), label="crop")
    _close(W.irfft(x, n=13), fp.irfft(x, n=13), label="pad")
    v = rng.standard_normal((3, 10))
    _close(W.irfft(v, n=6, axis=1), fp.irfft(v, n=6, axis=1), label="crop-ax")


def test_rfftfreq_validation():
    with pytest.raises(TypeError):
        W.rfftfreq(7.5)
    with pytest.raises(ValueError):
        W.rfftfreq(-3)


def test_multiplier_tables_are_cached(rng):
    from webgpufft_tpu import fftpack as WP
    WP._MULT_CACHE.clear()
    x = rng.standard_normal(12)
    WP.tilbert(x, 0.7)
    assert len(WP._MULT_CACHE) == 1
    WP.tilbert(rng.standard_normal(12), 0.7)   # same key: no new entry
    assert len(WP._MULT_CACHE) == 1
    WP.tilbert(x, 0.8)
    assert len(WP._MULT_CACHE) == 2


def test_surface_complete():
    for name in fp.__all__:
        assert hasattr(W, name), f"fftpack.{name} missing"


class TestConvolveModule:
    """scipy.fftpack.convolve parity (webgpufft_tpu/fftpack_convolve.py):
    the packed-slot kernel layout, the swap_real_imag pair swap, and the
    convolve_z sum identity, all vs the live compiled scipy module."""

    def _mods(self):
        from scipy.fftpack import convolve as scv
        from webgpufft_tpu.fftpack import convolve as wcv
        return scv, wcv

    def test_importable_as_submodule(self):
        import webgpufft_tpu.fftpack.convolve as wcv2
        _, wcv = self._mods()
        assert wcv2 is wcv
        for name in ("init_convolution_kernel", "convolve", "convolve_z",
                     "destroy_convolve_cache"):
            assert hasattr(wcv, name)

    @pytest.mark.parametrize("n", [1, 2, 7, 8, 16, 33])
    @pytest.mark.parametrize("d", [0, 1, 2, 3])
    def test_init_convolution_kernel(self, n, d):
        scv, wcv = self._mods()
        for zn in (None, 0, 1):
            kw = {} if zn is None else {"zero_nyquist": zn}
            ref = scv.init_convolution_kernel(
                n, lambda k: 1.0 / (1.0 + k), d=d, **kw)
            got = wcv.init_convolution_kernel(
                n, lambda k: 1.0 / (1.0 + k), d=d, **kw)
            np.testing.assert_allclose(got, ref, atol=1e-12)

    @pytest.mark.parametrize("n", [7, 8])
    @pytest.mark.parametrize("d", [-1, -2, -3, -4])
    def test_negative_d_matches_scipy(self, n, d):
        # integration kernels: scipy accepts negative d (fftpack.diff
        # order < 0 route); Python floor semantics reproduce its signs
        scv, wcv = self._mods()
        ref = scv.init_convolution_kernel(n, lambda k: 1.0 + k, d=d)
        got = wcv.init_convolution_kernel(n, lambda k: 1.0 + k, d=d)
        np.testing.assert_allclose(got, ref, atol=1e-12)

    def test_device_array_input_stays_on_device(self, rng):
        # a concrete jax array must not round-trip through host f64
        import jax.numpy as jnp
        scv, wcv = self._mods()
        n = 16
        om = wcv.init_convolution_kernel(n, lambda k: 1.0 / (1.0 + k))
        x = rng.standard_normal(n)
        got = np.asarray(wcv.convolve(jnp.asarray(x, jnp.float32), om))
        _close(got, scv.convolve(x.copy(), om), label="device-array")

    def test_kernel_func_extra_args(self):
        scv, wcv = self._mods()
        ref = scv.init_convolution_kernel(
            6, lambda k, a: a * (k + 1), kernel_func_extra_args=(2.5,))
        got = wcv.init_convolution_kernel(
            6, lambda k, a: a * (k + 1), kernel_func_extra_args=(2.5,))
        np.testing.assert_allclose(got, ref)

    @pytest.mark.parametrize("n", [4, 7, 8, 17, 32])
    @pytest.mark.parametrize("swap", [False, True])
    def test_convolve_vs_scipy(self, rng, n, swap):
        scv, wcv = self._mods()
        om = scv.init_convolution_kernel(n, lambda k: np.cos(0.3 * k))
        x = rng.standard_normal(n)
        ref = scv.convolve(x.copy(), om, swap_real_imag=swap)
        got = np.asarray(wcv.convolve(x, om, swap_real_imag=swap))
        _close(got, ref, label=f"convolve n={n} swap={swap}")

    @pytest.mark.parametrize("n", [4, 9, 16])
    def test_convolve_z_vs_scipy(self, rng, n):
        scv, wcv = self._mods()
        om_r = scv.init_convolution_kernel(n, lambda k: 1.0 / (1.0 + k))
        om_i = scv.init_convolution_kernel(n, lambda k: float(k), d=1)
        x = rng.standard_normal(n)
        ref = scv.convolve_z(x.copy(), om_r, om_i)
        got = np.asarray(wcv.convolve_z(x, om_r, om_i))
        _close(got, ref, label=f"convolve_z n={n}")

    def test_diff_via_convolve_matches_diff(self, rng):
        # the classic usage: first derivative as an odd-d kernel + swap
        _, wcv = self._mods()
        n = 16
        x = rng.standard_normal(n)
        om = wcv.init_convolution_kernel(n, lambda k: float(k), d=1)
        got = np.asarray(wcv.convolve(x, om, swap_real_imag=True))
        _close(got, fp.diff(x), label="diff-identity")

    def test_traced_input(self, rng):
        import jax
        import jax.numpy as jnp
        scv, wcv = self._mods()
        n = 12
        om = wcv.init_convolution_kernel(n, lambda k: 1.0 / (1.0 + k))
        x = rng.standard_normal(n)
        ref = scv.convolve(x.copy(), om)
        got = np.asarray(jax.jit(
            lambda xx: wcv.convolve(xx, om))(jnp.asarray(x)))
        _close(got, ref, label="traced")

    def test_validation(self):
        _, wcv = self._mods()
        with pytest.raises(ValueError, match="same length"):
            wcv.convolve(np.ones(4), np.ones(5))
        with pytest.raises(ValueError, match="same length"):
            wcv.convolve(np.ones((4, 4)), np.ones(4))
        with pytest.raises(ValueError, match="same length"):
            wcv.convolve_z(np.ones(4), np.ones(4), np.ones(5))
        with pytest.raises(ValueError, match="positive"):
            wcv.init_convolution_kernel(0, lambda k: 1.0)
        wcv.destroy_convolve_cache()   # parity no-op never raises
