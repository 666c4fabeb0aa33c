"""IIR design suite (webgpufft_tpu.iirdesign) vs scipy.signal.

Every prototype, transform, conversion and order-selection function is
pinned against the scipy call on the same arguments — arrays must match
(same pairing/ordering choices), not merely responses.
"""

import numpy as np
import pytest

import scipy.signal as ss

from webgpufft_tpu import iirdesign as D
from webgpufft_tpu import PlanError


def _zpk_close(got, want, tol=1e-9, label=""):
    gz, gp, gk = got
    wz, wp, wk = want
    gz, gp, wz, wp = map(np.atleast_1d, (gz, gp, wz, wp))
    assert len(gz) == len(wz) and len(gp) == len(wp), label
    for g, w in ((gz, wz), (gp, wp)):
        g = np.sort_complex(np.asarray(g, dtype=complex))
        w = np.sort_complex(np.asarray(w, dtype=complex))
        assert np.allclose(g, w, atol=tol, rtol=tol), (label, g, w)
    assert np.isclose(gk, wk, rtol=tol, atol=tol), (label, gk, wk)


class TestPrototypes:
    @pytest.mark.parametrize("N", [1, 2, 3, 5, 8])
    def test_buttap(self, N):
        _zpk_close(D.buttap(N), ss.buttap(N), label=f"buttap {N}")

    @pytest.mark.parametrize("N,rp", [(1, 0.5), (4, 1.0), (7, 3.0)])
    def test_cheb1ap(self, N, rp):
        _zpk_close(D.cheb1ap(N, rp), ss.cheb1ap(N, rp),
                   label=f"cheb1ap {N}")

    @pytest.mark.parametrize("N,rs", [(2, 20.0), (5, 40.0), (8, 60.0)])
    def test_cheb2ap(self, N, rs):
        _zpk_close(D.cheb2ap(N, rs), ss.cheb2ap(N, rs),
                   label=f"cheb2ap {N}")

    @pytest.mark.parametrize("N", [1, 2, 3, 4, 6, 9])
    def test_ellipap(self, N):
        _zpk_close(D.ellipap(N, 1.0, 40.0), ss.ellipap(N, 1.0, 40.0),
                   tol=1e-7, label=f"ellipap {N}")

    @pytest.mark.parametrize("N", [1, 2, 5, 10])
    @pytest.mark.parametrize("norm", ["phase", "delay", "mag"])
    def test_besselap(self, N, norm):
        _zpk_close(D.besselap(N, norm=norm), ss.besselap(N, norm=norm),
                   tol=1e-7, label=f"besselap {N} {norm}")


class TestConversions:
    def test_zpk2tf_tf2zpk(self):
        z, p, k = ss.butter(4, 0.3, output="zpk")
        b0, a0 = ss.zpk2tf(z, p, k)
        b1, a1 = D.zpk2tf(z, p, k)
        assert np.allclose(b1, b0) and np.allclose(a1, a0)
        z1, p1, k1 = D.tf2zpk(b0, a0)
        z0, p0, k0 = ss.tf2zpk(b0, a0)
        _zpk_close((z1, p1, k1), (z0, p0, k0), tol=1e-7, label="tf2zpk")

    @pytest.mark.parametrize("maker", [
        lambda: ss.butter(5, 0.25, output="zpk"),
        lambda: ss.butter(6, [0.2, 0.5], btype="bandpass", output="zpk"),
        lambda: ss.cheby1(7, 1, 0.4, output="zpk"),
        lambda: ss.cheby2(4, 30, [0.3, 0.6], btype="bandstop",
                          output="zpk"),
        lambda: ss.ellip(5, 1, 40, 0.3, output="zpk"),
    ])
    def test_zpk2sos_matches(self, maker):
        z, p, k = maker()
        got = D.zpk2sos(z, p, k)
        want = ss.zpk2sos(z, p, k)
        assert got.shape == want.shape
        assert np.allclose(got, want, atol=1e-10), (got, want)

    def test_zpk2sos_pairings(self):
        z1 = [-1, -0.5 - 0.5j, -0.5 + 0.5j]
        p1 = [0.75, 0.8 + 0.1j, 0.8 - 0.1j]
        for pairing in ("nearest", "keep_odd", "minimal"):
            got = D.zpk2sos(z1, p1, 1, pairing=pairing)
            want = ss.zpk2sos(z1, p1, 1, pairing=pairing)
            assert np.allclose(got, want, atol=1e-10), pairing

    def test_sos2zpk_sos2tf(self):
        sos = ss.butter(6, 0.2, output="sos")
        z0, p0, k0 = ss.sos2zpk(sos)
        z1, p1, k1 = D.sos2zpk(sos)
        _zpk_close((z1, p1, k1), (z0, p0, k0), tol=1e-7, label="sos2zpk")
        b0, a0 = ss.sos2tf(sos)
        b1, a1 = D.sos2tf(sos)
        assert np.allclose(b1, b0) and np.allclose(a1, a0)

    def test_bilinear(self):
        b, a = ss.butter(4, 2.0, analog=True)
        b0, a0 = ss.bilinear(b, a, fs=10.0)
        b1, a1 = D.bilinear(b, a, fs=10.0)
        assert np.allclose(b1, b0, atol=1e-10)
        assert np.allclose(a1, a0, atol=1e-10)


class TestDesigns:
    @pytest.mark.parametrize("output", ["ba", "zpk", "sos"])
    def test_butter_low(self, output):
        got = D.butter(5, 0.3, output=output)
        want = ss.butter(5, 0.3, output=output)
        if output == "zpk":
            _zpk_close(got, want, tol=1e-9)
        elif output == "ba":
            assert np.allclose(got[0], want[0]) and \
                np.allclose(got[1], want[1])
        else:
            assert np.allclose(got, want, atol=1e-12)

    @pytest.mark.parametrize("btype,Wn", [
        ("highpass", 0.4), ("bandpass", [0.2, 0.6]),
        ("bandstop", [0.25, 0.75])])
    def test_butter_bands(self, btype, Wn):
        b0, a0 = ss.butter(4, Wn, btype=btype)
        b1, a1 = D.butter(4, Wn, btype=btype)
        assert np.allclose(b1, b0, atol=1e-10)
        assert np.allclose(a1, a0, atol=1e-10)

    def test_butter_fs_and_analog(self):
        b0, a0 = ss.butter(3, 1000.0, fs=8000.0)
        b1, a1 = D.butter(3, 1000.0, fs=8000.0)
        assert np.allclose(b1, b0) and np.allclose(a1, a0)
        b0, a0 = ss.butter(3, 5.0, analog=True)
        b1, a1 = D.butter(3, 5.0, analog=True)
        assert np.allclose(b1, b0) and np.allclose(a1, a0)

    def test_cheby_and_ellip(self):
        for got, want in [
            (D.cheby1(5, 1, 0.3), ss.cheby1(5, 1, 0.3)),
            (D.cheby2(5, 40, 0.3, btype="highpass"),
             ss.cheby2(5, 40, 0.3, btype="highpass")),
            (D.ellip(4, 1, 40, [0.2, 0.5], btype="bandpass"),
             ss.ellip(4, 1, 40, [0.2, 0.5], btype="bandpass")),
        ]:
            assert np.allclose(got[0], want[0], atol=1e-9)
            assert np.allclose(got[1], want[1], atol=1e-9)

    @pytest.mark.parametrize("norm", ["phase", "delay", "mag"])
    def test_bessel(self, norm):
        b0, a0 = ss.bessel(5, 0.3, norm=norm)
        b1, a1 = D.bessel(5, 0.3, norm=norm)
        assert np.allclose(b1, b0, atol=1e-8)
        assert np.allclose(a1, a0, atol=1e-8)

    def test_validation(self):
        with pytest.raises(PlanError):
            D.butter(4, 1.5)
        with pytest.raises(PlanError):
            D.butter(4, [0.5, 0.2], btype="bandpass")
        with pytest.raises(PlanError):
            D.cheby1(4, None, 0.3)
        with pytest.raises(PlanError):
            D.iirfilter(4, 0.3, btype="nope")


class TestOrd:
    @pytest.mark.parametrize("wp,ws", [
        (0.2, 0.3), (0.3, 0.2),
        ([0.2, 0.5], [0.1, 0.6]),   # bandpass
        ([0.1, 0.6], [0.2, 0.5]),   # bandstop
    ])
    def test_buttord(self, wp, ws):
        n0, wn0 = ss.buttord(wp, ws, 3, 40)
        n1, wn1 = D.buttord(wp, ws, 3, 40)
        assert n1 == n0, (wp, ws)
        assert np.allclose(wn1, wn0, rtol=1e-4), (wp, ws)

    def test_cheb_ords(self):
        for fn0, fn1 in [(ss.cheb1ord, D.cheb1ord),
                         (ss.cheb2ord, D.cheb2ord)]:
            n0, wn0 = fn0(0.2, 0.3, 3, 60)
            n1, wn1 = fn1(0.2, 0.3, 3, 60)
            assert n1 == n0
            assert np.allclose(wn1, wn0, rtol=1e-6)
            n0, wn0 = fn0([0.2, 0.5], [0.1, 0.6], 3, 60)
            n1, wn1 = fn1([0.2, 0.5], [0.1, 0.6], 3, 60)
            assert n1 == n0
            assert np.allclose(wn1, wn0, rtol=1e-4)

    def test_ellipord(self):
        n0, wn0 = ss.ellipord(0.2, 0.3, 3, 60)
        n1, wn1 = D.ellipord(0.2, 0.3, 3, 60)
        assert n1 == n0
        assert np.allclose(wn1, wn0, rtol=1e-6)

    def test_ord_fs(self):
        n0, wn0 = ss.buttord(1000, 1500, 3, 40, fs=8000)
        n1, wn1 = D.buttord(1000, 1500, 3, 40, fs=8000)
        assert n1 == n0 and np.allclose(wn1, wn0, rtol=1e-6)


class TestEndToEnd:
    def test_designed_filter_filters(self, rng):
        """Design here, apply through webgpufft_tpu.filtering, compare
        the whole chain against scipy."""
        from webgpufft_tpu import filtering as FL
        x = rng.standard_normal(400)
        sos = D.butter(6, 0.2, output="sos")
        got = np.asarray(FL.sosfiltfilt(sos, x))
        want = ss.sosfiltfilt(ss.butter(6, 0.2, output="sos"), x)
        err = np.max(np.abs(got - want)) / np.max(np.abs(want))
        assert err < 5e-4, err


class TestNotchPeakComb:
    @pytest.mark.parametrize("w0,Q,fs", [
        (60, 30, 1000), (0.3, 15, 2.0), (1200, 8, 8000)])
    def test_iirnotch_iirpeak(self, w0, Q, fs):
        for fn, sfn in [(D.iirnotch, ss.iirnotch), (D.iirpeak, ss.iirpeak)]:
            bg, ag = fn(w0, Q, fs=fs)
            be, ae = sfn(w0, Q, fs=fs)
            assert np.allclose(bg, be, atol=1e-12)
            assert np.allclose(ag, ae, atol=1e-12)

    @pytest.mark.parametrize("ftype", ["notch", "peak"])
    @pytest.mark.parametrize("pass_zero", [False, True])
    def test_iircomb(self, ftype, pass_zero):
        bg, ag = D.iircomb(50, 25, ftype=ftype, fs=1000,
                           pass_zero=pass_zero)
        be, ae = ss.iircomb(50, 25, ftype=ftype, fs=1000,
                            pass_zero=pass_zero)
        assert np.allclose(bg, be, atol=1e-12)
        assert np.allclose(ag, ae, atol=1e-12)

    def test_validation(self):
        from webgpufft_tpu import PlanError
        with pytest.raises(PlanError):
            D.iirnotch(600, 30, fs=1000)        # past nyquist
        with pytest.raises(PlanError):
            D.iircomb(33, 25, fs=1000)          # fs not divisible by w0
        with pytest.raises(PlanError):
            D.iircomb(50, 25, ftype="stop", fs=1000)


class TestIirdesign:
    """iirdesign pinned to scipy.signal.iirdesign.  Low-pass/high-pass and
    bandpass agree coefficient-for-coefficient; bandstop Wn comes from a
    numeric optimizer in scipy, so the response is pinned instead."""

    @pytest.mark.parametrize("wp,ws,gp,gs,ftype", [
        (0.2, 0.3, 1, 40, "ellip"),
        (0.2, 0.3, 1, 40, "butter"),
        (0.2, 0.3, 1, 40, "cheby1"),
        (0.2, 0.3, 1, 40, "cheby2"),
        (0.3, 0.2, 1, 40, "cheby1"),          # highpass
        (0.3, 0.2, 0.5, 30, "ellip"),
        ([0.2, 0.5], [0.1, 0.6], 1, 40, "ellip"),   # bandpass
        ([0.2, 0.5], [0.1, 0.6], 3, 60, "cheby1"),
    ])
    def test_matches_scipy_ba(self, wp, ws, gp, gs, ftype):
        bg, ag = D.iirdesign(wp, ws, gp, gs, ftype=ftype)
        be, ae = ss.iirdesign(wp, ws, gp, gs, ftype=ftype)
        assert np.allclose(bg, be, atol=1e-10, rtol=1e-8)
        assert np.allclose(ag, ae, atol=1e-10, rtol=1e-8)

    @pytest.mark.parametrize("ftype", ["butter", "cheby2", "ellip"])
    def test_bandstop_response(self, ftype):
        sos_g = D.iirdesign([0.1, 0.6], [0.2, 0.5], 1, 40,
                            ftype=ftype, output="sos")
        sos_e = ss.iirdesign([0.1, 0.6], [0.2, 0.5], 1, 40,
                             ftype=ftype, output="sos")
        w, Hg = ss.sosfreqz(sos_g, worN=2048)
        _, He = ss.sosfreqz(sos_e, worN=2048)
        assert np.max(np.abs(np.abs(Hg) - np.abs(He))) < 2e-4

    def test_fs_and_sos(self):
        got = D.iirdesign(2000, 3000, 1, 40, ftype="ellip",
                          output="sos", fs=16000)
        want = ss.iirdesign(2000, 3000, 1, 40, ftype="ellip",
                            output="sos", fs=16000)
        assert np.allclose(got, want, atol=1e-12)

    def test_analog(self):
        bg, ag = D.iirdesign(100, 200, 1, 40, analog=True, ftype="butter")
        be, ae = ss.iirdesign(100, 200, 1, 40, analog=True, ftype="butter")
        assert np.allclose(bg, be, rtol=1e-10)
        assert np.allclose(ag, ae, rtol=1e-10)

    def test_validation(self):
        from webgpufft_tpu import PlanError
        with pytest.raises(PlanError):
            D.iirdesign(0.2, 0.3, 1, 40, ftype="bessel")   # no ord rule
        with pytest.raises(PlanError):
            D.iirdesign(0.2, 0.3, 1, 40, ftype="nope")
        with pytest.raises(PlanError):
            D.iirdesign([0.2, 0.5], [0.3, 0.6], 1, 40)     # crossed edges
        with pytest.raises(PlanError):
            D.iirdesign([0.1, 0.2, 0.3], [0.2, 0.3, 0.4], 1, 40)
