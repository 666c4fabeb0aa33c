"""LTI system toolbox (webgpufft_tpu.ltisys) vs scipy.signal.

Conversion/discretization tables must match scipy to f64 rounding; the
lsim/dlsim simulations run their state recurrence on device in f32, so
those are pinned at the same tolerance class as filtering's IIR scan.
"""

import warnings

import numpy as np
import pytest

import scipy.signal as ss

from webgpufft_tpu import ltisys as L
from webgpufft_tpu import PlanError


@pytest.fixture
def rng():
    return np.random.default_rng(5)


def _close(a, b, tol=1e-10, label=""):
    a = np.asarray(a)
    b = np.asarray(b)
    assert a.shape == b.shape, (label, a.shape, b.shape)
    if a.size == 0:
        return
    err = np.max(np.abs(a - b)) / max(np.max(np.abs(b)), 1e-30)
    assert err < tol, (label, err)


class TestConversions:
    def test_tf2ss_ss2tf_roundtrip(self):
        b, a = ss.butter(4, 0.2, analog=True)
        for got, want in zip(L.tf2ss(b, a), ss.tf2ss(b, a)):
            _close(got, want, label="tf2ss")
        A, B, C, D = ss.tf2ss(b, a)
        for got, want in zip(L.ss2tf(A, B, C, D), ss.ss2tf(A, B, C, D)):
            _close(got, want, label="ss2tf")

    def test_zpk_ss(self):
        z, p, k = ss.butter(3, 0.3, analog=True, output="zpk")
        for got, want in zip(L.zpk2ss(z, p, k), ss.zpk2ss(z, p, k)):
            _close(got, want, label="zpk2ss")
        A, B, C, D = ss.zpk2ss(z, p, k)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            gz, gp, gk = L.ss2zpk(A, B, C, D)
            wz, wp, wk = ss.ss2zpk(A, B, C, D)
        _close(np.sort_complex(np.atleast_1d(gz)),
               np.sort_complex(np.atleast_1d(wz)), label="ss2zpk z")
        _close(np.sort_complex(gp), np.sort_complex(wp), tol=1e-8,
               label="ss2zpk p")
        _close(gk, wk, tol=1e-8, label="ss2zpk k")

    def test_tf2ss_with_feedthrough(self):
        # num and den the same length -> nonzero D
        b = [1.0, 2.0, 1.0]
        a = [1.0, 0.5, 0.25]
        for got, want in zip(L.tf2ss(b, a), ss.tf2ss(b, a)):
            _close(got, want, label="tf2ss D")

    def test_normalize(self):
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            got = L.normalize([0, 0, 2, 4], [2, 1, 3])
            want = ss.normalize([0, 0, 2, 4], [2, 1, 3])
        for g, w in zip(got, want):
            _close(g, w, label="normalize")

    def test_normalize_warns(self):
        with pytest.warns(UserWarning):
            L.normalize([0.0, 1.0], [1.0, 2.0])

    def test_validation(self):
        with pytest.raises(PlanError):
            L.normalize([1.0], [0.0, 0.0])
        with pytest.raises(PlanError):
            L.tf2ss([1.0, 1.0, 1.0], [1.0, 2.0])   # improper
        with pytest.raises(PlanError):
            L.ss2tf(np.eye(2), np.ones((2, 1)), np.ones((1, 2)),
                    np.zeros((1, 1)), input=3)


class TestCont2Discrete:
    @pytest.mark.parametrize("method,alpha", [
        ("zoh", None), ("foh", None), ("bilinear", None),
        ("euler", None), ("backward_diff", None), ("gbt", 0.3),
        ("impulse", None)])
    def test_tf_all_methods(self, method, alpha):
        sysc = ss.butter(3, 5, analog=True)
        got = L.cont2discrete(sysc, 0.01, method=method, alpha=alpha)
        want = ss.cont2discrete(sysc, 0.01, method=method, alpha=alpha)
        assert got[-1] == want[-1]
        for g, w in zip(got[:-1], want[:-1]):
            _close(g, w, tol=1e-8, label=method)

    def test_ss_and_zpk_forms(self):
        sysc = ss.butter(3, 5, analog=True)
        Ass = ss.tf2ss(*sysc)
        got = L.cont2discrete(Ass, 0.05)
        want = ss.cont2discrete(Ass, 0.05)
        for g, w in zip(got[:-1], want[:-1]):
            _close(g, w, label="c2d ss")
        zpkc = ss.butter(2, 3, analog=True, output="zpk")
        got = L.cont2discrete(zpkc, 0.05, method="bilinear")
        want = ss.cont2discrete(zpkc, 0.05, method="bilinear")
        _close(np.sort_complex(np.atleast_1d(got[0])),
               np.sort_complex(np.atleast_1d(want[0])), label="c2d zpk z")
        _close(np.sort_complex(got[1]), np.sort_complex(want[1]),
               label="c2d zpk p")
        _close(got[2], want[2], label="c2d zpk k")

    def test_validation(self):
        sysc = ss.butter(2, 5, analog=True)
        with pytest.raises(PlanError):
            L.cont2discrete(sysc, 0.01, method="gbt")      # alpha missing
        with pytest.raises(PlanError):
            L.cont2discrete(sysc, 0.01, method="rk4")
        with pytest.raises(PlanError):
            L.cont2discrete(([1.0, 1.0], [1.0, 1.0]), 0.01,
                            method="impulse")              # not strictly proper


class TestLsim:
    @pytest.mark.parametrize("interp", [True, False])
    def test_forced_response(self, rng, interp):
        sysc = ss.butter(3, 4, analog=True)
        T = np.linspace(0, 5, 400)
        U = np.sin(2 * np.pi * 1.3 * T) + 0.3 * rng.standard_normal(T.size)
        tg, yg, xg = L.lsim(sysc, U, T, interp=interp)
        te, ye, xe = ss.lsim(sysc, U, T, interp=interp)
        _close(tg, te)
        _close(yg, ye, tol=2e-4, label="lsim y")
        _close(xg, xe, tol=2e-4, label="lsim x")

    def test_free_response_with_x0(self, rng):
        A, B, C, D = ss.tf2ss(*ss.butter(3, 4, analog=True))
        T = np.linspace(0, 5, 300)
        x0 = rng.standard_normal(3)
        _, yg, _ = L.lsim((A, B, C, D), None, T, X0=x0)
        _, ye, _ = ss.lsim((A, B, C, D), 0, T, X0=x0)
        _close(yg, ye, tol=2e-4, label="lsim free")

    def test_zpk_form(self, rng):
        zpkc = ss.cheby1(2, 1, 2, analog=True, output="zpk")
        T = np.linspace(0, 5, 200)
        U = np.cos(3 * T)
        _, yg, _ = L.lsim(zpkc, U, T)
        _, ye, _ = ss.lsim(zpkc, U, T)
        _close(yg, ye, tol=2e-4, label="lsim zpk")

    def test_validation(self):
        sysc = ss.butter(2, 4, analog=True)
        with pytest.raises(PlanError):
            L.lsim(sysc, np.ones(3), np.array([0.0, 0.1, 0.3]))  # non-unif
        with pytest.raises(PlanError):
            L.lsim(sysc, np.ones(5), np.linspace(0, 1, 4))  # length mismatch


class TestDlsim:
    def test_tf_and_ss(self, rng):
        sysd = ss.butter(3, 0.2)
        u = rng.standard_normal(300)
        got = L.dlsim((sysd[0], sysd[1], 0.1), u)
        want = ss.dlsim((sysd[0], sysd[1], 0.1), u)
        _close(got[0], want[0])
        _close(np.asarray(got[1]).ravel(), np.asarray(want[1]).ravel(),
               tol=2e-4, label="dlsim tf")
        A, B, C, D = ss.tf2ss(*sysd)
        got = L.dlsim((A, B, C, D, 0.1), u, x0=np.ones(3))
        want = ss.dlsim((A, B, C, D, 0.1), u, x0=np.ones(3))
        _close(got[1], want[1], tol=2e-4, label="dlsim ss y")
        _close(got[2], want[2], tol=2e-4, label="dlsim ss x")


class TestResponses:
    def test_step_impulse(self):
        sysc = ss.butter(3, 4, analog=True)
        for fg, fe in [(L.step, ss.step), (L.impulse, ss.impulse)]:
            tg, yg = fg(sysc)
            te, ye = fe(sysc)
            _close(tg, te)
            _close(yg, ye, tol=5e-4, label=fg.__name__)
            T = np.linspace(0, 3, 150)
            tg, yg = fg(sysc, T=T)
            te, ye = fe(sysc, T=T)
            _close(yg, ye, tol=5e-4, label=f"{fg.__name__} T")

    def test_dstep_dimpulse(self):
        sysd = ss.butter(3, 0.2)
        for fg, fe in [(L.dstep, ss.dstep), (L.dimpulse, ss.dimpulse)]:
            got = fg((sysd[0], sysd[1], 0.1), n=60)
            want = fe((sysd[0], sysd[1], 0.1), n=60)
            _close(got[0], want[0])
            assert len(got[1]) == len(want[1])
            _close(got[1][0], want[1][0], tol=2e-4, label=fg.__name__)


class TestFrequencyResponse:
    def test_freqs(self):
        sysc = ss.butter(3, 4, analog=True)
        gw, gh = L.freqs(*sysc, worN=200)
        ew, eh = ss.freqs(*sysc, worN=200)
        _close(gw, ew)
        _close(gh, eh, tol=1e-8, label="freqs")
        grid = np.logspace(-1, 2, 40)
        gw, gh = L.freqs(*sysc, worN=grid)
        ew, eh = ss.freqs(*sysc, worN=grid)
        _close(gh, eh, tol=1e-8, label="freqs grid")

    def test_freqs_zpk_and_findfreqs(self):
        z, p, k = ss.cheby1(2, 1, 2, analog=True, output="zpk")
        gw, gh = L.freqs_zpk(z, p, k, worN=150)
        ew, eh = ss.freqs_zpk(z, p, k, worN=150)
        _close(gw, ew)
        _close(gh, eh, tol=1e-8, label="freqs_zpk")
        b, a = ss.butter(3, 4, analog=True)
        _close(L.findfreqs(b, a, 30), ss.findfreqs(b, a, 30),
               label="findfreqs")

    def test_freqresp_bode(self):
        sysc = ss.butter(3, 4, analog=True)
        gw, gh = L.freqresp(sysc, n=500)
        ew, eh = ss.freqresp(sysc, n=500)
        _close(gw, ew)
        _close(gh, eh, tol=1e-8, label="freqresp")
        gw, gm, gp = L.bode(sysc)
        ew, em, ep = ss.bode(sysc)
        _close(gm, em, tol=1e-7, label="bode mag")
        _close(gp, ep, tol=1e-7, label="bode phase")

    def test_discrete(self):
        sysd = ss.butter(3, 0.2)
        dsys = (sysd[0], sysd[1], 0.1)
        gw, gh = L.dfreqresp(dsys)
        ew, eh = ss.dfreqresp(dsys)
        _close(gw, ew)
        _close(gh, eh, tol=1e-8, label="dfreqresp")
        wgrid = np.linspace(0.1, 2.5, 33)
        gw, gh = L.dfreqresp(dsys, w=wgrid)
        ew, eh = ss.dfreqresp(dsys, w=wgrid)
        _close(gh, eh, tol=1e-8, label="dfreqresp grid")
        gw, gm, gp = L.dbode(dsys)
        ew, em, ep = ss.dbode(dsys)
        _close(gw, ew)
        _close(gm, em, tol=1e-7, label="dbode mag")
        wg = np.array([0.2, 1.0, 2.0])
        gw, gm, gp = L.dbode(dsys, w=wg)
        ew, em, ep = ss.dbode(dsys, w=wg)
        _close(gw, ew)
        _close(gm, em, tol=1e-7, label="dbode grid")
        # zpk+dt and ss+dt input forms
        zd = ss.butter(2, 0.4, output="zpk")
        gw, gh = L.dfreqresp((zd[0], zd[1], zd[2], 0.05), n=64)
        ew, eh = ss.dfreqresp((zd[0], zd[1], zd[2], 0.05), n=64)
        _close(gh, eh, tol=1e-8, label="dfreqresp zpk")
        A, B, C, D = ss.tf2ss(*sysd)
        gw, gh = L.dfreqresp((A, B, C, D, 0.1), n=32)
        ew, eh = ss.dfreqresp((A, B, C, D, 0.1), n=32)
        _close(gh, eh, tol=1e-7, label="dfreqresp ss")


class TestNamespace:
    def test_reexported_in_filtering(self):
        from webgpufft_tpu import filtering as FL
        assert FL.lsim is L.lsim
        assert "cont2discrete" in FL.__all__

    def test_design_chain(self, rng):
        """iirdesign -> cont2discrete -> dlsim: the standard control
        workflow end-to-end through the package surface."""
        from webgpufft_tpu import iirdesign as D
        b, a = D.butter(2, 5, analog=True)
        num, den, dt = L.cont2discrete((b, a), 0.01, method="bilinear")
        u = np.ones(200)
        t, y = L.dlsim((np.atleast_1d(np.squeeze(num)), den, dt), u)
        te, ye = ss.dlsim(ss.cont2discrete(ss.butter(2, 5, analog=True),
                                           0.01, method="bilinear"), u)[:2]
        _close(y, ye, tol=2e-4, label="chain")


class TestReviewRegressions:
    """Regressions from the round-3 code review of this module."""

    def test_dlsim_static_gain_ss(self):
        # 0-state (static gain) state-space: scipy returns the constant
        # response; the 5-tuple path must still return an (empty) xout
        A = np.zeros((0, 0)); B = np.zeros((0, 1))
        C = np.zeros((1, 0)); D = np.array([[2.0]])
        tout, yout, xout = L.dlsim((A, B, C, D, 0.1), np.ones((4, 1)))
        te, ye, xe = ss.dlsim((A, B, C, D, 0.1), np.ones((4, 1)))
        _close(yout, ye, label="static gain y")
        assert xout.shape == (4, 0)

    def test_dstep_static_gain_tf(self):
        got = L.dstep(((2.0,), (1.0,), 0.1), n=4)
        want = ss.dstep(((2.0,), (1.0,), 0.1), n=4)
        _close(got[1][0], want[1][0], label="dstep gain")

    def test_dlsim_no_input_free_decay(self):
        A = np.array([[0.9]]); B = np.zeros((1, 0))
        C = np.eye(1); D = np.zeros((1, 0))
        tout, yout, xout = L.dlsim((A, B, C, D, 0.1),
                                   np.zeros((5, 0)), x0=[1.0])
        te, ye, xe = ss.dlsim((A, B, C, D, 0.1), np.zeros((5, 0)),
                              x0=[1.0])
        _close(yout, ye, tol=1e-6, label="free decay")

    def test_lsim_scalar_nonzero_U_raises_clearly(self):
        sysc = ss.butter(2, 4, analog=True)
        with pytest.raises(PlanError, match="same number of rows"):
            L.lsim(sysc, 3.0, np.linspace(0, 1, 10))

    def test_dlsim_tf_output_shape_matches_scipy(self):
        tout, yout = L.dlsim(([1.0, 0.5], [1.0, -0.5], 0.1), np.ones(5))
        te, ye = ss.dlsim(([1.0, 0.5], [1.0, -0.5], 0.1), np.ones(5))
        assert yout.shape == ye.shape == (5, 1)
        _close(yout, ye, tol=1e-6, label="tf shape")

    def test_normalize_all_zero_numerator_warns(self):
        with pytest.warns(UserWarning):
            got = L.normalize([0.0], [1.0, 2.0])
        with pytest.warns(Warning):
            want = ss.normalize([0.0], [1.0, 2.0])
        for g, w in zip(got, want):
            _close(np.atleast_1d(g), np.atleast_1d(w), label="zero num")


class TestPartialFractions:
    CASES = [
        ([1.0, 2.0], [1.0, 5.0, 6.0]),                # distinct real
        ([1.0], [1.0, 2.0, 1.0]),                     # double pole
        ([3.0, 1.0, 2.0], [1.0, 0.0, 1.0]),           # complex poles
        ([1.0, 2.0, 3.0, 4.0], [1.0, 1.0]),           # improper -> k
        ([1.0, 0.5], [1.0, -1.5, 0.75, -0.125]),      # triple pole
    ]
    ZCASES = [
        ([1.0, -1.0], [1.0, -0.5, 0.06]),
        ([1.0], [1.0, -1.0, 0.25]),
        ([2.0, 1.0, 0.5], [1.0, -0.3]),
    ]

    @staticmethod
    def _sorted(r, p):
        order = np.argsort(p.real * 1e6 + p.imag)
        return r[order], p[order]

    @pytest.mark.parametrize("case", range(len(CASES)))
    def test_residue_matches_scipy(self, case):
        b, a = self.CASES[case]
        rg, pg, kg = L.residue(b, a)
        re_, pe, ke = ss.residue(b, a)
        rg, pg = self._sorted(rg, pg)
        re_, pe = self._sorted(re_, pe)
        _close(rg, re_, tol=1e-8, label="r")
        _close(pg, pe, tol=1e-8, label="p")
        _close(kg, ke, tol=1e-8, label="k")

    @pytest.mark.parametrize("case", range(len(CASES)))
    def test_invres_matches_scipy(self, case):
        b, a = self.CASES[case]
        r, p, k = ss.residue(b, a)
        bg, ag = L.invres(r, p, k)
        be, ae = ss.invres(r, p, k)
        _close(bg, be, tol=1e-8, label="b")
        _close(ag, ae, tol=1e-8, label="a")

    def test_residuez_and_invresz(self):
        zc = self.ZCASES + [ss.butter(3, 0.3)[:2]]
        for b, a in zc:
            rg, pg, kg = L.residuez(b, a)
            re_, pe, ke = ss.residuez(b, a)
            rg, pg = self._sorted(rg, pg)
            re_, pe = self._sorted(re_, pe)
            _close(rg, re_, tol=1e-8, label="rz")
            _close(pg, pe, tol=1e-8, label="pz")
            _close(kg, ke, tol=1e-8, label="kz")
            r, p, k = ss.residuez(b, a)
            bg, ag = L.invresz(r, p, k)
            be, ae = ss.invresz(r, p, k)
            _close(bg, be, tol=1e-8, label="bz")
            _close(ag, ae, tol=1e-8, label="az")

    def test_unique_roots(self):
        p = np.array([1.0, 1.0005, 2.0, 2.0, 3.5])
        for rtype in ("min", "max", "avg"):
            gu, gm = L.unique_roots(p, tol=1e-2, rtype=rtype)
            wu, wm = ss.unique_roots(p, tol=1e-2, rtype=rtype)
            _close(np.sort(gu), np.sort(wu), tol=1e-12)
            assert sorted(gm.tolist()) == sorted(np.asarray(wm).tolist())

    def test_roundtrip(self):
        b, a = ss.cheby1(4, 1, 0.3)
        r, p, k = L.residuez(b, a)
        b2, a2 = L.invresz(r, p, k)
        w, h1 = ss.freqz(b, a, worN=64)
        _, h2 = ss.freqz(np.real(b2), np.real(a2), worN=64)
        _close(h2, h1, tol=1e-7, label="roundtrip")

    def test_validation(self):
        with pytest.raises(PlanError):
            L.residue([1.0], [0.0])
        with pytest.raises(PlanError):
            L.residuez([1.0], [0.0, 1.0])
        with pytest.raises(PlanError):
            L.unique_roots([1.0], rtype="median")


class TestLtiClasses:
    def test_tf_roundtrips(self):
        A = L.lti([1.0, 2], [3, 4, 5])
        B = ss.lti([1.0, 2], [3, 4, 5])
        _close(A.num, B.num, tol=1e-12)
        _close(A.den, B.den, tol=1e-12)
        _close(np.sort_complex(A.poles), np.sort_complex(B.poles),
               tol=1e-9)
        _close(A.zeros, B.zeros, tol=1e-9)
        za, zb = A.to_zpk(), B.to_zpk()
        assert np.isclose(za.gain, zb.gain)
        sa, sb = A.to_ss(), B.to_ss()
        _close(sa.A, sb.A, tol=1e-12)
        _close(sa.D, sb.D, tol=1e-12)
        assert A.dt is None and sa.dt is None

    def test_to_discrete(self):
        A = L.lti([1.0, 2], [3, 4, 5])
        B = ss.lti([1.0, 2], [3, 4, 5])
        with warnings.catch_warnings():
            # scipy's own to_discrete tf path warns BadCoefficients
            warnings.simplefilter("ignore")
            da, db = A.to_discrete(0.1), B.to_discrete(0.1)
        _close(da.num, db.num, tol=1e-10)
        _close(da.den, db.den, tol=1e-10)
        assert da.dt == db.dt == 0.1
        with pytest.raises(PlanError):
            da.to_discrete(0.1)

    def test_responses(self):
        A = L.lti([1.0, 2], [3, 4, 5])
        B = ss.lti([1.0, 2], [3, 4, 5])
        wa, ma, pa = A.bode(n=50)
        wb, mb, pb = B.bode(n=50)
        _close(wa, wb)
        _close(ma, mb, tol=1e-7)
        ta, ya = A.step()
        tb, yb = B.step()
        _close(ta, tb)
        _close(ya, yb, tol=5e-4)
        ta, ya = A.impulse(N=64)
        tb, yb = B.impulse(N=64)
        _close(ya, yb, tol=5e-4)
        T = np.linspace(0, 1, 30)
        _close(A.output(np.ones(30), T)[1], B.output(np.ones(30), T)[1],
               tol=5e-4)

    def test_discrete_classes(self):
        D1 = L.dlti([1.0, 0.5], [1.0, -0.5], dt=0.2)
        D2 = ss.dlti([1.0, 0.5], [1.0, -0.5], dt=0.2)
        td, yd = D1.step(n=5)
        te, ye = D2.step(n=5)
        _close(td, te)
        _close(yd[0], ye[0], tol=1e-6)
        wfa, ha = D1.freqresp(n=16)
        wfb, hb = D2.freqresp(n=16)
        _close(wfa, wfb)
        _close(ha, hb, tol=1e-7)
        Z1 = L.ZerosPolesGain([1], [0.5, 0.4], 2.0, dt=0.1)
        Z2 = ss.ZerosPolesGain([1], [0.5, 0.4], 2.0, dt=0.1)
        _close(Z1.freqresp(n=8)[1], Z2.freqresp(n=8)[1], tol=1e-8)
        u = np.ones(12)
        o1 = D1.output(u, None)
        o2 = D2.output(u, None)
        _close(o1[1], o2[1], tol=1e-5)

    def test_statespace_and_factories(self):
        S1 = L.StateSpace(np.eye(2) * 0.5, np.ones((2, 1)),
                          np.ones((1, 2)), np.zeros((1, 1)), dt=True)
        assert S1.inputs == 1 and S1.outputs == 1 and S1.dt is True
        assert isinstance(L.lti([1], [1, 1]), L.TransferFunction)
        assert isinstance(L.lti([], [-1.0], 2.0), L.ZerosPolesGain)
        assert isinstance(L.lti(np.eye(1), np.ones((1, 1)),
                                np.ones((1, 1)), np.zeros((1, 1))),
                          L.StateSpace)
        with pytest.raises(PlanError):
            L.lti([1.0])
        # conversion chain vs scipy (its ss2tf path warns)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            A = L.lti([], [-1.0, -2.0], 3.0).to_ss().to_tf()
            B = ss.lti([], [-1.0, -2.0], 3.0).to_ss().to_tf()
        _close(np.atleast_1d(A.num), np.atleast_1d(B.num), tol=1e-9)
        _close(A.den, B.den, tol=1e-9)


class TestPlacePoles:
    A4 = np.array([[1.38, -0.2077, 6.715, -5.676],
                   [-0.5814, -4.29, 0, 0.675],
                   [1.067, 4.273, -6.654, 5.893],
                   [0.048, 4.273, 1.343, -2.104]])
    B4 = np.array([[0, 5.679], [1.136, 1.136], [0, 0], [-3.146, 0]])

    def test_siso_ackermann_matches_scipy(self):
        A = np.array([[0.0, 1.0], [-2.0, -3.0]])
        B = np.array([[0.0], [1.0]])
        got = L.place_poles(A, B, [-5.0, -6.0])
        want = ss.place_poles(A, B, [-5.0, -6.0])
        # SISO gain is unique -> must match scipy exactly
        _close(got.gain_matrix, np.atleast_2d(want.gain_matrix),
               tol=1e-9)
        _close(np.sort(got.computed_poles.real),
               np.sort(np.asarray(want.computed_poles).real), tol=1e-9)

    @pytest.mark.parametrize("P", [
        np.array([-0.2, -0.5, -5.0566, -8.6659]),
        np.array([-1 + 1j, -1 - 1j, -2.0, -3.0]),
        np.array([-2.0, -2.0, -5.0, -6.0]),      # repeat <= rank(B)
    ])
    def test_mimo_places_poles(self, P):
        f = L.place_poles(self.A4, self.B4, P)
        got = np.sort_complex(f.computed_poles)
        want = np.sort_complex(_order_poles(P))
        assert np.max(np.abs(got - want)) < 1e-6
        assert f.rtol < 1e-6
        # the closed loop truly has those poles
        ev = np.linalg.eigvals(self.A4 - self.B4 @ f.gain_matrix)
        assert np.max(np.abs(np.sort_complex(ev) - want)) < 1e-6

    def test_validation(self):
        with pytest.raises(PlanError):
            L.place_poles(self.A4, self.B4, [-1, -2, -3])   # wrong count
        with pytest.raises(PlanError):
            L.place_poles(self.A4, self.B4,
                          [-1 + 1j, -2, -3, -4])            # unpaired
        with pytest.raises(PlanError):
            L.place_poles(self.A4, self.B4,
                          [-2.0, -2.0, -2.0, -5.0])         # > rank(B)
        with pytest.raises(PlanError):
            L.place_poles(np.eye(2), np.zeros((2, 1)), [-1, -2])

    def test_badcoefficients_exported(self):
        assert issubclass(L.BadCoefficients, UserWarning)


def _order_poles(P):
    P = np.asarray(P)
    r = np.sort(P[np.isreal(P)])
    c = np.sort_complex(P[np.imag(P) != 0])
    return np.concatenate([r, c])


class TestPlacePolesReviewRegressions:
    def test_unpaired_repeated_complex_rejected(self):
        A4 = TestPlacePoles.A4
        B4 = TestPlacePoles.B4
        with pytest.raises(PlanError):
            L.place_poles(A4, B4, [1j, 1j, -1j, -2.0])

    def test_rtol_consistent_ordering(self):
        f = L.place_poles(TestPlacePoles.A4, TestPlacePoles.B4,
                          [-1 + 1j, -1 - 1j, -2.0, -3.0])
        assert f.rtol < 1e-9
