"""FFT-based linear algebra (webgpufft_tpu/linalg.py) vs scipy.linalg
as the live oracle: solve_circulant (broadcasting, tol/singular policy)
and matmul_toeplitz (circulant embedding, tuple/bare forms)."""

import numpy as np
import pytest
import scipy.linalg as sla

import jax
import jax.numpy as jnp

from webgpufft_tpu import linalg as WL
from webgpufft_tpu.fftapi import ascomplex
from webgpufft_tpu.spec import PlanError


@pytest.fixture
def rng():
    return np.random.default_rng(20260818)


def _rel(a, b):
    return np.max(np.abs(np.asarray(a) - b)) / max(np.max(np.abs(b)), 1e-30)


def _mk(rng, shape, cx):
    a = rng.standard_normal(shape)
    return (a + 1j * rng.standard_normal(shape)) if cx else a


class TestSolveCirculant:
    @pytest.mark.parametrize("n", [2, 7, 16, 33])
    @pytest.mark.parametrize("cx", [False, True])
    def test_basic_vs_scipy(self, rng, n, cx):
        c = _mk(rng, (n,), cx)
        b = _mk(rng, (n,), cx)
        ref = sla.solve_circulant(c, b)
        got = WL.solve_circulant(c, b)
        got = ascomplex(np.asarray(got)) if cx else np.asarray(got)
        assert got.shape == ref.shape
        assert _rel(got, ref) < 5e-4

    def test_solves_the_system(self, rng):
        n = 12
        c = rng.standard_normal(n) + 3 * np.eye(1, n, 0).ravel()
        b = rng.standard_normal(n)
        x = np.asarray(WL.solve_circulant(c, b))
        assert _rel(sla.circulant(c) @ x, b) < 1e-4

    def test_broadcasting_and_axes(self, rng):
        # c batched (3,1,n), b (n,2): scipy broadcasts to (n,3,2) at
        # outaxis=0
        n = 10
        c = rng.standard_normal((3, 1, n))
        b = rng.standard_normal((n, 2))
        for outaxis in (0, -1):
            ref = sla.solve_circulant(c, b, outaxis=outaxis)
            got = np.asarray(WL.solve_circulant(c, b, outaxis=outaxis))
            assert got.shape == ref.shape
            assert _rel(got, ref) < 5e-4

    def test_caxis_baxis(self, rng):
        n = 9
        c = rng.standard_normal((n, 3))     # circulant axis 0, batch 3
        b = rng.standard_normal((3, n))     # same batch, vector axis 1
        ref = sla.solve_circulant(c, b, caxis=0, baxis=1)
        got = np.asarray(WL.solve_circulant(c, b, caxis=0, baxis=1))
        assert got.shape == ref.shape
        assert _rel(got, ref) < 5e-4

    def test_singular_raise_and_lstsq(self):
        c = np.array([1.0, 1.0, 1.0, 1.0])   # fft has exact zeros
        with pytest.raises(np.linalg.LinAlgError, match="singular"):
            WL.solve_circulant(c, np.ones(4))
        ref = sla.solve_circulant(c, np.ones(4), singular="lstsq")
        got = np.asarray(WL.solve_circulant(c, np.ones(4),
                                            singular="lstsq"))
        np.testing.assert_allclose(got, ref, atol=1e-6)

    def test_explicit_tol(self, rng):
        c = np.array([1.0, 0.9999, 1.0, 1.0001])
        b = rng.standard_normal(4)
        # a huge tol declares it singular
        with pytest.raises(np.linalg.LinAlgError):
            WL.solve_circulant(c, b, tol=10.0)
        got = np.asarray(WL.solve_circulant(c, b, tol=10.0,
                                            singular="lstsq"))
        ref = sla.solve_circulant(c, b, tol=10.0, singular="lstsq")
        np.testing.assert_allclose(got, ref, atol=1e-5)

    def test_shape_mismatch(self, rng):
        with pytest.raises(ValueError, match="incompatible"):
            WL.solve_circulant(rng.standard_normal(4),
                               rng.standard_normal(5))

    def test_traced_b_under_jit(self, rng):
        n = 8
        c = rng.standard_normal(n) + 2 * np.eye(1, n, 0).ravel()
        b = rng.standard_normal(n).astype(np.float32)
        ref = np.asarray(WL.solve_circulant(c, b))
        got = np.asarray(jax.jit(lambda bb: WL.solve_circulant(c, bb))(
            jnp.asarray(b)))
        np.testing.assert_allclose(got, ref, atol=1e-6)

    def test_traced_c_rejected(self, rng):
        c = jnp.asarray(rng.standard_normal(8).astype(np.float32))
        with pytest.raises(Exception, match="concrete"):
            jax.jit(lambda cc: WL.solve_circulant(
                cc, np.ones(8)))(c)


class TestMatmulToeplitz:
    @pytest.mark.parametrize("nr,nc", [(5, 5), (7, 3), (2, 9), (1, 1)])
    @pytest.mark.parametrize("cx", [False, True])
    def test_tuple_form_vs_scipy(self, rng, nr, nc, cx):
        c, r = _mk(rng, (nr,), cx), _mk(rng, (nc,), cx)
        for x in (_mk(rng, (nc,), cx), _mk(rng, (nc, 3), cx)):
            ref = sla.matmul_toeplitz((c, r), x)
            got = WL.matmul_toeplitz((c, r), x)
            got = ascomplex(np.asarray(got)) if cx else np.asarray(got)
            assert got.shape == ref.shape
            assert _rel(got, ref) < 5e-4

    @pytest.mark.parametrize("cx", [False, True])
    def test_bare_c_implies_hermitian(self, rng, cx):
        n = 8
        c = _mk(rng, (n,), cx)
        x = _mk(rng, (n, 2), cx)
        ref = sla.matmul_toeplitz(c, x)
        got = WL.matmul_toeplitz(c, x)
        got = ascomplex(np.asarray(got)) if cx else np.asarray(got)
        assert _rel(got, ref) < 5e-4

    def test_matches_dense_toeplitz(self, rng):
        c, r = rng.standard_normal(6), rng.standard_normal(4)
        x = rng.standard_normal((4, 2))
        got = np.asarray(WL.matmul_toeplitz((c, r), x))
        assert _rel(got, sla.toeplitz(c, r) @ x) < 1e-4

    def test_traced_x_and_operator(self, rng):
        c, r = rng.standard_normal(5), rng.standard_normal(5)
        x = rng.standard_normal(5).astype(np.float32)
        ref = np.asarray(WL.matmul_toeplitz((c, r), x))
        got = np.asarray(jax.jit(
            lambda xx: WL.matmul_toeplitz((c, r), xx))(jnp.asarray(x)))
        np.testing.assert_allclose(got, ref, atol=1e-5)
        # traced operator: differentiates through c
        cf = jnp.asarray(c.astype(np.float32))
        g = jax.grad(lambda cc: jnp.sum(WL.matmul_toeplitz(
            (cc, jnp.asarray(r.astype(np.float32))),
            jnp.asarray(x)) ** 2))(cf)
        assert np.all(np.isfinite(np.asarray(g)))

    def test_validation(self, rng):
        with pytest.raises(ValueError, match="one-dimensional"):
            WL.matmul_toeplitz((rng.standard_normal((2, 2)),
                                rng.standard_normal(2)),
                               rng.standard_normal(2))
        with pytest.raises(ValueError, match="rows"):
            WL.matmul_toeplitz((rng.standard_normal(4),
                                rng.standard_normal(3)),
                               rng.standard_normal(4))
        with pytest.raises(PlanError, match="1-D or 2-D"):
            WL.matmul_toeplitz(rng.standard_normal(3),
                               rng.standard_normal((3, 1, 1)))
        with pytest.raises(ValueError, match="infs or NaNs"):
            WL.matmul_toeplitz(np.array([np.inf, 1.0]),
                               rng.standard_normal(2), check_finite=True)


class TestSolveToeplitz:
    @pytest.mark.parametrize("n", [1, 2, 9, 32])
    @pytest.mark.parametrize("cx", [False, True])
    def test_tuple_form_vs_scipy(self, rng, n, cx):
        c, r = _mk(rng, (n,), cx), _mk(rng, (n,), cx)
        c[0] += n + 2                      # keep the minors well-conditioned
        for b in (_mk(rng, (n,), cx), _mk(rng, (n, 3), cx)):
            ref = sla.solve_toeplitz((c, r), b)
            got = WL.solve_toeplitz((c, r), b)
            got = ascomplex(np.asarray(got)) if cx else np.asarray(got)
            assert got.shape == ref.shape
            assert _rel(got, ref) < 5e-4

    @pytest.mark.parametrize("cx", [False, True])
    def test_bare_c_implies_hermitian(self, rng, cx):
        n = 11
        c = _mk(rng, (n,), cx)
        c[0] += n + 2
        b = _mk(rng, (n, 2), cx)
        ref = sla.solve_toeplitz(c, b)
        got = WL.solve_toeplitz(c, b)
        got = ascomplex(np.asarray(got)) if cx else np.asarray(got)
        assert got.shape == ref.shape and _rel(got, ref) < 5e-4

    def test_mixed_complex_b_real_op(self, rng):
        n = 10
        c, r = _mk(rng, (n,), False), _mk(rng, (n,), False)
        c[0] += n
        b = _mk(rng, (n,), True)
        ref = sla.solve_toeplitz((c, r), b)
        got = ascomplex(np.asarray(WL.solve_toeplitz((c, r), b)))
        assert got.shape == ref.shape and _rel(got, ref) < 5e-4

    def test_solves_the_system(self, rng):
        n = 16
        c, r = rng.standard_normal(n), rng.standard_normal(n)
        c[0] += n
        b = rng.standard_normal(n)
        x = np.asarray(WL.solve_toeplitz((c, r), b))
        r2 = r.copy()
        r2[0] = c[0]
        assert _rel(sla.toeplitz(c, r2) @ x, b) < 1e-4

    def test_traced_b_jit_and_grad(self, rng):
        n = 8
        c = rng.standard_normal(n)
        c[0] += n
        b = rng.standard_normal(n).astype(np.float32)
        ref = np.asarray(WL.solve_toeplitz(c, b))
        got = np.asarray(jax.jit(
            lambda bb: WL.solve_toeplitz(c, bb))(jnp.asarray(b)))
        np.testing.assert_allclose(got, ref, atol=1e-5)
        g = jax.grad(lambda bb: jnp.sum(
            WL.solve_toeplitz(c, bb) ** 2))(jnp.asarray(b))
        assert np.all(np.isfinite(np.asarray(g)))

    def test_empty_system_and_empty_rhs(self, rng):
        # scipy returns empty solutions for n=0 and for (n, 0) RHS sets
        got = np.asarray(WL.solve_toeplitz(np.ones(0), np.ones(0)))
        assert got.shape == sla.solve_toeplitz(np.ones(0), np.ones(0)).shape
        c = np.r_[5.0, rng.standard_normal(4)]
        got = np.asarray(WL.solve_toeplitz(c, np.ones((5, 0))))
        ref = sla.solve_toeplitz(c, np.ones((5, 0)))
        assert got.shape == ref.shape
        cx = c + 1j * rng.standard_normal(5)
        got = np.asarray(WL.solve_toeplitz(cx, np.ones((5, 0))))
        assert got.shape == (5, 0, 2)      # interleaved empty

    def test_validation(self, rng):
        # scipy's exact messages: dimensions / singular minor / finiteness
        with pytest.raises(ValueError, match="Incompatible dimensions"):
            WL.solve_toeplitz((np.ones(3), np.ones(4)), np.ones(3))
        with pytest.raises(ValueError, match="Incompatible dimensions"):
            WL.solve_toeplitz(np.ones(3), np.ones(4))
        with pytest.raises(ValueError, match="Incompatible dimensions"):
            WL.solve_toeplitz(np.ones(3), np.ones((3, 1, 1)))
        with pytest.raises(np.linalg.LinAlgError, match="principal minor"):
            WL.solve_toeplitz(np.array([0.0, 1.0]), np.ones(2))
        with pytest.raises(np.linalg.LinAlgError, match="principal minor"):
            # T invertible but a leading minor singular: scipy raises too
            WL.solve_toeplitz((np.array([0.0, 1.0]), np.array([5.0, 2.0])),
                              np.ones(2))
        with pytest.raises(ValueError, match="infs or NaNs"):
            WL.solve_toeplitz(np.array([np.nan, 1.0]), np.ones(2))
        with pytest.raises(PlanError, match="concrete"):
            jax.jit(lambda cc: WL.solve_toeplitz(cc, np.ones(4)))(
                jnp.ones(4))


class TestFuzzVsScipy:
    """Seeded grid mirroring the one-off 120-config pin sweep."""

    @pytest.mark.parametrize("seed", range(12))
    def test_solve_circulant_random(self, seed):
        rng = np.random.default_rng(1000 + seed)
        n = int(rng.integers(2, 40))
        cx_c, cx_b = rng.random() < 0.4, rng.random() < 0.4
        c = _mk(rng, (n,), cx_c)
        b_extra = () if rng.random() < 0.5 else (int(rng.integers(1, 4)),)
        b = _mk(rng, (n,) + b_extra, cx_b)
        outaxis = int(rng.choice([0, -1]))
        ref = sla.solve_circulant(c, b, outaxis=outaxis)
        got = WL.solve_circulant(c, b, outaxis=outaxis)
        got = (ascomplex(np.asarray(got)) if (cx_c or cx_b)
               else np.asarray(got))
        assert got.shape == ref.shape
        assert _rel(got, ref) < 5e-4

    @pytest.mark.parametrize("seed", range(12))
    def test_solve_toeplitz_random(self, seed):
        rng = np.random.default_rng(3000 + seed)
        n = int(rng.integers(1, 40))
        cx = rng.random() < 0.4
        c = _mk(rng, (n,), cx)
        c[0] += n + 2
        op = c if rng.random() < 0.4 else (c, _mk(rng, (n,), cx))
        b = (_mk(rng, (n,), cx) if rng.random() < 0.5
             else _mk(rng, (n, int(rng.integers(1, 5))), cx))
        ref = sla.solve_toeplitz(op, b)
        got = WL.solve_toeplitz(op, b)
        got = ascomplex(np.asarray(got)) if cx else np.asarray(got)
        assert got.shape == ref.shape
        assert _rel(got, ref) < 5e-4

    @pytest.mark.parametrize("seed", range(12))
    def test_matmul_toeplitz_random(self, seed):
        rng = np.random.default_rng(2000 + seed)
        nr, nc = int(rng.integers(1, 30)), int(rng.integers(1, 30))
        cx = rng.random() < 0.4
        c, r = _mk(rng, (nr,), cx), _mk(rng, (nc,), cx)
        x = (_mk(rng, (nc,), cx) if rng.random() < 0.4
             else _mk(rng, (nc, int(rng.integers(1, 5))), cx))
        ref = sla.matmul_toeplitz((c, r), x)
        got = WL.matmul_toeplitz((c, r), x)
        got = ascomplex(np.asarray(got)) if cx else np.asarray(got)
        assert got.shape == ref.shape
        assert _rel(got, ref) < 5e-4


def test_solve_circulant_complex_outaxis_out_of_range(rng=None):
    rng = np.random.default_rng(5)
    c = rng.standard_normal(4) + 1j * rng.standard_normal(4)
    b = rng.standard_normal((4, 3))
    # scipy raises AxisError for an out-of-range outaxis; so do we
    with pytest.raises(np.exceptions.AxisError):
        WL.solve_circulant(c, b, outaxis=2)
    with pytest.raises(np.exceptions.AxisError):
        WL.solve_circulant(c, b, outaxis=-3)
    # in-range negative outaxis still matches scipy
    ref = sla.solve_circulant(c, b, outaxis=-2)
    got = ascomplex(np.asarray(WL.solve_circulant(c, b, outaxis=-2)))
    assert got.shape == ref.shape and _rel(got, ref) < 5e-4
