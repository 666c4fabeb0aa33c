"""NUFFT (webgpufft_tpu/nufft.py) vs the exact direct-NDFT oracle.

The oracle is the O(N*M) f64 matrix evaluation of the defining sums, so
these tests pin the MATH, not another library.  The device computes in
f32, flooring achievable accuracy at ~1e-6 relative; tolerances reflect
that (the f64 sandbox derivation reaches 3e-8 at Msp=8)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from webgpufft_tpu import nufft as NU
from webgpufft_tpu.fftapi import ascomplex
from webgpufft_tpu.spec import PlanError


@pytest.fixture
def rng():
    return np.random.default_rng(2026)


def direct1(x, c, n, isign=1):
    k = np.arange(-(n // 2), (n + 1) // 2)
    return (c[None, :].astype(np.complex128)
            * np.exp(isign * 1j * k[:, None] * x[None, :])).sum(1)


def direct2(x, f, isign=-1):
    n = len(f)
    k = np.arange(-(n // 2), (n + 1) // 2)
    return (f[None, :].astype(np.complex128)
            * np.exp(isign * 1j * x[:, None] * k[None, :])).sum(1)


def _cplx(rng, *shape):
    return (rng.standard_normal(shape)
            + 1j * rng.standard_normal(shape)).astype(np.complex64)


def _rel(a, b):
    return np.max(np.abs(a - b)) / max(np.max(np.abs(b)), 1e-30)


class Test1D:
    @pytest.mark.parametrize("n", [16, 31, 50])
    @pytest.mark.parametrize("isign", [1, -1])
    def test_type1_matches_direct(self, rng, n, isign):
        m = 120
        x = rng.uniform(0, 2 * np.pi, m)
        c = _cplx(rng, m)
        got = ascomplex(np.asarray(NU.nufft1d1(x, c, n, isign=isign)))
        assert _rel(got, direct1(x, c, n, isign)) < 2e-5

    @pytest.mark.parametrize("n", [16, 31])
    @pytest.mark.parametrize("isign", [1, -1])
    def test_type2_matches_direct(self, rng, n, isign):
        m = 90
        x = rng.uniform(0, 2 * np.pi, m)
        f = _cplx(rng, n)
        got = ascomplex(np.asarray(NU.nufft1d2(x, f, isign=isign)))
        assert _rel(got, direct2(x, f, isign)) < 2e-5

    def test_eps_controls_accuracy(self, rng):
        # coarser eps -> coarser (but bounded) result; f32 floors ~1e-6
        m, n = 200, 40
        x = rng.uniform(0, 2 * np.pi, m)
        c = _cplx(rng, m)
        ref = direct1(x, c, n)
        loose = _rel(ascomplex(np.asarray(
            NU.nufft1d1(x, c, n, eps=1e-2))), ref)
        tight = _rel(ascomplex(np.asarray(
            NU.nufft1d1(x, c, n, eps=1e-6))), ref)
        assert tight < 2e-5
        assert loose < 1e-2
        assert tight <= loose

    def test_points_wrap_mod_2pi(self, rng):
        m, n = 60, 24
        x = rng.uniform(0, 2 * np.pi, m)
        c = _cplx(rng, m)
        a = np.asarray(NU.nufft1d1(x, c, n))
        b = np.asarray(NU.nufft1d1(x + 2 * np.pi, c, n))
        d = np.asarray(NU.nufft1d1(x - 4 * np.pi, c, n))
        assert np.max(np.abs(a - b)) < 1e-4
        assert np.max(np.abs(a - d)) < 1e-4

    def test_type2_is_transpose_of_type1(self, rng):
        # f_k = sum_j A_kj c_j and c_j = sum_k A_kj f_k with the SAME
        # isign share the matrix A = e^{isign i k x_j}: materialize both
        # on unit vectors and compare
        m, n = 7, 6
        x = rng.uniform(0, 2 * np.pi, m)
        A1 = np.zeros((n, m), np.complex128)
        for j in range(m):
            e = np.zeros(m, np.complex64)
            e[j] = 1.0
            A1[:, j] = ascomplex(np.asarray(
                NU.nufft1d1(x, e, n, isign=1)))
        A2 = np.zeros((m, n), np.complex128)
        for k in range(n):
            e = np.zeros(n, np.complex64)
            e[k] = 1.0
            A2[:, k] = ascomplex(np.asarray(
                NU.nufft1d2(x, e, isign=1)))
        assert np.max(np.abs(A1 - A2.T)) < 1e-4

    def test_batch_leading_dims(self, rng):
        m, n = 80, 20
        x = rng.uniform(0, 2 * np.pi, m)
        cb = _cplx(rng, 2, 3, m)
        out = np.asarray(NU.nufft1d1(x, cb, n))
        assert out.shape == (2, 3, n, 2)
        got = ascomplex(out[1, 2])
        assert _rel(got, direct1(x, cb[1, 2], n)) < 2e-5

    def test_jit_and_grads(self, rng):
        m, n = 40, 16
        x = jnp.asarray(rng.uniform(0, 2 * np.pi, m).astype(np.float32))
        ci = jnp.asarray(rng.standard_normal((m, 2)).astype(np.float32))

        fn = jax.jit(lambda pts, c: jnp.sum(NU.nufft1d1(pts, c, n) ** 2))
        gx, gc = jax.grad(fn, argnums=(0, 1))(x, ci)
        assert np.all(np.isfinite(np.asarray(gx)))
        assert np.all(np.isfinite(np.asarray(gc)))
        # grad wrt a point location against the analytic derivative of
        # the direct transform: d f_k / d x_j = isign i k c_j e^{i k x_j}
        eps = 1e-3
        xp = np.asarray(x, np.float64).copy()
        cc = np.asarray(ci[..., 0] + 1j * ci[..., 1], np.complex128)

        def loss_direct(xv):
            f = direct1(xv, cc, n)
            return float(np.sum(f.real ** 2 + f.imag ** 2))

        j = 7
        xp1 = xp.copy()
        xp1[j] += eps
        xp2 = xp.copy()
        xp2[j] -= eps
        fd = (loss_direct(xp1) - loss_direct(xp2)) / (2 * eps)
        assert abs(float(gx[j]) - fd) / max(abs(fd), 1e-6) < 1e-2

    def test_validation(self, rng):
        x = rng.uniform(0, 2 * np.pi, 10)
        c = _cplx(rng, 10)
        with pytest.raises(PlanError, match="eps"):
            NU.nufft1d1(x, c, 16, eps=2.0)
        with pytest.raises(PlanError, match="n_modes"):
            NU.nufft1d1(x, c, 1)
        with pytest.raises(PlanError, match="trailing"):
            NU.nufft1d1(x, _cplx(rng, 11), 16)
        with pytest.raises(PlanError, match="1-D"):
            NU.nufft1d1(x.reshape(2, 5), c, 16)


class Test2D:
    @pytest.mark.parametrize("n_modes", [(12, 18), (9, 9)])
    @pytest.mark.parametrize("isign", [1, -1])
    def test_type1_matches_direct(self, rng, n_modes, isign):
        m = 100
        n1, n2 = n_modes
        x = rng.uniform(0, 2 * np.pi, m)
        y = rng.uniform(0, 2 * np.pi, m)
        c = _cplx(rng, m)
        k1 = np.arange(-(n1 // 2), (n1 + 1) // 2)
        k2 = np.arange(-(n2 // 2), (n2 + 1) // 2)
        ref = np.einsum(
            "j,kj,lj->kl", c.astype(np.complex128),
            np.exp(isign * 1j * k1[:, None] * x[None, :]),
            np.exp(isign * 1j * k2[:, None] * y[None, :]))
        got = ascomplex(np.asarray(
            NU.nufft2d1(x, y, c, n_modes, isign=isign)))
        assert _rel(got, ref) < 2e-5

    @pytest.mark.parametrize("isign", [1, -1])
    def test_type2_matches_direct(self, rng, isign):
        m, n1, n2 = 80, 10, 14
        x = rng.uniform(0, 2 * np.pi, m)
        y = rng.uniform(0, 2 * np.pi, m)
        f = _cplx(rng, n1, n2)
        k1 = np.arange(-(n1 // 2), (n1 + 1) // 2)
        k2 = np.arange(-(n2 // 2), (n2 + 1) // 2)
        ref = np.einsum(
            "kl,jk,jl->j", f.astype(np.complex128),
            np.exp(isign * 1j * x[:, None] * k1[None, :]),
            np.exp(isign * 1j * y[:, None] * k2[None, :]))
        got = ascomplex(np.asarray(NU.nufft2d2(x, y, f, isign=isign)))
        assert _rel(got, ref) < 2e-5

    def test_roundtrip_uniform_points_recover_fft(self, rng):
        # uniform points = plain DFT: type 1 over x_j = 2 pi j / M with
        # M == N and unit strengths must reproduce the FFT of c
        n = 16
        x = 2 * np.pi * np.arange(n) / n
        c = _cplx(rng, n)
        got = ascomplex(np.asarray(NU.nufft1d1(x, c, n)))
        # e^{+2pi i k j / N} summed over j is N * ifft, CMCL = fftshift
        ref = np.fft.fftshift(np.fft.ifft(c.astype(np.complex128)) * n)
        assert _rel(got, direct1(x, c, n)) < 2e-5
        assert _rel(got, ref) < 2e-5

    def test_mismatched_points_raise(self, rng):
        with pytest.raises(PlanError, match="same number"):
            NU.nufft2d1(np.zeros(5), np.zeros(6), _cplx(rng, 5), (8, 8))

    def test_n_modes_validation(self, rng):
        x = rng.uniform(0, 2 * np.pi, 10)
        c = _cplx(rng, 10)
        with pytest.raises(PlanError, match="sequence of 2"):
            NU.nufft2d1(x, x, c, 8)
        with pytest.raises(PlanError, match="2 entries"):
            NU.nufft2d1(x, x, c, (8, 8, 8))

    def test_small_mode_counts_stay_accurate(self, rng):
        # regression: the tap floor raises Mr above sigma*N at small N;
        # tau must follow the EFFECTIVE oversampling (was 1e-4, now
        # f32-floored ~1e-6)
        m, n = 80, 6
        x = rng.uniform(0, 2 * np.pi, m)
        c = _cplx(rng, m)
        got = ascomplex(np.asarray(NU.nufft1d1(x, c, n)))
        assert _rel(got, direct1(x, c, n)) < 1e-5


class Test3D:
    @pytest.mark.parametrize("isign", [1, -1])
    def test_type1_and_type2_match_direct(self, rng, isign):
        m, n1, n2, n3 = 60, 8, 10, 6
        x, y, z = (rng.uniform(0, 2 * np.pi, m) for _ in range(3))
        c = _cplx(rng, m)
        k1 = np.arange(-(n1 // 2), (n1 + 1) // 2)
        k2 = np.arange(-(n2 // 2), (n2 + 1) // 2)
        k3 = np.arange(-(n3 // 2), (n3 + 1) // 2)
        ref = np.einsum(
            "j,kj,lj,mj->klm", c.astype(np.complex128),
            np.exp(isign * 1j * k1[:, None] * x[None, :]),
            np.exp(isign * 1j * k2[:, None] * y[None, :]),
            np.exp(isign * 1j * k3[:, None] * z[None, :]))
        got = ascomplex(np.asarray(
            NU.nufft3d1(x, y, z, c, (n1, n2, n3), isign=isign)))
        assert _rel(got, ref) < 2e-5
        f = _cplx(rng, n1, n2, n3)
        ref2 = np.einsum(
            "klm,jk,jl,jm->j", f.astype(np.complex128),
            np.exp(-isign * 1j * x[:, None] * k1[None, :]),
            np.exp(-isign * 1j * y[:, None] * k2[None, :]),
            np.exp(-isign * 1j * z[:, None] * k3[None, :]))
        got2 = ascomplex(np.asarray(
            NU.nufft3d2(x, y, z, f, isign=-isign)))
        assert _rel(got2, ref2) < 2e-5

    def test_jit_composes(self, rng):
        m, n = 30, 6
        x, y, z = (jnp.asarray(rng.uniform(0, 2 * np.pi, m)
                               .astype(np.float32)) for _ in range(3))
        ci = jnp.asarray(rng.standard_normal((m, 2)).astype(np.float32))
        fn = jax.jit(lambda c: NU.nufft3d1(x, y, z, c, (n, n, n)))
        out = np.asarray(fn(ci))
        assert out.shape == (n, n, n, 2) and np.all(np.isfinite(out))

    def test_point_chunking_matches_unchunked(self, rng, monkeypatch):
        # force several point chunks and check the scatter/gather paths
        # produce the same result as one chunk (up to f32 add order)
        m, n = 150, 8
        x, y, z = (rng.uniform(0, 2 * np.pi, m) for _ in range(3))
        c = _cplx(rng, m)
        f = _cplx(rng, n, n, n)
        ref1 = np.asarray(NU.nufft3d1(x, y, z, c, (n, n, n)))
        ref2 = np.asarray(NU.nufft3d2(x, y, z, f))
        monkeypatch.setattr(NU, "_CHUNK_TAP_ELEMS", 1 << 12)
        got1 = np.asarray(NU.nufft3d1(x, y, z, c, (n, n, n)))
        got2 = np.asarray(NU.nufft3d2(x, y, z, f))
        assert _rel(got1, ref1) < 1e-5
        assert _rel(got2, ref2) < 1e-5

    def test_chunk_count_stays_bounded(self):
        # the unrolled chunk count under jit is capped at _MAX_CHUNKS
        step = NU._point_step(1, 10_000_000, 4096)
        assert -(-10_000_000 // step) <= NU._MAX_CHUNKS


def direct3(x, c, s, isign=1):
    return (c[None, :].astype(np.complex128)
            * np.exp(isign * 1j * s[:, None] * x[None, :])).sum(1)


class TestType3:
    @pytest.mark.parametrize("isign", [1, -1])
    def test_1d_matches_direct(self, rng, isign):
        m, k = 120, 90
        x = rng.uniform(-3.0, 7.0, m)
        s = rng.uniform(-40.0, 25.0, k)
        c = _cplx(rng, m)
        got = ascomplex(np.asarray(NU.nufft1d3(x, c, s, isign=isign)))
        assert _rel(got, direct3(x, c, s, isign)) < 1e-5

    def test_2d_and_3d_match_direct(self, rng):
        m, k = 80, 60
        x, y, z = (rng.uniform(-2, 5, m) for _ in range(3))
        s, t, u = (rng.uniform(-15, 10, k) for _ in range(3))
        c = _cplx(rng, m)
        ref2 = (c[None, :].astype(np.complex128)
                * np.exp(1j * (s[:, None] * x[None, :]
                               + t[:, None] * y[None, :]))).sum(1)
        got2 = ascomplex(np.asarray(NU.nufft2d3(x, y, c, s, t)))
        assert _rel(got2, ref2) < 1e-5
        ref3 = (c[None, :].astype(np.complex128)
                * np.exp(1j * (s[:, None] * x[None, :]
                               + t[:, None] * y[None, :]
                               + u[:, None] * z[None, :]))).sum(1)
        got3 = ascomplex(np.asarray(NU.nufft3d3(x, y, z, c, s, t, u)))
        assert _rel(got3, ref3) < 1e-5

    def test_integer_targets_match_type1(self, rng):
        # type 3 at s = CMCL integer modes must reproduce type 1
        m, n = 70, 24
        x = rng.uniform(0, 2 * np.pi, m)
        c = _cplx(rng, m)
        ks = np.arange(-(n // 2), (n + 1) // 2).astype(np.float64)
        t3 = ascomplex(np.asarray(NU.nufft1d3(x, c, ks)))
        t1 = ascomplex(np.asarray(NU.nufft1d1(x, c, n)))
        assert _rel(t3, t1) < 1e-5

    def test_degenerate_extents(self, rng):
        # all-equal sources / targets must not divide by a zero extent
        m, k = 40, 30
        c = _cplx(rng, m)
        x0 = np.full(m, 2.7)
        s = rng.uniform(-30, 30, k)
        got = ascomplex(np.asarray(NU.nufft1d3(x0, c, s)))
        assert _rel(got, direct3(x0, c, s)) < 1e-5
        x = rng.uniform(-2, 2, m)
        s0 = np.full(k, -4.2)
        got = ascomplex(np.asarray(NU.nufft1d3(x, c, s0)))
        assert _rel(got, direct3(x, c, s0)) < 1e-5
        got = ascomplex(np.asarray(NU.nufft1d3(x[:1], c[:1], s[:1])))
        assert _rel(got, direct3(x[:1], c[:1], s[:1])) < 1e-5

    def test_eps_controls_accuracy(self, rng):
        m, k = 100, 50
        x = rng.uniform(-2, 2, m)
        s = rng.uniform(-20, 20, k)
        c = _cplx(rng, m)
        ref = direct3(x, c, s)
        loose = _rel(ascomplex(np.asarray(
            NU.nufft1d3(x, c, s, eps=1e-2))), ref)
        tight = _rel(ascomplex(np.asarray(
            NU.nufft1d3(x, c, s, eps=1e-6))), ref)
        assert tight < 1e-5
        assert loose < 1e-1
        assert tight <= loose

    def test_batch_and_jit_in_strengths(self, rng):
        m, k = 60, 40
        x = rng.uniform(-1, 1, m)
        s = rng.uniform(-10, 10, k)
        cb = _cplx(rng, 2, 3, m)
        out = np.asarray(NU.nufft1d3(x, cb, s))
        assert out.shape == (2, 3, k, 2)
        assert _rel(ascomplex(out[1, 2]), direct3(x, cb[1, 2], s)) < 1e-5
        ci = jnp.asarray(np.stack([cb[0, 0].real, cb[0, 0].imag], -1))
        fn = jax.jit(lambda c: NU.nufft1d3(x, c, s))
        got = ascomplex(np.asarray(fn(ci)))
        assert _rel(got, direct3(x, cb[0, 0], s)) < 1e-5
        # grads flow through the (linear) strengths
        g = jax.grad(lambda c: jnp.sum(NU.nufft1d3(x, c, s) ** 2))(ci)
        assert np.all(np.isfinite(np.asarray(g)))

    def test_traced_coordinates_rejected(self, rng):
        m, k = 20, 10
        x = rng.uniform(-1, 1, m)
        s = rng.uniform(-5, 5, k)
        ci = jnp.asarray(rng.standard_normal((m, 2)).astype(np.float32))
        with pytest.raises(Exception, match="concrete"):
            jax.jit(lambda xv: NU.nufft1d3(xv, ci, s))(jnp.asarray(x))
        with pytest.raises(PlanError, match="same length"):
            NU.nufft2d3(x, np.zeros(m + 1), ci, s, s)
        with pytest.raises(PlanError, match="non-empty"):
            NU.nufft1d3(np.zeros(0), np.zeros((0, 2)), s)


class TestAccuracyFloor:
    def test_host_points_stay_accurate_at_large_n(self, rng):
        # concrete (host) points compute taps in f64: position accuracy
        # must not degrade with N the way an f32 x-representation would
        # (f32 phase error ~ N * 6e-8 would be ~2.4e-4 at N=4096)
        m, n = 300, 4096
        x = rng.uniform(0, 2 * np.pi, m)
        c = _cplx(rng, m)
        got = ascomplex(np.asarray(NU.nufft1d1(x, c, n)))
        assert _rel(got, direct1(x, c, n)) < 3e-5


class TestReviewFixes:
    """Regression tests for the round-3 session-9 review findings."""

    def test_zero_points_type1_gives_zero_modes(self):
        out = ascomplex(np.asarray(
            NU.nufft1d1(np.zeros(0), np.zeros((0, 2), np.float32), 8)))
        assert out.shape == (8,)
        assert np.all(out == 0)

    def test_zero_points_type2_gives_empty_values(self, rng):
        f = _cplx(rng, 8)
        out = np.asarray(NU.nufft1d2(np.zeros(0), f))
        assert out.shape == (0, 2)
        out2 = np.asarray(NU.nufft2d2(np.zeros(0), np.zeros(0),
                                      _cplx(rng, 8, 6)))
        assert out2.shape == (0, 2)

    def test_zero_points_batched(self, rng):
        out = np.asarray(NU.nufft1d1(
            np.zeros(0), np.zeros((3, 0, 2), np.float32), 8))
        assert out.shape == (3, 8, 2)
        assert np.all(out == 0)

    @pytest.mark.parametrize("bad", [0, 2, -3])
    def test_isign_validated_types_1_and_2(self, rng, bad):
        x = rng.uniform(0, 2 * np.pi, 10)
        c = _cplx(rng, 10)
        with pytest.raises(PlanError, match="isign"):
            NU.nufft1d1(x, c, 8, isign=bad)
        with pytest.raises(PlanError, match="isign"):
            NU.nufft1d2(x, _cplx(rng, 8), isign=bad)

    def test_length1_tuple_n_modes_in_1d(self, rng):
        x = rng.uniform(0, 2 * np.pi, 30)
        c = _cplx(rng, 30)
        a = ascomplex(np.asarray(NU.nufft1d1(x, c, 16)))
        b = ascomplex(np.asarray(NU.nufft1d1(x, c, (16,))))
        assert np.array_equal(a, b)
        with pytest.raises(PlanError, match="1 entries"):
            NU.nufft1d1(x, c, (16, 16))

    def test_fine_grid_int32_overflow_rejected(self, rng):
        x = rng.uniform(0, 2 * np.pi, 4)
        c = _cplx(rng, 4)
        with pytest.raises(PlanError, match="int32"):
            NU.nufft3d1(x, x, x, c, (700, 700, 700))

    def test_chunked_taps_match_single_chunk(self, rng, monkeypatch):
        # force tiny point-chunks; results must be identical to one chunk
        m, n = 64, 24
        x = rng.uniform(0, 2 * np.pi, m)
        c = _cplx(rng, m)
        f = _cplx(rng, n)
        ref1 = np.asarray(NU.nufft1d1(x, c, n))
        ref2 = np.asarray(NU.nufft1d2(x, f))
        monkeypatch.setattr(NU, "_CHUNK_TAP_ELEMS", 64)
        got1 = np.asarray(NU.nufft1d1(x, c, n))
        got2 = np.asarray(NU.nufft1d2(x, f))
        np.testing.assert_allclose(got1, ref1, rtol=2e-6, atol=2e-6)
        np.testing.assert_allclose(got2, ref2, rtol=2e-6, atol=2e-6)
