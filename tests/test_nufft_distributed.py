"""Distributed NUFFT (parallel/nufft.py) on the 8-virtual-device mesh:
point-sharded types 1/2 vs the direct NDFT oracle AND the single-chip
module, plus the comm-profile structural assertions (type 1 = one
all-reduce of the fine grid, type 2 = collective-free)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from webgpufft_tpu import nufft as NU
from webgpufft_tpu.fftapi import ascomplex, asinterleaved
from webgpufft_tpu.parallel import nufft as DN
from webgpufft_tpu.parallel import sharded
from webgpufft_tpu.spec import PlanError


@pytest.fixture(scope="module")
def mesh_sp():
    return sharded.make_mesh({"sp": 8})


@pytest.fixture(scope="module")
def mesh_dpsp():
    return sharded.make_mesh({"dp": 2, "sp": 4})


@pytest.fixture
def rng():
    return np.random.default_rng(20260818)


def _cplx(rng, *shape):
    return (rng.standard_normal(shape)
            + 1j * rng.standard_normal(shape)).astype(np.complex64)


def _rel(a, b):
    return np.max(np.abs(a - b)) / max(np.max(np.abs(b)), 1e-30)


def direct1(x, c, n, isign=1):
    k = np.arange(-(n // 2), (n + 1) // 2)
    return (c[..., None, :].astype(np.complex128)
            * np.exp(isign * 1j * k[:, None] * x[None, :])).sum(-1)


class TestType1:
    @pytest.mark.parametrize("m", [203, 64, 5])  # odd/padded, exact, < ndev
    def test_1d_vs_oracle_and_single_chip(self, rng, mesh_sp, m):
        n = 48
        x = rng.uniform(0, 2 * np.pi, m)
        c = _cplx(rng, 2, m)
        fn = DN.build_distributed_nufft_type1(x, n, mesh_sp)
        got = ascomplex(np.asarray(jax.jit(fn)(c)))
        assert _rel(got, direct1(x, c, n)) < 2e-5
        single = ascomplex(np.asarray(NU.nufft1d1(x, c, n)))
        assert _rel(got, single) < 5e-6

    def test_2d_vs_single_chip(self, rng, mesh_sp):
        m, ns = 117, (24, 20)
        x, y = (rng.uniform(0, 2 * np.pi, m) for _ in range(2))
        c = _cplx(rng, m)
        fn = DN.build_distributed_nufft_type1((x, y), ns, mesh_sp)
        got = ascomplex(np.asarray(jax.jit(fn)(c)))
        single = ascomplex(np.asarray(NU.nufft2d1(x, y, c, ns)))
        assert _rel(got, single) < 5e-6

    def test_3d_vs_single_chip(self, rng, mesh_sp):
        m, ns = 61, (8, 10, 6)
        x, y, z = (rng.uniform(0, 2 * np.pi, m) for _ in range(3))
        c = _cplx(rng, m)
        fn = DN.build_distributed_nufft_type1((x, y, z), ns, mesh_sp,
                                              eps=1e-4)
        got = ascomplex(np.asarray(jax.jit(fn)(c)))
        single = ascomplex(np.asarray(NU.nufft3d1(x, y, z, c, ns, eps=1e-4)))
        assert _rel(got, single) < 5e-5

    def test_isign_minus_one(self, rng, mesh_sp):
        m, n = 80, 32
        x = rng.uniform(0, 2 * np.pi, m)
        c = _cplx(rng, m)
        fn = DN.build_distributed_nufft_type1(x, n, mesh_sp, isign=-1)
        got = ascomplex(np.asarray(jax.jit(fn)(c)))
        assert _rel(got, direct1(x, c, n, isign=-1)) < 2e-5

    def test_comm_profile_one_all_reduce_no_all_to_all(self, rng, mesh_sp):
        m, n = 64, 32
        x = rng.uniform(0, 2 * np.pi, m)
        c = asinterleaved(_cplx(rng, m))
        fn = DN.build_distributed_nufft_type1(x, n, mesh_sp)
        hlo = jax.jit(fn).lower(c).compile().as_text()
        assert "all-reduce" in hlo
        assert "all-to-all" not in hlo


class TestType2:
    @pytest.mark.parametrize("m", [203, 64])
    def test_1d_vs_oracle_and_single_chip(self, rng, mesh_sp, m):
        n = 48
        x = rng.uniform(0, 2 * np.pi, m)
        f = _cplx(rng, 2, n)
        fn = DN.build_distributed_nufft_type2(x, n, mesh_sp)
        got = ascomplex(np.asarray(jax.jit(fn)(f)))
        k = np.arange(-(n // 2), (n + 1) // 2)
        ref = np.einsum("bk,mk->bm", f.astype(np.complex128),
                        np.exp(-1j * x[:, None] * k[None, :]))
        assert _rel(got, ref) < 2e-5
        single = ascomplex(np.asarray(NU.nufft1d2(x, f)))
        assert _rel(got, single) < 5e-6

    def test_2d_vs_single_chip(self, rng, mesh_sp):
        m, ns = 117, (18, 22)
        x, y = (rng.uniform(0, 2 * np.pi, m) for _ in range(2))
        f = _cplx(rng, *ns)
        fn = DN.build_distributed_nufft_type2((x, y), ns, mesh_sp)
        got = ascomplex(np.asarray(jax.jit(fn)(f)))
        single = ascomplex(np.asarray(NU.nufft2d2(x, y, f)))
        assert _rel(got, single) < 5e-6

    def test_collective_free(self, rng, mesh_sp):
        m, n = 64, 32
        x = rng.uniform(0, 2 * np.pi, m)
        f = asinterleaved(_cplx(rng, n))
        fn = DN.build_distributed_nufft_type2(x, n, mesh_sp)
        hlo = jax.jit(fn).lower(f).compile().as_text()
        assert "all-to-all" not in hlo
        assert "all-gather" not in hlo


class TestComposition:
    def test_dp_x_sp_type1_matches_sp_only(self, rng, mesh_dpsp, mesh_sp):
        m, n, b = 90, 40, 4
        x = rng.uniform(0, 2 * np.pi, m)
        c = _cplx(rng, b, m)
        fn_ds = DN.build_distributed_nufft_type1(
            x, n, mesh_dpsp, batch_axis_name="dp")
        fn_s = DN.build_distributed_nufft_type1(x, n, mesh_sp)
        a = ascomplex(np.asarray(jax.jit(fn_ds)(c)))
        bb = ascomplex(np.asarray(jax.jit(fn_s)(c)))
        assert _rel(a, bb) < 1e-6
        assert _rel(a, direct1(x, c, n)) < 2e-5

    def test_dp_x_sp_type2(self, rng, mesh_dpsp):
        m, n, b = 90, 40, 4
        x = rng.uniform(0, 2 * np.pi, m)
        f = _cplx(rng, b, n)
        fn = DN.build_distributed_nufft_type2(
            x, n, mesh_dpsp, batch_axis_name="dp")
        got = ascomplex(np.asarray(jax.jit(fn)(f)))
        single = ascomplex(np.asarray(NU.nufft1d2(x, f)))
        assert _rel(got, single) < 5e-6

    def test_gradients_match_single_chip(self, rng, mesh_sp):
        # adjoint-solver contract: grads through the (linear) strengths
        # on the distributed path == single-chip grads
        m, n = 70, 24
        x = rng.uniform(0, 2 * np.pi, m)
        ci = jnp.asarray(rng.standard_normal((m, 2)).astype(np.float32))
        fn = DN.build_distributed_nufft_type1(x, n, mesh_sp)
        g_dist = jax.grad(lambda c: jnp.sum(fn(c) ** 2))(ci)
        g_single = jax.grad(
            lambda c: jnp.sum(NU.nufft1d1(x, c, n) ** 2))(ci)
        np.testing.assert_allclose(np.asarray(g_dist),
                                   np.asarray(g_single),
                                   rtol=1e-4, atol=1e-5)

    def test_roundtrip_t2_of_t1_peak(self, rng, mesh_sp):
        # type-2(type-1(c)) at the same points ~ smoothed identity:
        # check a pure single-mode strength set survives the roundtrip
        m, n = 128, 32
        x = rng.uniform(0, 2 * np.pi, m)
        c = np.exp(-1j * 3 * x).astype(np.complex64)
        t1 = DN.build_distributed_nufft_type1(x, n, mesh_sp)
        modes = ascomplex(np.asarray(jax.jit(t1)(c)))
        # f_k = sum_j e^{i(k-3)x_j} peaks at k = +3
        k = np.arange(-(n // 2), (n + 1) // 2)
        assert np.argmax(np.abs(modes)) == int(np.where(k == 3)[0][0])


class TestValidation:
    def test_bad_mesh_axes(self, rng, mesh_sp):
        x = rng.uniform(0, 2 * np.pi, 8)
        with pytest.raises(PlanError, match="no axis"):
            DN.build_distributed_nufft_type1(x, 16, mesh_sp, "nope")
        with pytest.raises(PlanError, match="batch axis"):
            DN.build_distributed_nufft_type1(x, 16, mesh_sp,
                                             batch_axis_name="dp")

    def test_zero_points_rejected(self, mesh_sp):
        with pytest.raises(PlanError, match="at least one"):
            DN.build_distributed_nufft_type1(np.zeros(0), 16, mesh_sp)

    def test_traced_points_rejected(self, rng, mesh_sp):
        x = rng.uniform(0, 2 * np.pi, 8)
        with pytest.raises(Exception, match="concrete"):
            jax.jit(lambda xv: DN.build_distributed_nufft_type1(
                xv, 16, mesh_sp))(jnp.asarray(x))

    def test_mismatched_coords(self, rng, mesh_sp):
        x = rng.uniform(0, 2 * np.pi, 8)
        with pytest.raises(PlanError, match="same number"):
            DN.build_distributed_nufft_type1((x, x[:4]), (8, 8), mesh_sp)

    def test_wrong_strength_length(self, rng, mesh_sp):
        x = rng.uniform(0, 2 * np.pi, 8)
        fn = DN.build_distributed_nufft_type1(x, 16, mesh_sp)
        with pytest.raises(PlanError, match="trailing length"):
            fn(_cplx(rng, 9))

    def test_wrong_mode_shape(self, rng, mesh_sp):
        x = rng.uniform(0, 2 * np.pi, 8)
        fn = DN.build_distributed_nufft_type2(x, 16, mesh_sp)
        with pytest.raises(PlanError, match="trailing shape"):
            fn(_cplx(rng, 15))

    def test_bad_isign(self, rng, mesh_sp):
        x = rng.uniform(0, 2 * np.pi, 8)
        with pytest.raises(PlanError, match="isign"):
            DN.build_distributed_nufft_type1(x, 16, mesh_sp, isign=0)


def direct3(x, c, s, isign=1):
    return (c[..., None, :].astype(np.complex128)
            * np.exp(isign * 1j * s[:, None] * x[None, :])).sum(-1)


class TestType3:
    @pytest.mark.parametrize("m,k", [(157, 93), (64, 64), (6, 3)])
    def test_1d_vs_oracle_and_single_chip(self, rng, mesh_sp, m, k):
        x = rng.uniform(-4, 7, m)
        s = rng.uniform(-30, 20, k)
        c = _cplx(rng, 2, m)
        fn = DN.build_distributed_nufft_type3(x, s, mesh_sp)
        got = ascomplex(np.asarray(jax.jit(fn)(c)))
        assert _rel(got, direct3(x, c, s)) < 2e-5
        single = ascomplex(np.asarray(NU.nufft1d3(x, c, s)))
        assert _rel(got, single) < 5e-6

    def test_2d_vs_oracle(self, rng, mesh_sp):
        m, k = 84, 41
        x, y = rng.uniform(-2, 2, m), rng.uniform(0, 5, m)
        s, t = rng.uniform(-8, 8, k), rng.uniform(-6, 3, k)
        c = _cplx(rng, m)
        fn = DN.build_distributed_nufft_type3((x, y), (s, t), mesh_sp)
        got = ascomplex(np.asarray(jax.jit(fn)(c)))
        ref = np.einsum("m,km->k", c.astype(np.complex128),
                        np.exp(1j * (np.outer(s, x) + np.outer(t, y))))
        assert _rel(got, ref) < 2e-5

    def test_isign_minus_one(self, rng, mesh_sp):
        m, k = 60, 50
        x = rng.uniform(-1, 1, m)
        s = rng.uniform(-12, 12, k)
        c = _cplx(rng, m)
        fn = DN.build_distributed_nufft_type3(x, s, mesh_sp, isign=-1)
        got = ascomplex(np.asarray(jax.jit(fn)(c)))
        assert _rel(got, direct3(x, c, s, isign=-1)) < 2e-5

    def test_dp_x_sp(self, rng, mesh_dpsp):
        m, k, b = 90, 70, 4
        x = rng.uniform(0, 3, m)
        s = rng.uniform(-15, 5, k)
        c = _cplx(rng, b, m)
        fn = DN.build_distributed_nufft_type3(
            x, s, mesh_dpsp, batch_axis_name="dp")
        got = ascomplex(np.asarray(jax.jit(fn)(c)))
        assert _rel(got, direct3(x, c, s)) < 2e-5

    def test_comm_profile(self, rng, mesh_sp):
        m, k = 64, 32
        x = rng.uniform(-1, 1, m)
        s = rng.uniform(-9, 9, k)
        c = asinterleaved(_cplx(rng, m))
        fn = DN.build_distributed_nufft_type3(x, s, mesh_sp)
        hlo = jax.jit(fn).lower(c).compile().as_text()
        assert "all-reduce" in hlo
        assert "all-to-all" not in hlo

    def test_rank_mismatch_rejected(self, rng, mesh_sp):
        x = rng.uniform(-1, 1, 8)
        with pytest.raises(PlanError, match="same rank"):
            DN.build_distributed_nufft_type3((x, x), x, mesh_sp)

    def test_traced_coords_rejected(self, rng, mesh_sp):
        x = rng.uniform(-1, 1, 8)
        with pytest.raises(Exception, match="concrete"):
            jax.jit(lambda xv: DN.build_distributed_nufft_type3(
                xv, x, mesh_sp))(jnp.asarray(x))
