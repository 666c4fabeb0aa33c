"""Plan-level distributed API (parallel/plans.create_distributed_plan) on
the 8-virtual-CPU-device mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import webgpufft_tpu as W
from webgpufft_tpu import PlanError
from webgpufft_tpu.core.cplx import interleave, uninterleave
from webgpufft_tpu.parallel import sharded
from webgpufft_tpu.parallel.plans import create_distributed_plan
from webgpufft_tpu.utils import mathref as R


@pytest.fixture(scope="module")
def mesh8():
    return sharded.make_mesh({"sp": 8})


@pytest.fixture(scope="module")
def mesh24():
    return sharded.make_mesh({"dp": 2, "sp": 4})


def test_c2c_1d_seq(mesh8, rng, assert_close):
    n, batch = 1024, 2
    z = rng.standard_normal((batch, n)) + 1j * rng.standard_normal((batch, n))
    plan = create_distributed_plan(type="c2c", shape=[n], batch=batch,
                                   direction="forward", normalize="unitary",
                                   mesh=mesh8, seq_axis="sp")
    assert plan.route.mode == "distributed-sp"
    assert any(r.startswith("digit-split:") for r in plan.route.reasons)
    y = uninterleave(np.asarray(plan(interleave(z))))
    ref = R.fft_nd(z, [n], "forward") / np.sqrt(n)
    assert_close(y.real, ref.real, label="dseq c2c.re")
    assert_close(y.imag, ref.imag, label="dseq c2c.im")


def test_c2c_1d_seq_inverse_roundtrip(mesh24, rng, assert_close):
    n, batch = 512, 4
    z = rng.standard_normal((batch, n)) + 1j * rng.standard_normal((batch, n))
    fwd = create_distributed_plan(type="c2c", shape=[n], batch=batch,
                                  mesh=mesh24, batch_axis="dp", seq_axis="sp")
    inv = create_distributed_plan(type="c2c", shape=[n], batch=batch,
                                  direction="inverse", normalize="backward",
                                  mesh=mesh24, batch_axis="dp", seq_axis="sp")
    back = uninterleave(np.asarray(inv(fwd(interleave(z)))))
    assert_close(back.real, z.real, label="dseq roundtrip.re")
    assert_close(back.imag, z.imag, label="dseq roundtrip.im")


def test_c2c_nd_seq(mesh8, rng, assert_close):
    shape, batch = [64, 24], 2
    z = (rng.standard_normal((batch, *shape))
         + 1j * rng.standard_normal((batch, *shape)))
    plan = create_distributed_plan(type="c2c", shape=shape, batch=batch,
                                   normalize="unitary",
                                   mesh=mesh8, seq_axis="sp")
    y = uninterleave(np.asarray(plan(interleave(z))))
    ref = R.fft_nd(z, shape, "forward") / np.sqrt(np.prod(shape))
    assert_close(y.real, ref.real, label="dseq nd.re")
    assert_close(y.imag, ref.imag, label="dseq nd.im")


def test_r2c_c2r_seq_roundtrip(mesh8, rng, assert_close):
    n, batch = 2048, 2
    x = rng.standard_normal((batch, n))
    r2c = create_distributed_plan(type="r2c", shape=[n], batch=batch,
                                  mesh=mesh8, seq_axis="sp")
    c2r = create_distributed_plan(type="c2r", shape=[n], batch=batch,
                                  direction="inverse", normalize="backward",
                                  mesh=mesh8, seq_axis="sp")
    spec = np.asarray(r2c(jnp.asarray(x.astype(np.float32))))
    ref = np.fft.rfft(x, axis=-1)
    got = uninterleave(spec)
    assert_close(got.real, ref.real, label="dseq r2c.re")
    assert_close(got.imag, ref.imag, label="dseq r2c.im")
    back = np.asarray(c2r(jnp.asarray(spec)))
    assert_close(back, x, label="dseq c2r roundtrip")


def test_fftconv_seq(mesh24, rng, assert_close):
    n, batch = 256, 4
    z = rng.standard_normal((batch, n)) + 1j * rng.standard_normal((batch, n))
    k = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    plan = create_distributed_plan(type="fftconv", shape=[n], batch=batch,
                                   mesh=mesh24, batch_axis="dp",
                                   seq_axis="sp")
    y = uninterleave(np.asarray(
        plan(interleave(z), kernel=interleave(k)))).reshape(batch, n)
    ref = R.fftconv(z, k, [n], batch=batch, boundary="circular")
    assert_close(y.real, ref.real, label="dseq fftconv.re")
    assert_close(y.imag, ref.imag, label="dseq fftconv.im")


def test_fftconv_nd_seq_correlation(mesh8, rng, assert_close):
    shape, batch = [64, 6], 2
    z = (rng.standard_normal((batch, *shape))
         + 1j * rng.standard_normal((batch, *shape)))
    k = (rng.standard_normal(shape) + 1j * rng.standard_normal(shape))
    plan = create_distributed_plan(
        type="fftconv", shape=shape, batch=batch,
        fftConv={"mode": "correlation"}, mesh=mesh8, seq_axis="sp")
    y = uninterleave(np.asarray(plan(interleave(z), kernel=interleave(k))))
    y = y.reshape(batch, *shape)
    ref = R.fftconv(z, k, shape, batch=batch, boundary="circular",
                    mode="correlation")
    assert_close(y.real, ref.real, label="dseq ndcorr.re")
    assert_close(y.imag, ref.imag, label="dseq ndcorr.im")


@pytest.mark.parametrize("n,kc", [(100, 1), (101, 2), (13, 1)])
def test_fftconv_seq_circular_unsplittable(mesh24, rng, assert_close, n,
                                           kc):
    """Circular fftconv at lengths with NO mesh-divisible digit split
    (100/101/13 on sp=4) takes the chirp-Z fallback — any length
    distributes, like plain distributed c2c (deep-fuzz regression)."""
    batch = 4
    z = rng.standard_normal((batch, n)) + 1j * rng.standard_normal((batch, n))
    ks = rng.standard_normal((kc, n)) + 1j * rng.standard_normal((kc, n))
    plan = create_distributed_plan(
        type="fftconv", shape=[n], batch=batch,
        fftConv={"mode": "correlation", "kernelCount": kc},
        mesh=mesh24, batch_axis="dp", seq_axis="sp")
    kin = (np.stack([ks.real, ks.imag], -1).astype(np.float32)
           if kc > 1 else interleave(ks[0]))
    y = np.asarray(plan(interleave(z), kernel=kin))
    if kc == 1:
        y = y[None]
    for i in range(kc):
        ref = R.fftconv(z, ks[i], [n], batch=batch, boundary="circular",
                        mode="correlation")
        assert_close(y[i, ..., 0], ref.real, atol_scale=5e-5,
                     label=f"bluestein conv n={n} #{i}.re")
        assert_close(y[i, ..., 1], ref.imag, atol_scale=5e-5,
                     label=f"bluestein conv n={n} #{i}.im")


def test_fftconv_nd_seq_circular_unsplittable_axis0(mesh8, rng,
                                                    assert_close):
    """ND circular fftconv with an unsplittable axis 0 (n0=15 on sp=8)
    runs the grid pipeline at the smooth padded work length and folds
    back mod n0; the route records the padding."""
    shape, batch = [15, 6], 2
    z = (rng.standard_normal((batch, *shape))
         + 1j * rng.standard_normal((batch, *shape)))
    k = rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
    plan = create_distributed_plan(type="fftconv", shape=shape, batch=batch,
                                   mesh=mesh8, seq_axis="sp")
    assert any(r.startswith("fftconv-padded-circular:")
               for r in plan.route.reasons), plan.route.reasons
    y = uninterleave(np.asarray(plan(interleave(z), kernel=interleave(k))))
    y = y.reshape(batch, *shape)
    ref = R.fftconv(z, k, shape, batch=batch, boundary="circular")
    assert_close(y.real, ref.real, atol_scale=5e-5, label="bs ndconv.re")
    assert_close(y.imag, ref.imag, atol_scale=5e-5, label="bs ndconv.im")


def test_fftconv_nd_seq_circular_unsplittable_dp_multikernel(
        mesh24, rng, assert_close):
    """The padded ND route composes with a batch axis AND kernelCount > 1
    (the (kc, b) reshape through the dp-sharded inverse)."""
    shape, batch, kc = [15, 4], 4, 2
    z = (rng.standard_normal((batch, *shape))
         + 1j * rng.standard_normal((batch, *shape)))
    ks = (rng.standard_normal((kc, *shape))
          + 1j * rng.standard_normal((kc, *shape)))
    plan = create_distributed_plan(
        type="fftconv", shape=shape, batch=batch,
        fftConv={"mode": "correlation", "kernelCount": kc},
        mesh=mesh24, batch_axis="dp", seq_axis="sp")
    kin = np.stack([ks.real, ks.imag], -1).astype(np.float32)
    y = np.asarray(plan(interleave(z), kernel=kin))
    for i in range(kc):
        ref = R.fftconv(z, ks[i], shape, batch=batch, boundary="circular",
                        mode="correlation")
        got = uninterleave(y[i]).reshape(batch, *shape)
        assert_close(got.real, ref.real, atol_scale=5e-5,
                     label=f"padded nd dp kc #{i}.re")
        assert_close(got.imag, ref.imag, atol_scale=5e-5,
                     label=f"padded nd dp kc #{i}.im")


@pytest.mark.parametrize("boundary", ["linear-full", "linear-same",
                                      "linear-valid"])
def test_fftconv_seq_linear_1d(mesh24, rng, assert_close, boundary):
    """Linear-boundary distributed fftconv: smooth-padded circular conv +
    boundary crop (new; the seq path used to reject linear boundaries)."""
    n, kn, batch = 100, 17, 4
    z = rng.standard_normal((batch, n)) + 1j * rng.standard_normal((batch, n))
    k = rng.standard_normal(kn) + 1j * rng.standard_normal(kn)
    plan = create_distributed_plan(
        type="fftconv", shape=[n], batch=batch,
        fftConv={"boundary": boundary, "kernelShape": [kn]},
        mesh=mesh24, batch_axis="dp", seq_axis="sp")
    y = np.asarray(plan(interleave(z), kernel=interleave(k)))
    ref = R.fftconv(z, k, [n], batch=batch, boundary=boundary,
                    kernel_shape=[kn])
    assert y.shape == (batch, ref.shape[1], 2)
    assert_close(y[..., 0], ref.real, label=f"dseq lin {boundary}.re")
    assert_close(y[..., 1], ref.imag, label=f"dseq lin {boundary}.im")


def test_fftconv_seq_linear_nd_correlation(mesh8, rng, assert_close):
    shape, kshape, batch = [30, 10], [5, 3], 2
    z = (rng.standard_normal((batch, *shape))
         + 1j * rng.standard_normal((batch, *shape)))
    k = rng.standard_normal(kshape) + 1j * rng.standard_normal(kshape)
    plan = create_distributed_plan(
        type="fftconv", shape=shape, batch=batch,
        fftConv={"boundary": "linear-same", "kernelShape": kshape,
                 "mode": "correlation"},
        mesh=mesh8, seq_axis="sp")
    y = np.asarray(plan(interleave(z), kernel=interleave(k)))
    ref = R.fftconv(z, k, shape, batch=batch, boundary="linear-same",
                    kernel_shape=kshape, mode="correlation")
    assert_close(y[..., 0].reshape(ref.shape), ref.real,
                 label="dseq lin ndcorr.re")
    assert_close(y[..., 1].reshape(ref.shape), ref.imag,
                 label="dseq lin ndcorr.im")


@pytest.mark.parametrize("boundary", ["circular", "linear-full",
                                      "linear-same", "linear-valid"])
def test_fftconv_seq_halo_route(mesh24, rng, assert_close, boundary):
    """Short-kernel distributed convolution takes the halo-exchange route
    (one (k-1)-sample ppermute; no all_to_all), every boundary mode."""
    n, k, batch = 1024, 17, 4
    z = rng.standard_normal((batch, n)) + 1j * rng.standard_normal((batch, n))
    kk = rng.standard_normal(k) + 1j * rng.standard_normal(k)
    plan = create_distributed_plan(
        type="fftconv", shape=[n], batch=batch,
        fftConv={"boundary": boundary, "kernelShape": [k]},
        mesh=mesh24, batch_axis="dp", seq_axis="sp")
    assert any(r.startswith("fftconv-halo") for r in plan.route.reasons)
    y = np.asarray(plan(interleave(z), kernel=interleave(kk)))
    ref = R.fftconv(z, kk, [n], batch=batch, boundary=boundary,
                    kernel_shape=[k])
    assert_close(y[..., 0], ref.real, label=f"halo {boundary}.re")
    assert_close(y[..., 1], ref.imag, label=f"halo {boundary}.im")


@pytest.mark.parametrize("boundary", ["circular", "linear-full",
                                      "linear-same", "linear-valid"])
def test_fftconv_seq_halo_nd(mesh24, rng, assert_close, boundary):
    """ND halo route: axis 0 shards with a (k0-1)-slab ppermute; other
    axes convolve locally (wrap-padded for circular)."""
    shape, kshape, batch = (200, 8, 6), (9, 3, 2), 4
    z = (rng.standard_normal((batch, *shape))
         + 1j * rng.standard_normal((batch, *shape)))
    kk = rng.standard_normal(kshape) + 1j * rng.standard_normal(kshape)
    plan = create_distributed_plan(
        type="fftconv", shape=list(shape), batch=batch,
        fftConv={"boundary": boundary, "kernelShape": list(kshape)},
        mesh=mesh24, batch_axis="dp", seq_axis="sp")
    assert any(r.startswith("fftconv-halo") for r in plan.route.reasons)
    y = np.asarray(plan(interleave(z), kernel=interleave(kk)))
    ref = R.fftconv(z, kk, list(shape), batch=batch, boundary=boundary,
                    kernel_shape=list(kshape))
    got = (y[..., 0] + 1j * y[..., 1]).reshape(ref.shape)
    assert_close(got.real, ref.real, label=f"nd-halo {boundary}.re")
    assert_close(got.imag, ref.imag, label=f"nd-halo {boundary}.im")


def test_fftconv_seq_halo_ineligible_falls_back(mesh8, rng, assert_close):
    """Large kernels and correlation stay on the spectrum route."""
    n = 256
    big = create_distributed_plan(
        type="fftconv", shape=[n], batch=2,
        fftConv={"boundary": "linear-full", "kernelShape": [n // 2]},
        mesh=mesh8, seq_axis="sp")
    assert not any(r.startswith("fftconv-halo") for r in big.route.reasons)
    corr = create_distributed_plan(
        type="fftconv", shape=[n], batch=2,
        fftConv={"boundary": "linear-same", "kernelShape": [9],
                 "mode": "correlation"},
        mesh=mesh8, seq_axis="sp")
    assert not any(r.startswith("fftconv-halo") for r in corr.route.reasons)
    # and the fallback stays correct
    z = rng.standard_normal((2, n)) + 1j * rng.standard_normal((2, n))
    kk = rng.standard_normal(9) + 1j * rng.standard_normal(9)
    y = np.asarray(corr(interleave(z), kernel=interleave(kk)))
    ref = R.fftconv(z, kk, [n], batch=2, boundary="linear-same",
                    kernel_shape=[9], mode="correlation")
    assert_close(y[..., 0], ref.real, label="spectrum corr fallback")


def test_fftconv_seq_multi_kernel(mesh24, rng, assert_close):
    """Multi-kernel distributed fftconv: the data spectrum is computed once
    and shared; output is kernel-major (kcount, batch, ..., 2) like the
    local plan's default layout."""
    n, batch, kcount = 128, 4, 3
    z = rng.standard_normal((batch, n)) + 1j * rng.standard_normal((batch, n))
    ks = (rng.standard_normal((kcount, n))
          + 1j * rng.standard_normal((kcount, n)))
    plan = create_distributed_plan(
        type="fftconv", shape=[n], batch=batch,
        fftConv={"kernelCount": kcount},
        mesh=mesh24, batch_axis="dp", seq_axis="sp")
    kin = np.stack([ks.real, ks.imag], -1).astype(np.float32)
    y = np.asarray(plan(interleave(z), kernel=kin))
    assert y.shape == (kcount, batch, n, 2)
    for k in range(kcount):
        ref = R.fftconv(z, ks[k], [n], batch=batch, boundary="circular")
        assert_close(y[k, ..., 0], ref.real, label=f"dseq mk{k}.re")
        assert_close(y[k, ..., 1], ref.imag, label=f"dseq mk{k}.im")
    with pytest.raises(PlanError, match="kernelCount"):
        plan(interleave(z), kernel=kin[0])


def test_fftconv_seq_multi_kernel_linear_batch_major(mesh8, rng,
                                                     assert_close):
    shape, kshape, batch, kcount = [32, 8], [5, 3], 2, 2
    z = (rng.standard_normal((batch, *shape))
         + 1j * rng.standard_normal((batch, *shape)))
    ks = (rng.standard_normal((kcount, *kshape))
          + 1j * rng.standard_normal((kcount, *kshape)))
    plan = create_distributed_plan(
        type="fftconv", shape=shape, batch=batch,
        fftConv={"boundary": "linear-full", "kernelShape": kshape,
                 "kernelCount": kcount, "outputLayout": "batch-major"},
        mesh=mesh8, seq_axis="sp")
    kin = np.stack([ks.real, ks.imag], -1).astype(np.float32)
    y = np.asarray(plan(interleave(z), kernel=kin))
    out_shape = tuple(shape[d] + kshape[d] - 1 for d in range(2))
    assert y.shape == (batch, kcount, *out_shape, 2)
    for k in range(kcount):
        ref = R.fftconv(z, ks[k], shape, batch=batch,
                        boundary="linear-full", kernel_shape=kshape)
        assert_close(y[:, k, ..., 0], ref.real, label=f"dseq mklin{k}.re")
        assert_close(y[:, k, ..., 1], ref.imag, label=f"dseq mklin{k}.im")


def test_c2c_seq_bluestein_prime(mesh24, rng, assert_close):
    """Arbitrary-length distributed FFT: prime n cannot digit-split over a
    power-of-two mesh axis, so the seq path runs the distributed Bluestein
    chirp-Z embedding (new; used to raise 'cannot split')."""
    n, batch = 101, 4
    z = rng.standard_normal((batch, n)) + 1j * rng.standard_normal((batch, n))
    plan = create_distributed_plan(type="c2c", shape=[n], batch=batch,
                                   normalize="none", mesh=mesh24,
                                   batch_axis="dp", seq_axis="sp")
    y = uninterleave(np.asarray(plan(interleave(z))))
    ref = R.fft_nd(z, [n], "forward")
    assert_close(y.real, ref.real, label="dseq bluestein.re")
    assert_close(y.imag, ref.imag, label="dseq bluestein.im")


def test_c2c_seq_bluestein_inverse_roundtrip(mesh8, rng, assert_close):
    n, batch = 225, 2       # smooth but odd: no split divisible by 8
    z = rng.standard_normal((batch, n)) + 1j * rng.standard_normal((batch, n))
    fwd = create_distributed_plan(type="c2c", shape=[n], batch=batch,
                                  mesh=mesh8, seq_axis="sp")
    inv = create_distributed_plan(type="c2c", shape=[n], batch=batch,
                                  direction="inverse", normalize="backward",
                                  mesh=mesh8, seq_axis="sp")
    back = uninterleave(np.asarray(inv(fwd(interleave(z)))))
    assert_close(back.real, z.real, label="dseq blu roundtrip.re")
    assert_close(back.imag, z.imag, label="dseq blu roundtrip.im")


def test_r2c_c2r_seq_odd_n(mesh8, rng, assert_close):
    """Odd-n distributed r2c/c2r (complex widening + Bluestein; the
    half-complex trick needs even n)."""
    n, batch = 225, 2
    x = rng.standard_normal((batch, n))
    r2c = create_distributed_plan(type="r2c", shape=[n], batch=batch,
                                  mesh=mesh8, seq_axis="sp")
    pk = np.asarray(r2c(x.astype(np.float32)))
    ref = np.fft.rfft(x, axis=-1)
    assert pk.shape == (batch, n // 2 + 1, 2)
    assert_close(pk[..., 0], ref.real, label="dseq r2c odd.re")
    assert_close(pk[..., 1], ref.imag, label="dseq r2c odd.im")
    c2r = create_distributed_plan(type="c2r", shape=[n], batch=batch,
                                  direction="inverse", normalize="backward",
                                  mesh=mesh8, seq_axis="sp")
    back = np.asarray(c2r(pk))
    assert_close(back, x, label="dseq c2r odd roundtrip")


def test_trig_seq_bluestein_length(mesh24, rng, assert_close):
    """dct2 at a length with no mesh-divisible split rides the Bluestein
    distributed FFT."""
    n, batch = 1000, 4
    x = rng.standard_normal((batch, n))
    plan = create_distributed_plan(type="dct2", shape=[n], batch=batch,
                                   normalize="unitary", mesh=mesh24,
                                   batch_axis="dp", seq_axis="sp")
    y = np.asarray(plan(x.astype(np.float32)))
    ref = R.dct_nd(x, [n], "dct2", "forward", "unitary")
    assert_close(y, ref, label="dseq dct2 bluestein")


@pytest.mark.parametrize("kind", ["dct1", "dct2", "dct3", "dct4",
                                  "dst1", "dst2", "dst3", "dst4"])
@pytest.mark.parametrize("direction", ["forward", "inverse"])
def test_trig_seq(mesh24, rng, assert_close, kind, direction):
    """Sequence-parallel DCT/DST, all eight types, vs the CPU oracle."""
    n, batch = 256, 4
    x = rng.standard_normal((batch, n))
    plan = create_distributed_plan(type=kind, shape=[n], batch=batch,
                                   direction=direction, normalize="unitary",
                                   mesh=mesh24, batch_axis="dp",
                                   seq_axis="sp")
    y = np.asarray(plan(x.astype(np.float32)))
    ref = R.dct_nd(x, [n], kind, direction, "unitary")
    assert_close(y, ref, label=f"dseq {kind} {direction}")


def test_trig_seq_roundtrip(mesh8, rng, assert_close):
    n, batch = 512, 2
    x = rng.standard_normal((batch, n))
    fwd = create_distributed_plan(type="dct2", shape=[n], batch=batch,
                                  normalize="none", mesh=mesh8,
                                  seq_axis="sp")
    inv = create_distributed_plan(type="dct2", shape=[n], batch=batch,
                                  direction="inverse", normalize="backward",
                                  mesh=mesh8, seq_axis="sp")
    back = np.asarray(inv(np.asarray(fwd(x.astype(np.float32)))))
    # the half-amplitude convention's none-fwd/backward-inv roundtrip
    # yields x/2, exactly like the local plan pair
    import webgpufft_tpu as W
    lf = W.create_plan(type="dct2", shape=[n], batch=batch, normalize="none")
    li = W.create_plan(type="dct2", shape=[n], batch=batch,
                       direction="inverse", normalize="backward")
    local = np.asarray(li(np.asarray(lf(x.astype(np.float32)))))
    assert_close(back, local, label="dseq dct2 roundtrip vs local")
    assert_close(back * 2.0, x, label="dseq dct2 roundtrip to x")


@pytest.mark.parametrize("kind", ["dct1", "dst1", "dct4", "dst4"])
def test_trig14_seq_nd_matches_single_chip(mesh8, rng, assert_close, kind):
    """Rank-2 types 1/4 with axis 0 spanning chips: the distributed plan
    matches the single-chip plan at 1e-5 (VERDICT r3 missing #3 done
    criterion); riding axis takes the local route."""
    import webgpufft_tpu as W
    n, m, batch = 128, 16, 2
    x = rng.standard_normal((batch, n, m)).astype(np.float32)
    dplan = create_distributed_plan(type=kind, shape=[n, m], batch=batch,
                                    normalize="unitary", mesh=mesh8,
                                    seq_axis="sp")
    lplan = W.create_plan(type=kind, shape=[n, m], batch=batch,
                          normalize="unitary")
    assert_close(np.asarray(dplan(x)), np.asarray(lplan(x)),
                 label=f"dseq {kind} rank2 vs single-chip")
    ref = R.dct_nd(x, [n, m], kind, "forward", "unitary")
    assert_close(np.asarray(dplan(x)), ref, label=f"dseq {kind} rank2")


def test_trig14_seq_self_inverse_roundtrip(mesh8, rng, assert_close):
    """dct4 fwd(none) o inv(backward) on the mesh == N/2-scaled identity,
    exactly like the local plan pair."""
    n, batch = 256, 2
    x = rng.standard_normal((batch, n)).astype(np.float32)
    fwd = create_distributed_plan(type="dct4", shape=[n], batch=batch,
                                  normalize="none", mesh=mesh8,
                                  seq_axis="sp")
    inv = create_distributed_plan(type="dct4", shape=[n], batch=batch,
                                  direction="inverse", normalize="backward",
                                  mesh=mesh8, seq_axis="sp")
    back = np.asarray(inv(np.asarray(fwd(x))))
    assert_close(back * 2.0, x, label="dseq dct4 roundtrip")


def test_fftconv_seq_linear_valid_too_big_kernel(mesh8):
    with pytest.raises(PlanError, match="valid"):
        create_distributed_plan(
            type="fftconv", shape=[16], batch=1,
            fftConv={"boundary": "linear-valid", "kernelShape": [20]},
            mesh=mesh8, seq_axis="sp")


def test_dp_only_wraps_local_plan(mesh24, rng, assert_close):
    n, batch = 64, 8
    x = rng.standard_normal((batch, n, n))
    plan = create_distributed_plan(type="dct2", shape=[n, n], batch=batch,
                                   normalize="unitary",
                                   mesh=mesh24, batch_axis="dp")
    assert plan.route.mode == "distributed-dp"
    y = np.asarray(plan(jnp.asarray(x.astype(np.float32))))
    ref = R.dct_nd(x, [n, n], "dct2", "forward", "unitary")
    assert_close(y, ref, label="dp dct2")


def test_dp_only_fftconv_kernel(mesh24, rng, assert_close):
    n, batch = 32, 4
    z = rng.standard_normal((batch, n)) + 1j * rng.standard_normal((batch, n))
    k = rng.standard_normal(5) + 1j * rng.standard_normal(5)
    plan = create_distributed_plan(
        type="fftconv", shape=[n], batch=batch,
        fftConv={"boundary": "linear-same", "kernelShape": [5]},
        mesh=mesh24, batch_axis="dp")
    y = uninterleave(np.asarray(plan(interleave(z), kernel=interleave(k))))
    ref = R.fftconv(z, k, [n], batch=batch, boundary="linear-same",
                    kernel_shape=[5])
    assert_close(y.real, ref.real, label="dp fftconv.re")


def test_validation_errors(mesh24, mesh8):
    with pytest.raises(PlanError, match="batch_axis and/or seq_axis"):
        create_distributed_plan(type="c2c", shape=[64], mesh=mesh24)
    with pytest.raises(PlanError, match="not a mesh axis"):
        create_distributed_plan(type="c2c", shape=[64], mesh=mesh24,
                                seq_axis="tp")
    with pytest.raises(PlanError, match="distinct"):
        create_distributed_plan(type="c2c", shape=[64], mesh=mesh24,
                                batch_axis="sp", seq_axis="sp")
    with pytest.raises(PlanError, match="divide evenly"):
        create_distributed_plan(type="c2c", shape=[64], batch=3,
                                mesh=mesh24, batch_axis="dp")
    with pytest.raises(PlanError, match="not supported for type"):
        create_distributed_plan(type="conv2d", shape=[8, 8],
                                conv={"kernelSize": 3},
                                mesh=mesh24, seq_axis="sp")
    # ioView on seq-axis plans now composes via shard-local staging (r4)
    pv = create_distributed_plan(type="c2c", shape=[64],
                                 ioView={"input": {"shape": [32]}},
                                 mesh=mesh24, seq_axis="sp")
    assert "distributed-staging" in pv.route.reasons
    # unsplittable circular fftconv lengths no longer decline: the
    # chirp-Z fallback distributes any length (n=12 has no two smooth
    # factors divisible by 8)
    p12 = create_distributed_plan(type="fftconv", shape=[12],
                                  fftConv={"boundary": "circular"},
                                  mesh=mesh8, seq_axis="sp")
    rng12 = np.random.default_rng(0)
    z12 = (rng12.standard_normal((1, 12))
           + 1j * rng12.standard_normal((1, 12)))
    k12 = rng12.standard_normal(12) + 1j * rng12.standard_normal(12)
    got12 = uninterleave(np.asarray(
        p12(interleave(z12), kernel=interleave(k12)))).reshape(1, 12)
    ref12 = R.fftconv(z12, k12, [12], batch=1, boundary="circular")
    assert np.max(np.abs(got12 - ref12)) / np.max(np.abs(ref12)) < 5e-5
    # linear boundaries are supported (padded-circular route) and short
    # circular kernels ride the halo route; a LONG partial circular kernel
    # (halo-ineligible) still requires full length on the spectrum route
    with pytest.raises(PlanError, match="kernelShape == shape"):
        create_distributed_plan(type="fftconv", shape=[64],
                                fftConv={"boundary": "circular",
                                         "kernelShape": [32]},
                                mesh=mesh24, seq_axis="sp")
    with pytest.raises(PlanError, match="requires kernel="):
        plan = create_distributed_plan(type="fftconv", shape=[64],
                                       mesh=mesh8, seq_axis="sp")
        plan(np.zeros((1, 64, 2), np.float32))


def test_nd_seq_flat_input_with_batch_axis(mesh24, rng, assert_close):
    """Flat (batch, n_total, 2) input to an ND seq plan with dp batch
    sharding: the batch placement must adapt to the actual input ndim
    (regression: a static shaped-ndim sharding crashed device_put)."""
    shape, batch = [64, 24], 4
    z = (rng.standard_normal((batch, *shape))
         + 1j * rng.standard_normal((batch, *shape)))
    plan = create_distributed_plan(type="c2c", shape=shape, batch=batch,
                                   normalize="unitary", mesh=mesh24,
                                   batch_axis="dp", seq_axis="sp")
    flat = interleave(z).reshape(batch, int(np.prod(shape)), 2)
    y = uninterleave(np.asarray(plan(flat)).reshape(batch, *shape, 2))
    ref = R.fft_nd(z, shape, "forward") / np.sqrt(np.prod(shape))
    assert_close(y.real, ref.real, label="dseq nd flat.re")
    assert_close(y.imag, ref.imag, label="dseq nd flat.im")


def test_dp_only_strided_flat_buffer(mesh24, rng, assert_close):
    """Batch-sharded local plan with layout strides takes a flat 1-D buffer
    whose leading dim is NOT the batch; exec must not force a batch
    placement onto it (regression: device_put ndim mismatch)."""
    n, batch, stride = 32, 4, 3
    span = 1 + (n - 1) * stride
    z = (rng.standard_normal(batch * span)
         + 1j * rng.standard_normal(batch * span))
    plan = create_distributed_plan(
        type="c2c", shape=[n], batch=batch, layout={"strides": [stride]},
        mesh=mesh24, batch_axis="dp")
    y = uninterleave(np.asarray(plan(interleave(z))))
    gathered = np.stack([z[b * span: b * span + n * stride: stride]
                         for b in range(batch)])
    ref = R.fft_nd(gathered, [n], "forward")
    got = np.stack([y[b * span: b * span + n * stride: stride]
                    for b in range(batch)])
    assert_close(got.real, ref.real, label="dp strided.re")
    assert_close(got.imag, ref.imag, label="dp strided.im")


def test_workspace_and_destroy(mesh8):
    plan = create_distributed_plan(type="c2c", shape=[512], batch=8,
                                   mesh=mesh8, seq_axis="sp")
    assert plan.get_workspace_size_bytes() == 2 * 8 * 512 * 8 // 8
    plan.destroy()
    assert plan._jit is None


def test_fftconv_seq_halo_packed_kernel(mesh8, rng, assert_close):
    """The halo route accepts the packed-flat kernel convention the
    spectrum route takes (regression: shard_map spec mismatch)."""
    shape, kshape = (96, 5), (4, 2)
    z = (rng.standard_normal((2, *shape))
         + 1j * rng.standard_normal((2, *shape)))
    kk = rng.standard_normal(kshape) + 1j * rng.standard_normal(kshape)
    plan = create_distributed_plan(
        type="fftconv", shape=list(shape), batch=2,
        fftConv={"boundary": "linear-full", "kernelShape": list(kshape)},
        mesh=mesh8, seq_axis="sp")
    assert any(r.startswith("fftconv-halo") for r in plan.route.reasons)
    packed = interleave(kk.reshape(-1))          # (prod(kshape), 2)
    y = np.asarray(plan(interleave(z), kernel=packed))
    ref = R.fftconv(z, kk, list(shape), batch=2, boundary="linear-full",
                    kernel_shape=list(kshape))
    got = (y[..., 0] + 1j * y[..., 1]).reshape(ref.shape)
    assert_close(got.real, ref.real, label="halo packed kernel")


def test_halo_route_hlo_has_no_all_to_all(mesh8):
    """Structural proof of the halo route's communication claim: the
    compiled HLO contains NO all-to-all — only collective-permutes of the
    (k-1)-slab halo — while the spectrum route's digit exchange shows the
    all_to_all.  (The FakeDevice-analog lane: assert the command stream,
    not just the values.)"""
    x = jnp.zeros((2, 1024, 2), jnp.float32)
    k = jnp.zeros((17, 2), jnp.float32)
    halo = create_distributed_plan(
        type="fftconv", shape=[1024], batch=2,
        fftConv={"boundary": "linear-same", "kernelShape": [17]},
        mesh=mesh8, seq_axis="sp")
    txt = jax.jit(halo._jit).lower(x, k).compile().as_text()
    assert txt.count("all-to-all(") == 0
    assert txt.count("collective-permute(") >= 1
    spectrum = create_distributed_plan(type="c2c", shape=[1024], batch=2,
                                       mesh=mesh8, seq_axis="sp")
    txt2 = jax.jit(spectrum._jit).lower(x).compile().as_text()
    assert txt2.count("all-to-all(") >= 1


# ---------------------------------------------------------------------------
# Distributed ND real transforms + ND trig (VERDICT r2 #1/#5)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("shape", [
    [128, 12],       # half-complex trick on the axis-0 four-step (h splits)
    [30, 10],        # even n0, no four-step split -> half-trick Bluestein
    [13, 6],         # odd n0 -> complex-widening Bluestein
    [24, 8, 6],      # rank 3, half-trick Bluestein
    [64, 4, 6],      # rank 3, half-complex four-step
])
def test_r2c_c2r_nd_seq(mesh8, rng, assert_close, shape):
    """Rank>=2 distributed r2c/c2r vs numpy, axis 0 packed (the reference's
    real_complex.js packing), every route of the axis-0 policy."""
    batch = 2
    x = rng.standard_normal((batch, *shape))
    r2c = create_distributed_plan(type="r2c", shape=shape, batch=batch,
                                  mesh=mesh8, seq_axis="sp")
    axes = tuple(range(1, len(shape) + 1))
    ref = np.fft.fftn(x, axes=axes)[:, : shape[0] // 2 + 1]
    got = uninterleave(np.asarray(r2c(jnp.asarray(x.astype(np.float32)))))
    assert_close(got.real, ref.real, label=f"nd r2c {shape}.re")
    assert_close(got.imag, ref.imag, label=f"nd r2c {shape}.im")
    c2r = create_distributed_plan(type="c2r", shape=shape, batch=batch,
                                  direction="inverse", normalize="backward",
                                  mesh=mesh8, seq_axis="sp")
    back = np.asarray(c2r(jnp.asarray(interleave(ref).astype(np.float32))))
    assert_close(back, x, label=f"nd c2r {shape} roundtrip")


def test_r2c_nd_seq_dp_sp(mesh24, rng, assert_close):
    """dp x sp: batch sharded over dp while axis 0 distributes over sp."""
    shape, batch = [32, 6, 4], 4
    x = rng.standard_normal((batch, *shape))
    plan = create_distributed_plan(type="r2c", shape=shape, batch=batch,
                                   normalize="unitary", mesh=mesh24,
                                   batch_axis="dp", seq_axis="sp")
    ref = (np.fft.fftn(x, axes=(1, 2, 3))[:, :17]
           / np.sqrt(np.prod(shape)))
    got = uninterleave(np.asarray(plan(jnp.asarray(x.astype(np.float32)))))
    assert_close(got.real, ref.real, label="nd r2c dpsp.re")
    assert_close(got.imag, ref.imag, label="nd r2c dpsp.im")


@pytest.mark.parametrize("kind", ["dct2", "dct3", "dst2", "dst3"])
def test_trig_nd_seq(mesh24, rng, assert_close, kind):
    """Rank-2 distributed DCT/DST: distributed axis-0 trig wrappers +
    local per-axis routing for the rest, forward and inverse."""
    shape, batch = [16, 12], 4
    x = rng.standard_normal((batch, *shape))
    for direction, normalize in (("forward", "none"),
                                 ("inverse", "backward")):
        plan = create_distributed_plan(type=kind, shape=shape, batch=batch,
                                       direction=direction,
                                       normalize=normalize, mesh=mesh24,
                                       batch_axis="dp", seq_axis="sp")
        y = np.asarray(plan(jnp.asarray(x.astype(np.float32))))
        ref = R.dct_nd(x, shape, kind, direction, normalize)
        assert_close(y, ref, label=f"nd {kind} {direction}")


def test_trig_nd_seq_odd_axis0_and_fft_rest(mesh24, rng, assert_close):
    """Odd axis 0 (Bluestein embedding) and an FFT-routed riding axis
    (dctFftMinN forced down) both compose in the ND trig plan."""
    x = rng.standard_normal((2, 15, 8))
    plan = create_distributed_plan(type="dct2", shape=[15, 8], batch=2,
                                   mesh=mesh24, batch_axis="dp",
                                   seq_axis="sp")
    assert_close(np.asarray(plan(jnp.asarray(x.astype(np.float32)))),
                 R.dct_nd(x, [15, 8], "dct2", "forward", "none"),
                 label="nd dct2 odd axis0")
    x2 = rng.standard_normal((2, 16, 16))
    plan2 = create_distributed_plan(type="dct3", shape=[16, 16], batch=2,
                                    tuning={"dctFftMinN": 16}, mesh=mesh24,
                                    batch_axis="dp", seq_axis="sp")
    assert_close(np.asarray(plan2(jnp.asarray(x2.astype(np.float32)))),
                 R.dct_nd(x2, [16, 16], "dct3", "forward", "none"),
                 label="nd dct3 fft-routed rest axis")


def test_c2c_nd_seq_bluestein_axis0(mesh8, rng, assert_close):
    """ND c2c with an unsplittable axis 0 takes the axis-0 Bluestein
    embedding (used to raise 'cannot split')."""
    shape, batch = [13, 8], 2
    z = (rng.standard_normal((batch, *shape))
         + 1j * rng.standard_normal((batch, *shape)))
    plan = create_distributed_plan(type="c2c", shape=shape, batch=batch,
                                   mesh=mesh8, seq_axis="sp")
    y = uninterleave(np.asarray(plan(interleave(z))))
    ref = R.fft_nd(z, shape, "forward")
    assert_close(y.real, ref.real, label="nd bluestein axis0.re")
    assert_close(y.imag, ref.imag, label="nd bluestein axis0.im")


def test_fftconv_seq_channel_lanes(mesh24, rng, assert_close):
    """The reference's channel-lane preset workflow composes with sequence
    parallelism (VERDICT r2 #5): 2 input channels, multi-kernel strided
    output lanes — bit-compared against the LOCAL plan on identical flat
    buffers, plus the oracle per lane."""
    import math
    shape, b, kc = [64], 4, 2
    cin, cout = 2, 4
    n = math.prod(shape)
    preset = W.create_fftconv_kernel_major_channel_lane_preset({
        "shape": shape, "batch": b, "kernelCount": kc,
        "input": {"channels": cin, "channelIndex": 1},
        "output": {"channels": cout, "channelIndex": 0,
                   "kernelStepChannels": 2},
    })
    local = W.create_plan({"type": "fftconv", **preset})
    dist = create_distributed_plan({"type": "fftconv", **preset},
                                   mesh=mesh24, batch_axis="dp",
                                   seq_axis="sp")
    lanes = (rng.standard_normal((b, cin, n))
             + 1j * rng.standard_normal((b, cin, n)))
    flat_in = interleave(lanes.reshape(-1))
    k = rng.standard_normal((kc, n)) + 1j * rng.standard_normal((kc, n))
    ref_flat = np.asarray(local.exec(flat_in, kernel=interleave(k)))
    got_flat = np.asarray(dist(flat_in, kernel=interleave(k)))
    assert got_flat.shape == ref_flat.shape
    assert_close(got_flat, ref_flat, label="dseq channel lanes vs local")
    out = uninterleave(got_flat).reshape(b, cout, n)
    x = lanes[:, 1, :]
    for kk in range(kc):
        ref = R.fftconv(x, k[kk], shape, batch=b)
        assert_close(out[:, kk * 2, :].real, ref.real,
                     label=f"dseq lane{kk * 2}.re")
        assert_close(out[:, kk * 2, :].imag, ref.imag,
                     label=f"dseq lane{kk * 2}.im")
    assert np.all(out[:, 1, :] == 0) and np.all(out[:, 3, :] == 0)


def test_fftconv_seq_channel_lanes_halo_linear(mesh8, rng, assert_close):
    """Channel lanes also wrap the halo-exchange route (short linear
    kernel): input-side lanes only, output shaped normally."""
    n, kn, b, cin = 128, 5, 2, 3
    plan = create_distributed_plan(
        type="fftconv", shape=[n], batch=b,
        fftConv={"boundary": "linear-same", "kernelShape": [kn],
                 "channelPolicy": {"input": {"channels": cin,
                                             "channelIndex": 2}}},
        mesh=mesh8, seq_axis="sp")
    assert any("fftconv-halo" in r for r in plan.route.reasons)
    lanes = (rng.standard_normal((b, cin, n))
             + 1j * rng.standard_normal((b, cin, n)))
    kern = rng.standard_normal(kn) + 1j * rng.standard_normal(kn)
    y = np.asarray(plan(interleave(lanes.reshape(-1)),
                        kernel=interleave(kern)))
    ref = R.fftconv(lanes[:, 2, :], kern, [n], batch=b,
                    boundary="linear-same", kernel_shape=[kn])
    got = uninterleave(y).reshape(b, n)
    assert_close(got.real, ref.real, label="halo lane.re")
    assert_close(got.imag, ref.imag, label="halo lane.im")


# ---------------------------------------------------------------------------
# Pencil decomposition: axes 0 AND 1 each span a mesh axis (2-D device
# decomposition over a heFFTe/P3DFFT-style pencil layout; the reference is
# single-device — SURVEY.md §2.9 — so this is new TPU scaling surface)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def mesh_pencil():
    return sharded.make_mesh({"sp0": 2, "sp1": 4})


@pytest.fixture(scope="module")
def mesh_pencil_dp():
    return sharded.make_mesh({"dp": 2, "sp0": 2, "sp1": 2})


@pytest.mark.parametrize("shape,direction,norm", [
    ([8, 16], "forward", "none"),
    ([12, 32], "inverse", "backward"),
    ([8, 16, 6], "forward", "unitary"),     # rank 3: riding axis local
    ([16, 16, 3, 5], "forward", "none"),    # rank 4: two riding axes
])
def test_c2c_pencil(mesh_pencil, rng, assert_close, shape, direction, norm):
    b = 3
    z = (rng.standard_normal((b, *shape))
         + 1j * rng.standard_normal((b, *shape)))
    plan = create_distributed_plan(type="c2c", shape=shape, batch=b,
                                   direction=direction, normalize=norm,
                                   mesh=mesh_pencil,
                                   seq_axis=("sp0", "sp1"))
    assert plan.route.mode == "distributed-pencil"
    assert any(r.startswith("pencil-split:") for r in plan.route.reasons)
    y = uninterleave(np.asarray(plan(interleave(z)))).reshape(b, *shape)
    ref = R.fft_nd(z, shape, direction)
    if norm == "unitary":
        ref = ref / np.sqrt(np.prod(shape))
    elif norm == "backward" and direction == "inverse":
        ref = ref / np.prod(shape)
    assert_close(y.real, ref.real, label="pencil c2c.re")
    assert_close(y.imag, ref.imag, label="pencil c2c.im")


def test_c2c_pencil_dp(mesh_pencil_dp, rng, assert_close):
    """dp x pencil: batch sharded over a third mesh axis."""
    shape, b = [8, 12, 10], 4
    z = (rng.standard_normal((b, *shape))
         + 1j * rng.standard_normal((b, *shape)))
    plan = create_distributed_plan(type="c2c", shape=shape, batch=b,
                                   mesh=mesh_pencil_dp, batch_axis="dp",
                                   seq_axis=("sp0", "sp1"))
    y = uninterleave(np.asarray(plan(interleave(z)))).reshape(b, *shape)
    ref = R.fft_nd(z, shape, "forward")
    assert_close(y.real, ref.real, label="pencil dp.re")
    assert_close(y.imag, ref.imag, label="pencil dp.im")


def test_c2c_pencil_roundtrip(mesh_pencil, rng, assert_close):
    shape, b = [12, 16, 5], 2
    z = (rng.standard_normal((b, *shape))
         + 1j * rng.standard_normal((b, *shape)))
    fwd = create_distributed_plan(type="c2c", shape=shape, batch=b,
                                  mesh=mesh_pencil, seq_axis=("sp0", "sp1"))
    inv = create_distributed_plan(type="c2c", shape=shape, batch=b,
                                  direction="inverse", normalize="backward",
                                  mesh=mesh_pencil, seq_axis=("sp0", "sp1"))
    back = uninterleave(np.asarray(inv(fwd(interleave(z))))).reshape(b, *shape)
    assert_close(back.real, z.real, label="pencil rt.re")
    assert_close(back.imag, z.imag, label="pencil rt.im")


@pytest.mark.parametrize("shape", [
    [8, 16, 6],      # even n0
    [12, 32],        # rank 2 (packed axis + second pencil axis only)
    [12, 16, 5],     # riding odd local axis
])
def test_r2c_c2r_pencil(mesh_pencil, rng, assert_close, shape):
    b = 2
    x = rng.standard_normal((b, *shape)).astype(np.float32)
    r2c = create_distributed_plan(type="r2c", shape=shape, batch=b,
                                  mesh=mesh_pencil, seq_axis=("sp0", "sp1"))
    assert r2c.route.mode == "distributed-pencil"
    y = np.asarray(r2c(x))
    p0 = shape[0] // 2 + 1
    ref = R.fft_nd(x.astype(np.float64), shape, "forward")[:, :p0]
    got = uninterleave(y).reshape(b, p0, *shape[1:])
    assert_close(got.real, ref.real, label="pencil r2c.re")
    assert_close(got.imag, ref.imag, label="pencil r2c.im")
    c2r = create_distributed_plan(type="c2r", shape=shape, batch=b,
                                  direction="inverse", normalize="backward",
                                  mesh=mesh_pencil, seq_axis=("sp0", "sp1"))
    back = np.asarray(c2r(y)).reshape(b, *shape)
    assert_close(back, x, label="pencil c2r roundtrip")


@pytest.mark.parametrize("shape,boundary,kshape,kcount", [
    ([8, 16], "circular", None, 1),          # direct-spectrum, full kernel
    ([8, 16, 3], "circular", None, 2),       # rank 3, multi-kernel
    ([10, 12], "linear-full", [3, 5], 1),    # padded-circular per pencil axis
    ([10, 12], "linear-same", [3, 3], 2),    # crop + multi-kernel
    ([12, 16], "linear-valid", [5, 3], 1),
])
def test_fftconv_pencil_matches_single_chip(mesh_pencil, rng, assert_close,
                                            shape, boundary, kshape, kcount):
    """fftconv on a 2-D pencil decomposition (VERDICT r4 missing #4):
    axes 0 and 1 each span a mesh axis through the whole spectrum
    pipeline; results match the single-chip plan."""
    fc = {"boundary": boundary, "kernelCount": kcount}
    if kshape is not None:
        fc["kernelShape"] = kshape
    opts = {"type": "fftconv", "shape": shape, "batch": 2, "fftConv": fc}
    ks = tuple(kshape) if kshape is not None else tuple(shape)
    x = rng.standard_normal((2, *shape, 2)).astype(np.float32) * 0.1
    kern = rng.standard_normal((kcount, *ks, 2)).astype(np.float32) * 0.1
    dp = create_distributed_plan(opts, mesh=mesh_pencil,
                                 seq_axis=("sp0", "sp1"))
    assert dp.route.mode == "distributed-pencil"
    lp = W.create_plan(opts)
    assert_close(np.asarray(dp(x, kernel=kern)),
                 np.asarray(lp.exec(x, kernel=kern)),
                 label=f"pencil fftconv {boundary}")


def test_fftconv_pencil_unsplittable_falls_back_single_axis(
        mesh_pencil, rng, assert_close):
    """A circular length with no smooth mesh-divisible split on its
    pencil axis takes the documented single-axis fallback (the
    padded-circular route covers any length) instead of raising
    (round-5 review finding: the docstring promised this fallback but
    the builder raised)."""
    opts = {"type": "fftconv", "shape": [7, 16], "batch": 2,
            "fftConv": {"boundary": "circular"}}
    x = rng.standard_normal((2, 7, 16, 2)).astype(np.float32) * 0.1
    kern = rng.standard_normal((7, 16, 2)).astype(np.float32) * 0.1
    dp = create_distributed_plan(opts, mesh=mesh_pencil,
                                 seq_axis=("sp0", "sp1"))
    assert any(r.startswith("pencil-fallback-single-axis(sp0)")
               for r in dp.route.reasons), dp.route.reasons
    assert not any(r.startswith("pencil-split:") for r in dp.route.reasons)
    # the fallback route's padded-circular fold is reported the same way
    # the directly-reached single-axis route reports it (r5 review)
    assert any(r.startswith("fftconv-padded-circular:")
               for r in dp.route.reasons), dp.route.reasons
    lp = W.create_plan(opts)
    assert_close(np.asarray(dp(x, kernel=kern)),
                 np.asarray(lp.exec(x, kernel=kern)),
                 label="pencil fftconv fallback")


def test_fftconv_pencil_operand_bound_error_does_not_fall_back(mesh_pencil):
    """Only the unsplittable-length condition may take the single-axis
    fallback (sharded.UnsplittableAxisError); a per-device operand-bound
    violation must surface as a PlanError — the single-axis route's
    per-device operands would be strictly LARGER, so silently rerouting
    would either mislead or run past the validated einsum size (r5
    review finding on the bare `except ValueError`)."""
    from webgpufft_tpu.spec import PlanError
    opts = {"type": "fftconv", "shape": [512, 512, 256], "batch": 1,
            "fftConv": {"boundary": "circular"}}
    with pytest.raises(PlanError, match="per-device stage operands"):
        create_distributed_plan(opts, mesh=mesh_pencil,
                                seq_axis=("sp0", "sp1"))


def test_fftconv_trivial_zeropad_not_tagged_staged(mesh_pencil, rng,
                                                   assert_close):
    """A zeroPad rect covering the full domain applies no mask: the
    route must NOT claim distributed-staging (round-5 review finding:
    the reason was keyed off the spec, not off what was applied)."""
    opts = {"type": "fftconv", "shape": [8, 16], "batch": 2,
            "fftConv": {"boundary": "circular"},
            "zeroPad": {"read": {"start": [0, 0], "end": [8, 16]}}}
    x = rng.standard_normal((2, 8, 16, 2)).astype(np.float32) * 0.1
    kern = rng.standard_normal((8, 16, 2)).astype(np.float32) * 0.1
    dp = create_distributed_plan(opts, mesh=mesh_pencil,
                                 seq_axis=("sp0", "sp1"))
    assert "distributed-staging" not in dp.route.reasons
    lp = W.create_plan(opts)
    assert_close(np.asarray(dp(x, kernel=kern)),
                 np.asarray(lp.exec(x, kernel=kern)),
                 label="pencil fftconv trivial zeroPad")


def test_fftconv_pencil_correlation_zeropad_dp(mesh_pencil_dp, rng,
                                               assert_close):
    """Pencil fftconv composes with dp batch sharding, correlation mode,
    and the shard-local zeroPad masks."""
    opts = {"type": "fftconv", "shape": [8, 12], "batch": 4,
            "fftConv": {"boundary": "linear-same", "mode": "correlation",
                        "kernelShape": [3, 3]},
            "zeroPad": {"read": {"start": [1, 0], "end": [9, 13]},
                        "write": {"start": [0, 1], "end": [9, 12]}}}
    x = rng.standard_normal((4, 8, 12, 2)).astype(np.float32)
    kern = rng.standard_normal((3, 3, 2)).astype(np.float32)
    dp = create_distributed_plan(opts, mesh=mesh_pencil_dp, batch_axis="dp",
                                 seq_axis=("sp0", "sp1"))
    assert "distributed-staging" in dp.route.reasons
    lp = W.create_plan(opts)
    assert_close(np.asarray(dp(x, kernel=kern)),
                 np.asarray(lp.exec(x, kernel=kern)),
                 label="pencil fftconv correlation+zeroPad+dp")


def test_fftconv_pencil_hlo_collectives_ride_own_axis(mesh_pencil):
    """No collective in the pencil fftconv pipeline spans all P0*P1
    devices (each digit exchange rides its own mesh axis's ring)."""
    import re
    plan = create_distributed_plan(
        type="fftconv", shape=[8, 16], batch=2,
        fftConv={"boundary": "circular"},
        mesh=mesh_pencil, seq_axis=("sp0", "sp1"))
    x = jnp.zeros((2, 8, 16, 2), jnp.float32)
    k = jnp.zeros((8, 16, 2), jnp.float32)
    txt = plan._jit.lower(x, k).compile().as_text()
    for l in txt.splitlines():
        m = re.search(r"replica_groups=\[(\d+),(\d+)\]", l)
        if m:
            assert int(m.group(2)) < 8, l


def test_pencil_validation_errors(mesh_pencil, mesh_pencil_dp):
    # rank 1 c2c
    with pytest.raises(PlanError, match="rank >= 2"):
        create_distributed_plan(type="c2c", shape=[1024], batch=2,
                                mesh=mesh_pencil, seq_axis=("sp0", "sp1"))
    # unsupported type
    with pytest.raises(PlanError, match="pencil seq_axis supports"):
        create_distributed_plan(type="dct2", shape=[8, 16], batch=2,
                                mesh=mesh_pencil, seq_axis=("sp0", "sp1"))
    # duplicate axes
    with pytest.raises(PlanError, match="distinct"):
        create_distributed_plan(type="c2c", shape=[8, 16], batch=2,
                                mesh=mesh_pencil, seq_axis=("sp0", "sp0"))
    # batch axis reused as pencil axis
    with pytest.raises(PlanError, match="distinct"):
        create_distributed_plan(type="c2c", shape=[8, 8], batch=2,
                                mesh=mesh_pencil_dp, batch_axis="sp0",
                                seq_axis=("sp0", "sp1"))
    # unsplittable axis surfaces the single-seq_axis suggestion
    with pytest.raises(PlanError, match="Bluestein"):
        create_distributed_plan(type="c2c", shape=[10, 16], batch=2,
                                mesh=mesh_pencil, seq_axis=("sp0", "sp1"))
    # 3+ axes rejected
    with pytest.raises(PlanError, match="pair"):
        create_distributed_plan(type="c2c", shape=[8, 8, 8], batch=1,
                                mesh=mesh_pencil_dp,
                                seq_axis=("dp", "sp0", "sp1"))
    # singleton tuple degrades to the single-axis route
    plan = create_distributed_plan(type="c2c", shape=[16, 6], batch=2,
                                   mesh=mesh_pencil, seq_axis=("sp0",))
    assert plan.route.mode == "distributed-sp"


def test_pencil_hlo_collectives_ride_own_axis(mesh_pencil):
    """Structural claim of the pencil layout: every collective's replica
    groups stay WITHIN one mesh axis (digit exchanges ride their own ICI
    ring); no collective ever spans all P0*P1 devices."""
    import re
    plan = create_distributed_plan(type="c2c", shape=[8, 16], batch=2,
                                   mesh=mesh_pencil, seq_axis=("sp0", "sp1"))
    x = jnp.zeros((2, 8, 16, 2), jnp.float32)
    txt = plan._jit.lower(x).compile().as_text()
    a2a_defs = [l for l in txt.splitlines()
                if re.search(r"= \S+ all-to-all\(", l)
                or re.search(r"\) all-to-all\(", l)]
    assert len(a2a_defs) >= 2      # one digit exchange per decomposed axis
    ndev_total = 8
    for l in txt.splitlines():
        m = re.search(r"replica_groups=\[(\d+),(\d+)\]", l)
        if m:
            group_size = int(m.group(2))
            assert group_size < ndev_total, l


# ---------------------------------------------------------------------------
# Staging composition on seq-axis plans (ioView/zeroPad/layout/bf16 run
# shard-locally around the distributed core; VERDICT r3 missing #4)
# ---------------------------------------------------------------------------

def test_seq_c2c_ioview_zeropad_matches_single_chip(mesh24, rng,
                                                    assert_close):
    opts = {"type": "c2c", "shape": [64, 16], "batch": 4,
            "direction": "forward", "normalize": "unitary",
            "ioView": {"input": {"shape": [48, 12], "placement": "center"},
                       "output": {"shape": [32, 8]}},
            "zeroPad": {"read": {"start": [2, 0], "end": [46, 16]}}}
    x = rng.standard_normal((4, 48, 12, 2)).astype(np.float32)
    dp = create_distributed_plan(opts, mesh=mesh24, batch_axis="dp",
                                 seq_axis="sp")
    assert "distributed-staging" in dp.route.reasons
    lp = W.create_plan(opts)
    assert_close(np.asarray(dp(x)), np.asarray(lp.exec(x)),
                 label="dseq c2c ioView+zeroPad vs single-chip")


def test_seq_r2c_layout_strides_matches_single_chip(mesh24, rng,
                                                    assert_close):
    opts = {"type": "r2c", "shape": [64, 16], "batch": 2,
            "direction": "forward", "normalize": "none",
            "layout": {"inputStrides": [16, 1], "inputOffsetElements": 8,
                       "inputBatchStrideElements": 1100}}
    flat = rng.standard_normal((2 * 1100 + 64 * 16,)).astype(np.float32)
    dp = create_distributed_plan(opts, mesh=mesh24, seq_axis="sp")
    lp = W.create_plan(opts)
    assert_close(np.asarray(dp(flat)), np.asarray(lp.exec(flat)),
                 label="dseq r2c layout vs single-chip")


def test_seq_c2r_output_ioview(mesh24, rng, assert_close):
    opts = {"type": "c2r", "shape": [32, 8], "batch": 2,
            "direction": "inverse", "normalize": "backward",
            "ioView": {"output": {"shape": [24, 8]}}}
    z = np.fft.fftn(rng.standard_normal((2, 32, 8)), axes=(1, 2))
    x = np.stack([z.real, z.imag], -1).astype(np.float32)[:, :17]
    dp = create_distributed_plan(opts, mesh=mesh24, seq_axis="sp")
    lp = W.create_plan(opts)
    got, want = np.asarray(dp(x)), np.asarray(lp.exec(x))
    assert got.shape == (2, 24, 8)
    assert_close(got, want, label="dseq c2r output ioView vs single-chip")


def test_seq_bf16_storage(mesh24, rng):
    opts = {"type": "c2c", "shape": [256], "batch": 4,
            "precision": "bf16-storage", "normalize": "unitary"}
    x = jnp.asarray(rng.standard_normal((4, 256, 2)), jnp.bfloat16)
    dp = create_distributed_plan(opts, mesh=mesh24, seq_axis="sp")
    lp = W.create_plan(opts)
    yd = np.asarray(dp(x), dtype=np.float32)
    yl = np.asarray(lp.exec(x), dtype=np.float32)
    assert yd.dtype == np.float32 and np.max(np.abs(yd - yl)) == 0.0


def test_pencil_staged_ioview(mesh8, rng, assert_close):
    opts = {"type": "c2c", "shape": [16, 16, 8], "batch": 2,
            "normalize": "none",
            "ioView": {"input": {"shape": [12, 16, 8]}}}
    x = rng.standard_normal((2, 12, 16, 8, 2)).astype(np.float32)
    mesh = sharded.make_mesh({"sp0": 2, "sp1": 2, "dp": 2})
    dp = create_distributed_plan(opts, mesh=mesh, batch_axis="dp",
                                 seq_axis=("sp0", "sp1"))
    lp = W.create_plan(opts)
    assert_close(np.asarray(dp(x)), np.asarray(lp.exec(x)),
                 label="pencil staged ioView vs single-chip")


def test_seq_trig_staged_zeropad(mesh24, rng, assert_close):
    opts = {"type": "dct4", "shape": [64], "batch": 2,
            "normalize": "unitary",
            "zeroPad": {"read": {"start": [4], "end": [60]}}}
    x = rng.standard_normal((2, 64)).astype(np.float32)
    dp = create_distributed_plan(opts, mesh=mesh24, seq_axis="sp")
    lp = W.create_plan(opts)
    assert_close(np.asarray(dp(x)), np.asarray(lp.exec(x)),
                 label="dseq dct4 zeroPad vs single-chip")


@pytest.mark.parametrize("boundary,kshape,zp", [
    # direct-spectrum route (circular, full-length kernel), read+write
    ("circular", None,
     {"read": {"start": [8], "end": [56]}, "write": {"start": [4], "end": [60]}}),
    # halo route (short kernel), read-only
    ("circular", [5], {"read": {"start": [0], "end": [48]}}),
    # padded-circular spectrum route (linear boundaries), write in the
    # fftShape = n+k-1 domain (rect extends past the crop end)
    ("linear-full", [9], {"write": {"start": [6], "end": [70]}}),
    ("linear-same", [7],
     {"read": {"start": [2], "end": [64]}, "write": {"start": [0], "end": [60]}}),
    ("linear-valid", [9], {"read": {"start": [1], "end": [70]}}),
])
def test_seq_fftconv_zeropad_matches_single_chip(mesh24, rng, assert_close,
                                                 boundary, kshape, zp):
    """The r4 reject is gone: fftconv zeroPad stages shard-locally around
    every distributed route (VERDICT r4 missing #3; reference fuses the
    rects into its internal C2C plans, fftconv.js:532-567)."""
    fc = {"boundary": boundary}
    if kshape is not None:
        fc["kernelShape"] = kshape
    opts = {"type": "fftconv", "shape": [64], "batch": 4,
            "fftConv": fc, "zeroPad": zp}
    k = kshape[0] if kshape is not None else 64
    x = rng.standard_normal((4, 64, 2)).astype(np.float32)
    kern = rng.standard_normal((k, 2)).astype(np.float32)
    dp = create_distributed_plan(opts, mesh=mesh24, batch_axis="dp",
                                 seq_axis="sp")
    assert "distributed-staging" in dp.route.reasons
    lp = W.create_plan(opts)
    assert_close(np.asarray(dp(x, kernel=kern)),
                 np.asarray(lp.exec(x, kernel=kern)),
                 label=f"dseq fftconv zeroPad {boundary} vs single-chip")


def test_seq_fftconv_zeropad_nd_multikernel(mesh24, rng, assert_close):
    """zeroPad composes with rank-2, kernelCount>1, correlation, and both
    output layouts on the distributed spectrum route."""
    for outl in ("kernel-major", "batch-major"):
        opts = {"type": "fftconv", "shape": [16, 12], "batch": 2,
                "fftConv": {"boundary": "linear-same", "mode": "correlation",
                            "kernelShape": [5, 3], "kernelCount": 2,
                            "outputLayout": outl},
                "zeroPad": {"read": {"start": [1, 0], "end": [18, 13]},
                            "write": {"start": [0, 1], "end": [19, 12]}}}
        x = rng.standard_normal((2, 16, 12, 2)).astype(np.float32)
        kern = rng.standard_normal((2, 5, 3, 2)).astype(np.float32)
        dp = create_distributed_plan(opts, mesh=mesh24, batch_axis="dp",
                                     seq_axis="sp")
        lp = W.create_plan(opts)
        assert_close(np.asarray(dp(x, kernel=kern)),
                     np.asarray(lp.exec(x, kernel=kern)),
                     label=f"dseq fftconv zeroPad nd {outl}")


def test_seq_fftconv_zeropad_channel_lanes(mesh24, rng, assert_close):
    """zeroPad read mask applies AFTER the channel-lane input gather and
    the write mask BEFORE the lane scatter (wrapper ordering)."""
    opts = {"type": "fftconv", "shape": [32], "batch": 2,
            "fftConv": {"boundary": "circular", "kernelShape": [32],
                        "kernelCount": 2,
                        "channelPolicy": {
                            "input": {"channels": 3, "channelIndex": 1},
                            "output": {"channels": 4, "channelIndex": 0,
                                       "kernelStepChannels": 2}}},
            "zeroPad": {"read": {"start": [2], "end": [30]},
                        "write": {"start": [1], "end": [31]}}}
    x = rng.standard_normal((2 * 3 * 32, 2)).astype(np.float32)
    kern = rng.standard_normal((2, 32, 2)).astype(np.float32)
    dp = create_distributed_plan(opts, mesh=mesh24, batch_axis="dp",
                                 seq_axis="sp")
    lp = W.create_plan(opts)
    assert_close(np.asarray(dp(x, kernel=kern)),
                 np.asarray(lp.exec(x, kernel=kern)),
                 label="dseq fftconv zeroPad channel lanes")


def test_seq_inplace_still_rejected(mesh8):
    with pytest.raises(PlanError, match="inPlace"):
        create_distributed_plan({"type": "c2c", "shape": [64],
                                 "inPlace": True},
                                mesh=mesh8, seq_axis="sp")
