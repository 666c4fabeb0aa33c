"""Multi-chip sharding tests on the 8-virtual-CPU-device mesh
(SURVEY.md §4 TPU translation: mesh logic testable without a pod)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

import webgpufft_tpu as W
from webgpufft_tpu.core.cplx import interleave, uninterleave
from webgpufft_tpu.parallel import sharded
from webgpufft_tpu.utils import mathref as R


@pytest.fixture(scope="module")
def mesh8():
    return sharded.make_mesh({"dp": 8})


@pytest.fixture(scope="module")
def mesh24():
    return sharded.make_mesh({"dp": 2, "sp": 4})


def test_make_mesh_validates():
    with pytest.raises(ValueError, match="devices"):
        sharded.make_mesh({"dp": 64})


def test_make_mesh_ici_optimized_and_plain_agree_in_shape():
    """Full-device meshes route through mesh_utils.create_device_mesh
    (ICI-aware placement); partial meshes and ici_optimized=False keep
    enumeration order.  All flavors produce the same logical mesh."""
    for kwargs in ({}, {"ici_optimized": False}):
        m = sharded.make_mesh({"dp": 2, "sp": 4}, **kwargs)
        assert m.axis_names == ("dp", "sp")
        assert tuple(m.shape.values()) == (2, 4)
        assert len({d.id for d in m.devices.ravel()}) == 8
    part = sharded.make_mesh({"sp": 4})
    assert tuple(part.shape.values()) == (4,)


def test_make_mesh_dcn_path():
    """dcn= splits axes over host granules (degenerate 1-granule case on
    the CPU fabric); invalid factors and unknown axes are rejected."""
    m = sharded.make_mesh({"dp": 2, "sp": 4}, dcn={"dp": 1})
    assert tuple(m.shape.values()) == (2, 4)
    with pytest.raises(ValueError, match="does not divide"):
        sharded.make_mesh({"dp": 3}, dcn={"dp": 2})
    with pytest.raises(ValueError, match="not in the mesh"):
        sharded.make_mesh({"dp": 4}, dcn={"xx": 2})


def test_batch_sharded_c2c(mesh8, rng, assert_close):
    n, batch = 128, 32
    z = rng.standard_normal((batch, n)) + 1j * rng.standard_normal((batch, n))
    plan = W.create_plan(type="c2c", shape=[n], batch=batch, direction="forward",
                        tuning={"impl": "xla"})
    run = sharded.shard_batch(plan, mesh8, "dp")
    y = uninterleave(np.asarray(run(interleave(z))))
    ref = R.fft_nd(z, [n], "forward")
    assert_close(y.real, ref.real, label="dp.re")
    assert_close(y.imag, ref.imag, label="dp.im")


def test_batch_sharded_fftconv(mesh8, rng, assert_close):
    shape, batch = [16], 16
    x = rng.standard_normal((batch, 16)) + 1j * rng.standard_normal((batch, 16))
    k = rng.standard_normal((5,)) + 1j * rng.standard_normal((5,))
    plan = W.create_plan(type="fftconv", shape=shape, batch=batch,
                        fftConv={"boundary": "linear-same", "kernelShape": [5]})
    from jax.sharding import NamedSharding
    xs = jax.device_put(jnp.asarray(interleave(x)),
                        NamedSharding(mesh8, P("dp", None, None)))
    y = uninterleave(np.asarray(plan.exec(xs, kernel=interleave(k))))
    ref = R.fftconv(x, k, shape, batch=batch, boundary="linear-same",
                    kernel_shape=[5])
    assert_close(y.real, ref.real, label="dp fftconv.re")


@pytest.mark.parametrize("n,ndev_axis", [(1024, "dp"), (4096, "dp")])
def test_distributed_fft_1d(mesh8, n, ndev_axis, rng, assert_close):
    batch = 2
    z = rng.standard_normal((batch, n)) + 1j * rng.standard_normal((batch, n))
    fn = sharded.build_distributed_fft_1d(n, mesh8, "dp", "forward")
    y = np.asarray(jax.jit(fn)(jnp.asarray(interleave(z))))
    y = uninterleave(y.reshape(batch, n, 2))
    ref = R.fft_nd(z, [n], "forward")
    assert_close(y.real, ref.real, label=f"dist{n}.re")
    assert_close(y.imag, ref.imag, label=f"dist{n}.im")


def test_distributed_fft_inverse_normalized(mesh8, rng, assert_close):
    n, batch = 1024, 2
    z = rng.standard_normal((batch, n)) + 1j * rng.standard_normal((batch, n))
    fwd = sharded.build_distributed_fft_1d(n, mesh8, "dp", "forward")
    inv = sharded.build_distributed_fft_1d(n, mesh8, "dp", "inverse", "backward")
    yf = jax.jit(fwd)(jnp.asarray(interleave(z))).reshape(batch, n, 2)
    back = np.asarray(jax.jit(inv)(yf)).reshape(batch, n, 2)
    back = uninterleave(back)
    assert_close(back.real, z.real, label="dist roundtrip.re")
    assert_close(back.imag, z.imag, label="dist roundtrip.im")


def test_distributed_split_validation(mesh8):
    with pytest.raises(ValueError, match="split"):
        sharded.build_distributed_fft_1d(17 * 8, mesh8, "dp")
    assert sharded.choose_distributed_split(2 ** 20, 8) == (1024, 1024)
    assert sharded.choose_distributed_split(64, 8) == (8, 8)
    assert sharded.choose_distributed_split(12, 8) is None


def test_2d_mesh_dp_plus_sp(mesh24, rng, assert_close):
    """Combined data-parallel batch + sequence-parallel FFT on a dp x sp
    mesh — the flagship multi-chip layout."""
    n, batch = 256, 4
    z = rng.standard_normal((batch, n)) + 1j * rng.standard_normal((batch, n))
    fn = sharded.build_distributed_fft_1d(n, mesh24, "sp", "forward")

    from jax.sharding import NamedSharding
    x = jax.device_put(jnp.asarray(interleave(z)),
                       NamedSharding(mesh24, P("dp", None, None)))
    y = np.asarray(jax.jit(fn)(x)).reshape(batch, n, 2)
    ref = R.fft_nd(z, [n], "forward")
    assert_close(uninterleave(y).real, ref.real, label="dp+sp.re")


def test_distributed_fft_axis0_nd(mesh8, rng, assert_close):
    """ND array with axis 0 distributed: four-step over ICI, trailing axes
    riding locally."""
    import jax.numpy as jnp
    shape = (256, 12)
    batch = 2
    z = rng.standard_normal((batch, *shape)) + 1j * rng.standard_normal((batch, *shape))
    fn = sharded.build_distributed_fft_axis0(shape, mesh8, "dp", "forward")
    y = np.asarray(jax.jit(fn)(jnp.asarray(interleave(z))))
    got = uninterleave(y.reshape(batch, shape[0], shape[1], 2))
    ref = np.fft.fft(z, axis=1)  # FFT along logical axis 0 only
    assert_close(got.real, ref.real, label="nd-axis0.re")
    assert_close(got.imag, ref.imag, label="nd-axis0.im")


def test_distributed_axis0_composes_with_local_axes(mesh8, rng, assert_close):
    """Full 2D FFT: distributed axis 0 + local plan for axis 1."""
    import jax.numpy as jnp
    import webgpufft_tpu as W
    shape = (256, 16)
    batch = 2
    z = rng.standard_normal((batch, *shape)) + 1j * rng.standard_normal((batch, *shape))
    fn0 = sharded.build_distributed_fft_axis0(shape, mesh8, "dp", "forward")
    # local axis-1 FFT as a batched 1D plan over (batch*n0) lines
    p1 = W.create_plan(type="c2c", shape=[shape[1]], batch=batch * shape[0],
                      direction="forward", tuning={"impl": "xla"})
    y0 = jax.jit(fn0)(jnp.asarray(interleave(z))).reshape(batch, shape[0], shape[1], 2)
    y = np.asarray(p1(np.asarray(y0).reshape(-1, shape[1], 2)))
    got = uninterleave(y.reshape(batch, *shape, 2))
    ref = np.fft.fft2(z, axes=(1, 2))
    assert_close(got.real, ref.real, label="2d dist+local.re")
    assert_close(got.imag, ref.imag, label="2d dist+local.im")


# ---------------------------------------------------------------------------
# distributed compositions: r2c, fftconv (VERDICT r1 #7)
# ---------------------------------------------------------------------------

def test_distributed_r2c(mesh8, rng, assert_close):
    """Distributed real->packed FFT (half-complex trick on the distributed
    digit plan) matches np.fft.rfft."""
    n, batch = 512, 4
    x = rng.standard_normal((batch, n)).astype(np.float32)
    fn = sharded.build_distributed_r2c_1d(n, mesh8, "dp")
    y = uninterleave(np.asarray(jax.jit(fn)(jnp.asarray(x))))
    ref = np.fft.rfft(x, axis=1)
    assert_close(y.real, ref.real, label="dist-r2c.re")
    assert_close(y.imag, ref.imag, label="dist-r2c.im")


def test_distributed_r2c_normalized(mesh8, rng, assert_close):
    n, batch = 256, 2
    x = rng.standard_normal((batch, n)).astype(np.float32)
    fn = sharded.build_distributed_r2c_1d(n, mesh8, "dp", normalize="unitary")
    y = uninterleave(np.asarray(jax.jit(fn)(jnp.asarray(x))))
    assert_close(y.real, np.fft.rfft(x, axis=1).real / np.sqrt(n),
                 label="dist-r2c unitary")


def test_distributed_fftconv(mesh24, rng, assert_close):
    """Distributed circular fftconv on the dp x sp mesh matches the numpy
    circular convolution, including a NON-square digit split."""
    from jax.sharding import NamedSharding
    n, batch = 512, 4  # 512 over sp=4: balanced split is non-square
    z = rng.standard_normal((batch, n)) + 1j * rng.standard_normal((batch, n))
    kt = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    fn = sharded.build_distributed_fftconv_1d(n, mesh24, "sp",
                                              batch_axis_name="dp")
    n1, n2 = fn.split
    assert n1 != n2  # exercise the swapped-split inverse chaining
    x = jax.device_put(jnp.asarray(interleave(z)),
                       NamedSharding(mesh24, P("dp", None, None)))
    y = np.asarray(jax.jit(fn)(x, jnp.asarray(interleave(kt))))
    ref = np.fft.ifft(np.fft.fft(z, axis=1) * np.fft.fft(kt), axis=1)
    got = uninterleave(y)
    assert_close(got.real, ref.real, label="dist-fftconv.re")
    assert_close(got.imag, ref.imag, label="dist-fftconv.im")


def test_distributed_fftconv_correlation(mesh8, rng, assert_close):
    n, batch = 256, 2
    z = rng.standard_normal((batch, n)) + 1j * rng.standard_normal((batch, n))
    kt = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    fn = sharded.build_distributed_fftconv_1d(n, mesh8, "dp",
                                              mode="correlation")
    y = uninterleave(np.asarray(jax.jit(fn)(
        jnp.asarray(interleave(z)), jnp.asarray(interleave(kt)))))
    ref = np.fft.ifft(np.fft.fft(z, axis=1) * np.conj(np.fft.fft(kt)), axis=1)
    assert_close(y.real, ref.real, label="dist-corr.re")
    assert_close(y.imag, ref.imag, label="dist-corr.im")


def test_distributed_r2c_odd_widens(mesh8, rng, assert_close):
    """Odd n takes the complex-widening path (Bluestein when the length
    has no mesh-divisible split) instead of raising."""
    n = 255                      # 3*5*17: not even smooth
    x = rng.standard_normal((2, n))
    fn = sharded.build_distributed_r2c_1d(n, mesh8, "dp")
    pk = np.asarray(fn(jnp.asarray(x.astype(np.float32))))
    ref = np.fft.rfft(x, axis=-1)
    assert pk.shape == (2, n // 2 + 1, 2)
    assert_close(pk[..., 0], ref.real, label="odd r2c.re")
    assert_close(pk[..., 1], ref.imag, label="odd r2c.im")


def test_distributed_fftconv_nd(mesh24, rng, assert_close):
    """ND circular fftconv with axis 0 spanning chips: distributed
    four-step on axis 0, local FFTs for the rest, pointwise in the
    sharded grid."""
    from jax.sharding import NamedSharding
    shape = (256, 6, 5)
    batch = 2
    z = rng.standard_normal((batch, *shape)) + 1j * rng.standard_normal((batch, *shape))
    kt = rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
    fn = sharded.build_distributed_fftconv_nd(shape, mesh24, "sp",
                                              batch_axis_name="dp")
    x = jax.device_put(jnp.asarray(interleave(z)),
                       NamedSharding(mesh24, P("dp", *([None] * 4))))
    y = np.asarray(jax.jit(fn)(x, jnp.asarray(interleave(kt))))
    ref = np.fft.ifftn(np.fft.fftn(z, axes=(1, 2, 3))
                       * np.fft.fftn(kt), axes=(1, 2, 3))
    got = uninterleave(y)
    assert_close(got.real, ref.real, label="nd-dist-conv.re")
    assert_close(got.imag, ref.imag, label="nd-dist-conv.im")


def test_distributed_fftconv_nd_correlation_rader_rest_axis(mesh8, rng, assert_close):
    """ND distributed correlation with a PRIME local axis (exercises the
    local Rader plan riding the sharded grid)."""
    shape = (256, 7)
    batch = 2
    z = rng.standard_normal((batch, *shape)) + 1j * rng.standard_normal((batch, *shape))
    kt = rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
    fn = sharded.build_distributed_fftconv_nd(shape, mesh8, "dp",
                                              mode="correlation")
    y = np.asarray(jax.jit(fn)(jnp.asarray(interleave(z)),
                               jnp.asarray(interleave(kt))))
    ref = np.fft.ifftn(np.fft.fftn(z, axes=(1, 2))
                       * np.conj(np.fft.fftn(kt)), axes=(1, 2))
    got = uninterleave(y)
    assert_close(got.real, ref.real, label="nd-dist-corr.re")
    assert_close(got.imag, ref.imag, label="nd-dist-corr.im")


def test_distributed_operand_bounds(mesh8, rng, assert_close, monkeypatch):
    """Per-device einsum operands in the distributed plans are bounded:
    batch slabs inside shard_map (regression: unbounded), and a transform
    too large per device fails at build."""
    from webgpufft_tpu.core import axis as A
    monkeypatch.setattr(A, "OPERAND_CHUNK_ELEMS", 512)
    n, batch = 256, 32  # per-dev batch 4 x (256/8)=32/item -> slabbed
    z = rng.standard_normal((batch, n)) + 1j * rng.standard_normal((batch, n))
    fn = sharded.build_distributed_fft_1d(n, mesh8, "dp", "forward",
                                          batch_axis_name=None)
    y = uninterleave(np.asarray(jax.jit(fn)(jnp.asarray(interleave(z)))
                                .reshape(batch, n, 2)))
    assert_close(y, np.fft.fft(z, axis=1), label="dist-slabbed")
    with pytest.raises(ValueError, match="per-device"):
        monkeypatch.setattr(A, "OPERAND_CHUNK_ELEMS", 16)
        sharded.build_distributed_fft_1d(n, mesh8, "dp")


class TestDistributedStft:
    """Sequence-parallel STFT/ISTFT: time axis sharded over the mesh,
    the (W - H)-sample window-overlap halo rides one ppermute."""

    @pytest.fixture(scope="class")
    def spmesh(self):
        return sharded.make_mesh({"sp": 8})

    @pytest.mark.parametrize("W,O,n,win", [
        (256, 192, 4000, "hann"),   # 75% overlap, gcd framing
        (128, 64, 4544, "hann"),    # 50% overlap (H | W)
        (64, 0, 4544, "boxcar"),    # no overlap (no halo; hann fails NOLA)
        (100, 37, 3969, "hann"),    # coprime-ish hop (gather fallback)
    ])
    def test_matches_facade(self, spmesh, W, O, n, win):
        from webgpufft_tpu.parallel import (build_distributed_stft,
                                            build_distributed_istft)
        from webgpufft_tpu import fft as wfft
        mesh = spmesh
        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, n)).astype(np.float32)
        f, t, fn = build_distributed_stft(n, mesh, "sp", fs=50.0,
                                          window=win, nperseg=W,
                                          noverlap=O)
        with mesh:
            Zd = np.asarray(jax.jit(fn)(x))
        fr, tr, Zr = wfft.stft(x, fs=50.0, window=win, nperseg=W,
                               noverlap=O)
        assert np.allclose(f, np.asarray(fr))
        assert np.allclose(t, np.asarray(tr))
        Zr = np.asarray(Zr)
        assert Zd.shape == Zr.shape
        scale = max(np.max(np.abs(Zr)), 1e-6)
        assert np.max(np.abs(Zd - Zr)) / scale < 1e-5

        ifn = build_distributed_istft(n, mesh, "sp", fs=50.0,
                                      window=win, nperseg=W, noverlap=O)
        with mesh:
            xr = np.asarray(jax.jit(ifn)(Zr))
        assert xr.shape == x.shape
        assert np.max(np.abs(xr - x)) < 2e-5 * max(np.max(np.abs(x)), 1)

    def test_no_all_to_all(self, spmesh):
        """The comm profile is the O(W) halo, not an O(n) exchange."""
        from webgpufft_tpu.parallel import build_distributed_stft
        mesh = spmesh
        n = 4000
        _, _, fn = build_distributed_stft(n, mesh, "sp", nperseg=256,
                                          noverlap=192)
        x = jnp.zeros((1, n), jnp.float32)
        with mesh:
            hlo = jax.jit(fn).lower(x).compile().as_text()
        assert "all-to-all" not in hlo

    def test_frame_split_validation(self, spmesh):
        from webgpufft_tpu.parallel import build_distributed_stft
        mesh = spmesh
        with pytest.raises(ValueError):
            # frame count not divisible by 8
            build_distributed_stft(1000, mesh, "sp", nperseg=256,
                                   noverlap=192)

    def test_1d_input_and_nfft(self, spmesh):
        from webgpufft_tpu.parallel import (build_distributed_stft,
                                            build_distributed_istft)
        from webgpufft_tpu import fft as wfft
        mesh = spmesh
        n = 4544
        x = np.random.default_rng(1).standard_normal(n).astype(np.float32)
        f, t, fn = build_distributed_stft(n, mesh, "sp", nperseg=128,
                                          noverlap=64, nfft=256)
        with mesh:
            Zd = np.asarray(fn(x))
        _, _, Zr = wfft.stft(x, nperseg=128, noverlap=64, nfft=256)
        Zr = np.asarray(Zr)
        assert Zd.shape == Zr.shape
        assert np.max(np.abs(Zd - Zr)) < 1e-5 * max(np.max(np.abs(Zr)), 1)


class TestDistributedWelch:
    @pytest.fixture(scope="class")
    def spmesh(self):
        return sharded.make_mesh({"sp": 8})

    @pytest.mark.parametrize("n,W,O,sc", [
        (4288, 256, 192, "density"),
        (4160, 128, 64, "spectrum"),
        (4288, 256, 192, "spectrum"),
    ])
    def test_matches_facade(self, spmesh, n, W, O, sc):
        from webgpufft_tpu.parallel import build_distributed_welch
        from webgpufft_tpu import fft as wfft
        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, n)).astype(np.float32)
        f, fn = build_distributed_welch(n, spmesh, "sp", fs=100.0,
                                        nperseg=W, noverlap=O, scaling=sc)
        with spmesh:
            Pd = np.asarray(jax.jit(fn)(x))
        fr, Pr = wfft.welch(x, fs=100.0, nperseg=W, noverlap=O,
                            scaling=sc)
        Pr = np.asarray(Pr)
        assert np.allclose(f, np.asarray(fr))
        assert Pd.shape == Pr.shape
        assert np.max(np.abs(Pd - Pr)) / np.max(Pr) < 1e-5

    def test_validation(self, spmesh):
        from webgpufft_tpu.parallel import build_distributed_welch
        with pytest.raises(ValueError):
            build_distributed_welch(4544, spmesh, "sp", nperseg=128,
                                    noverlap=64)   # 70 frames, not /8
        with pytest.raises(ValueError):
            build_distributed_welch(100, spmesh, "sp", nperseg=256)


class TestDistributedCsd:
    @pytest.fixture(scope="class")
    def spmesh(self):
        return sharded.make_mesh({"sp": 8})

    def test_matches_facade(self, spmesh):
        from webgpufft_tpu.parallel import build_distributed_csd
        from webgpufft_tpu import fft as wfft
        from webgpufft_tpu.fftapi import ascomplex
        rng = np.random.default_rng(0)
        n = 4288
        x = rng.standard_normal((2, n)).astype(np.float32)
        y = rng.standard_normal((2, n)).astype(np.float32)
        f, fn = build_distributed_csd(n, spmesh, "sp", fs=100.0,
                                      nperseg=256, noverlap=192)
        with spmesh:
            Pd = ascomplex(np.asarray(jax.jit(fn)(x, y)))
        fr, Pr = wfft.csd(x, y, fs=100.0, nperseg=256, noverlap=192)
        Pr = ascomplex(np.asarray(Pr))
        assert np.allclose(f, np.asarray(fr))
        assert np.max(np.abs(Pd - Pr)) / np.max(np.abs(Pr)) < 1e-5

    def test_self_csd_is_welch(self, spmesh):
        from webgpufft_tpu.parallel import (build_distributed_csd,
                                            build_distributed_welch)
        rng = np.random.default_rng(1)
        n = 4288
        x = rng.standard_normal(n).astype(np.float32)
        f, cfn = build_distributed_csd(n, spmesh, "sp", nperseg=256,
                                       noverlap=192)
        _, wfn = build_distributed_welch(n, spmesh, "sp", nperseg=256,
                                         noverlap=192)
        with spmesh:
            Pc = np.asarray(cfn(x, x))
            Pw = np.asarray(wfn(x))
        assert np.max(np.abs(Pc[..., 0] - Pw)) / np.max(Pw) < 1e-5
        assert np.max(np.abs(Pc[..., 1])) / np.max(Pw) < 1e-5


class TestDistributedSpectralDpSp:
    def test_stft_welch_on_dp_sp(self):
        """dp x sp composition: batch sharded over dp, time over sp."""
        from webgpufft_tpu.parallel import (build_distributed_stft,
                                            build_distributed_welch)
        from webgpufft_tpu import fft as wfft
        mesh = sharded.make_mesh({"dp": 2, "sp": 4})
        rng = np.random.default_rng(2)
        n = 4032      # nb = 64 for W=256/H=64 -> /4 devices
        x = rng.standard_normal((4, n)).astype(np.float32)
        f, t, fn = build_distributed_stft(n, mesh, "sp", nperseg=256,
                                          noverlap=192,
                                          batch_axis_name="dp")
        with mesh:
            Zd = np.asarray(jax.jit(fn)(x))
        _, _, Zr = wfft.stft(x, nperseg=256, noverlap=192)
        Zr = np.asarray(Zr)
        assert np.max(np.abs(Zd - Zr)) / np.max(np.abs(Zr)) < 1e-5
        nw = 4288     # welch framing: (4288-256)/64+1 = 64 frames
        xw = rng.standard_normal((4, nw)).astype(np.float32)
        _, wfn = build_distributed_welch(nw, mesh, "sp", nperseg=256,
                                         noverlap=192,
                                         batch_axis_name="dp")
        with mesh:
            Pd = np.asarray(jax.jit(wfn)(xw))
        _, Pr = wfft.welch(xw, nperseg=256, noverlap=192)
        Pr = np.asarray(Pr)
        assert np.max(np.abs(Pd - Pr)) / np.max(Pr) < 1e-5


class TestSpectralReviewRegressions:
    @pytest.fixture(scope="class")
    def spmesh(self):
        return sharded.make_mesh({"sp": 8})

    def test_istft_infers_nfft_from_bins(self, spmesh):
        """Regression: a zero-padded spectrogram (nfft > nperseg) fed to
        an istft built WITHOUT nfft used to silently truncate bins."""
        from webgpufft_tpu.parallel import (build_distributed_stft,
                                            build_distributed_istft)
        rng = np.random.default_rng(0)
        n = 4544
        x = rng.standard_normal(n).astype(np.float32)
        _, _, fn = build_distributed_stft(n, spmesh, "sp", nperseg=128,
                                          noverlap=64, nfft=256)
        ifn = build_distributed_istft(n, spmesh, "sp", nperseg=128,
                                      noverlap=64)   # nfft inferred
        with spmesh:
            Z = np.asarray(fn(x))
            xr = np.asarray(ifn(Z))
        assert np.max(np.abs(xr - x)) < 2e-5 * max(np.max(np.abs(x)), 1)

    def test_istft_rejects_bin_mismatch(self, spmesh):
        from webgpufft_tpu.parallel import build_distributed_istft
        ifn = build_distributed_istft(4544, spmesh, "sp", nperseg=128,
                                      noverlap=64, nfft=128)
        bad = np.zeros((129, 72, 2), np.float32)   # 129 bins vs 65
        with pytest.raises(ValueError):
            with spmesh:
                ifn(bad)

    def test_halo_must_fit_slab(self, spmesh):
        """Regression: an overlap wider than the per-device slab used to
        fail late inside jit with an opaque broadcast error."""
        from webgpufft_tpu.parallel import (build_distributed_stft,
                                            build_distributed_welch)
        with pytest.raises(ValueError, match="overlap"):
            build_distributed_stft(448, spmesh, "sp", nperseg=256,
                                   noverlap=192)
        with pytest.raises(ValueError, match="overlap"):
            build_distributed_welch(704, spmesh, "sp", nperseg=256,
                                    noverlap=192)
