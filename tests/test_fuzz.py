"""Seeded random-spec stress matrix vs the numpy oracle.

The reference stresses its scheduler with rank-4..6 matrices and random
large-mode combinations (test/c2c_large_batch.unit.test.js stress blocks);
this lane draws bounded random specs across families — shapes with mixed/
prime/Bluestein axes, batch, direction, normalize, precision, staging —
and checks every one against utils/mathref.  Deterministic (seeded), so a
failure reproduces by index.
"""

import numpy as np
import pytest

import webgpufft_tpu as W
from webgpufft_tpu.core.cplx import interleave, uninterleave
from webgpufft_tpu.utils import mathref as R

AXIS_POOL = [2, 3, 4, 5, 6, 7, 8, 9, 11, 12, 13, 15, 16, 17, 20, 23, 30]


def _rand_spec(rng):
    rank = int(rng.integers(1, 5))
    shape = [int(rng.choice(AXIS_POOL)) for _ in range(rank)]
    while np.prod(shape) > 4096:
        shape[int(rng.integers(0, rank))] = 2
    batch = int(rng.choice([1, 2, 3, 5]))
    direction = str(rng.choice(["forward", "inverse"]))
    normalize = str(rng.choice(["none", "backward", "unitary"]))
    return shape, batch, direction, normalize


@pytest.mark.parametrize("seed", range(24))
def test_fuzz_c2c(seed, assert_close):
    rng = np.random.default_rng(1000 + seed)
    shape, batch, direction, normalize = _rand_spec(rng)
    z = rng.standard_normal((batch, *shape)) + 1j * rng.standard_normal((batch, *shape))
    plan = W.create_plan(type="c2c", shape=shape, batch=batch,
                        direction=direction, normalize=normalize,
                        cache=W.PlanCache())
    y = uninterleave(np.asarray(plan(interleave(z))))
    ref = R.fft_nd(z, shape, direction, normalize)
    assert_close(y, ref, label=f"fuzz c2c seed={seed} {shape} b{batch} "
                 f"{direction}/{normalize} kinds={plan.route.axis_kinds}")


@pytest.mark.parametrize("seed", range(12))
def test_fuzz_r2c_c2r_roundtrip(seed, assert_close):
    rng = np.random.default_rng(2000 + seed)
    shape, batch, _, _ = _rand_spec(rng)
    shape[0] = int(rng.choice([4, 6, 8, 9, 12, 16, 17, 30]))  # incl. odd/prime
    x = rng.standard_normal((batch, *shape)).astype(np.float32)
    fwd = W.create_plan(type="r2c", shape=shape, direction="forward",
                       batch=batch, cache=W.PlanCache())
    inv = W.create_plan(type="c2r", shape=shape, direction="inverse",
                       normalize="backward", batch=batch, cache=W.PlanCache())
    y = uninterleave(np.asarray(fwd(x)))
    ref = R.r2c_packed(x.astype(np.float64), shape)
    assert_close(y, ref, label=f"fuzz r2c seed={seed} {shape}")
    back = np.asarray(inv(np.asarray(fwd(x))))
    assert_close(back, x, label=f"fuzz r2c/c2r roundtrip seed={seed} {shape}")


@pytest.mark.parametrize("seed", range(12))
def test_fuzz_dct_dst(seed, assert_close):
    rng = np.random.default_rng(3000 + seed)
    shape, batch, direction, normalize = _rand_spec(rng)
    kind = str(rng.choice(["dct1", "dct2", "dct3", "dct4",
                           "dst1", "dst2", "dst3", "dst4"]))
    if kind in ("dst1",):  # dst1 domain constraint: keep axes >= 2
        shape = [max(s, 2) for s in shape]
    x = rng.standard_normal((batch, *shape)).astype(np.float32)
    plan = W.create_plan(type=kind, shape=shape, batch=batch,
                        direction=direction, normalize=normalize,
                        cache=W.PlanCache())
    y = np.asarray(plan(x))
    ref = R.dct_nd(x.astype(np.float64), shape, kind, direction)
    ref = ref * R.normalize_scale(normalize, direction, int(np.prod(shape)))
    assert_close(y, ref, atol_scale=5e-5,
                 label=f"fuzz {kind} seed={seed} {shape} {direction}/{normalize}")


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_fftconv(seed, assert_close):
    rng = np.random.default_rng(4000 + seed)
    rank = int(rng.integers(1, 4))
    shape = [int(rng.choice([4, 6, 8, 9, 12, 16])) for _ in range(rank)]
    kshape = [int(rng.integers(1, s + 1)) for s in shape]
    boundary = str(rng.choice(["circular", "linear-full", "linear-same",
                               "linear-valid"]))
    mode = str(rng.choice(["convolution", "correlation"]))
    batch = int(rng.choice([1, 2, 3]))
    z = rng.standard_normal((batch, *shape)) + 1j * rng.standard_normal((batch, *shape))
    k = rng.standard_normal(kshape) + 1j * rng.standard_normal(kshape)
    plan = W.create_plan(type="fftconv", shape=shape, batch=batch,
                        fftConv={"boundary": boundary, "mode": mode,
                                 "kernelShape": kshape},
                        cache=W.PlanCache())
    y = uninterleave(np.asarray(plan.exec(interleave(z), kernel=interleave(k))))
    ref = R.fftconv(z, k, shape, batch=batch, mode=mode, boundary=boundary,
                    kernel_shape=kshape)
    assert_close(y, ref, atol_scale=5e-5,
                 label=f"fuzz fftconv seed={seed} {shape}*{kshape} "
                 f"{boundary}/{mode}")


# ---------------------------------------------------------------------------
# Distributed fuzz lane (8 virtual CPU devices; seeded like the local lane)
# ---------------------------------------------------------------------------

from webgpufft_tpu.parallel import sharded
from webgpufft_tpu.parallel.plans import create_distributed_plan


@pytest.fixture(scope="module")
def _dmeshes():
    return {
        "sp8": sharded.make_mesh({"sp": 8}),
        "dp2sp4": sharded.make_mesh({"dp": 2, "sp": 4}),
        "dp4sp2": sharded.make_mesh({"dp": 4, "sp": 2}),
    }


@pytest.mark.parametrize("seed", range(12))
def test_fuzz_distributed_c2c(seed, _dmeshes, assert_close):
    """Random 1-D lengths (splittable and Bluestein), meshes, directions,
    and norms through create_distributed_plan vs the oracle."""
    rng = np.random.default_rng(5000 + seed)
    key = str(rng.choice(["sp8", "dp2sp4", "dp4sp2"]))
    mesh = _dmeshes[key]
    dp = "dp" if "dp" in mesh.shape else None
    n = int(rng.choice([64, 96, 101, 128, 144, 225, 256, 360, 509, 1000]))
    batch = int(rng.choice([2, 4])) * (mesh.shape[dp] if dp else 1)
    direction = str(rng.choice(["forward", "inverse"]))
    normalize = str(rng.choice(["none", "backward", "unitary"]))
    z = rng.standard_normal((batch, n)) + 1j * rng.standard_normal((batch, n))
    plan = create_distributed_plan(type="c2c", shape=[n], batch=batch,
                                   direction=direction, normalize=normalize,
                                   mesh=mesh, batch_axis=dp, seq_axis="sp")
    y = uninterleave(np.asarray(plan(interleave(z))))
    ref = R.fft_nd(z, [n], direction, normalize)
    assert_close(y, ref, label=f"dfuzz c2c seed={seed} n={n} {key} "
                 f"{direction}/{normalize}")


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_distributed_fftconv(seed, _dmeshes, assert_close):
    rng = np.random.default_rng(6000 + seed)
    key = str(rng.choice(["sp8", "dp2sp4"]))
    mesh = _dmeshes[key]
    dp = "dp" if "dp" in mesh.shape else None
    n = int(rng.choice([64, 100, 128, 160]))
    kn = int(rng.integers(1, 33))
    boundary = str(rng.choice(["circular", "linear-full", "linear-same",
                               "linear-valid"]))
    mode = str(rng.choice(["convolution", "correlation"]))
    kcount = int(rng.choice([1, 2]))
    batch = 2 * (mesh.shape[dp] if dp else 1)
    if boundary == "circular":
        kn = n                         # circular kernels are full-length
    z = rng.standard_normal((batch, n)) + 1j * rng.standard_normal((batch, n))
    ks = (rng.standard_normal((kcount, kn))
          + 1j * rng.standard_normal((kcount, kn)))
    plan = create_distributed_plan(
        type="fftconv", shape=[n], batch=batch,
        fftConv={"boundary": boundary, "mode": mode, "kernelShape": [kn],
                 "kernelCount": kcount},
        mesh=mesh, batch_axis=dp, seq_axis="sp")
    kin = (np.stack([ks.real, ks.imag], -1).astype(np.float32)
           if kcount > 1 else interleave(ks[0]))
    y = np.asarray(plan(interleave(z), kernel=kin))
    if kcount == 1:
        y = y[None]
    for k in range(kcount):
        ref = R.fftconv(z, ks[k], [n], batch=batch, mode=mode,
                        boundary=boundary, kernel_shape=[kn])
        assert_close(y[k, ..., 0], ref.real, atol_scale=5e-5,
                     label=f"dfuzz conv seed={seed} n={n} k{kn} "
                     f"{boundary}/{mode} kc{kcount} #{k}.re")
        assert_close(y[k, ..., 1], ref.imag, atol_scale=5e-5,
                     label=f"dfuzz conv seed={seed} #{k}.im")


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_distributed_real_and_trig(seed, _dmeshes, assert_close):
    rng = np.random.default_rng(7000 + seed)
    mesh = _dmeshes["dp2sp4"]
    n = int(rng.choice([64, 128, 225, 256, 360, 1000]))
    batch = 4
    x = rng.standard_normal((batch, n))
    which = str(rng.choice(["r2c", "trig"]))
    if which == "r2c":
        r2c = create_distributed_plan(type="r2c", shape=[n], batch=batch,
                                      mesh=mesh, batch_axis="dp",
                                      seq_axis="sp")
        pk = np.asarray(r2c(x.astype(np.float32)))
        ref = np.fft.rfft(x, axis=-1)
        assert_close(pk[..., 0], ref.real,
                     label=f"dfuzz r2c seed={seed} n={n}.re")
        assert_close(pk[..., 1], ref.imag,
                     label=f"dfuzz r2c seed={seed} n={n}.im")
        c2r = create_distributed_plan(type="c2r", shape=[n], batch=batch,
                                      direction="inverse",
                                      normalize="backward", mesh=mesh,
                                      batch_axis="dp", seq_axis="sp")
        back = np.asarray(c2r(pk))
        assert_close(back, x, label=f"dfuzz c2r seed={seed} n={n}")
    else:
        kind = str(rng.choice(["dct2", "dct3", "dst2", "dst3"]))
        direction = str(rng.choice(["forward", "inverse"]))
        plan = create_distributed_plan(type=kind, shape=[n], batch=batch,
                                       direction=direction,
                                       normalize="unitary", mesh=mesh,
                                       batch_axis="dp", seq_axis="sp")
        y = np.asarray(plan(x.astype(np.float32)))
        ref = R.dct_nd(x, [n], kind, direction, "unitary")
        assert_close(y, ref, atol_scale=5e-5,
                     label=f"dfuzz {kind} seed={seed} n={n} {direction}")


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_distributed_real_and_trig_nd(seed, _dmeshes, assert_close):
    """Random rank-2/3 shapes (splittable, even-unsplittable, odd axis 0)
    through the distributed ND r2c/c2r and dct/dst plans vs the oracles."""
    rng = np.random.default_rng(7500 + seed)
    key = str(rng.choice(["sp8", "dp2sp4"]))
    mesh = _dmeshes[key]
    dp = "dp" if "dp" in mesh.shape else None
    n0 = int(rng.choice([13, 15, 24, 30, 32, 64, 128]))
    rest = [int(v) for v in
            rng.choice([4, 5, 6, 8, 12], size=int(rng.choice([1, 2])))]
    shape = [n0] + rest
    batch = 2 * (mesh.shape[dp] if dp else 1)
    x = rng.standard_normal((batch, *shape))
    which = str(rng.choice(["r2c", "trig"]))
    axes = tuple(range(1, len(shape) + 1))
    if which == "r2c":
        r2c = create_distributed_plan(type="r2c", shape=shape, batch=batch,
                                      mesh=mesh, batch_axis=dp,
                                      seq_axis="sp")
        pk = np.asarray(r2c(x.astype(np.float32)))
        ref = np.fft.fftn(x, axes=axes)[:, : n0 // 2 + 1]
        assert_close(pk[..., 0], ref.real,
                     label=f"dfuzz ndr2c seed={seed} {shape}.re")
        assert_close(pk[..., 1], ref.imag,
                     label=f"dfuzz ndr2c seed={seed} {shape}.im")
        c2r = create_distributed_plan(type="c2r", shape=shape, batch=batch,
                                      direction="inverse",
                                      normalize="backward", mesh=mesh,
                                      batch_axis=dp, seq_axis="sp")
        assert_close(np.asarray(c2r(pk)), x,
                     label=f"dfuzz ndc2r seed={seed} {shape}")
    else:
        kind = str(rng.choice(["dct2", "dct3", "dst2", "dst3"]))
        direction = str(rng.choice(["forward", "inverse"]))
        plan = create_distributed_plan(type=kind, shape=shape, batch=batch,
                                       direction=direction,
                                       normalize="unitary", mesh=mesh,
                                       batch_axis=dp, seq_axis="sp")
        y = np.asarray(plan(x.astype(np.float32)))
        ref = R.dct_nd(x, shape, kind, direction, "unitary")
        assert_close(y, ref, atol_scale=5e-5,
                     label=f"dfuzz nd{kind} seed={seed} {shape} {direction}")


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_distributed_fftconv_nd(seed, _dmeshes, assert_close):
    """Random ND distributed convolutions across the halo and spectrum
    routes (kernel size decides), all boundaries."""
    rng = np.random.default_rng(8000 + seed)
    mesh = _dmeshes["dp2sp4"]
    shape = [int(rng.choice([96, 128, 200])), int(rng.choice([6, 8, 12]))]
    kshape = [int(rng.integers(2, 12)), int(rng.integers(1, 4))]
    boundary = str(rng.choice(["linear-full", "linear-same", "circular"]))
    if boundary == "circular" and shape[0] % 4:
        boundary = "linear-full"
    batch = 4
    z = (rng.standard_normal((batch, *shape))
         + 1j * rng.standard_normal((batch, *shape)))
    kk = rng.standard_normal(kshape) + 1j * rng.standard_normal(kshape)
    plan = create_distributed_plan(
        type="fftconv", shape=shape, batch=batch,
        fftConv={"boundary": boundary, "kernelShape": kshape},
        mesh=mesh, batch_axis="dp", seq_axis="sp")
    y = np.asarray(plan(interleave(z), kernel=interleave(kk)))
    ref = R.fftconv(z, kk, shape, batch=batch, boundary=boundary,
                    kernel_shape=kshape)
    got = (y[..., 0] + 1j * y[..., 1]).reshape(ref.shape)
    assert_close(got.real, ref.real, atol_scale=5e-5,
                 label=f"dfuzz ndconv seed={seed} {shape}*{kshape} "
                 f"{boundary} route={plan.route.reasons[-1]}")
    assert_close(got.imag, ref.imag, atol_scale=5e-5,
                 label=f"dfuzz ndconv seed={seed}.im")


@pytest.mark.parametrize("seed", range(10))
def test_fuzz_distributed_pencil(seed, assert_close):
    """Random pencil-decomposed (2-D mesh) c2c / r2c / c2r configurations
    vs the oracle: random splittable axis lengths, ranks, riding-axis
    lengths (any), directions, norms, and dp mixing."""
    rng = np.random.default_rng(7000 + seed)
    meshes = {
        "2x4": sharded.make_mesh({"sp0": 2, "sp1": 4}),
        "4x2": sharded.make_mesh({"sp0": 4, "sp1": 2}),
        "dp2x2x2": sharded.make_mesh({"dp": 2, "sp0": 2, "sp1": 2}),
    }
    key = str(rng.choice(list(meshes)))
    mesh = meshes[key]
    dp = "dp" if "dp" in mesh.shape else None
    p0, p1 = mesh.shape["sp0"], mesh.shape["sp1"]

    def pick_len(p):
        # lengths with two smooth factors each divisible by p
        opts = [p * p, 4 * p * p, 3 * p * p, 6 * p * p, 2 * p * p]
        return int(rng.choice(opts))

    n0, n1 = pick_len(p0), pick_len(p1)
    rank = int(rng.choice([2, 3]))
    rest = [int(rng.choice([3, 5, 6, 7]))] if rank == 3 else []
    shape = [n0, n1, *rest]
    batch = (mesh.shape[dp] if dp else 1) * int(rng.choice([1, 2]))
    kind = str(rng.choice(["c2c", "r2c_c2r"]))
    if kind == "c2c":
        direction = str(rng.choice(["forward", "inverse"]))
        normalize = str(rng.choice(["none", "backward", "unitary"]))
        z = (rng.standard_normal((batch, *shape))
             + 1j * rng.standard_normal((batch, *shape)))
        plan = create_distributed_plan(
            type="c2c", shape=shape, batch=batch, direction=direction,
            normalize=normalize, mesh=mesh, batch_axis=dp,
            seq_axis=("sp0", "sp1"))
        y = uninterleave(np.asarray(plan(interleave(z)))).reshape(batch, *shape)
        ref = R.fft_nd(z, shape, direction, normalize)
        assert_close(y, ref, label=f"pfuzz c2c seed={seed} {shape} {key} "
                     f"{direction}/{normalize}")
    else:
        x = rng.standard_normal((batch, *shape)).astype(np.float32)
        r2c = create_distributed_plan(type="r2c", shape=shape, batch=batch,
                                      mesh=mesh, batch_axis=dp,
                                      seq_axis=("sp0", "sp1"))
        y = np.asarray(r2c(x))
        pk = shape[0] // 2 + 1
        ref = R.fft_nd(x.astype(np.float64), shape, "forward")[:, :pk]
        got = uninterleave(y).reshape(batch, pk, *shape[1:])
        assert_close(got, ref, label=f"pfuzz r2c seed={seed} {shape} {key}")
        c2r = create_distributed_plan(type="c2r", shape=shape, batch=batch,
                                      direction="inverse",
                                      normalize="backward", mesh=mesh,
                                      batch_axis=dp, seq_axis=("sp0", "sp1"))
        back = np.asarray(c2r(y)).reshape(batch, *shape)
        assert_close(back, x, label=f"pfuzz c2r seed={seed} {shape} {key}")


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_dsp_toolkit(seed):
    """Random filter designs applied on device vs scipy end-to-end:
    design family, order, band type, and application path all drawn
    randomly; every chain is checked against scipy.signal."""
    import scipy.signal as ss
    from webgpufft_tpu import filtering as FL
    r = np.random.default_rng(1000 + seed)
    n = int(r.integers(64, 400))
    x = r.standard_normal(n).astype(np.float32)

    # random IIR design
    ftype = r.choice(["butter", "cheby1", "cheby2", "ellip"])
    order = int(r.integers(2, 7))
    btype = r.choice(["lowpass", "highpass", "bandpass"])
    if btype == "bandpass":
        lo = r.uniform(0.1, 0.4)
        wn = [lo, lo + r.uniform(0.1, 0.4)]
    else:
        wn = r.uniform(0.1, 0.8)
    kw = {}
    if ftype in ("cheby1", "ellip"):
        kw["rp"] = 1.0
    if ftype in ("cheby2", "ellip"):
        kw["rs"] = 40.0
    sos = FL.iirfilter(order, wn, btype=btype, ftype=ftype,
                       output="sos", **kw)
    sos_ref = ss.iirfilter(order, wn, btype=btype, ftype=ftype,
                           output="sos", **kw)
    assert np.allclose(sos, sos_ref, atol=1e-9, rtol=1e-7)

    got = np.asarray(FL.sosfilt(sos, x))
    want = ss.sosfilt(sos_ref, x)
    scale = max(np.max(np.abs(want)), 1e-6)
    assert np.max(np.abs(got - want)) / scale < 5e-4

    # random FIR design + device convolution path
    numtaps = int(r.integers(9, 64)) | 1
    cutoff = r.uniform(0.1, 0.9)
    taps = FL.firwin(numtaps, cutoff)
    assert np.allclose(taps, ss.firwin(numtaps, cutoff), atol=1e-13)
    got = np.asarray(FL.lfilter(taps, 1.0, x))
    want = ss.lfilter(taps, [1.0], x)
    assert np.max(np.abs(got - want)) / max(np.max(np.abs(want)),
                                            1e-6) < 5e-4

    # random symmetric IIR (splines) geometry
    from webgpufft_tpu import splines as SP
    z1 = float(r.uniform(-0.7, 0.7))
    if abs(z1) > 0.05 and n > 60:
        c0 = float(r.uniform(0.5, 3.0))
        got = np.asarray(SP.symiirorder1(x.astype(np.float64), c0, z1))
        want = ss.symiirorder1(x.astype(np.float64), c0, z1)
        assert np.max(np.abs(got - want)) / max(np.max(np.abs(want)),
                                                1e-6) < 5e-4


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_shorttime_and_envelope(seed):
    """Random ShortTimeFFT geometries and envelope bands vs scipy."""
    import scipy.signal as ss
    from webgpufft_tpu import ShortTimeFFT
    from webgpufft_tpu import fft as wfft
    from webgpufft_tpu.fftapi import ascomplex
    r = np.random.default_rng(2000 + seed)
    n = int(r.integers(40, 300))
    x = r.standard_normal(n)

    m = int(r.integers(4, 24))
    hop = int(r.integers(1, m + 1))
    mfft = m + int(r.integers(0, 9))
    mode = r.choice(["onesided", "twosided", "centered"])
    A = ShortTimeFFT(ss.windows.gaussian(m, m / 4), hop=hop, fs=5,
                     fft_mode=mode, mfft=mfft)
    B = ss.ShortTimeFFT(ss.windows.gaussian(m, m / 4), hop=hop, fs=5,
                        fft_mode=mode, mfft=mfft)
    S_g = ascomplex(np.asarray(A.stft(x)))
    S_e = B.stft(x)
    scale = max(np.max(np.abs(S_e)), 1e-6)
    assert np.max(np.abs(S_g - S_e)) / scale < 5e-4, (m, hop, mfft, mode)
    if A.invertible:
        xr = np.asarray(A.istft(S_e.astype(np.complex64), k1=n))
        want = B.istft(S_e, k1=n)
        if mode == "onesided":
            assert np.max(np.abs(xr - want.real)) < 5e-4 * max(
                np.max(np.abs(want.real)), 1e-6)

    # envelope with a random legal band
    bp0 = int(r.integers(-(n // 2), (n + 1) // 2 - 1))
    bp1 = int(r.integers(bp0 + 1, (n + 1) // 2 + 1))
    res = r.choice(["lowpass", "all"])
    got = np.asarray(wfft.envelope(x, (bp0, bp1), residual=res))
    want = ss.envelope(x, (bp0, bp1), residual=res)
    scale = max(np.max(np.abs(want)), 1e-6)
    assert np.max(np.abs(got - want)) / scale < 1e-4, (bp0, bp1, res)


@pytest.mark.parametrize("seed", range(5))
def test_fuzz_distributed_spectral(seed, _dmeshes):
    """Random sequence-parallel STFT/welch geometries vs the facade."""
    from webgpufft_tpu.parallel import (build_distributed_stft,
                                        build_distributed_istft,
                                        build_distributed_welch)
    from webgpufft_tpu.parallel import sharded as _sh
    from webgpufft_tpu.parallel.sharded import distributed_stft_geometry
    from webgpufft_tpu import fft as wfft
    r = np.random.default_rng(3000 + seed)
    mesh = _sh.make_mesh({"sp": int(r.choice([2, 4, 8]))})
    ndev = mesh.shape["sp"]
    W = int(r.choice([32, 64, 96, 128]))
    H = int(r.integers(max(W // 4, 8), W + 1))
    # walk n upward until the frame count splits
    n = int(r.integers(1500, 4000))
    for _ in range(2000):
        if distributed_stft_geometry(n, W, H, ndev) is not None:
            break
        n += 1
    x = r.standard_normal((2, n)).astype(np.float32)
    f, t, fn = build_distributed_stft(n, mesh, "sp", nperseg=W,
                                      noverlap=W - H)
    with mesh:
        Zd = np.asarray(fn(x))
    _, _, Zr = wfft.stft(x, nperseg=W, noverlap=W - H)
    Zr = np.asarray(Zr)
    scale = max(np.max(np.abs(Zr)), 1e-6)
    assert np.max(np.abs(Zd - Zr)) / scale < 2e-5, (W, H, n, ndev)

    # inverse (only when hann/geometry is NOLA)
    import scipy.signal as ss_
    if ss_.check_NOLA("hann", W, W - H):
        ifn = build_distributed_istft(n, mesh, "sp", nperseg=W,
                                      noverlap=W - H)
        with mesh:
            xr = np.asarray(ifn(Zr))
        assert np.max(np.abs(xr - x)) / max(np.max(np.abs(x)), 1e-6) \
            < 5e-5, (W, H, n, ndev)

    # welch on its own geometry (tail-drop framing)
    nbw = (n - W) // H + 1
    if nbw % ndev == 0:
        fw, wfn = build_distributed_welch(n, mesh, "sp", nperseg=W,
                                          noverlap=W - H)
        with mesh:
            Pd = np.asarray(wfn(x))
        _, Pr = wfft.welch(x, nperseg=W, noverlap=W - H)
        Pr = np.asarray(Pr)
        assert np.max(np.abs(Pd - Pr)) / np.max(Pr) < 2e-5


# --------------------------------------------- facade ND s=/axes= edges

@pytest.mark.parametrize("seed", range(30))
def test_fuzz_facade_nd_s_axes(seed):
    """Seeded lane of the session-8 one-off sweep that caught the
    hermitian-family divergences: random s/axes combos (negatives,
    duplicates, -1 entries, over-long) through fftn/ifftn/rfftn/irfftn/
    ihfftn/dctn must agree with numpy/scipy in VALUE and in KIND of
    outcome (both compute or both raise)."""
    import scipy.fft as sf
    from webgpufft_tpu import fftapi as F
    from webgpufft_tpu.spec import PlanError

    rng = np.random.default_rng(777000 + seed)
    nd = int(rng.integers(1, 4))
    shape = tuple(int(rng.integers(3, 12)) for _ in range(nd))
    x = rng.standard_normal(shape)
    z = x + 1j * rng.standard_normal(shape)
    r = rng.random()
    if r < 0.25:
        axes = None
    else:
        k = int(rng.integers(1, nd + 2))
        axes = tuple(int(rng.integers(-nd, nd)) for _ in range(k))
    if rng.random() < 0.45:
        s = None
    else:
        base = len(axes) if axes is not None else nd
        slen = base if rng.random() < 0.8 else base + 1
        s = tuple(int(rng.choice([-1, 3, 4, 5])) for _ in range(slen))
    norm = [None, "ortho", "forward"][int(rng.integers(0, 3))]
    cases = [
        ("fftn", lambda: F.fftn(z, s=s, axes=axes, norm=norm),
         lambda: np.fft.fftn(z, s=s, axes=axes, norm=norm), True),
        ("rfftn", lambda: F.rfftn(x, s=s, axes=axes, norm=norm),
         lambda: np.fft.rfftn(x, s=s, axes=axes, norm=norm), True),
        ("ihfftn", lambda: F.ihfftn(x, s=s, axes=axes, norm=norm),
         lambda: sf.ihfftn(x, s=s, axes=axes, norm=norm), True),
        ("dctn", lambda: F.dctn(
            x, s=None if s is None else tuple(abs(m) + 2 for m in s),
            axes=axes, norm=norm),
         lambda: sf.dctn(
            x, s=None if s is None else tuple(abs(m) + 2 for m in s),
            axes=axes, norm=norm), False),
    ]
    for name, ours, ref, cplx in cases:
        try:
            want = ref()
            want_exc = False
        except Exception:  # noqa: BLE001
            want, want_exc = None, True
        try:
            got = np.asarray(ours())
            got_exc = False
        except PlanError:
            got, got_exc = None, True
        assert got_exc == want_exc, \
            (name, shape, axes, s, norm, "outcome-kind mismatch")
        if want_exc:
            continue
        if cplx and np.iscomplexobj(want):
            got = got[..., 0] + 1j * got[..., 1]
        assert got.shape == np.shape(want), (name, shape, axes, s, norm)
        scale = max(1.0, float(np.max(np.abs(want))))
        assert float(np.max(np.abs(got - want))) / scale < 5e-3, \
            (name, shape, axes, s, norm)
