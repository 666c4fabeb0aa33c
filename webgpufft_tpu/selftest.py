"""Backend self-test: quick correctness sweep on the CURRENT jax backend.

Usage: python -m webgpufft_tpu.selftest [--deep]

Builds one plan per family, compares against the numpy oracle, and prints a
PASS/FAIL line each — the fast way to validate a new device, runtime, or
jax version (the analog of the reference's browser harness smoke lane).

``--deep`` (run(deep=True)) adds the 256^3 production flagship geometry —
the exact configuration where the XLA-TPU backend silently miscompiled the
statically-unrolled batch-chunk route (r29-r31 bisect, round 5) while every
smaller shape passed.  Slower (~2 GB arrays, two large compiles); run it
when validating a new TPU runtime or XLA release.
"""

from __future__ import annotations

import sys

import numpy as np


def run(tol: float = 1e-5, deep: bool = False) -> bool:
    import jax

    import webgpufft_tpu as W
    from webgpufft_tpu.core.cplx import interleave, uninterleave
    from webgpufft_tpu.utils import mathref as R

    rng = np.random.default_rng(0)
    ok_all = True

    def check(label, got, ref):
        nonlocal ok_all
        got = np.asarray(got, dtype=np.float64)
        ref = np.asarray(ref, dtype=np.float64)
        err = np.max(np.abs(got - ref)) / max(1e-12, np.max(np.abs(ref)))
        ok = err <= tol
        ok_all &= ok
        print(f"{'PASS' if ok else 'FAIL'} {label:34s} max_rel_err={err:.2e}")

    print(f"backend={jax.default_backend()} device={jax.devices()[0]}")
    cache = W.PlanCache()

    z = rng.standard_normal((2, 96)) + 1j * rng.standard_normal((2, 96))
    p = W.create_plan({"type": "c2c", "shape": [96], "batch": 2,
                       "normalize": "unitary"}, cache=cache)
    check("c2c mixed (96)", interleave(uninterleave(np.asarray(p(interleave(z))))),
          interleave(R.fft_nd(z, [96], "forward", "unitary")))

    z = rng.standard_normal((1, 17)) + 1j * rng.standard_normal((1, 17))
    p = W.create_plan({"type": "c2c", "shape": [17], "batch": 1}, cache=cache)
    check("c2c rader (17)", np.asarray(p(interleave(z))),
          interleave(R.fft_nd(z, [17], "forward")))

    z = rng.standard_normal((1, 34)) + 1j * rng.standard_normal((1, 34))
    p = W.create_plan({"type": "c2c", "shape": [34], "batch": 1}, cache=cache)
    check("c2c bluestein (34)", np.asarray(p(interleave(z))),
          interleave(R.fft_nd(z, [34], "forward")))

    x = rng.standard_normal((2, 16, 6)).astype(np.float32)
    p = W.create_plan({"type": "r2c", "shape": [16, 6], "direction": "forward",
                       "batch": 2}, cache=cache)
    check("r2c 2d", np.asarray(p(x)), interleave(R.r2c_packed(x, [16, 6])))

    packed = R.r2c_packed(x.astype(np.float64), [16, 6])
    p = W.create_plan({"type": "c2r", "shape": [16, 6], "direction": "inverse",
                       "normalize": "backward", "batch": 2}, cache=cache)
    check("c2r 2d", np.asarray(p(interleave(packed))), x)

    # rank-3 volume on the large-batch-chunk route (the production
    # 128^3/256^3 path) — r28 found a TPU-only wrong-result there that
    # every small-shape check above missed.  batch=3 is load-bearing:
    # 2 x 128^3 = 2^22 complex elems EQUALS the chunk bound and does not
    # chunk (round-5 review finding); 3 x 128^3 does (chunk 1, 3 groups).
    x3 = rng.standard_normal((3, 128, 128, 128)).astype(np.float32)
    p = W.create_plan({"type": "r2c", "shape": [128, 128, 128],
                       "batch": 3}, cache=cache)
    assert any("large-batch-chunk" in r for r in p.route.reasons), \
        p.route.reasons
    y3 = np.asarray(p(x3))
    check("r2c 3d chunked (128^3 b3)", y3,
          interleave(R.r2c_packed(x3, [128, 128, 128])))
    p = W.create_plan({"type": "c2r", "shape": [128, 128, 128],
                       "direction": "inverse", "normalize": "backward",
                       "batch": 3}, cache=cache)
    assert any("large-batch-chunk" in r for r in p.route.reasons), \
        p.route.reasons
    check("c2r 3d chunked (128^3 b3)", np.asarray(p(y3)), x3)

    if deep:
        # the flagship geometry where XLA-TPU miscompiled the unrolled
        # batch-chunk route (silent rel~1.2-1.5; benches/r29-r31, round 5)
        # while 128^3 above passed — guard the lax.map route at full size
        xd = rng.standard_normal((3, 256, 256, 256)).astype(np.float32)
        p = W.create_plan({"type": "r2c", "shape": [256, 256, 256],
                           "batch": 3}, cache=cache)
        yd = np.asarray(p(xd))
        check("r2c 3d chunked deep (256^3 b3)", yd,
              interleave(R.r2c_packed(xd, [256, 256, 256])))
        p = W.create_plan({"type": "c2r", "shape": [256, 256, 256],
                           "direction": "inverse", "normalize": "backward",
                           "batch": 3}, cache=cache)
        check("c2r 3d chunked deep (256^3 b3)", np.asarray(p(yd)), xd)
        del xd, yd

        # overlap-save at a geometry whose block groups take the
        # STATIC-UNROLL branch (os-blocks(128) -> os-block-chunk(64),
        # ngroups=2): the one serialization site that keeps the unroll
        # (measured 2.5x benefit, plans/fftconv.py) — guard it at scale
        # against the r29-31 miscompile class, which was geometry-
        # dependent (only large shapes failed)
        nos, bos, kos = 1032000, 8, 129
        zos = (rng.standard_normal((bos, nos))
               + 1j * rng.standard_normal((bos, nos)))
        kker = (rng.standard_normal((kos,))
                + 1j * rng.standard_normal((kos,)))
        p = W.create_plan({"type": "fftconv", "shape": [nos], "batch": bos,
                           "fftConv": {"boundary": "circular",
                                       "kernelShape": [kos],
                                       "tuning": {"overlapSave": "on",
                                                  "overlapBlock": 8192}}},
                          cache=cache)
        assert any(r.startswith("os-block-chunk(") for r in p.route.reasons), \
            p.route.reasons
        check("fftconv os unrolled deep (2^20-class)",
              np.asarray(p.exec(interleave(zos), kernel=interleave(kker))),
              interleave(R.fftconv(zos, kker, [nos], batch=bos,
                                   boundary="circular", kernel_shape=[kos])))
        del zos, kker

    xr = rng.standard_normal((2, 8, 8)).astype(np.float32)
    for kind in ("dct2", "dst3"):
        p = W.create_plan({"type": kind, "shape": [8, 8], "direction": "forward",
                           "batch": 2}, cache=cache)
        check(f"{kind} 8x8", np.asarray(p(xr)),
              R.dct_nd(xr, [8, 8], kind, "forward"))

    zc = rng.standard_normal((2, 16)) + 1j * rng.standard_normal((2, 16))
    k = rng.standard_normal((5,)) + 1j * rng.standard_normal((5,))
    p = W.create_plan({"type": "fftconv", "shape": [16], "batch": 2,
                       "fftConv": {"boundary": "linear-same",
                                   "kernelShape": [5]}}, cache=cache)
    got = p.exec(interleave(zc), kernel=interleave(k))
    check("fftconv linear-same", np.asarray(got),
          interleave(R.fftconv(zc, k, [16], batch=2, boundary="linear-same",
                               kernel_shape=[5])))

    p = W.create_plan({"type": "conv2d", "shape": [8, 8], "batch": 1,
                       "conv": {"kernelSize": 3, "padding": "same"}}, cache=cache)
    xi = rng.standard_normal((1, *p.in_shape)).astype(np.float32)
    w = rng.standard_normal((3, 3)).astype(np.float32)
    check("conv2d 3x3 same", np.asarray(p.exec(xi, kernel=w)),
          R.conv2d_direct(xi, w, pad=p.pad))

    # four-step HBM route (forced small so the selftest stays fast)
    z = rng.standard_normal((1, 4096)) + 1j * rng.standard_normal((1, 4096))
    p = W.create_plan({"type": "c2c", "shape": [4096], "batch": 1,
                       "tuning": {"fourStepMinN": 4096}}, cache=cache)
    assert p.route.mode == "four-step-hbm", p.route
    check("c2c four-step (4096)", np.asarray(p(interleave(z))),
          interleave(R.fft_nd(z, [4096], "forward")))

    # overlap-save streaming convolution route (forced small blocks)
    zc = rng.standard_normal((1, 512)) + 1j * rng.standard_normal((1, 512))
    k = rng.standard_normal((9,)) + 1j * rng.standard_normal((9,))
    p = W.create_plan({"type": "fftconv", "shape": [512], "batch": 1,
                       "fftConv": {"boundary": "circular",
                                   "kernelShape": [9],
                                   "tuning": {"overlapSave": "on",
                                              "overlapBlock": 64}}},
                      cache=cache)
    assert p.route.mode == "overlap-save", p.route
    check("fftconv overlap-save (512)",
          np.asarray(p.exec(interleave(zc), kernel=interleave(k))),
          interleave(R.fftconv(zc, k, [512], batch=1, boundary="circular",
                               kernel_shape=[9])))

    # functional facade (stft roundtrip through the plan cache)
    from . import fftapi
    xs = rng.standard_normal(1024).astype(np.float32)
    _, _, Zs = fftapi.stft(xs, nperseg=128)
    _, back = fftapi.istft(Zs, nperseg=128)
    check("facade stft/istft (1024)", np.asarray(back)[:1024], xs)

    # facade 2-D boundary convolution + polyphase resampling (vs the
    # oracle formulations they reduce to)
    a2 = rng.standard_normal((12, 10)).astype(np.float64)
    k2 = rng.standard_normal((3, 4)).astype(np.float64)
    pad = np.pad(a2, ((2, 2), (3, 3)), mode="wrap")
    ref = np.zeros((14, 13))
    for i in range(14):
        for j in range(13):
            ref[i, j] = np.sum(pad[i:i + 3, j:j + 4] * k2[::-1, ::-1])
    check("facade convolve2d wrap", np.asarray(
        fftapi.convolve2d(a2, k2, "full", "wrap")), ref)
    try:
        from scipy.signal import resample_poly as sp_rp
        xr = rng.standard_normal(240)
        check("facade resample_poly 2/3", np.asarray(
            fftapi.resample_poly(xr, 2, 3)), sp_rp(xr, 2, 3))
    except ImportError:
        pass

    # DSP toolkit device paths (round-3 surfaces): IIR scan, FIR plan
    # route, ShortTimeFFT framing/overlap-add, envelope band slicing
    try:
        import scipy.signal as ss_or
        from webgpufft_tpu import filtering as FL
        from webgpufft_tpu import ShortTimeFFT

        xf = rng.standard_normal(2048).astype(np.float32)
        sos = FL.butter(6, 0.2, output="sos")
        check("dsp sosfiltfilt", np.asarray(FL.sosfiltfilt(sos, xf)),
              ss_or.sosfiltfilt(ss_or.butter(6, 0.2, output="sos"), xf))
        taps = FL.remez(63, [0, 0.2, 0.3, 1.0], [1, 0], fs=2.0)
        check("dsp lfilter remez", np.asarray(FL.lfilter(taps, 1.0, xf)),
              ss_or.lfilter(taps, [1.0], xf))
        SFT = ShortTimeFFT.from_window("hann", fs=1.0, nperseg=256,
                                       noverlap=192)
        Sd = SFT.stft(xf)
        check("dsp shorttime roundtrip",
              np.asarray(SFT.istft(Sd, k1=2048, interleaved=True)), xf)
        check("dsp envelope", np.asarray(fftapi.envelope(xf)),
              ss_or.envelope(xf.astype(np.float64)))
        check("dsp cspline1d", np.asarray(FL.cspline1d(xf)),
              ss_or.cspline1d(xf.astype(np.float64)))
    except (ImportError, AttributeError):
        # AttributeError: scipy < 1.16 has no envelope oracle
        pass

    # AOT export/load roundtrip on this backend
    p = W.create_plan({"type": "c2c", "shape": [64], "batch": 2,
                       "normalize": "unitary"}, cache=cache)
    ep = W.load_exported_plan(W.export_plan(p))
    z = rng.standard_normal((2, 64)) + 1j * rng.standard_normal((2, 64))
    check("aot export/load (64)", np.asarray(ep(interleave(z))),
          interleave(R.fft_nd(z, [64], "forward", "unitary")))

    print("SELFTEST", "PASS" if ok_all else "FAIL")
    return ok_all


if __name__ == "__main__":
    sys.exit(0 if run(deep="--deep" in sys.argv[1:]) else 1)
