"""fftconv plan tests: boundaries, modes, multi-kernel, output layouts,
channel-lane policies and preset helpers.

Reference coverage: fftconv suite entries in test/complete.suite.js +
channel-lane preset builders (src/runtime/fftconv_channel_lane_presets.js).
Oracle: utils/mathref.fftconv == reference src/utils/math.js:469-603.
"""

import math

import numpy as np
import pytest

import webgpufft_tpu as W
from webgpufft_tpu.core.cplx import interleave, uninterleave
from webgpufft_tpu.utils import mathref as R


def rand_c(rng, shape):
    return rng.standard_normal(shape) + 1j * rng.standard_normal(shape)


@pytest.mark.parametrize("boundary", ["circular", "linear-full", "linear-same", "linear-valid"])
@pytest.mark.parametrize("mode", ["convolution", "correlation"])
def test_boundaries_and_modes(boundary, mode, rng, assert_close):
    shape, kshape = [16], [5]
    x = rand_c(rng, (2, 16))
    k = rand_c(rng, (5,))
    plan = W.create_plan(type="fftconv", shape=shape, batch=2,
                        fftConv={"boundary": boundary, "mode": mode,
                                 "kernelShape": kshape})
    y = uninterleave(np.asarray(plan.exec(interleave(x), kernel=interleave(k))))
    ref = R.fftconv(x, k, shape, batch=2, mode=mode, boundary=boundary,
                    kernel_shape=kshape)
    assert_close(y.real, ref.real, label=f"{boundary}/{mode}.re")
    assert_close(y.imag, ref.imag, label=f"{boundary}/{mode}.im")


@pytest.mark.parametrize("shape,kshape", [
    ([12, 10], [3, 3]), ([8, 6, 4], [3, 2, 2]), ([16, 8, 4], [16, 8, 4]),
])
def test_nd_fftconv(shape, kshape, rng, assert_close):
    x = rand_c(rng, (2, *shape))
    k = rand_c(rng, tuple(kshape))
    plan = W.create_plan(type="fftconv", shape=shape, batch=2,
                        fftConv={"boundary": "linear-same", "kernelShape": kshape})
    y = uninterleave(np.asarray(plan.exec(interleave(x), kernel=interleave(k))))
    ref = R.fftconv(x, k, shape, batch=2, boundary="linear-same", kernel_shape=kshape)
    assert_close(y.real, ref.real, label="nd.re")
    assert_close(y.imag, ref.imag, label="nd.im")


@pytest.mark.parametrize("output_layout", ["kernel-major", "batch-major"])
def test_multi_kernel(output_layout, rng, assert_close):
    shape, kshape, kc, b = [16, 8, 4], [3, 3, 3], 3, 2
    x = rand_c(rng, (b, *shape))
    ks = [rand_c(rng, tuple(kshape)) for _ in range(kc)]
    plan = W.create_plan(type="fftconv", shape=shape, batch=b,
                        fftConv={"kernelCount": kc, "kernelShape": kshape,
                                 "boundary": "linear-same",
                                 "outputLayout": output_layout})
    y = uninterleave(np.asarray(plan.exec(
        interleave(x), kernel=[interleave(k) for k in ks])))
    refs = [R.fftconv(x, k, shape, batch=b, boundary="linear-same",
                      kernel_shape=kshape) for k in ks]
    ref = np.stack(refs)                       # (kc, b, *out)
    if output_layout == "batch-major":
        ref = np.moveaxis(ref, 0, 1)
    assert_close(y.real, ref.real, label=f"multi.{output_layout}.re")
    assert_close(y.imag, ref.imag, label=f"multi.{output_layout}.im")


def test_multi_kernel_packed_payload(rng, assert_close):
    shape, kshape, kc = [8], [3], 2
    x = rand_c(rng, (1, 8))
    ks = rand_c(rng, (kc, 3))
    plan = W.create_plan(type="fftconv", shape=shape, batch=1,
                        fftConv={"kernelCount": kc, "kernelShape": kshape})
    packed = interleave(ks.reshape(-1))        # (kc*prod(kshape), 2)
    y = uninterleave(np.asarray(plan.exec(interleave(x), kernel=packed)))
    refs = np.stack([R.fftconv(x, ks[i], shape, batch=1, kernel_shape=kshape)
                     for i in range(kc)])
    assert_close(y.real, refs.real, label="packed.re")


def test_kernel_defaults_to_shape(rng, assert_close):
    shape = [12]
    x = rand_c(rng, (1, 12))
    k = rand_c(rng, (12,))
    plan = W.create_plan(type="fftconv", shape=shape, batch=1)
    y = uninterleave(np.asarray(plan.exec(interleave(x), kernel=interleave(k))))
    ref = R.fftconv(x, k, shape, batch=1)
    assert_close(y.real, ref.real, label="default kshape")


def test_zero_pad_stages(rng, assert_close):
    """zeroPad.read/write act in the FFT logical domain
    (reference: docs/API.md:274-278)."""
    shape, kshape = [16], [5]
    fft_shape = [20]
    x = rand_c(rng, (1, 16))
    k = rand_c(rng, (5,))
    plan = W.create_plan(type="fftconv", shape=shape, batch=1,
                        fftConv={"boundary": "linear-same", "kernelShape": kshape},
                        zeroPad={"read": {"start": [2], "end": [18]}})
    y = uninterleave(np.asarray(plan.exec(interleave(x), kernel=interleave(k))))
    xz = x.copy()
    # read-stage zeroing applies to the embedded fft-domain data: indices
    # [0,2) and [18,20) of the 20-length padded line; the data occupies [0,16)
    xz[:, :2] = 0
    ref = R.fftconv(xz, k, shape, batch=1, boundary="linear-same", kernel_shape=kshape)
    assert_close(y.real, ref.real, label="zeroPad.read.re")
    assert_close(y.imag, ref.imag, label="zeroPad.read.im")


def test_channel_lane_preset_roundtrip(rng, assert_close):
    """End-to-end channel-lane workflow: 2 input channels, multi-kernel
    strided output lanes (reference: fftconv_channel_lane_presets.js:99-138
    — kernel k writes lane channelIndex + k*kernelStepChannels)."""
    shape, b, kc = [8], 2, 2
    cin, cout = 2, 4
    n = math.prod(shape)
    preset = W.create_fftconv_kernel_major_channel_lane_preset({
        "shape": shape, "batch": b, "kernelCount": kc,
        "input": {"channels": cin, "channelIndex": 1},
        "output": {"channels": cout, "channelIndex": 0, "kernelStepChannels": 2},
    })
    plan = W.create_plan({"type": "fftconv", **preset})

    lanes = rand_c(rng, (b, cin, n))           # [batch][channel][elem]
    flat_in = interleave(lanes.reshape(-1))    # flat element buffer
    k = rand_c(rng, (kc, n))
    out = np.asarray(plan.exec(flat_in, kernel=interleave(k)))
    out = uninterleave(out).reshape(b, cout, n)

    x = lanes[:, 1, :]                         # channelIndex 1 selects lane 1
    for kk in range(kc):
        ref = R.fftconv(x, k[kk], shape, batch=b)
        lane = kk * 2                          # kernelStepChannels=2
        assert_close(out[:, lane, :].real, ref.real, label=f"lane{lane}.re")
        assert_close(out[:, lane, :].imag, ref.imag, label=f"lane{lane}.im")
    # untouched lanes stay zero
    assert np.all(out[:, 1, :] == 0) and np.all(out[:, 3, :] == 0)


def test_output_kernel_stride_elements(rng, assert_close):
    shape, kc = [8], 2
    x = rand_c(rng, (1, 8))
    ks = rand_c(rng, (kc, 8))
    plan = W.create_plan(type="fftconv", shape=shape, batch=1,
                        fftConv={"kernelCount": kc,
                                 "outputKernelStrideElements": 16})
    y = uninterleave(np.asarray(plan.exec(interleave(x), kernel=interleave(ks))))
    assert y.shape == (32,)
    for kk in range(kc):
        ref = R.fftconv(x, ks[kk], shape, batch=1)[0]
        assert_close(y[kk * 16: kk * 16 + 8].real, ref.real, label=f"k{kk}")


def test_validation_errors():
    with pytest.raises(W.PlanError, match="circular"):
        W.create_plan(type="fftconv", shape=[8], fftConv={"kernelShape": [9]})
    with pytest.raises(W.PlanError, match="linear-valid"):
        W.create_plan(type="fftconv", shape=[4],
                     fftConv={"boundary": "linear-valid", "kernelShape": [5]})
    plan = W.create_plan(type="fftconv", shape=[8])
    with pytest.raises(W.PlanError, match="kernel"):
        plan.exec(np.zeros((1, 8, 2), np.float32))


def test_fftconv_large_batch_chunk(rng, assert_close):
    """kcount*batch*fftN beyond the validated size executes per batch-slice
    (the fftconv reading of the large-batch chunk mode)."""
    shape, kc, batch = [1024], 2, 4096  # 2*4096*1024 = 2^23 -> chunked
    plan = W.create_plan(type="fftconv", shape=shape, batch=batch,
                        fftConv={"kernelCount": kc})
    assert any("large-batch-chunk" in r for r in plan.route.reasons), plan.route.reasons
    # correctness on repeated small content
    x = rand_c(rng, (8, 1024))
    ks = rand_c(rng, (kc, 1024))
    xfull = np.tile(x, (512, 1))
    y = uninterleave(np.asarray(plan.exec(interleave(xfull), kernel=interleave(ks))))
    for kk in range(kc):
        ref = R.fftconv(x, ks[kk], shape, batch=8)
        got = y[kk].reshape(512, 8, 1024)[0]
        assert_close(got.real, ref.real, label=f"chunked k{kk}.re")
        assert_close(got.imag, ref.imag, label=f"chunked k{kk}.im")


# ---------------------------------------------------------------------------
# Overlap-save streaming route
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("boundary", ["circular", "linear-full",
                                      "linear-same", "linear-valid"])
def test_overlap_save_all_boundaries(rng, assert_close, boundary):
    """Forced overlap-save (small shapes via overlapBlock) matches the
    oracle for every boundary mode."""
    n, k, B, batch = 777, 9, 60, 2
    z = rng.standard_normal((batch, n)) + 1j * rng.standard_normal((batch, n))
    kk = rng.standard_normal(k) + 1j * rng.standard_normal(k)
    plan = W.create_plan(type="fftconv", shape=[n], batch=batch,
                        fftConv={"boundary": boundary, "kernelShape": [k],
                                 "tuning": {"overlapSave": "on",
                                            "overlapBlock": B}},
                        cache=W.PlanCache())
    assert plan.route.mode == "overlap-save"
    assert any(r.startswith("os-block") for r in plan.route.reasons)
    y = uninterleave(np.asarray(plan.exec(interleave(z),
                                          kernel=interleave(kk))))
    ref = R.fftconv(z, kk, [n], batch=batch, boundary=boundary,
                    kernel_shape=[k])
    assert_close(y, ref, label=f"os {boundary}")


def test_overlap_save_auto_selection():
    """Auto picks overlap-save only for long-signal/short-kernel 1-D
    convolution; off disables; structural blockers fall back."""
    big = W.create_plan(type="fftconv", shape=[1 << 18], batch=1,
                       fftConv={"boundary": "linear-same",
                                "kernelShape": [129]},
                       cache=W.PlanCache())
    assert big.route.mode == "overlap-save"
    off = W.create_plan(type="fftconv", shape=[1 << 18], batch=1,
                       fftConv={"boundary": "linear-same",
                                "kernelShape": [129],
                                "tuning": {"overlapSave": "off"}},
                       cache=W.PlanCache())
    assert off.route.mode != "overlap-save"
    # correlation / small n / heavy chunk-forcing batch stay on the
    # standard route (many serialized block groups measured 2.5x slower)
    corr = W.create_plan(type="fftconv", shape=[1 << 18], batch=1,
                        fftConv={"boundary": "linear-same", "mode": "correlation",
                                 "kernelShape": [129]},
                        cache=W.PlanCache())
    assert corr.route.mode != "overlap-save"
    chunky = W.create_plan(type="fftconv", shape=[1 << 20], batch=4,
                          fftConv={"boundary": "linear-same",
                                   "kernelShape": [129]},
                          cache=W.PlanCache())
    assert chunky.route.mode != "overlap-save"
    # moderate-n gate (r4_os_gate sweep): n=2^15 b=1 and n=2^14 b=4 won
    # on-chip; n=2^14 b=1 lost (0.89x); 3 mild lax.map groups won 2.74x
    for shape, batch, want in (([1 << 15], 1, True), ([1 << 14], 4, True),
                               ([1 << 14], 1, False), ([1 << 18], 16, True)):
        p = W.create_plan(type="fftconv", shape=shape, batch=batch,
                          fftConv={"boundary": "linear-same",
                                   "kernelShape": [129]},
                          cache=W.PlanCache())
        assert (p.route.mode == "overlap-save") == want, (shape, batch)
    mild = W.create_plan(type="fftconv", shape=[1 << 18], batch=16,
                         fftConv={"boundary": "linear-same",
                                  "kernelShape": [129]},
                         cache=W.PlanCache())
    assert any(r.startswith("os-block-chunk") for r in mild.route.reasons)
    unchunked = W.create_plan(type="fftconv", shape=[1 << 20], batch=1,
                             fftConv={"boundary": "linear-same",
                                      "kernelShape": [129]},
                             cache=W.PlanCache())
    assert unchunked.route.mode == "overlap-save"
    small = W.create_plan(type="fftconv", shape=[4096], batch=1,
                         fftConv={"boundary": "linear-same",
                                  "kernelShape": [129]},
                         cache=W.PlanCache())
    assert small.route.mode != "overlap-save"
    with pytest.raises(W.PlanError, match="overlapSave"):
        W.create_plan(type="fftconv", shape=[64, 64],
                     fftConv={"tuning": {"overlapSave": "on"}},
                     cache=W.PlanCache())


def test_overlap_save_block_chunking(rng, assert_close):
    """Block groups stream through lax.map when batch*nb*B exceeds the
    operand bound (forced tiny bound is impossible here, so force many
    blocks instead and check correctness of the grouped path)."""
    n, k, B, batch = 2048, 5, 16, 3   # nb = ceil(2052/12) = 171 blocks
    z = rng.standard_normal((batch, n)) + 1j * rng.standard_normal((batch, n))
    kk = rng.standard_normal(k) + 1j * rng.standard_normal(k)
    plan = W.create_plan(type="fftconv", shape=[n], batch=batch,
                        fftConv={"boundary": "linear-full",
                                 "kernelShape": [k],
                                 "tuning": {"overlapSave": "on",
                                            "overlapBlock": B}},
                        cache=W.PlanCache())
    y = uninterleave(np.asarray(plan.exec(interleave(z),
                                          kernel=interleave(kk))))
    ref = R.fftconv(z, kk, [n], batch=batch, boundary="linear-full",
                    kernel_shape=[k])
    assert_close(y, ref, label="os grouped")


def test_overlap_save_grouped_path_forced(rng, assert_close, monkeypatch):
    """Force the lax.map block-group streaming branch (operand bound
    lowered) and check correctness + the os-block-chunk route reason —
    the only coverage of that branch (review finding)."""
    import webgpufft_tpu.plans.transforms as T
    monkeypatch.setattr(T, "CHUNK_ELEMS", 1 << 12)
    n, k, B, batch = 2048, 5, 16, 3
    z = rng.standard_normal((batch, n)) + 1j * rng.standard_normal((batch, n))
    kk = rng.standard_normal(k) + 1j * rng.standard_normal(k)
    plan = W.create_plan(type="fftconv", shape=[n], batch=batch,
                        fftConv={"boundary": "linear-full",
                                 "kernelShape": [k],
                                 "tuning": {"overlapSave": "on",
                                            "overlapBlock": B}},
                        cache=W.PlanCache())
    assert any(r.startswith("os-block-chunk") for r in plan.route.reasons)
    y = uninterleave(np.asarray(plan.exec(interleave(z),
                                          kernel=interleave(kk))))
    ref = R.fftconv(z, kk, [n], batch=batch, boundary="linear-full",
                    kernel_shape=[k])
    assert_close(y, ref, label="os grouped forced")
