"""Combination coverage mirroring the reference's hardest suite entries:
custom strides + ioView + zeroPad together, prime lengths inside fftconv,
larger mixed ND shapes (reference: complete.suite.js combo tests)."""

import numpy as np
import pytest

import webgpufft_tpu as W
from webgpufft_tpu.core.cplx import interleave, uninterleave
from webgpufft_tpu.utils import mathref as R


def rand_c(rng, shape):
    return rng.standard_normal(shape) + 1j * rng.standard_normal(shape)


@pytest.mark.parametrize("shape", [(96, 105), (24, 25, 27), (8, 17, 6)])
def test_c2c_nd_mixed_sizes(shape, rng, assert_close):
    """Rank 2-3 with mixed smooth/prime axes (reference: 96x105, 24x25x27)."""
    z = rand_c(rng, (2, *shape))
    plan = W.create_plan(type="c2c", shape=list(shape), batch=2, direction="forward")
    y = uninterleave(np.asarray(plan(interleave(z))))
    ref = R.fft_nd(z, shape, "forward")
    assert_close(y.real, ref.real, label=f"nd{shape}.re")
    assert_close(y.imag, ref.imag, label=f"nd{shape}.im")


def test_c2c_strides_ioview_zeropad_combo(rng, assert_close):
    """Strided flat input over the VIEW shape + center embed + zeroPad
    (reference: 'c2c regular path matches baseline with custom strides +
    ioView+zeroPad')."""
    logical = (12,)
    vshape = (8,)
    stride, batch = 3, 2
    span = (vshape[0] - 1) * stride + 1
    flat = rand_c(rng, (batch * span,))
    plan = W.create_plan(
        type="c2c", shape=list(logical), batch=batch, direction="forward",
        layout={"inputStrides": [stride]},
        ioView={"input": {"shape": list(vshape), "placement": "center"}},
        zeroPad={"read": {"start": [1], "end": [11]}})
    y = uninterleave(np.asarray(plan(interleave(flat))))
    gathered = np.stack([flat[b * span: b * span + vshape[0] * stride: stride]
                         for b in range(batch)])
    emb = np.zeros((batch, 12), complex)
    emb[:, 2:10] = gathered              # center: floor((12-8)/2) = 2
    emb[:, :1] = 0
    emb[:, 11:] = 0
    ref = R.fft_nd(emb, logical, "forward")
    assert_close(y.real, ref.real, label="combo.re")
    assert_close(y.imag, ref.imag, label="combo.im")


def test_r2c_packed_output_strides(rng, assert_close):
    n, batch, stride = 17, 2, 2
    x = rng.standard_normal((batch, n)).astype(np.float32)
    plan = W.create_plan(type="r2c", shape=[n], direction="forward", batch=batch,
                        layout={"outputStrides": [stride]})
    flat = uninterleave(np.asarray(plan(x)))
    ref = R.r2c_packed(x.astype(np.float64), [n])
    p0 = n // 2 + 1
    span = (p0 - 1) * stride + 1
    for b in range(batch):
        got = flat[b * span: b * span + p0 * stride: stride]
        assert_close(got.real, ref[b].real, label=f"r2c-out-strided b{b}.re")
        assert_close(got.imag, ref[b].imag, label=f"r2c-out-strided b{b}.im")


def test_c2r_packed_input_strides(rng, assert_close):
    n, batch, stride = 17, 2, 3
    x = rng.standard_normal((batch, n))
    packed = R.r2c_packed(x, [n])
    p0 = n // 2 + 1
    span = (p0 - 1) * stride + 1
    flat = np.zeros((batch * span,), complex)
    for b in range(batch):
        flat[b * span: b * span + p0 * stride: stride] = packed[b]
    plan = W.create_plan(type="c2r", shape=[n], direction="inverse",
                        normalize="backward", batch=batch,
                        layout={"inputStrides": [stride]})
    y = np.asarray(plan(interleave(flat)))
    # output side has no layout -> shaped (batch, n)
    assert_close(y, x, label="c2r strided packed in")


def test_dct2_strides_ioview_zeropad_combo(rng, assert_close):
    logical = (10,)
    vshape = (6,)
    stride, batch = 2, 2
    span = (vshape[0] - 1) * stride + 1
    flat = rng.standard_normal((batch * span,)).astype(np.float32)
    plan = W.create_plan(
        type="dct2", shape=list(logical), batch=batch, direction="forward",
        layout={"inputStrides": [stride]},
        ioView={"input": {"shape": list(vshape)}},
        zeroPad={"write": {"start": [0], "end": [8]}})
    y = np.asarray(plan(flat))
    gathered = np.stack([flat[b * span: b * span + vshape[0] * stride: stride]
                         for b in range(batch)])
    emb = np.zeros((batch, 10))
    emb[:, :6] = gathered
    ref = R.dct_nd(emb, logical, "dct2", "forward")
    ref[:, 8:] = 0
    assert_close(y, ref, label="dct combo")


@pytest.mark.parametrize("n,mode", [(17, "convolution"), (29, "correlation")])
def test_fftconv_prime_lengths(n, mode, rng, assert_close):
    """Prime fftShape exercises Rader inside the fftconv pipeline
    (reference: fftconv 1D N=17 / N=29)."""
    x = rand_c(rng, (2, n))
    k = rand_c(rng, (n,))
    plan = W.create_plan(type="fftconv", shape=[n], batch=2,
                        fftConv={"mode": mode})
    y = uninterleave(np.asarray(plan.exec(interleave(x), kernel=interleave(k))))
    ref = R.fftconv(x, k, [n], batch=2, mode=mode)
    assert_close(y.real, ref.real, label=f"fftconv p{n}.re")
    assert_close(y.imag, ref.imag, label=f"fftconv p{n}.im")
    assert "rader" in plan.route.axis_kinds


def test_fftconv_2d_odd(rng, assert_close):
    """2D fftconv with odd shape + smaller kernel (reference: 8x9 batched)."""
    shape, kshape = [8, 9], [3, 2]
    x = rand_c(rng, (2, 8, 9))
    k = rand_c(rng, (3, 2))
    plan = W.create_plan(type="fftconv", shape=shape, batch=2,
                        fftConv={"boundary": "linear-full", "kernelShape": kshape})
    y = uninterleave(np.asarray(plan.exec(interleave(x), kernel=interleave(k))))
    ref = R.fftconv(x, k, shape, batch=2, boundary="linear-full", kernel_shape=kshape)
    assert_close(y.real, ref.real, label="fftconv2d.re")


def test_c2c_roundtrip_n210(rng, assert_close):
    """Composite 210 = 2*3*5*7 forward+inverse roundtrip with backward
    normalization (reference headline roundtrip test)."""
    n = 210
    z = rand_c(rng, (2, n))
    fwd = W.create_plan(type="c2c", shape=[n], batch=2, direction="forward")
    inv = W.create_plan(type="c2c", shape=[n], batch=2, direction="inverse",
                        normalize="backward")
    back = uninterleave(np.asarray(inv(fwd(interleave(z)))))
    assert_close(back.real, z.real, label="n210.re")
    assert_close(back.imag, z.imag, label="n210.im")
