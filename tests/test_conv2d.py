"""conv2d plan tests (reference: src/runtime/plans/conv2d.js + conv2d suite
entries; oracle src/utils/math.js:411-467 — cross-correlation indexing,
zero boundary, stride 1)."""

import numpy as np
import pytest

import webgpufft_tpu as W
from webgpufft_tpu.core.cplx import interleave, uninterleave
from webgpufft_tpu.utils import mathref as R


@pytest.mark.parametrize("k", [1, 2, 3])
@pytest.mark.parametrize("padding", ["same", "valid"])
def test_real_conv(k, padding, rng, assert_close):
    hout, wout = 8, 6
    plan = W.create_plan(type="conv2d", shape=[hout, wout], batch=2,
                        conv={"kernelSize": k, "padding": padding})
    hin, win = plan.in_shape
    x = rng.standard_normal((2, hin, win)).astype(np.float32)
    w = rng.standard_normal((k, k)).astype(np.float32)
    y = np.asarray(plan.exec(x, kernel=w))
    ref = R.conv2d_direct(x, w, pad=plan.pad)
    assert y.shape == (2, hout, wout)
    assert_close(y, ref, label=f"real k={k} {padding}")


@pytest.mark.parametrize("ktype", ["real", "complex"])
def test_complex_data(ktype, rng, assert_close):
    k = 3
    plan = W.create_plan(type="conv2d", shape=[6, 6], batch=2,
                        conv={"kernelSize": k, "padding": "same",
                              "kernelType": ktype})
    hin, win = plan.in_shape
    x = rng.standard_normal((2, hin, win)) + 1j * rng.standard_normal((2, hin, win))
    if ktype == "real":
        w = rng.standard_normal((k, k))
        wdev = w.astype(np.float32)
    else:
        w = rng.standard_normal((k, k)) + 1j * rng.standard_normal((k, k))
        wdev = interleave(w)
    y = uninterleave(np.asarray(plan.exec(interleave(x), kernel=wdev)))
    ref = R.conv2d_direct(x, w, pad=plan.pad)
    assert_close(y.real, ref.real, label=f"cplx/{ktype}.re")
    assert_close(y.imag, ref.imag, label=f"cplx/{ktype}.im")


def test_explicit_padding(rng, assert_close):
    k = 3
    pad = (2, 0, 1, 0)
    plan = W.create_plan(type="conv2d", shape=[8, 8], batch=1,
                        conv={"kernelSize": k, "padding": "explicit", "pad": list(pad)})
    hin, win = plan.in_shape
    assert (hin, win) == (8 + 2 - 2, 8 + 2 - 1)
    x = rng.standard_normal((1, hin, win)).astype(np.float32)
    w = rng.standard_normal((k, k)).astype(np.float32)
    y = np.asarray(plan.exec(x, kernel=w))
    ref = R.conv2d_direct(x, w, pad=pad)
    assert_close(y, ref, label="explicit pad")


def test_validation():
    with pytest.raises(W.PlanError, match="kernelSize"):
        W.create_plan(type="conv2d", shape=[8, 8], conv={"kernelSize": 5})
    with pytest.raises(W.PlanError, match="conv"):
        W.create_plan(type="conv2d", shape=[8, 8])
    with pytest.raises(W.PlanError, match="H, W"):
        W.create_plan(type="conv2d", shape=[8], conv={"kernelSize": 3})
    with pytest.raises(W.PlanError, match="boundary"):
        W.create_plan(type="conv2d", shape=[8, 8],
                     conv={"kernelSize": 3, "boundary": "wrap"})
