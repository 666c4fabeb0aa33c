"""r2c / c2r plan tests: packed half-spectrum conventions and roundtrips
(reference coverage: r2c/c2r suite entries incl. rank-4 in
test/complete.suite.js; packing rule docs/API.md:203-208)."""

import numpy as np
import pytest

import webgpufft_tpu as W
from webgpufft_tpu.core.cplx import interleave, uninterleave
from webgpufft_tpu.utils import mathref as R


@pytest.mark.parametrize("shape", [
    (8,), (9,), (1024,), (17,), (8, 8), (9, 4), (12, 5, 3), (4, 3, 2, 5),
])
def test_r2c_matches_oracle(shape, rng, assert_close):
    x = rng.standard_normal((2, *shape))
    plan = W.create_plan(type="r2c", shape=list(shape), direction="forward", batch=2)
    y = uninterleave(np.asarray(plan(x.astype(np.float32))))
    ref = R.r2c_packed(x, shape)
    assert y.shape == ref.shape == (2, shape[0] // 2 + 1, *shape[1:])
    assert_close(y.real, ref.real, label=f"r2c{shape}.re")
    assert_close(y.imag, ref.imag, label=f"r2c{shape}.im")


@pytest.mark.parametrize("shape", [(8,), (9,), (8, 8), (9, 4), (12, 5, 3), (4, 3, 2, 5)])
def test_c2r_roundtrip(shape, rng, assert_close):
    x = rng.standard_normal((2, *shape))
    packed = R.r2c_packed(x, shape)
    plan = W.create_plan(type="c2r", shape=list(shape), direction="inverse",
                        normalize="backward", batch=2)
    y = np.asarray(plan(interleave(packed)))
    assert y.shape == (2, *shape)
    assert_close(y, x, label=f"c2r{shape}")


@pytest.mark.parametrize("normalize", ["none", "backward", "unitary"])
def test_real_normalize_modes(normalize, rng, assert_close):
    shape = (16, 6)
    x = rng.standard_normal((2, *shape))
    plan = W.create_plan(type="r2c", shape=list(shape), direction="forward",
                        batch=2, normalize=normalize)
    y = uninterleave(np.asarray(plan(x.astype(np.float32))))
    ref = R.r2c_packed(x, shape, normalize)
    assert_close(y.real, ref.real, label="r2c.norm")

    packed = R.r2c_packed(x, shape)
    plan = W.create_plan(type="c2r", shape=list(shape), direction="inverse",
                        batch=2, normalize=normalize)
    z = np.asarray(plan(interleave(packed)))
    refz = R.c2r_packed(packed, shape, normalize)
    assert_close(z, refz, label="c2r.norm")


def test_unitary_roundtrip_is_identity(rng, assert_close):
    shape = (24,)
    x = rng.standard_normal((3, *shape))
    fwd = W.create_plan(type="r2c", shape=list(shape), direction="forward",
                        batch=3, normalize="unitary")
    inv = W.create_plan(type="c2r", shape=list(shape), direction="inverse",
                        batch=3, normalize="unitary")
    y = np.asarray(inv(fwd(x.astype(np.float32))))
    assert_close(y, x, label="unitary roundtrip")


def test_direction_validation():
    with pytest.raises(W.PlanError, match="forward"):
        W.create_plan(type="r2c", shape=[8], direction="inverse")
    with pytest.raises(W.PlanError, match="inverse"):
        W.create_plan(type="c2r", shape=[8], direction="forward")


def test_c2r_ignores_self_conjugate_imag(rng, assert_close):
    # imag at self-conjugate bins (0 and N/2) must not leak into the real
    # output (reference zeroes them explicitly, real_complex.js:116-201)
    shape = (8,)
    x = rng.standard_normal((1, *shape))
    packed = R.r2c_packed(x, shape)
    dirty = packed.copy()
    dirty[:, 0] += 0.7j
    dirty[:, -1] += 0.3j
    plan = W.create_plan(type="c2r", shape=list(shape), direction="inverse",
                        normalize="backward", batch=1)
    y = np.asarray(plan(interleave(dirty)))
    assert_close(y, x, label="self-conj imag ignored")
