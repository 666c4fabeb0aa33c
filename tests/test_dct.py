"""DCT/DST types 1-4 vs the oracle and vs scipy (scaled).

Reference conventions: src/utils/math.js:291-409 — plain trig sums (most are
scipy's unnormalized transforms scaled by 1/2; dct1 matches scipy exactly).
Covers both directions, normalize modes, 1D/2D/3D, and the
forward/inverse kind aliasing (dct3 fwd == dct2 inv etc.,
reference typeKind table dct_fft.js:48-58).
"""

import numpy as np
import pytest
import scipy.fft

import webgpufft_tpu as W
from webgpufft_tpu.utils import mathref as R

ALL_KINDS = ["dct1", "dct2", "dct3", "dct4", "dst1", "dst2", "dst3", "dst4"]


def run_dct(kind, shape, direction, rng, assert_close, normalize="none", batch=2):
    x = rng.standard_normal((batch, *shape)).astype(np.float32)
    plan = W.create_plan(type=kind, shape=list(shape), direction=direction,
                        batch=batch, normalize=normalize)
    y = np.asarray(plan(x))
    ref = R.dct_nd(x, shape, kind, direction, normalize)
    assert_close(y, ref, label=f"{kind}{shape}:{direction}")
    return x, y


@pytest.mark.parametrize("kind", ALL_KINDS)
@pytest.mark.parametrize("shape", [(8,), (16,), (7,), (8, 8), (5, 12), (4, 3, 6)])
@pytest.mark.parametrize("direction", ["forward", "inverse"])
def test_dct_dst_all_types(kind, shape, direction, rng, assert_close):
    run_dct(kind, shape, direction, rng, assert_close)


@pytest.mark.parametrize("kind,stype", [
    ("dct2", 2), ("dct3", 3), ("dct4", 4), ("dst2", 2), ("dst3", 3), ("dst4", 4),
])
def test_scaling_vs_scipy(kind, stype, rng, assert_close):
    """Reference forward transforms are scipy's unnormalized ones / 2 for
    types 2-4 (dct1 is exactly scipy; dst1 is scipy / 2)."""
    n = 16
    x = rng.standard_normal((1, n)).astype(np.float64)
    fn = scipy.fft.dct if kind.startswith("dct") else scipy.fft.dst
    ref = fn(x, type=stype, norm=None) / 2.0
    plan = W.create_plan(type=kind, shape=[n], direction="forward", batch=1)
    y = np.asarray(plan(x.astype(np.float32)))
    assert_close(y, ref, label=f"{kind} vs scipy")


def test_dct1_exactly_scipy(rng, assert_close):
    n = 12
    x = rng.standard_normal((1, n))
    ref = scipy.fft.dct(x, type=1, norm=None)
    plan = W.create_plan(type="dct1", shape=[n], direction="forward", batch=1)
    assert_close(np.asarray(plan(x.astype(np.float32))), ref, label="dct1 scipy")


def test_dst1_half_scipy(rng, assert_close):
    n = 12
    x = rng.standard_normal((1, n))
    ref = scipy.fft.dst(x, type=1, norm=None) / 2.0
    plan = W.create_plan(type="dst1", shape=[n], direction="forward", batch=1)
    assert_close(np.asarray(plan(x.astype(np.float32))), ref, label="dst1 scipy")


@pytest.mark.parametrize("kind", ["dct2", "dst2"])
def test_forward_inverse_aliasing(kind, rng, assert_close):
    """kindN fwd == kind(5-N) inv up to the normalize factor."""
    n = 10
    x = rng.standard_normal((2, n)).astype(np.float32)
    alias = {"dct2": "dct3", "dst2": "dst3"}[kind]
    p1 = W.create_plan(type=kind, shape=[n], direction="forward", batch=2)
    p2 = W.create_plan(type=alias, shape=[n], direction="inverse", batch=2)
    assert_close(np.asarray(p1(x)), np.asarray(p2(x)), label=f"{kind} fwd == {alias} inv")


@pytest.mark.parametrize("normalize", ["none", "backward", "unitary"])
def test_dct_normalize(normalize, rng, assert_close):
    run_dct("dct2", (8, 8), "inverse", rng, assert_close, normalize=normalize)


def test_dct2_roundtrip(rng, assert_close):
    """dct2 fwd -> dct2 inv with backward normalize recovers x/2 in the
    reference convention (each direction carries a 1/2 vs scipy; the 1/N of
    backward completes scipy's 2/N inverse scaling up to the factor 2)."""
    n = 16
    x = rng.standard_normal((2, n)).astype(np.float32)
    fwd = W.create_plan(type="dct2", shape=[n], direction="forward", batch=2)
    inv = W.create_plan(type="dct2", shape=[n], direction="inverse", batch=2,
                        normalize="backward")
    y = np.asarray(inv(fwd(x)))
    assert_close(y, x / 2.0, label="dct2 roundtrip")


def test_dct_8x8_blocks_shape(rng):
    # the JPEG-style config from BASELINE.md
    x = rng.standard_normal((64, 8, 8)).astype(np.float32)
    plan = W.create_plan(type="dct2", shape=[8, 8], direction="forward", batch=64)
    assert np.asarray(plan(x)).shape == (64, 8, 8)


# ---------------------------------------------------------------------------
# FFT route (large axes; forced low threshold to exercise on small shapes)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("kind", ["dct2", "dct3", "dst2", "dst3"])
@pytest.mark.parametrize("direction", ["forward", "inverse"])
@pytest.mark.parametrize("shape", [(16,), (12, 8)])
def test_dct_fft_route(kind, shape, direction, rng, assert_close):
    x = rng.standard_normal((2, *shape)).astype(np.float32)
    cache = W.PlanCache()
    plan = W.create_plan({"type": kind, "shape": list(shape),
                          "direction": direction, "batch": 2,
                          "tuning": {"dct_fft_min_n": 4}}, cache=cache)
    assert any("fft" in r for r in plan.route.reasons), plan.route.reasons
    y = np.asarray(plan(x))
    ref = R.dct_nd(x, shape, kind, direction)
    assert_close(y, ref, label=f"fft-route {kind}{shape}:{direction}")


def test_dct_fft_route_large_default(rng, assert_close):
    """Axes >= 512 take the FFT route by default."""
    n = 1024
    x = rng.standard_normal((1, n)).astype(np.float32)
    plan = W.create_plan(type="dct2", shape=[n], direction="forward", batch=1)
    assert "dct-axis0-fft" in plan.route.reasons
    y = np.asarray(plan(x))
    ref = R.dct_nd(x, (n,), "dct2", "forward")
    assert_close(y, ref, label="dct2-1024 fft route")


def test_dct_matmul_default_small(rng):
    plan = W.create_plan(type="dct2", shape=[8, 8], direction="forward", batch=1)
    assert "dct-axis0-matmul" in plan.route.reasons
