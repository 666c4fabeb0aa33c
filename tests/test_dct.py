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

@pytest.mark.parametrize("kind", ["dct1", "dct2", "dct3", "dct4",
                                  "dst1", "dst2", "dst3", "dst4"])
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


@pytest.mark.parametrize("kind", ["dct1", "dct4", "dst1", "dst4"])
def test_trig14_fft_route_large_default(kind, rng):
    """Types 1/4 take the FFT embedding by default at large N — no O(N^2)
    table (VERDICT r3 missing #1; reference work lengths dct_fft.js:10-14).
    Pinned against scipy in f64 (the dense mathref oracle would itself be
    the giant table this route exists to avoid)."""
    import scipy.fft as sf

    n = 4096
    x = rng.standard_normal((2, n)).astype(np.float32)
    plan = W.create_plan(type=kind, shape=[n], direction="forward", batch=2)
    assert "dct-axis0-fft" in plan.route.reasons
    # consts stay far below a dense N*N table (mixed-radix stage tables
    # are O(N * maxSubLength), ~2-3M elements here vs 16.8M dense)
    total = sum(int(np.prod(v.shape)) for v in plan._consts.values())
    assert total < n * n // 4, total
    y = np.asarray(plan(x))
    styp = int(kind[-1])
    f = sf.dct if kind.startswith("dct") else sf.dst
    conv = 1.0 if kind == "dct1" else 0.5   # repo trig convention vs scipy
    ref = f(x.astype(np.float64), type=styp, axis=-1) * conv
    rel = np.max(np.abs(y - ref)) / np.max(np.abs(ref))
    assert rel < 1e-5, rel


def test_trig14_self_inverse_roundtrip(rng, assert_close):
    """direction=inverse on self-inverse kinds via the FFT route."""
    n = 1024
    x = rng.standard_normal((2, n)).astype(np.float32)
    for kind in ("dct1", "dct4", "dst1", "dst4"):
        fwd = W.create_plan(type=kind, shape=[n], direction="forward", batch=2)
        inv = W.create_plan(type=kind, shape=[n], direction="inverse", batch=2,
                            normalize="backward")
        assert "dct-axis0-fft" in fwd.route.reasons
        y = np.asarray(inv(fwd(x)))
        # unnormalized self-inverse factors: dct1 -> 2(N-1); dct4/dst4 ->
        # N/2; dst1 -> (N+1)/2 under the repo's no-factor-2 trig
        # convention — with normalize="backward" (1/N) the residual is:
        resid = {"dct1": 2.0 * (n - 1) / n, "dct4": 0.5,
                 "dst1": (n + 1) / (2.0 * n), "dst4": 0.5}[kind]
        assert_close(y, x * resid, label=f"{kind} roundtrip")


def test_giant_matmul_table_guarded():
    """A matmul-route trig table past 2^24 elements raises at build with
    diagnostics instead of silently materializing GiB of consts."""
    with pytest.raises(W.PlanError, match="trig table"):
        W.create_plan({"type": "dct4", "shape": [1 << 15],
                       "tuning": {"dct_fft_min_n": 1 << 20}})
    # and the default tuning routes the same spec through the FFT embedding
    p = W.create_plan({"type": "dct4", "shape": [1 << 15]})
    assert "dct-axis0-fft" in p.route.reasons


def test_dct_matmul_default_small(rng):
    plan = W.create_plan(type="dct2", shape=[8, 8], direction="forward", batch=1)
    assert "dct-axis0-matmul" in plan.route.reasons
