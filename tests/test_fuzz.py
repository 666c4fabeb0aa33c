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
