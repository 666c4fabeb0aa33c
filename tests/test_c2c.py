"""c2c plan correctness vs the numpy oracle.

Ports the reference's c2c coverage matrix from test/complete.suite.js:
mixed/Bluestein/Rader axes up to rank 4, both directions, all normalize
modes, batching, forced axis algorithms, in-place execution.
"""

import numpy as np
import pytest

import webgpufft_tpu as W
from webgpufft_tpu.core.cplx import interleave, uninterleave
from webgpufft_tpu.utils import mathref as R


def run_c2c(z, shape, assert_close, label="", **opts):
    batch = z.shape[0]
    plan = W.create_plan(type="c2c", shape=list(shape), batch=batch, **opts)
    y = uninterleave(np.asarray(plan(interleave(z))))
    ref = R.fft_nd(z, shape, opts.get("direction", "forward"),
                   opts.get("normalize", "none"))
    assert_close(np.stack([y.real, y.imag], -1), np.stack([ref.real, ref.imag], -1),
                 label=label or f"c2c{shape}")
    return plan


@pytest.mark.parametrize("shape", [
    (4,), (8,), (16,), (1024,), (12,), (60,), (2310,),   # mixed radix
    (17,), (97,), (101,),                                # rader primes
    (34,), (646,),                                       # bluestein composites
    (8, 8), (16, 12), (9, 4), (17, 8), (34, 6), (4, 4, 4), (8, 3, 5),
    (4, 3, 2, 5),                                        # rank 4
])
@pytest.mark.parametrize("direction", ["forward", "inverse"])
def test_c2c_shapes(shape, direction, rng, assert_close):
    z = rng.standard_normal((2, *shape)) + 1j * rng.standard_normal((2, *shape))
    run_c2c(z, shape, assert_close, direction=direction)


@pytest.mark.parametrize("normalize", ["none", "backward", "unitary"])
@pytest.mark.parametrize("direction", ["forward", "inverse"])
def test_c2c_normalize(normalize, direction, rng, assert_close):
    z = rng.standard_normal((3, 24)) + 1j * rng.standard_normal((3, 24))
    run_c2c(z, (24,), assert_close, direction=direction, normalize=normalize)


def test_c2c_roundtrip(rng, assert_close):
    shape = (32, 15)
    z = rng.standard_normal((2, *shape)) + 1j * rng.standard_normal((2, *shape))
    fwd = W.create_plan(type="c2c", shape=list(shape), batch=2, direction="forward")
    inv = W.create_plan(type="c2c", shape=list(shape), batch=2, direction="inverse",
                        normalize="backward")
    back = uninterleave(np.asarray(inv(fwd(interleave(z)))))
    assert_close(back.real, z.real, label="roundtrip.re")
    assert_close(back.imag, z.imag, label="roundtrip.im")


@pytest.mark.parametrize("force,kind", [
    ({"forceBluesteinAxes": [0]}, "bluestein"),
    ({"forceRaderAxes": [0]}, "rader"),
])
def test_c2c_forced_axis_algorithms(force, kind, rng, assert_close):
    n = 13  # smooth prime: would normally be "mixed"
    z = rng.standard_normal((2, n)) + 1j * rng.standard_normal((2, n))
    plan = run_c2c(z, (n,), assert_close, direction="forward", tuning=force)
    assert plan.route.axis_kinds == (kind,)


def test_c2c_rader_max_prime_reroute(rng, assert_close):
    # prime above raderMaxPrime must fall back to Bluestein
    # (reference: large_policy.js raderMaxPrime default 4096)
    z = rng.standard_normal((1, 31)) + 1j * rng.standard_normal((1, 31))
    plan = run_c2c(z, (31,), assert_close, tuning={"raderMaxPrime": 20})
    assert plan.route.axis_kinds == ("bluestein",)


def test_c2c_in_place_donation(rng, assert_close):
    z = rng.standard_normal((4, 64)) + 1j * rng.standard_normal((4, 64))
    plan = W.create_plan(type="c2c", shape=[64], batch=4, direction="forward",
                        inPlace=True)
    import jax.numpy as jnp
    x = jnp.asarray(interleave(z))
    y = uninterleave(np.asarray(plan(x)))
    ref = R.fft_nd(z, (64,), "forward")
    assert_close(y.real, ref.real, label="inplace")


def test_c2c_batch_one_and_large(rng, assert_close):
    for batch in (1, 37):
        z = rng.standard_normal((batch, 30)) + 1j * rng.standard_normal((batch, 30))
        run_c2c(z, (30,), assert_close)


def test_c2c_length_one_axis(rng, assert_close):
    z = rng.standard_normal((2, 1, 8)) + 1j * rng.standard_normal((2, 1, 8))
    run_c2c(z, (1, 8), assert_close)


def test_c2c_input_shape_validation():
    plan = W.create_plan(type="c2c", shape=[8], batch=2)
    with pytest.raises(W.PlanError, match="expected input shape"):
        plan(np.zeros((2, 8), np.float32))  # missing component dim


def test_c2c_mid_axis_deep_chain(rng, assert_close):
    """Non-last axis whose sub-length chain is deeper than 2 levels
    (maxSubLength=8 -> 512 = [8, 8, 8]) exercises the W4 mid-axis
    recursion's twiddle + digit-swap branch (core/axis._rec_mid)."""
    shape = [512, 4]
    z = (rng.standard_normal(tuple([2] + shape))
         + 1j * rng.standard_normal(tuple([2] + shape)))
    plan = W.create_plan(type="c2c", shape=shape, batch=2,
                        tuning={"maxSubLength": 8})
    y = uninterleave(np.asarray(plan(interleave(z))))
    ref = R.fft_nd(z, shape, "forward")
    assert_close(y.real, ref.real, label="mid-deep.re")
    assert_close(y.imag, ref.imag, label="mid-deep.im")
