"""Test harness setup.

Tests run on the CPU backend with 8 virtual devices so that plan logic,
routing, and multi-chip sharding are all exercised without TPU hardware —
the analog of the reference's FakeDevice unit-test lane
(reference: test/c2c_large_batch.unit.test.js:34-126) plus the
`--xla_force_host_platform_device_count` mesh strategy from SURVEY.md §4.

On-device (real TPU) validation happens via bench.py and __graft_entry__.py.
"""

import os

os.environ.setdefault("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# The axon TPU plugin ignores JAX_PLATFORMS from the environment; the config
# update below reliably pins tests to the CPU backend.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def _assert_close(actual, expected, atol_scale=1e-5, label=""):
    """Elementwise |a - e| <= tol with tol = atol_scale * max|e| (the
    "max rel err vs numpy.fft" criterion from BASELINE.md; the reference
    uses per-element atol+rtol*|e| at 1e-4, complete.node.test.js:14-25 —
    ours is stricter).  Complex inputs compare BOTH components (casting to
    float64 would silently discard the imaginary part)."""
    actual = np.asarray(actual)
    expected = np.asarray(expected)
    dt = (np.complex128 if (np.iscomplexobj(actual) or np.iscomplexobj(expected))
          else np.float64)
    actual = actual.astype(dt)
    expected = expected.astype(dt)
    assert actual.shape == expected.shape, (
        f"{label}: shape {actual.shape} != {expected.shape}")
    scale = max(np.max(np.abs(expected)), 1e-12)
    err = np.max(np.abs(actual - expected)) / scale
    assert err <= atol_scale, f"{label}: max rel err {err:.3e} > {atol_scale:.0e}"


@pytest.fixture
def assert_close():
    return _assert_close


@pytest.fixture
def rng():
    return np.random.default_rng(12345)
