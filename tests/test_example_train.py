"""The training example (examples/system_identification.py): gradient
descent THROUGH the fftconv plan recovers an unknown FIR system, and the
distributed (dp x sp) training trajectory matches single-chip — the
plan layer's adjoint contract exercised end-to-end by a real optimizer
loop."""

import importlib.util
import os

import numpy as np
import pytest


def _load():
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples", "system_identification.py")
    spec = importlib.util.spec_from_file_location("sysid_example", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ex():
    return _load()


def test_recovers_the_kernel(ex):
    k_hat, k_true, losses = ex.run(n=128, klen=9, batch=4, steps=200,
                                   noise=1e-4)
    assert losses[-1] < losses[0] * 1e-3
    err = np.max(np.abs(k_hat - k_true)) / np.max(np.abs(k_true))
    assert err < 2e-2, err


def test_distributed_training_matches_single_chip(ex):
    import jax
    from webgpufft_tpu.parallel import sharded

    if jax.device_count() < 4:
        pytest.skip("needs >= 4 devices")
    single, _, _ = ex.run(n=128, klen=9, batch=4, steps=60, noise=1e-4)
    mesh = sharded.make_mesh({"dp": 2, "sp": 2})
    dist, _, _ = ex.run(n=128, klen=9, batch=4, steps=60, noise=1e-4,
                        mesh=mesh)
    err = np.max(np.abs(dist - single)) / max(np.max(np.abs(single)), 1e-12)
    assert err < 1e-4, err
