"""Tracing/profiling subsystem tests (runtime/trace.py)."""

import numpy as np

import webgpufft_tpu as W
from webgpufft_tpu.runtime import trace


def test_plan_stats(rng):
    plan = W.create_plan(type="c2c", shape=[64], batch=8)
    x = rng.standard_normal((8, 64, 2)).astype(np.float32)
    stats = trace.plan_stats(plan, x)
    assert stats["model_flops"] == 5 * 64 * 6 * 8
    assert stats["model_min_bytes"] == 2 * 64 * 8 * 8
    # XLA cost analysis fields are backend-dependent; present on CPU
    if stats.get("flops"):
        assert stats["flops"] > 0


def test_annotate_and_trace(tmp_path, rng):
    plan = W.create_plan(type="c2c", shape=[16], batch=4)
    x = rng.standard_normal((4, 16, 2)).astype(np.float32)
    with trace.annotate("fft-step"):
        plan(x)
    # memory_stats may be None on CPU; just exercise the call
    trace.memory_stats()
