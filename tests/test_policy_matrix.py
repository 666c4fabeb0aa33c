"""Structural routing-decision matrix — the analog of the reference's
123 FakeDevice unit tests (test/c2c_large_batch.unit.test.js): assert
per-axis strategy, chunk sizes, and reason codes across the spec space
without executing transforms."""

import numpy as np
import pytest

import webgpufft_tpu as W
from webgpufft_tpu.plans.transforms import CHUNK_ELEMS, chunked_batch


def reasons(plan):
    return plan.route.reasons


def build(**opts):
    return W.create_plan(dict(opts), cache=W.PlanCache())


@pytest.mark.parametrize("shape,batch,impl,want_mode,want_axis_reasons", [
    # default auto -> xla everywhere
    ([64], 16, "auto", "xla", ["c2c-axis0-xla"]),
    # pallas-auto: last axis fused, two-factor smooth
    ([64], 16, "pallas-auto", "pallas-fused", ["c2c-axis0-fused-lines"]),
    # prime axis cannot fuse -> xla fallback per axis
    ([17], 16, "pallas-auto", "xla", ["c2c-axis0-xla"]),
    # rank 2 pallas-auto: cols + lines (digits >= 16 per axis required
    # in multi-kernel programs; 64 = 8x8 digits -> gated to xla)
    ([256, 256], 16, "pallas-auto", "pallas-fused",
     ["c2c-axis0-fused-cols", "c2c-axis1-fused-lines"]),
    ([64, 64], 16, "pallas-auto", "xla",
     ["c2c-axis0-xla", "c2c-axis1-xla"]),
    # rank 2 auto: W4 mid-axis + last-axis einsum (both 'xla')
    ([64, 64], 16, "auto", "xla",
     ["c2c-axis0-xla", "c2c-axis1-xla"]),
    # small lanes + tiny digits -> xla fallbacks
    ([64, 8], 16, "pallas-auto", "xla",
     ["c2c-axis0-xla", "c2c-axis1-xla"]),
    # mixed prime + smooth rank 2
    ([17, 64], 4, "auto", "xla",
     ["c2c-axis0-xla", "c2c-axis1-xla"]),
])
def test_c2c_strategy_matrix(shape, batch, impl, want_mode, want_axis_reasons):
    plan = build(type="c2c", shape=shape, batch=batch,
                 tuning={"impl": impl})
    assert plan.route.mode == want_mode, (plan.route.mode, reasons(plan))
    for r in want_axis_reasons:
        assert r in reasons(plan), (r, reasons(plan))


@pytest.mark.parametrize("batch,n,want_chunk", [
    (4096, 1024, 4096),       # exactly 2^22 -> unchunked
    (4096, 4096, 1024),       # 2^24 -> chunk at 1024
    (4096, 2048, 2048),
    (8192, 4096, 1024),
    (1, 2 ** 20, 1),          # single huge line: chunk of 1
    (3, 2 ** 22, 1),          # non-dividing batch: falls to 1
])
def test_chunk_size_matrix(batch, n, want_chunk):
    assert chunked_batch(batch, n) == want_chunk


def test_chunk_reason_recorded_across_families():
    for t, shape in [("c2c", [4096]), ("r2c", [4096]), ("dct2", [4096])]:
        plan = build(type=t, shape=shape, batch=4096,
                     direction="forward")
        assert any("large-batch-chunk" in r for r in reasons(plan)), (t, reasons(plan))


@pytest.mark.parametrize("kinds,shape,tuning", [
    (("mixed",), [60], {}),
    (("rader",), [101], {}),
    (("bluestein",), [101], {"raderMaxPrime": 50}),
    (("bluestein",), [34], {}),
    (("mixed", "rader", "bluestein"), [16, 17, 34], {}),
])
def test_axis_kinds_matrix(kinds, shape, tuning):
    plan = build(type="c2c", shape=shape, batch=2, tuning=tuning)
    assert plan.route.axis_kinds == kinds


def test_fused_attempt_recorded_under_auto():
    plan = build(type="c2c", shape=[64], batch=16)
    assert any(r.startswith("impl-auto-prefers-xla") for r in reasons(plan))
    assert "pallas-fused" not in plan.route.mode


def test_dct_route_reasons():
    plan = build(type="dct2", shape=[1024, 8], batch=2)
    assert "dct-axis0-fft" in reasons(plan)
    assert "dct-axis1-matmul" in reasons(plan)


def test_scale_folding_route():
    """Normalize folded into the last DFT table leaves no scale pass; the
    rebuilt axis plan carries out_scale."""
    plan = build(type="c2c", shape=[64], batch=2, normalize="unitary",
                 tuning={"impl": "xla"})
    import math
    # structural: consts contain the scaled final-level table
    last = [k for k in plan._consts if k.endswith("/dft0")]
    assert last
