"""Plan-cache snapshot tests (reference: test/pipeline_cache.unit.test.js —
versioned snapshot export/import/prewarm, src/runtime/pipeline_cache.js)."""

import json

import numpy as np
import pytest

import webgpufft_tpu as W
from webgpufft_tpu.runtime.cache import (
    SNAPSHOT_SCHEMA, export_plan_cache_snapshot, import_plan_cache_snapshot)


def test_snapshot_roundtrip():
    cache = W.PlanCache()
    W.create_plan({"type": "c2c", "shape": [16], "batch": 2,
                   "normalize": "unitary"}, cache=cache)
    W.create_plan({"type": "fftconv", "shape": [8],
                   "fftConv": {"boundary": "linear-same", "kernelShape": [3],
                               "kernelCount": 2}}, cache=cache)
    W.create_plan({"type": "dct2", "shape": [8, 8], "direction": "inverse",
                   "ioView": {"input": {"shape": [6, 6], "placement": "center"}},
                   "zeroPad": {"read": {"start": [1, 0], "end": [8, 8]}}},
                  cache=cache)
    snap = export_plan_cache_snapshot(cache)
    assert snap["schema"] == SNAPSHOT_SCHEMA
    assert snap["metadata"]["plans"] == 3
    # must survive JSON serialization
    snap2 = json.loads(json.dumps(snap))

    fresh = W.PlanCache()
    n = import_plan_cache_snapshot(snap2, cache=fresh)
    assert n == 3 and len(fresh) == 3
    # rebuilt specs must be identical (cache hits)
    p = W.create_plan({"type": "c2c", "shape": [16], "batch": 2,
                       "normalize": "unitary"}, cache=fresh)
    assert len(fresh) == 3  # no new entry


def test_snapshot_rejects_stale_chunk_bound():
    """A snapshot recorded under looser validation (chunkElements above
    the round-5 cap) must fail the import with the version diagnostic,
    not silently rebuild the forbidden configuration (round-5 review
    finding)."""
    cache = W.PlanCache()
    W.create_plan({"type": "c2c", "shape": [16], "batch": 2,
                   "normalize": "unitary"}, cache=cache)
    snap = json.loads(json.dumps(export_plan_cache_snapshot(cache)))
    snap["specs"][0]["tuning"]["chunk_elems"] = 1 << 25
    fresh = W.PlanCache()
    with pytest.raises(ValueError, match="could not be rebuilt"):
        import_plan_cache_snapshot(snap, cache=fresh)


def test_snapshot_rejects_bad_schema():
    with pytest.raises(ValueError, match="schema"):
        import_plan_cache_snapshot({"schema": "other", "version": 1})
    with pytest.raises(ValueError, match="version"):
        import_plan_cache_snapshot({"schema": SNAPSHOT_SCHEMA, "version": 99})


def test_rebuilt_plan_executes(rng, assert_close):
    from webgpufft_tpu.core.cplx import interleave, uninterleave
    from webgpufft_tpu.utils import mathref as R

    cache = W.PlanCache()
    W.create_plan({"type": "c2c", "shape": [12], "batch": 2}, cache=cache)
    snap = json.loads(json.dumps(export_plan_cache_snapshot(cache)))
    fresh = W.PlanCache()
    import_plan_cache_snapshot(snap, cache=fresh)
    plan = W.create_plan({"type": "c2c", "shape": [12], "batch": 2}, cache=fresh)
    z = rng.standard_normal((2, 12)) + 1j * rng.standard_normal((2, 12))
    y = uninterleave(np.asarray(plan(interleave(z))))
    ref = R.fft_nd(z, [12], "forward")
    assert_close(y.real, ref.real, label="rebuilt plan")


def test_snapshot_at_plan_creation():
    """createPlan-style cache.snapshot option prewarms the plan cache
    (reference: docs/API.md:316-323)."""
    import webgpufft_tpu as W
    cache = W.PlanCache()
    p1 = W.create_plan(type="c2c", shape=[16], batch=2, cache=cache)
    snap = W.export_plan_cache_snapshot(cache)
    fresh = W.PlanCache()
    p2 = W.create_plan({"type": "c2c", "shape": [32], "cache": {"snapshot": snap}},
                      cache=fresh)
    assert len(fresh) == 2  # the snapshot spec + the new plan
    assert p2.spec.shape == (32,)
    import pytest as _pytest
    with _pytest.raises(W.PlanError, match="cache option"):
        W.create_plan({"type": "c2c", "shape": [8], "cache": "bogus"},
                     cache=W.PlanCache())


def test_snapshot_legacy_v1_upgrade():
    """Legacy v1 snapshots import via the upgrade path (reference:
    pipeline_cache.js legacy version upgrade)."""
    import webgpufft_tpu as W
    from webgpufft_tpu.runtime import cache as C
    own = W.PlanCache()
    W.create_plan(type="dct2", shape=[8], batch=2, cache=own)
    snap = W.export_plan_cache_snapshot(own)
    assert snap["version"] == C.SNAPSHOT_VERSION
    legacy = dict(snap)
    legacy["version"] = 1
    legacy["metadata"] = {"plans": 1}
    fresh = W.PlanCache()
    n = W.import_plan_cache_snapshot(legacy, cache=fresh)
    assert n == 1 and len(fresh) == 1
    import pytest as _pytest
    with _pytest.raises(ValueError, match="version"):
        C.upgrade_snapshot({"schema": C.SNAPSHOT_SCHEMA, "version": 99})


def test_snapshot_without_matmul_precision_prewarms():
    """Snapshots saved before the matmulPrecision knob rebuild with the
    'auto' default; the rebuild must resolve it exactly like normalize_spec
    or the prewarmed plan never hits the live cache key (regression)."""
    import webgpufft_tpu as W
    own = W.PlanCache()
    W.create_plan(type="c2c", shape=[16], batch=2, cache=own)
    snap = W.export_plan_cache_snapshot(own)
    for s in snap["specs"]:
        s["tuning"].pop("matmul_precision", None)
    fresh = W.PlanCache()
    W.import_plan_cache_snapshot(snap, cache=fresh)
    assert len(fresh) == 1
    W.create_plan(type="c2c", shape=[16], batch=2, cache=fresh)
    assert len(fresh) == 1, "prewarmed plan was not reused (cache key drift)"


def test_snapshot_as_keyword_cache_option():
    """cache={'snapshot': snap} works as a KEYWORD too (regression: the
    dict used to be captured by the PlanCache-typed parameter and crash)."""
    import webgpufft_tpu as W
    own = W.PlanCache()
    W.create_plan(type="c2c", shape=[16], cache=own)
    snap = W.export_plan_cache_snapshot(own)
    p = W.create_plan(type="c2c", shape=[32], cache={"snapshot": snap})
    assert p.spec.shape == (32,)


def test_cache_option_collision_raises():
    import webgpufft_tpu as W
    own = W.PlanCache()
    W.create_plan(type="c2c", shape=[16], cache=own)
    snap = W.export_plan_cache_snapshot(own)
    import pytest as _pytest
    with _pytest.raises(W.PlanError, match="once"):
        W.create_plan({"type": "c2c", "shape": [8], "cache": {"snapshot": snap}},
                     cache={"snapshot": snap})


def test_plan_get_pipeline_cache_snapshot():
    """Per-plan snapshot export (reference: plan.getPipelineCacheSnapshot,
    docs/API.md:121)."""
    cache = W.PlanCache()
    plan = W.create_plan({"type": "c2c", "shape": [16]}, cache=cache)
    snap = plan.get_pipeline_cache_snapshot()
    assert snap["schema"].startswith("webgpufft")
    assert any(s["shape"] == [16] or tuple(s["shape"]) == (16,)
               for s in snap["specs"])
    # the snapshot round-trips into a fresh cache
    fresh = W.PlanCache()
    W.import_plan_cache_snapshot(snap, cache=fresh)
    assert len(fresh) == 1
