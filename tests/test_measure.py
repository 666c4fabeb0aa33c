"""Measured plan selection (tuning.rigor="measure", runtime/measure.py)."""

import numpy as np
import pytest

import webgpufft_tpu as W
from webgpufft_tpu.runtime import measure as M


def _opts(**tuning):
    return {"type": "c2c", "shape": [512], "batch": 4,
            "direction": "forward", "normalize": "unitary",
            "tuning": {"rigor": "measure", **tuning}}


def test_measure_builds_working_plan_and_records(rng):
    cache = W.PlanCache()
    p = W.create_plan(_opts(), cache=cache)
    notes = [r for r in p.route.reasons if r.startswith("measured")]
    assert notes, p.route.reasons
    assert len(cache.measured) == 1
    (rec,) = cache.measured.values()
    assert rec["winner"] in rec["trials_ms"]
    assert len(rec["trials_ms"]) >= 2          # really compared candidates
    # numerically identical to the estimate-rigor plan
    x = rng.standard_normal((4, 512, 2)).astype(np.float32)
    pe = W.create_plan({**_opts(), "tuning": {}}, cache=cache)
    err = np.max(np.abs(np.asarray(p.exec(x)) - np.asarray(pe.exec(x))))
    assert err < 1e-5, err


def test_measure_decision_is_cached(monkeypatch):
    cache = W.PlanCache()
    W.create_plan(_opts(), cache=cache)
    calls = {"n": 0}

    def boom(*a, **k):
        calls["n"] += 1
        raise AssertionError("re-measured a cached decision")

    monkeypatch.setattr(M, "_chain_time", boom)
    p2 = W.create_plan(_opts(), cache=cache)
    assert calls["n"] == 0
    # the same (winner) plan object comes back, carrying its original
    # measured-winner annotation from the first call
    assert any(r.startswith("measured-winner:") for r in p2.route.reasons)


def test_measure_never_mutates_estimate_callers_plan(rng):
    """An estimate-rigor caller's plan must keep its route metadata even
    when a later measure-rigor call resolves to the same cached plan."""
    cache = W.PlanCache()
    est = W.create_plan({**_opts(), "tuning": {}}, cache=cache)
    before = est.route.reasons
    W.create_plan(_opts(), cache=cache)     # may resolve to the same plan
    assert est.route.reasons == before


def test_measure_caches_degraded_decisions(monkeypatch):
    """no-candidate outcomes are cached so repeat calls skip candidate
    construction entirely."""
    cache = W.PlanCache()
    tiny = {"type": "c2c", "shape": [16], "batch": 1,
            "direction": "forward", "normalize": "none",
            "tuning": {"rigor": "measure"}}
    p = W.create_plan(tiny, cache=cache)
    assert any(r == "measure-no-candidates" for r in p.route.reasons)
    assert len(cache.measured) == 1
    monkeypatch.setattr(M, "candidate_overrides",
                        lambda *a: pytest.fail("re-ran candidate sweep"))
    W.create_plan(tiny, cache=cache)


def test_measure_snapshot_roundtrip(monkeypatch):
    cache = W.PlanCache()
    W.create_plan(_opts(), cache=cache)
    snap = W.export_plan_cache_snapshot(cache)
    assert snap["version"] == 3 and len(snap["measured"]) == 1
    fresh = W.PlanCache()
    W.import_plan_cache_snapshot(snap, cache=fresh)
    assert fresh.measured == cache.measured
    monkeypatch.setattr(M, "_chain_time",
                        lambda *a, **k: pytest.fail("re-measured"))
    p = W.create_plan(_opts(), cache=fresh)
    # the recorded decision resolved the spec (no timing ran); the plan
    # itself was prewarmed by the snapshot import
    (rec,) = cache.measured.values()
    for k, v in (rec["overrides"] or {}).items():
        assert getattr(p.spec.tuning, k) == v


def test_v2_snapshot_upgrades_with_empty_measured():
    cache = W.PlanCache()
    W.create_plan({"type": "c2c", "shape": [32], "batch": 2,
                   "direction": "forward", "normalize": "none"}, cache=cache)
    snap = W.export_plan_cache_snapshot(cache)
    legacy = {k: v for k, v in snap.items() if k != "measured"}
    legacy["version"] = 2
    fresh = W.PlanCache()
    assert W.import_plan_cache_snapshot(legacy, cache=fresh) == 1
    assert fresh.measured == {}


def test_measure_defers_under_trace(rng):
    import jax

    cache = W.PlanCache()
    x = rng.standard_normal((4, 64, 2)).astype(np.float32)

    @jax.jit
    def run(v):
        p = W.create_plan({"type": "c2c", "shape": [64], "batch": 4,
                           "direction": "forward", "normalize": "none",
                           "tuning": {"rigor": "measure"}}, cache=cache)
        return p.exec(v)

    y = np.asarray(run(x))
    assert y.shape == x.shape
    assert cache.measured == {}            # no timing happened under trace
    specs = cache.specs()
    assert all(s.tuning.rigor == "estimate" for s in specs)


def test_measure_unsupported_types_degrade_gracefully():
    cache = W.PlanCache()
    p = W.create_plan({"type": "fftconv", "shape": [64],
                       "fftConv": {"boundary": "circular"},
                       "tuning": {"rigor": "measure"}}, cache=cache)
    assert any(r.startswith("measure-unsupported:") for r in p.route.reasons)
    assert cache.measured == {}


def test_distributed_records_measure_degradation():
    import jax
    from webgpufft_tpu.parallel import sharded
    mesh = sharded.make_mesh({"sp": min(4, jax.device_count())})
    p = W.create_distributed_plan({"type": "c2c", "shape": [64], "batch": 2,
                                   "direction": "forward", "normalize": "none",
                                   "tuning": {"rigor": "measure"}},
                                  mesh=mesh, seq_axis="sp")
    assert "measure-unsupported:distributed" in p.route.reasons


def test_rigor_validation():
    with pytest.raises(W.PlanError, match="rigor"):
        W.create_plan({"type": "c2c", "shape": [16],
                       "tuning": {"rigor": "exhaustive"}})


def test_facade_plan_tuning_context(rng):
    """fftapi.plan_tuning threads tuning (incl. measured rigor) into every
    plan the facade builds; nesting merges and restores."""
    import scipy.fft as sf
    from webgpufft_tpu import fftapi as F
    from webgpufft_tpu.runtime.cache import default_cache

    x = rng.standard_normal(600).astype(np.float32)
    before = len(default_cache().measured)
    with F.plan_tuning(rigor="measure"):
        y = F.dct(x)
    assert len(default_cache().measured) > before
    assert np.allclose(np.asarray(y), sf.dct(np.float64(x)), atol=1e-3)
    with F.plan_tuning(maxSubLength=8):
        assert F._DEFAULT_TUNING == {"maxSubLength": 8}
        with F.plan_tuning(rigor="measure"):
            assert F._DEFAULT_TUNING == {"maxSubLength": 8,
                                         "rigor": "measure"}
        assert F._DEFAULT_TUNING == {"maxSubLength": 8}
    assert F._DEFAULT_TUNING == {}


def test_measured_plan_exports(rng, tmp_path):
    """A measured winner is a plain concrete plan: AOT export/load works."""
    cache = W.PlanCache()
    p = W.create_plan(_opts(), cache=cache)
    blob = W.export_plan(p)
    q = W.load_exported_plan(blob)
    x = rng.standard_normal((4, 512, 2)).astype(np.float32)
    err = np.max(np.abs(np.asarray(q(x)) - np.asarray(p.exec(x))))
    assert err < 1e-6, err


def test_shape_changing_plan_measures(rng):
    """r2c output shape differs from input: the hetero chain path."""
    cache = W.PlanCache()
    p = W.create_plan({"type": "r2c", "shape": [4096], "batch": 2,
                       "direction": "forward", "normalize": "none",
                       "tuning": {"rigor": "measure"}}, cache=cache)
    assert any(r.startswith("measured") for r in p.route.reasons)
    x = rng.standard_normal((2, 4096)).astype(np.float32)
    got = np.asarray(p.exec(x))
    want = np.fft.rfft(x, axis=-1)
    err = np.max(np.abs((got[..., 0] + 1j * got[..., 1]) - want))
    assert err / np.max(np.abs(want)) < 1e-5


def test_diverging_candidate_rejected_by_numeric_gate(monkeypatch):
    """A candidate whose output disagrees with the baseline plan must never
    win on timing alone (silent-miscompile protection; ADVICE r3 high)."""
    cache = W.PlanCache()
    real_sample = M._output_sample

    def corrupting_sample(plan, x):
        got = real_sample(plan, x)
        # poison every non-baseline candidate's fingerprint
        if plan.spec.tuning.max_sub_length != 32 or \
                plan.spec.tuning.chunk_elems is not None or \
                plan.spec.tuning.disable_four_step or \
                plan.spec.tuning.large_route != "auto":
            return got + 1.0
        return got

    monkeypatch.setattr(M, "_output_sample", corrupting_sample)
    p = W.create_plan(_opts(), cache=cache)
    assert any(r == "measure-all-candidates-diverged"
               for r in p.route.reasons), p.route.reasons
    (rec,) = cache.measured.values()
    assert rec["winner"] == "as-requested" and rec["rejected"]
    # and the returned plan is the numerically-correct baseline
    x = np.random.default_rng(0).standard_normal((4, 512, 2)).astype(np.float32)
    pe = W.create_plan({**_opts(), "tuning": {}}, cache=W.PlanCache())
    err = np.max(np.abs(np.asarray(p.exec(x)) - np.asarray(pe.exec(x))))
    assert err < 1e-5, err


def test_partial_divergence_still_measures(monkeypatch):
    """Only diverging candidates drop; agreeing ones still race on time."""
    cache = W.PlanCache()
    real_sample = M._output_sample

    def corrupt_sub16(plan, x):
        got = real_sample(plan, x)
        if plan.spec.tuning.max_sub_length == 16:
            return got + 1.0
        return got

    monkeypatch.setattr(M, "_output_sample", corrupt_sub16)
    p = W.create_plan(_opts(), cache=cache)
    assert any(r.startswith("measured-winner:") or
               r.startswith("measured-cached:") for r in p.route.reasons)
    (rec,) = cache.measured.values()
    assert rec.get("rejected") == ["maxSubLength=16"]
    assert "maxSubLength=16" not in rec["trials_ms"]


def test_stale_cached_override_revalidated(rng):
    """A measured-cache record whose overrides predate a validation
    tightening (e.g. a chunkElements winner recorded by 0.10) must not
    rebuild the now-forbidden configuration: the stale record is dropped
    and the spec re-measures (round-5 review finding)."""
    cache = W.PlanCache()
    from webgpufft_tpu.spec import normalize_spec

    spec = normalize_spec(_opts())
    key = M.measure_key(spec)
    cache.measured[key] = {"winner": "chunkElements=2^25",
                           "overrides": {"chunk_elems": 1 << 25},
                           "trials_ms": {}}
    p = W.create_plan(_opts(), cache=cache)
    # the forbidden override was not applied...
    ce = p.spec.tuning.chunk_elems
    assert ce is None or ce <= (1 << 22), ce
    assert not any("chunk-elems-override(33554432)" in r
                   for r in p.route.reasons), p.route.reasons
    # ...and the stale record was replaced by a fresh, valid decision
    rec = cache.measured[key]
    assert rec.get("overrides", {}).get("chunk_elems") is None
    x = rng.standard_normal((4, 512, 2)).astype(np.float32)
    ref = np.fft.fft(x[..., 0] + 1j * x[..., 1], axis=1, norm="ortho")
    got = np.asarray(p.exec(x), np.float64)
    err = (np.max(np.abs((got[..., 0] + 1j * got[..., 1]) - ref))
           / np.max(np.abs(ref)))
    assert err < 1e-5, err


def test_no_raised_chunk_bound_candidate():
    """The measured planner must never offer a raised chunkElements bound:
    bounds above the 2^22 default miscompile silently on composed 3-D TPU
    routes (r8b round 2, r29 round 5) and the spec validator rejects them
    (spec.validate_tuning)."""
    from webgpufft_tpu.runtime import measure as M
    from webgpufft_tpu.spec import normalize_spec

    big = normalize_spec({"type": "c2c", "shape": [4096], "batch": 4096})
    descs = [d for d, _ in M.candidate_overrides(big)]
    assert not any(d.startswith("chunkElements") for d in descs)
