"""Spec validation + routing-policy structural tests.

The pure-function test lane (reference: test/large_policy.unit.test.js and
the FakeDevice structural assertions) — verifies plan construction decisions
without running transforms.
"""

import numpy as np
import pytest

import webgpufft_tpu as W
from webgpufft_tpu.spec import normalize_spec
from webgpufft_tpu.core.axis import select_axis_kind


def test_plan_type_validation():
    with pytest.raises(W.PlanError, match="type"):
        normalize_spec({"type": "nope", "shape": [8]})
    with pytest.raises(W.PlanError, match="shape"):
        normalize_spec({"type": "c2c", "shape": []})
    with pytest.raises(W.PlanError, match="positive"):
        normalize_spec({"type": "c2c", "shape": [0]})
    with pytest.raises(W.PlanError, match="direction"):
        normalize_spec({"type": "c2c", "shape": [8], "direction": "up"})
    with pytest.raises(W.PlanError, match="normalize"):
        normalize_spec({"type": "c2c", "shape": [8], "normalize": "ortho"})
    with pytest.raises(W.PlanError, match="inPlace"):
        normalize_spec({"type": "r2c", "shape": [8], "inPlace": True})
    with pytest.raises(W.PlanError, match="f32"):
        normalize_spec({"type": "fftconv", "shape": [8], "precision": "f16-storage"})


def test_direction_defaults_and_overrides():
    s = normalize_spec({"type": "fftconv", "shape": [8], "direction": "inverse"})
    assert s.direction == "forward"  # ignored for fftconv (docs/API.md:13)
    s = normalize_spec({"type": "dct2", "shape": [8], "direction": "inverse"})
    assert s.direction == "inverse"


def test_axis_kind_policy():
    tun = normalize_spec({"type": "c2c", "shape": [8]}).tuning
    assert select_axis_kind(1024, 0, tun) == "mixed"
    assert select_axis_kind(2310, 0, tun) == "mixed"
    assert select_axis_kind(17, 0, tun) == "rader"
    assert select_axis_kind(4093, 0, tun) == "rader"     # prime <= default 4096
    assert select_axis_kind(4099, 0, tun) == "bluestein"  # prime above the cap
    tun_small = normalize_spec({"type": "c2c", "shape": [8],
                                "tuning": {"raderMaxPrime": 100}}).tuning
    assert select_axis_kind(101, 0, tun_small) == "bluestein"
    assert select_axis_kind(34, 0, tun) == "bluestein"   # composite non-smooth
    assert select_axis_kind(1, 0, tun) == "mixed"


def test_force_rader_requires_prime():
    with pytest.raises(ValueError, match="not prime"):
        W.create_plan(type="c2c", shape=[12], tuning={"forceRaderAxes": [0]})


def test_route_metadata_exposed():
    plan = W.create_plan(type="c2c", shape=[16, 17], batch=2)
    assert plan.route.axis_kinds == ("mixed", "rader")
    assert plan.large_route_mode in ("xla", "pallas-fused")
    assert isinstance(plan.large_route_reasons, tuple)
    assert "pallas-fused" in plan.route.attempts


def test_impl_forced_xla():
    plan = W.create_plan(type="c2c", shape=[64], batch=16,
                        tuning={"impl": "xla"})
    assert plan.route.mode == "xla"
    assert "impl-forced-xla" in plan.route.reasons


def test_impl_forced_pallas_unavailable_raises():
    with pytest.raises(Exception, match="pallas"):
        W.create_plan(type="c2c", shape=[8, 8], batch=2,
                     tuning={"impl": "pallas"})


def test_unknown_tuning_key_rejected():
    with pytest.raises(W.PlanError, match="tuning"):
        W.create_plan(type="c2c", shape=[8], tuning={"warpSpeed": 9})


def test_spec_hashable_and_cached():
    cache = W.PlanCache()
    p1 = W.create_plan({"type": "c2c", "shape": [8]}, cache=cache)
    p2 = W.create_plan({"type": "c2c", "shape": [8]}, cache=cache)
    assert p1 is p2
    p3 = W.create_plan({"type": "c2c", "shape": [8], "batch": 2}, cache=cache)
    assert p3 is not p1
    assert len(cache) == 2


def test_workspace_and_destroy():
    plan = W.create_plan(type="c2c", shape=[32], batch=4)
    assert plan.get_workspace_size_bytes() > 0
    plan.destroy()


def test_create_fft_plan_alias():
    p = W.create_fft_plan(shape=[16], direction="forward")
    assert p.spec.plan_type == "c2c"
    with pytest.raises(W.PlanError):
        W.create_fft_plan(type="r2c", shape=[16])


def test_normalize_scale_rule():
    from webgpufft_tpu.utils.mathref import normalize_scale
    assert normalize_scale("none", "forward", 64) == 1.0
    assert normalize_scale("backward", "forward", 64) == 1.0
    assert normalize_scale("backward", "inverse", 64) == 1.0 / 64
    assert normalize_scale("unitary", "forward", 64) == 1.0 / 8
    assert normalize_scale("unitary", "inverse", 64) == 1.0 / 8


def test_selftest_module_passes():
    """The shipped backend self-test must pass on the test backend."""
    from webgpufft_tpu.selftest import run
    assert run()


def test_plan_error_details_payload():
    """Structured diagnostics ride PlanError (reference errors embed shapes
    and routing metadata; common.js:42-53)."""
    plan = W.create_plan(type="c2c", shape=[8], batch=2)
    try:
        plan(np.zeros((3, 8, 2), np.float32))
        assert False, "expected PlanError"
    except W.PlanError as e:
        assert e.details["plan_type"] == "c2c"
        assert e.details["batch"] == 2
        assert "route_mode" in e.details


def test_matmul_precision_knob_parsing():
    """tuning.matmulPrecision: auto resolves per storage precision; bad
    values raise (benches/r3_precision_transpose.py precision ladder)."""
    p = W.create_plan(type="c2c", shape=[16])
    assert p.spec.tuning.matmul_precision == "highest"   # f32 auto
    assert not any(r.startswith("mxu-precision") for r in p.route.reasons)
    p = W.create_plan(type="c2c", shape=[16], precision="bf16-storage")
    assert p.spec.tuning.matmul_precision == "default"   # bf16 auto
    assert "mxu-precision:default" in p.route.reasons
    p = W.create_plan(type="c2c", shape=[16], precision="bf16-storage",
                     tuning={"matmulPrecision": "highest"})
    assert p.spec.tuning.matmul_precision == "highest"   # forced back
    p = W.create_plan(type="c2c", shape=[16],
                     tuning={"matmulPrecision": "high"})
    assert "mxu-precision:high" in p.route.reasons
    with pytest.raises(W.PlanError, match="matmulPrecision"):
        W.create_plan(type="c2c", shape=[16],
                     tuning={"matmulPrecision": "fast"})


def test_matmul_precision_threads_through_plans(rng, assert_close):
    """Plans built under every matmulPrecision stay correct (the CPU
    backend ignores the enum, so this validates threading, not numerics)."""
    from webgpufft_tpu.core.cplx import interleave, uninterleave
    from webgpufft_tpu.utils import mathref as R
    n, batch = 48, 3
    z = rng.standard_normal((batch, n)) + 1j * rng.standard_normal((batch, n))
    ref = R.fft_nd(z, [n], "forward")
    for mp in ("highest", "high", "default"):
        plan = W.create_plan(type="c2c", shape=[n], batch=batch,
                            tuning={"matmulPrecision": mp})
        y = uninterleave(np.asarray(plan(interleave(z))))
        assert_close(y.real, ref.real, label=f"mp={mp}.re")
        assert_close(y.imag, ref.imag, label=f"mp={mp}.im")
    # a 2D four-step-eligible shape exercises rows-form + four-step threading
    plan = W.create_plan(type="c2c", shape=[64, 16], batch=2,
                        tuning={"matmulPrecision": "high",
                                "fourStepMinN": 64})
    z2 = (rng.standard_normal((2, 64, 16))
          + 1j * rng.standard_normal((2, 64, 16)))
    y2 = uninterleave(np.asarray(plan(interleave(z2))))
    ref2 = R.fft_nd(z2, [64, 16], "forward")
    assert_close(y2.real, ref2.real, label="mp-2d.re")
    # dct matmul route under the knob
    pd = W.create_plan(type="dct2", shape=[8], batch=4,
                      tuning={"matmulPrecision": "high"})
    xr = rng.standard_normal((4, 8))
    yd = np.asarray(pd(xr.astype(np.float32)))
    refd = R.dct_nd(xr, [8], "dct2", "forward", "none")
    assert_close(yd, refd, label="mp-dct")


def test_fftconv_webgpu_tuning_knobs_recorded():
    """fftConv.tuning.{pointwiseChunkElements, extractCopyChunkElements}
    chunk WebGPU dispatches in the reference (fftconv.js:283-305); XLA
    fuses those passes, so they are accepted and RECORDED as no-op route
    reasons — never silently dropped (VERDICT r2 #3)."""
    plan = W.create_plan(
        type="fftconv", shape=[32],
        fftConv={"boundary": "circular",
                 "tuning": {"pointwiseChunkElements": 4096,
                            "extractCopyChunkElements": 8192}})
    for key in ("pointwiseChunkElements", "extractCopyChunkElements"):
        assert (f"ignored-webgpu-knob:fftConv.tuning.{key}"
                in plan.route.reasons), plan.route.reasons
    with pytest.raises(W.PlanError, match="fftConv.tuning"):
        W.create_plan(type="fftconv", shape=[32],
                      fftConv={"tuning": {"warpSpeed": 9}})


def test_every_spec_field_is_consumed_or_recorded():
    """Meta-test against accepted-but-inert option drift (VERDICT r2 #2):
    every field of every spec dataclass must be either consumed by some
    module outside spec.py (builders, policy, plans, cache) or carried by
    the recorded-knob machinery.  A new spec field with no consumer fails
    here the day it is added."""
    import dataclasses as dc
    import pathlib
    import re

    import webgpufft_tpu.spec as S

    pkg = pathlib.Path(S.__file__).resolve().parent
    outside = "\n".join(
        p.read_text() for p in pkg.rglob("*.py")
        if p.name != "spec.py" and "__pycache__" not in p.parts)
    spec_classes = [S.PlanSpec, S.TuningSpec, S.FftConvSpec, S.Conv2dSpec,
                    S.LayoutSpec, S.IoViewSpec, S.IoViewSide, S.ZeroPadSpec,
                    S.ZeroPadStage, S.ChannelLane]
    # fields whose whole job is performed inside spec.py's normalization
    # and recorded via the route-reason machinery
    recorded = {"ignored_webgpu_knobs"}
    missing = []
    for cls in spec_classes:
        for f in dc.fields(cls):
            if f.name in recorded:
                continue
            if not re.search(rf"\b{re.escape(f.name)}\b", outside):
                missing.append(f"{cls.__name__}.{f.name}")
    assert not missing, (
        f"spec fields accepted but consumed nowhere outside spec.py: "
        f"{missing} — implement, record as a route reason, or reject")


def test_max_fused_elements_caps_fused_line():
    """maxFusedElements (the reference's VMEM line budget analog) caps the
    fused path's line length — caught inert by the spec-field meta-test."""
    from webgpufft_tpu.runtime.policy import fused_eligibility
    ok, _ = fused_eligibility(normalize_spec(
        {"type": "c2c", "shape": [64], "batch": 64,
         "tuning": {"impl": "pallas-auto"}}))
    capped, reasons = fused_eligibility(normalize_spec(
        {"type": "c2c", "shape": [64], "batch": 64,
         "tuning": {"impl": "pallas-auto", "maxFusedElements": 32}}))
    assert ok and not capped
    assert "line-exceeds-max-fused-elements" in reasons


def test_pallas_gate_consulted_by_auto(monkeypatch):
    """impl='auto' consults the recorded Pallas-vs-XLA gate verdict
    (VERDICT r2 #3b): the shipped verdict keeps XLA with the measured
    speedup cited; a recorded pallas win on the matching backend flips
    auto to the fused path with no code change."""
    import jax

    from webgpufft_tpu.runtime import policy

    gate = policy.load_pallas_gate()
    assert gate.get("winner") == "xla"           # shipped r2 verdict
    spec = normalize_spec({"type": "c2c", "shape": [64], "batch": 64})
    ok, reasons = policy.fused_eligibility(spec)
    assert not ok and any("gate:xla" in r for r in reasons), reasons
    # simulate a stack where the re-probe recorded a pallas win
    monkeypatch.setitem(policy._PALLAS_GATE_CACHE, "v",
                        {"winner": "pallas", "speedup": 1.5,
                         "backend": jax.default_backend()})
    ok, reasons = policy.fused_eligibility(spec)
    assert ok and any("pallas-gate-win" in r for r in reasons), reasons
    # a verdict from a DIFFERENT backend must not flip this process
    monkeypatch.setitem(policy._PALLAS_GATE_CACHE, "v",
                        {"winner": "pallas", "speedup": 1.5,
                         "backend": "tpu-v99"})
    ok, reasons = policy.fused_eligibility(spec)
    assert not ok and any("gate-backend" in r for r in reasons), reasons


def test_pallas_gate_probe_runs(monkeypatch, tmp_path):
    """The one-command gate probe measures, decides, and writes the
    verdict file impl='auto' reads (smoke on CPU: tiny config, no write
    to the shipped file)."""
    from webgpufft_tpu.runtime import pallas_gate

    v = pallas_gate.run_gate(configs=((64, 64),), trials=1, write=False)
    assert v["winner"] in ("xla", "pallas")
    assert v["measured"], v


def test_option_dict_typos_rejected():
    """Unknown keys in structured option dicts raise instead of silently
    doing nothing (r4: a nested layout={'input': {...}} dict parsed to an
    all-defaults LayoutSpec without a whisper)."""
    import pytest
    cases = [
        {"type": "c2c", "shape": [16], "layout": {"input": {"strides": [1]}}},
        {"type": "c2c", "shape": [16], "ioView": {"inptu": {"shape": [8]}}},
        {"type": "c2c", "shape": [16],
         "zeroPad": {"raed": {"start": [0], "end": [8]}}},
        {"type": "fftconv", "shape": [16], "fftConv": {"boundry": "circular"}},
        {"type": "c2c", "shape": [16], "ioView": {"input": {"shpae": [8]}}},
    ]
    for opts in cases:
        with pytest.raises(W.PlanError):
            W.create_plan(opts)
