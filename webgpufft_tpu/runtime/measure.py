"""Measured plan selection — the TPU analog of FFTW's ``FFTW_MEASURE``.

``tuning.rigor`` selects the planner effort:

- ``"estimate"`` (default): build the statically-policied plan (the
  reference's behavior — its plan.js routes purely on static rules).
- ``"measure"``: additionally build a small set of route-alternative
  candidates, time each ON THE LIVE DEVICE with the alternating-trials
  protocol (docs/PERFORMANCE.md — tunnel throughput swings minute to
  minute, so candidates are timed round-robin in one session and
  compared best-of), and return the fastest.

Measured decisions are cached on the PlanCache keyed by
(backend, device kind, normalized spec), and persist through plan-cache
snapshots (schema v3), so a serving process prewarmed from a snapshot
reuses the measured winner without re-timing.  The static policy is the
noise-guarded default: a candidate must beat the as-requested
configuration by >3% to displace it.

The candidate set explores the decisions the static policy makes from
thresholds rather than physics:

- ``impl``: XLA einsum pipeline vs the fused Pallas kernel (when
  structurally eligible) — the static gate is a stack-global verdict
  (runtime/pallas_gate.py); measuring decides per-plan.
- four-step HBM decomposition on vs off (static gate: n >= 2^16) — per
  size/batch the crossover moves.
- ``maxSubLength`` 16/32/64 — stage count vs per-stage MAC balance.

Measurement dispatches real device work at plan-build time (like
FFTW_MEASURE, it is deliberately slow once); keep it out of latency-
critical paths and let the cache/snapshot amortize it.  Inside a jit
trace measuring is impossible (no concrete device execution), so
rigor="measure" degrades to the static policy with route reason
``measure-deferred-under-trace``.
"""

from __future__ import annotations

import dataclasses
import json
import math
import time
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from ..spec import PlanSpec, spec_to_dict, validate_tuning

# Candidates must beat the as-requested config by this factor to win
# (tunnel timing noise within an alternating round is a few percent).
WIN_MARGIN = 1.03
# Alternating rounds x per-round reps; small on purpose — plan build is
# the wrong place for long benchmarks, and the tunnel rules require
# bounded in-flight work.
MEASURE_ROUNDS = 2
MEASURE_UNROLL = 4
MEASURE_REPS = 2
# Do not attempt the sub-length sweep on tiny transforms: the stage
# tables are identical below 16 and the timing is all dispatch overhead.
SUBLEN_MIN_AXIS = 128
# Axes at/above this may be four-step decomposed when forced; keep the
# toggle candidates out of small plans where the route can never apply.
FOURSTEP_CANDIDATE_MIN_AXIS = 1 << 12


def _replace_tuning(spec: PlanSpec, **overrides) -> PlanSpec:
    return dataclasses.replace(
        spec, tuning=dataclasses.replace(spec.tuning, **overrides))


def strip_rigor(spec: PlanSpec) -> PlanSpec:
    """The concrete spec a measured plan is keyed/built under."""
    if spec.tuning.rigor == "estimate":
        return spec
    return _replace_tuning(spec, rigor="estimate")


def measure_key(spec: PlanSpec) -> str:
    """Stable cache key: device identity + the full normalized spec."""
    import jax
    dev = jax.devices()[0]
    ident = f"{jax.default_backend()}/{getattr(dev, 'device_kind', dev)}"
    return ident + "|" + json.dumps(spec_to_dict(strip_rigor(spec)),
                                    sort_keys=True, default=str)


def candidate_overrides(spec: PlanSpec) -> List[Tuple[str, Dict[str, Any]]]:
    """(description, tuning-overrides) candidates, baseline first."""
    from .policy import fused_eligibility

    t = spec.tuning
    cands: List[Tuple[str, Dict[str, Any]]] = [("as-requested", {})]
    # impl flip: only explore when the user left the choice open
    if t.impl in ("auto", "pallas-auto"):
        ok, _ = fused_eligibility(_replace_tuning(spec, impl="pallas"))
        if ok:
            cands.append(("impl=pallas", {"impl": "pallas"}))
            cands.append(("impl=xla", {"impl": "xla"}))
    if spec.plan_type in ("c2c", "r2c", "c2r") and t.large_route == "auto" \
            and not t.disable_four_step \
            and max(spec.shape) >= FOURSTEP_CANDIDATE_MIN_AXIS:
        cands.append(("four-step=forced", {"large_route": "out-of-core"}))
        cands.append(("four-step=off", {"disable_four_step": True}))
    if max(spec.shape) >= SUBLEN_MIN_AXIS:
        for sub in (16, 32, 64):
            if sub != t.max_sub_length:
                cands.append((f"maxSubLength={sub}", {"max_sub_length": sub}))
    # No raised-chunk-bound candidate: bounds above the 2^22 default
    # miscompile SILENTLY on composed 3-D TPU routes (r8b round 2; r29
    # round 5 reproduced rel=1.33 at 2^25 on r2c 256^3 b3) and measured
    # slower at every flagship config (docs/BENCHMARKS.md r13) — the spec
    # validator now rejects them outright (spec.validate_tuning).  The
    # numeric cross-check in run_measure stays as defense-in-depth for
    # the remaining candidates.
    return cands


def _synth_input(plan) -> Optional[Any]:
    """A deterministic input matching the plan's expected shape/dtype, or
    None when the plan's exec contract is not a single dense array."""
    import jax.numpy as jnp
    from ..plans import stages

    if plan.needs_kernel or plan._expect_input is None:
        return None
    shape, _interleaved = plan._expect_input
    if shape == (None,):           # strided flat buffers: size not derivable
        return None
    rng = np.random.default_rng(0)
    x = rng.standard_normal(tuple(shape)).astype(np.float32)
    return jnp.asarray(x, dtype=stages.expect_dtype(plan.spec.precision))


# A route-alternative must numerically agree with the baseline plan before
# timing may select it (alternatives like chunkElements change the einsum
# decomposition, and the backend has a history of silent operand-size
# miscompiles — see benches/r8b_bound_validity.py).  Download is bounded to
# a strided sample so the check stays cheap through the tunnel.
AGREE_RTOL = 1e-4
AGREE_SAMPLES = 4096


def _output_sample(plan, x) -> Optional[np.ndarray]:
    """Bounded strided sample of the plan's output on x (f64 host copy)."""
    import jax.numpy as jnp

    y = plan._fn(plan._consts, x).ravel()
    stride = max(1, y.shape[0] // AGREE_SAMPLES)
    return np.asarray(y[::stride][:AGREE_SAMPLES], dtype=np.float64)


def _agrees(ref: np.ndarray, plan, x) -> bool:
    """True when plan's sampled output matches the baseline sample."""
    try:
        got = _output_sample(plan, x)
    except Exception:
        return False
    if got.shape != ref.shape:
        return False
    denom = max(float(np.linalg.norm(ref)), 1e-30)
    return float(np.linalg.norm(got - ref)) / denom <= AGREE_RTOL


def _chain_time(plan, x, *, unroll: int, reps: int) -> float:
    """Per-application seconds; same protocol as profile.unrolled_chain_time
    but tolerant of shape-changing transforms (r2c/c2r/dct with n=) by
    serializing applications through a scalar feedback term.  The feedback
    add costs one elementwise pass per application — identical across
    candidates, so relative comparisons stay valid."""
    import jax
    import jax.numpy as jnp
    from . import profile

    fn = lambda v: plan._fn(plan._consts, v)  # noqa: E731
    y0 = fn(x)
    if y0.shape == x.shape and y0.dtype == x.dtype:
        return profile.unrolled_chain_time(fn, x, unroll=unroll, reps=reps)

    @jax.jit
    def chain(v):
        s = jnp.zeros((), jnp.float32)
        for _ in range(unroll):
            y = fn(v + (s * 1e-30).astype(v.dtype))
            s = y[(0,) * y.ndim].astype(jnp.float32)
        return s

    s = float(chain(x))            # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        s = float(chain(x))        # scalar readback is the barrier
    return max((time.perf_counter() - t0) / reps / unroll, 1e-9)


def run_measure(spec: PlanSpec, cache):
    """Resolve a rigor="measure" spec to its measured-winner concrete spec.

    Returns (winner_spec, route_reason_notes, winner_plan_or_None) — the
    already-built winner plan is handed back so the caller can seed it
    into the PlanCache instead of rebuilding and re-jitting it.  Never
    raises on timing trouble: any failure degrades to the static policy
    with a reason, and degraded decisions are cached too so repeated
    measure-rigor calls do not re-pay candidate construction.
    """
    from .. import _build_plan

    base = strip_rigor(spec)
    try:
        from jax._src import core as _jax_core
        trace_clean = _jax_core.trace_state_clean()
    except Exception:
        # fail CLOSED: if the trace-state probe is unavailable we cannot
        # prove we are outside a trace, and timing inside one dispatches
        # device work on every retrace
        trace_clean = False
    if not trace_clean:
        return base, ("measure-deferred-under-trace",), None

    key = measure_key(spec)
    hit = cache.measured.get(key)
    if hit is not None:
        ov = hit.get("overrides") or {}
        note = hit.get("winner", "as-requested")
        try:
            # cached overrides may predate a validation tightening (e.g.
            # the round-5 chunkElements cap): re-validate before applying
            # so a stale snapshot cannot rebuild a now-forbidden config
            cached = _replace_tuning(base, **ov)
            validate_tuning(cached.tuning)
            return cached, (f"measured-cached:{note}",), None
        except Exception:
            del cache.measured[key]  # stale record: fall through, re-measure

    if spec.plan_type in ("fftconv", "conv2d"):
        # conv plans take kernel operands; their streaming-route gate is
        # already measured separately (benches/r4_os_gate.py)
        return base, (f"measure-unsupported:{spec.plan_type}",), None

    def settle(note: str):
        # a degraded decision is still a decision: cache it so repeated
        # measure-rigor calls on this spec skip candidate construction
        cache.measured[key] = {"winner": "as-requested", "overrides": {},
                               "note": note}
        return base, (note,), None

    cands = candidate_overrides(base)
    built = []
    seen_modes = set()
    for desc, ov in cands:
        if desc == "as-requested":
            p = _build_plan(base)        # a baseline failure is a real error
        else:
            try:
                p = _build_plan(_replace_tuning(base, **ov))
            except Exception:
                continue                 # ineligible candidate: skip
        sig = (p.route.mode, p.spec.tuning.max_sub_length,
               p.spec.tuning.chunk_elems)
        if desc != "as-requested" and not ov.get("max_sub_length") \
                and sig in seen_modes:
            continue                     # toggle was a no-op for this spec
        seen_modes.add(sig)
        built.append((desc, ov, p))
    x = _synth_input(built[0][2]) if built else None
    if x is None or len(built) < 2:
        return settle("measure-no-candidates")

    # Numeric gate: drop any alternative whose output diverges from the
    # baseline plan's on the synthetic input.  Timing alone must never pick
    # between routes that disagree (observed for chunkElements flips at
    # 256^3, benches/results_r3.jsonl r8_chunk rows with mid_ok:false).
    try:
        ref = _output_sample(built[0][2], x)
    except Exception:
        return settle("measure-failed")
    rejected = [d for d, _ov, p in built[1:] if not _agrees(ref, p, x)]
    if rejected:
        built = [b for b in built if b[0] not in rejected]
    if len(built) < 2:
        cache.measured[key] = {"winner": "as-requested", "overrides": {},
                               "note": "measure-all-candidates-diverged",
                               "rejected": rejected}
        return base, ("measure-all-candidates-diverged",), built[0][2]

    times: Dict[str, float] = {}
    try:
        for _ in range(MEASURE_ROUNDS):   # alternating trials, best-of
            for desc, _ov, p in built:
                dt = _chain_time(p, x, unroll=MEASURE_UNROLL,
                                 reps=MEASURE_REPS)
                times[desc] = min(times.get(desc, math.inf), dt)
    except Exception:
        return settle("measure-failed")

    base_dt = times[built[0][0]]
    win_desc, win_ov, win_plan = min(built, key=lambda b: times[b[0]])
    if times[win_desc] * WIN_MARGIN >= base_dt:
        win_desc, win_ov, win_plan = "as-requested", {}, built[0][2]
    records = {d: round(times[d] * 1e3, 4) for d in times}
    cache.measured[key] = {"winner": win_desc, "overrides": win_ov,
                           "trials_ms": records,
                           **({"rejected": rejected} if rejected else {})}
    speedup = base_dt / times.get(win_desc, base_dt)
    return (_replace_tuning(base, **win_ov),
            (f"measured-winner:{win_desc}@{speedup:.2f}x",), win_plan)
