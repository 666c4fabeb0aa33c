"""Execution-route policy: which implementation serves a plan.

TPU reinterpretation of the reference's large-routing policy
(src/runtime/large_policy.js:301-450).  The reference routes around WebGPU
binding-size limits (normal / large-chunk / out-of-core four-step); on TPU
those limits do not exist — XLA tiles HBM-resident tensors freely — so the
real routing decision is *which kernel strategy* runs the hot path:

- "pallas-fused":  whole lines resident in VMEM, one fused kernel per
                   transform (the analog of the reference's subgroup
                   fast path, src/plan.js:1401-1447, but for whole plans).
- "xla":           staged einsum pipeline (general: any rank, any axis kind,
                   arbitrary staging) — the analog of the per-stage pass
                   chain.
- "four-step-hbm": lines too large for VMEM are decomposed so sub-lines
                   stream through VMEM (analog of the reference's
                   out-of-core four-step, c2c.js:3386-3549).

Reason codes are recorded for structural tests, mirroring the reference's
`reasonCodes`/`attemptedRoutes` diagnostics.
"""

from __future__ import annotations

from typing import List, Tuple

from ..spec import PlanSpec

# v5e VMEM is ~128 MiB but a practical per-kernel working set (operands +
# scratch + double buffering) should stay well under it.
VMEM_BUDGET_BYTES = 64 * 1024 * 1024
FUSED_MAX_SUB = 128        # sub-DFT matrices must tile the MXU
FUSED_MIN_BATCH = 8        # grid needs enough lines to tile the sublane dim


_PALLAS_GATE_CACHE: dict = {}


def load_pallas_gate() -> dict:
    """The recorded Pallas-vs-XLA decision-gate verdict (written by
    ``python -m webgpufft_tpu.runtime.pallas_gate`` — the one-command
    re-probe run at the top of each round).  ``impl:"auto"`` consults it:
    the day a stack bump makes the fused kernel win on TPU, the recorded
    winner flips and auto routes to Pallas with no code change."""
    if "v" not in _PALLAS_GATE_CACHE:
        import json
        import os
        path = os.path.join(os.path.dirname(__file__), "pallas_gate.json")
        try:
            with open(path) as f:
                _PALLAS_GATE_CACHE["v"] = json.load(f)
        except Exception:
            _PALLAS_GATE_CACHE["v"] = {}
    return _PALLAS_GATE_CACHE["v"]


def _auto_prefers_pallas() -> Tuple[bool, str]:
    """(flip, reason) for impl='auto' from the recorded gate verdict."""
    gate = load_pallas_gate()
    winner = gate.get("winner")
    if winner is None:
        return False, "impl-auto-prefers-xla"
    if winner != "pallas":
        return False, (f"impl-auto-prefers-xla(gate:{winner}"
                       f"@{gate.get('speedup', 0):.2f}x)")
    import jax
    if jax.default_backend() != gate.get("backend"):
        return False, (f"impl-auto-prefers-xla(gate-backend:"
                       f"{gate.get('backend')})")
    return True, f"pallas-gate-win@{gate.get('speedup', 0):.2f}x"


def fused_eligibility(spec: PlanSpec) -> Tuple[bool, List[str]]:
    """Can the fused Pallas path serve this plan's core transform?"""
    import math as _math

    reasons: List[str] = []
    t = spec.tuning
    if t.impl == "xla":
        return False, ["impl-forced-xla"]
    win_note = None
    if t.impl == "auto":
        flip, reason = _auto_prefers_pallas()
        if not flip:
            return False, [reason]
        win_note = reason        # gate says pallas wins: check eligibility
    if spec.plan_type != "c2c":
        reasons.append("fused-requires-c2c")
    if spec.precision != "f32":
        reasons.append("fused-requires-f32")
    from ..core import fused
    n_last = spec.shape[-1]
    lines = spec.batch * _math.prod(spec.shape[:-1])
    if not fused.supports_length(n_last, t):
        reasons.append("fused-unsupported-length")
    if lines < FUSED_MIN_BATCH:
        reasons.append("fused-batch-too-small")
    budget = t.vmem_limit_bytes or fused.DEFAULT_VMEM_BUDGET
    if n_last * 12 * 8 > budget:
        reasons.append("line-exceeds-vmem-budget")
    if t.max_fused_elements is not None and n_last > t.max_fused_elements:
        reasons.append("line-exceeds-max-fused-elements")
    if not reasons:
        tile = t.batch_tile or fused.pick_batch_tile(lines, n_last, budget)
        if tile is None or lines % tile != 0 or tile < 1:
            reasons.append("fused-no-batch-tile")
    if not reasons and win_note:
        return True, [win_note]
    return not reasons, reasons


def knob_reasons(spec: PlanSpec) -> Tuple[str, ...]:
    """Route reasons recording reference WebGPU-only tuning knobs that were
    accepted as no-ops (spec.WEBGPU_ONLY_TUNING_KEYS), plus any non-default
    MXU contraction precision in effect."""
    out = tuple(f"ignored-webgpu-knob:{k}"
                for k in spec.tuning.ignored_webgpu_knobs)
    if spec.tuning.matmul_precision != "highest":
        out = out + (f"mxu-precision:{spec.tuning.matmul_precision}",)
    return out


def resolve_route(spec: PlanSpec, axis_kinds: Tuple[str, ...]):
    from ..plans.base import RouteInfo

    attempts: List[str] = []
    knobs = knob_reasons(spec)
    ok, reasons = fused_eligibility(spec)
    attempts.append("pallas-fused")
    if ok:
        return RouteInfo(mode="pallas-fused", impl="pallas",
                         axis_kinds=axis_kinds, reasons=tuple(reasons) + knobs,
                         attempts=tuple(attempts))
    attempts.append("xla")
    return RouteInfo(mode="xla", impl="xla", axis_kinds=axis_kinds,
                     reasons=tuple(reasons) + knobs, attempts=tuple(attempts))
