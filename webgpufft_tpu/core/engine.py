"""ND transform assembly: per-axis plans + normalization.

The reference's plan layer walks axes issuing one compute pass per radix
stage (src/runtime/plans/c2c.js:3921-3967); here each logical axis is one
AxisPlan applied along its array axis, and XLA fuses the whole chain into a
handful of MXU contractions.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

from .axis import AxisPlan, build_axis_plan, slabbed_axis_apply
from ..utils.mathref import normalize_scale


def build_axis_plans(shape: Sequence[int], direction: str, tuning,
                     prefix: str = "ax") -> List[AxisPlan]:
    return [build_axis_plan(n, d, direction, tuning, f"{prefix}{d}")
            for d, n in enumerate(shape)]


def collect_consts(axis_plans: Sequence[AxisPlan]) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for ap in axis_plans:
        out.update(ap.consts())
    return out


def apply_nd(x, axis_plans: Sequence[AxisPlan], consts, batch_dims: int = 1,
             chunk_elems: int = None):
    """Apply per-axis transforms; logical axis d lives at array axis
    batch_dims + d of interleaved x (..., 2).

    Axes are applied in DESCENDING order (last axis first).  The
    transforms commute, and on TPU the order matters enormously: an
    early leading-axis (mid-form) pass poisons the layout every later
    last-axis pass sees — at 256^3 the ascending 3-axis chain ran 83 ms
    vs 33 ms descending, with pair probes isolating the axis0-then-last
    combination as the pathology (benches/r17c_triple_barrier.py,
    r17b/r17c rows in benches/results_r4.jsonl; optimization_barrier
    between passes does NOT fix it, so it is a layout-assignment effect,
    not an instruction-fusion one).
    """
    for d in range(len(axis_plans) - 1, -1, -1):
        ap = axis_plans[d]
        if ap.n == 1:
            continue  # length-1 axis is the identity
        x = slabbed_axis_apply(x, ap, batch_dims + d, consts, chunk_elems)
    return x


def plan_scale(normalize: str, direction: str, n_total: int) -> float:
    """Single per-plan scale factor (reference: common.js:35-40)."""
    return normalize_scale(normalize, direction, n_total)
