"""Tracing / profiling hooks.

The reference ships no tracing at all (SURVEY.md §5: wall-clock around
queue.submit only); per the build mandate the TPU framework does better from
day one:

- ``trace(path)``: context manager around ``jax.profiler.trace`` producing a
  TensorBoard/xprof trace of everything executed inside.
- ``annotate(name)``: ``jax.profiler.TraceAnnotation`` wrapper so plan-level
  phases show up as named spans inside device traces.
- ``plan_stats(plan, x)``: static cost introspection of a plan's jitted
  executable (XLA cost analysis: flops, bytes accessed) plus the analytical
  roofline model from runtime/profile.py.
"""

from __future__ import annotations

import contextlib
from typing import Any, Dict, Optional

import jax

from . import profile as _profile


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture an xprof/TensorBoard trace of the enclosed execution."""
    with jax.profiler.trace(log_dir):
        yield


def annotate(name: str):
    """Named span inside device traces (usable as context manager)."""
    return jax.profiler.TraceAnnotation(name)


def plan_stats(plan, *example_args) -> Dict[str, Any]:
    """Compile the plan for the given example args and report XLA's cost
    analysis next to the analytical model.

    Returns {flops, bytes_accessed, model_flops, model_min_bytes,
    arithmetic_intensity} where available (fields may be absent on backends
    without cost analysis).
    """
    import jax.numpy as jnp

    args = [a if not isinstance(a, jnp.ndarray) else a for a in example_args]
    lowered = jax.jit(plan._fn).lower(plan._consts, *args)
    compiled = lowered.compile()
    out: Dict[str, Any] = {}
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        out["flops"] = ca.get("flops")
        out["bytes_accessed"] = ca.get("bytes accessed", ca.get("bytes_accessed"))
    except Exception:
        pass
    spec = plan.spec
    out["model_flops"] = _profile.fft_flops(spec.n_total, spec.batch)
    out["model_min_bytes"] = _profile.fft_min_bytes(spec.n_total, spec.batch)
    fl, by = out.get("flops"), out.get("bytes_accessed")
    if fl and by:
        out["arithmetic_intensity"] = fl / by
    return out


def memory_stats() -> Optional[Dict[str, Any]]:
    """Device memory statistics when the backend exposes them."""
    dev = jax.devices()[0]
    try:
        return dev.memory_stats()
    except Exception:
        return None
