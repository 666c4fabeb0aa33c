"""Plan cache + snapshot persistence.

TPU analog of the reference's per-device pipeline cache and its versioned
snapshot export/import (reference: src/runtime/pipeline_cache.js:116-222).
Two layers:

1. ``PlanCache``: in-process memoization of built plans keyed by normalized
   spec (the reference keys shader modules by WGSL source string).
2. Snapshot: a JSON-serializable descriptor of every cached spec.  Importing
   a snapshot rebuilds (and therefore re-jits) those plans, prewarming both
   the plan constants and — when the persistent compilation cache is enabled
   via ``enable_persistent_compilation_cache`` — XLA's on-disk executable
   cache, which is the true analog of prewarmed driver pipelines.
"""

from __future__ import annotations

import time
from typing import Any, Dict, List, Optional

from ..spec import PlanSpec, spec_to_dict

SNAPSHOT_SCHEMA = "webgpufft-tpu.plan-cache"
# v1: bare spec list.  v2: adds framework metadata, reported in the
# diagnostic when a spec entry fails to rebuild (version drift).  v3
# (current): adds the measured-rigor decisions ("measured" — see
# runtime/measure.py) so serving processes reuse measured winners
# without re-timing.  Legacy snapshots are upgraded on import, mirroring
# the reference's legacy-version upgrade (pipeline_cache.js:39-114).
SNAPSHOT_VERSION = 3


class PlanCache:
    def __init__(self):
        self._plans: Dict[PlanSpec, Any] = {}
        # measured-rigor decisions: measure_key -> {winner, overrides,
        # trials_ms} (runtime/measure.py); exported in snapshots (v3)
        self.measured: Dict[str, Dict[str, Any]] = {}

    def get_or_create(self, spec: PlanSpec):
        plan = self._plans.get(spec)
        if plan is None:
            from .. import _build_plan
            plan = _build_plan(spec)
            self._plans[spec] = plan
        plan._plan_cache = self  # for plan.get_pipeline_cache_snapshot()
        return plan

    def get(self, spec: PlanSpec):
        return self._plans.get(spec)

    def adopt(self, spec: PlanSpec, plan) -> None:
        """Seed an externally-built plan (e.g. the measured-rigor winner,
        already compiled during timing) without rebuilding it."""
        self._plans.setdefault(spec, plan)
        plan._plan_cache = self

    def __len__(self):
        return len(self._plans)

    def clear(self):
        self._plans.clear()
        self.measured.clear()

    def specs(self) -> List[PlanSpec]:
        return list(self._plans.keys())


_default_cache = PlanCache()


def default_cache() -> PlanCache:
    return _default_cache


def export_plan_cache_snapshot(cache: Optional[PlanCache] = None) -> Dict[str, Any]:
    from .. import __version__
    cache = cache if cache is not None else _default_cache
    return {
        "schema": SNAPSHOT_SCHEMA,
        "version": SNAPSHOT_VERSION,
        "createdAtMs": int(time.time() * 1000),
        "metadata": {"plans": len(cache), "framework": f"webgpufft-tpu/{__version__}"},
        "specs": [spec_to_dict(s) for s in cache.specs()],
        "measured": dict(cache.measured),
    }


def upgrade_snapshot(snapshot: Dict[str, Any]) -> Dict[str, Any]:
    """Upgrade a legacy snapshot to the current version in place-of
    (reference: pipeline_cache.js legacy v1 -> v2 upgrade, :39-114)."""
    version = snapshot.get("version")
    if version == SNAPSHOT_VERSION:
        return snapshot
    if version == 1:
        up = dict(snapshot)
        up["version"] = 2
        meta = dict(up.get("metadata") or {})
        meta.setdefault("framework", "webgpufft-tpu/legacy-v1")
        up["metadata"] = meta
        return upgrade_snapshot(up)
    if version == 2:
        up = dict(snapshot)
        up["version"] = 3
        up.setdefault("measured", {})
        return up
    raise ValueError(f"unsupported snapshot version {version}")


def import_plan_cache_snapshot(snapshot: Dict[str, Any],
                               cache: Optional[PlanCache] = None,
                               build: bool = True) -> int:
    """Validate a snapshot (upgrading legacy versions) and (optionally)
    rebuild its plans to prewarm compilation.  Returns the number of specs
    accepted."""
    cache = cache if cache is not None else _default_cache
    if not isinstance(snapshot, dict) or snapshot.get("schema") != SNAPSHOT_SCHEMA:
        raise ValueError(f"unrecognized plan-cache snapshot schema: "
                         f"{snapshot.get('schema') if isinstance(snapshot, dict) else type(snapshot)}")
    snapshot = upgrade_snapshot(snapshot)
    framework = (snapshot.get("metadata") or {}).get("framework", "")
    count = 0
    for d in snapshot.get("specs", []):
        try:
            spec = _rebuild_spec(d)
        except Exception as e:
            raise ValueError(
                f"snapshot spec entry could not be rebuilt ({e!r}); the "
                f"snapshot may come from an incompatible framework version "
                f"(recorded: {framework or 'unknown'})")
        if build:
            cache.get_or_create(spec)
        count += 1
    measured = snapshot.get("measured")
    if isinstance(measured, dict):
        for k, v in measured.items():
            if isinstance(k, str) and isinstance(v, dict):
                cache.measured.setdefault(k, v)
    return count


def _rebuild_spec(d: Dict[str, Any]) -> PlanSpec:
    """Round-trip a dataclasses.asdict(PlanSpec) back into a PlanSpec."""
    from .. import spec as S

    def mk(cls, v):
        return None if v is None else cls(**v)

    lay = d.get("layout") or {}
    for k in ("input_strides", "output_strides"):
        if lay.get(k) is not None:
            lay[k] = tuple(lay[k])
    for k in ("whdcn_input", "whdcn_output"):
        if lay.get(k) is not None:
            lay[k] = S.ChannelLane(**lay[k])
    io = d.get("io_view") or {}
    io_sides = {}
    for side in ("input", "output"):
        v = io.get(side)
        if v is not None:
            v = dict(v)
            v["shape"] = tuple(v["shape"])
            v["offset"] = tuple(v["offset"])
            io_sides[side] = S.IoViewSide(**v)
        else:
            io_sides[side] = None
    zp = d.get("zero_pad") or {}
    zp_sides = {}
    for side in ("read", "write"):
        v = zp.get(side)
        zp_sides[side] = (S.ZeroPadStage(start=tuple(v["start"]), end=tuple(v["end"]))
                          if v is not None else None)
    fc = d.get("fft_conv")
    if fc is not None:
        # drop fields a newer schema removed (e.g. the r2-era inert
        # pointwise/extract chunk knobs) so old snapshots still load
        fc = {k: v for k, v in fc.items()
              if k in S.FftConvSpec.__dataclass_fields__}
        if fc.get("kernel_shape") is not None:
            fc["kernel_shape"] = tuple(fc["kernel_shape"])
        for k in ("channel_input", "channel_output"):
            if fc.get(k) is not None:
                fc[k] = S.ChannelLane(**fc[k])
        fc = S.FftConvSpec(**fc)
    conv = d.get("conv")
    if conv is not None:
        conv = dict(conv)
        if conv.get("pad") is not None:
            conv["pad"] = tuple(conv["pad"])
        conv = S.Conv2dSpec(**conv)
    tun = dict(d.get("tuning") or {})
    for k in ("force_bluestein_axes", "force_rader_axes", "ignored_webgpu_knobs"):
        tun[k] = tuple(tun.get(k, ()))
    # pre-matmulPrecision snapshots rebuild with the 'auto' default; resolve
    # it the same way normalize_spec does or the rebuilt spec can never hit
    # the cache key a live create_plan produces (prewarm would be lost).
    # validate_tuning guards against snapshots recorded under looser rules
    # (e.g. a chunkElements above the round-5 cap): such entries fail the
    # import with the version-incompatibility diagnostic below instead of
    # silently rebuilding a now-forbidden configuration.
    tuning = S.validate_tuning(
        S.resolve_auto_tuning(S.TuningSpec(**tun), d.get("precision", "f32")))
    return S.PlanSpec(
        plan_type=d["plan_type"], shape=tuple(d["shape"]),
        direction=d.get("direction", "forward"), batch=d.get("batch", 1),
        normalize=d.get("normalize", "none"), precision=d.get("precision", "f32"),
        in_place=d.get("in_place", False),
        layout=S.LayoutSpec(**lay) if lay else S.LayoutSpec(),
        io_view=S.IoViewSpec(**io_sides), zero_pad=S.ZeroPadSpec(**zp_sides),
        fft_conv=fc, conv=conv, tuning=tuning,
    )


def enable_persistent_compilation_cache(directory: str):
    """Point JAX's persistent compilation cache at ``directory`` so jitted
    plan executables survive process restarts (the closest TPU analog of the
    reference's shader-module snapshot prewarm)."""
    import jax
    jax.config.update("jax_compilation_cache_dir", directory)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
