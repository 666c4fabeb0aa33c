"""webgpufft_tpu — a TPU-native spectral transform framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the WebGPU FFT
library at MaximEremenko/WebGPU-FFT: plan-based ND FFTs (c2c/r2c/c2r),
DCT/DST types 1-4, FFT convolution with boundary modes and channel-lane
routing, and direct small conv2d — re-architected for TPU hardware
(MXU matmul FFT stages, VMEM-fused Pallas kernels, ICI sharding via
jax.sharding) rather than translated from WGSL compute shaders.

Public API (reference: src/index.js / src/public_api.js / docs/API.md):

    plan = create_plan({"type": "c2c", "shape": [1024], "direction": "forward",
                        "batch": 4096, "normalize": "none"})
    y = plan(x)                      # x: float32 (batch, *shape, 2) interleaved
    y = plan.exec(x, kernel=k)       # fftconv / conv2d

Beyond the reference surface:

    from webgpufft_tpu import fft as wfft      # numpy/scipy-style facade
    Y = wfft.fft(z); S = wfft.welch(x)         # full numpy.fft + scipy.signal

    plan = create_distributed_plan(opts, mesh=mesh,   # multi-chip (ICI)
                                   batch_axis="dp", seq_axis="sp")
    blob = export_plan(plan)                   # AOT serving artifacts

Complex tensors are interleaved float32 with a trailing component dim
([..., 0]=re, [..., 1]=im) — byte-compatible with the reference's
interleaved storage, and the natural layout for the TPU's real-valued MXU.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

from .spec import PlanError, PlanSpec, normalize_spec
from .plans.base import Plan, RouteInfo
from .runtime.cache import (
    PlanCache,
    default_cache,
    enable_persistent_compilation_cache,
    export_plan_cache_snapshot,
    import_plan_cache_snapshot,
)
from .runtime.aot import (ExportedPlan, ExportedPipeline,  # noqa: E501
                          export_distributed_plan, export_plan,
                          export_pipeline, load_exported_pipeline,
                          load_exported_plan)
from .core.cplx import interleave, uninterleave
from .utils.bufferview import BufferView

__version__ = "0.11.0"


def upload_complex(z, device=None):
    """numpy complex array -> device-resident interleaved f32 array
    (reference: uploadComplex, src/utils/webgpu.js:9-23)."""
    import jax
    import jax.numpy as jnp
    x = jnp.asarray(interleave(__import__("numpy").asarray(z)))
    return jax.device_put(x, device) if device is not None else x


def download_complex(x):
    """Device interleaved array -> numpy complex128
    (reference: downloadComplex, src/utils/webgpu.js:29-55)."""
    import numpy as _np
    return uninterleave(_np.asarray(x))

__all__ = [
    "create_plan", "create_fft_plan", "Plan", "PlanSpec", "PlanError",
    "RouteInfo", "PlanCache", "default_cache",
    "export_plan_cache_snapshot", "import_plan_cache_snapshot",
    "enable_persistent_compilation_cache",
    "create_fftconv_channel_lane_preset",
    "create_fftconv_kernel_major_channel_lane_preset",
    "create_fftconv_batch_major_channel_lane_preset",
    "export_plan", "export_distributed_plan", "load_exported_plan",
    "export_pipeline", "load_exported_pipeline", "ExportedPipeline",
    "ExportedPlan",
    "interleave", "uninterleave", "BufferView",
    "upload_complex", "download_complex",
    "create_distributed_plan",
    "fft", "fftapi", "ndimage", "filtering", "iirdesign", "waveforms",
    "peaks", "ltisys", "splines", "windows", "ShortTimeFFT",
    "ScipyFftBackend", "scipy_fft_backend", "install_scipy_fft_backend",
    "uninstall_scipy_fft_backend", "torch_fft", "fftpack", "pyfftw",
    "nufft", "linalg",
]


def create_distributed_plan(opts=None, *, mesh, batch_axis=None,
                            seq_axis=None, **kwargs):
    """Multi-chip plan from reference-style options (new TPU layer; see
    parallel/plans.py).  ``mesh`` is a jax.sharding.Mesh; ``batch_axis``
    shards the batch (data parallel), ``seq_axis`` distributes single
    transforms over chips (all_to_all digit exchange over ICI)."""
    from .parallel.plans import create_distributed_plan as _impl
    return _impl(opts, mesh=mesh, batch_axis=batch_axis, seq_axis=seq_axis,
                 **kwargs)


def _build_plan(spec: PlanSpec) -> Plan:
    """Dispatch a normalized spec to its plan builder
    (reference: src/runtime/create_plan.js:12-23)."""
    t = spec.plan_type
    if t == "c2c":
        from .plans.transforms import build_c2c
        return build_c2c(spec)
    if t == "r2c":
        from .plans.transforms import build_r2c
        return build_r2c(spec)
    if t == "c2r":
        from .plans.transforms import build_c2r
        return build_c2r(spec)
    if t.startswith("dct") or t.startswith("dst"):
        from .plans.transforms import build_dct
        return build_dct(spec)
    if t == "fftconv":
        from .plans.fftconv import build_fftconv
        return build_fftconv(spec)
    if t == "conv2d":
        from .plans.conv2d import build_conv2d
        return build_conv2d(spec)
    raise PlanError(f"unknown plan type {t!r}")


def create_plan(opts: Optional[Dict[str, Any]] = None, *,
                cache: Optional[PlanCache] = None, **kwargs) -> Plan:
    """Create (or fetch from cache) an executable transform plan.

    Accepts a reference-style options dict and/or keyword arguments; see
    docs/API.md for the full surface.

    A reference-style ``cache`` OPTION may carry a snapshot to prewarm from
    (reference: createPlan cache.snapshot, docs/API.md:316-323):
    ``create_plan({..., "cache": {"snapshot": snap}})`` imports the snapshot
    into the active plan cache before building.
    """
    merged = dict(opts or {})
    merged.update(kwargs)
    if isinstance(cache, dict):
        # cache given as a KEYWORD in reference-option style
        # (create_plan(..., cache={'snapshot': snap})) — it is the option,
        # not a PlanCache
        if "cache" in merged:
            raise PlanError(
                "cache option given both in the options dict and as a "
                "keyword; pass it once")
        merged["cache"] = cache
        cache = None
    target = cache if cache is not None else default_cache()
    copt = merged.pop("cache", None)
    if copt is not None:
        if not isinstance(copt, dict):
            raise PlanError("cache option must be a dict (e.g. {'snapshot': snap})")
        snap = copt.get("snapshot")
        if snap is not None:
            import_plan_cache_snapshot(snap, cache=target)
    spec = normalize_spec(merged)
    if spec.tuning.rigor == "measure":
        # FFTW_MEASURE-style planner: time route candidates on the live
        # device and build the winner (runtime/measure.py); the decision
        # caches on the PlanCache and persists through snapshots.
        from .runtime.measure import run_measure
        spec, notes, built = run_measure(spec, target)
        fresh = target.get(spec) is None
        if built is not None:
            target.adopt(spec, built)    # reuse the compiled winner
        plan = target.get_or_create(spec)
        if fresh and notes:
            # annotate only a plan this call created — a cache-shared plan
            # may already be held by estimate-rigor callers whose route
            # metadata must not change under them
            import dataclasses as _dc
            plan.route = _dc.replace(
                plan.route, reasons=plan.route.reasons + tuple(
                    n for n in notes if n not in plan.route.reasons))
        return plan
    return target.get_or_create(spec)


def create_fft_plan(opts: Optional[Dict[str, Any]] = None, **kwargs) -> Plan:
    """Low-level alias constrained to c2c (reference exposes createFftPlan as
    the low-level mixed-radix engine, src/plan.js:1298)."""
    merged = dict(opts or {})
    merged.update(kwargs)
    merged.setdefault("type", "c2c")
    if merged["type"] != "c2c":
        raise PlanError("create_fft_plan builds c2c plans only")
    return create_plan(merged)


# ---------------------------------------------------------------------------
# FFTConv channel-lane preset helpers
# (reference: src/runtime/fftconv_channel_lane_presets.js:139-206)
# ---------------------------------------------------------------------------

def _lane_fragment(d: Dict[str, Any], output_side: bool) -> Dict[str, Any]:
    if not isinstance(d, dict) or "channels" not in d:
        raise PlanError("channel-lane descriptor requires 'channels'")
    out = {"channels": int(d["channels"])}
    for k in ("channelIndex", "channelStrideElements", "batchStrideElements",
              "offsetElements"):
        if k in d:
            out[k] = int(d[k])
    if output_side and "kernelStepChannels" in d:
        out["kernelStepChannels"] = int(d["kernelStepChannels"])
    return out


def create_fftconv_channel_lane_preset(opts: Dict[str, Any]) -> Dict[str, Any]:
    """Build a validated fftconv channelPolicy plan fragment.

    Returns a dict merging into create_plan options:
    ``create_plan({"type": "fftconv", **preset})``.
    """
    shape = list(opts["shape"])
    batch = int(opts.get("batch", 1))
    layout = opts.get("layout")
    if layout is not None:
        extra = set(layout) - {"interleavedComplex"}
        if extra:
            raise PlanError(f"preset layout must not include stride/whdcn fields: {extra}")
    frag: Dict[str, Any] = {
        "shape": shape,
        "batch": batch,
        "fftConv": {
            "mode": opts.get("mode", "convolution"),
            "boundary": opts.get("boundary", "circular"),
            "kernelCount": int(opts.get("kernelCount", 1)),
            "channelPolicy": {
                "input": _lane_fragment(opts["input"], False),
                "output": _lane_fragment(opts["output"], True),
            },
        },
    }
    if "kernelShape" in opts:
        frag["fftConv"]["kernelShape"] = list(opts["kernelShape"])
    if "outputLayout" in opts:
        frag["fftConv"]["outputLayout"] = opts["outputLayout"]
    return frag


def create_fftconv_kernel_major_channel_lane_preset(opts: Dict[str, Any]) -> Dict[str, Any]:
    frag = create_fftconv_channel_lane_preset({**opts, "outputLayout": "kernel-major"})
    return frag


def create_fftconv_batch_major_channel_lane_preset(opts: Dict[str, Any]) -> Dict[str, Any]:
    frag = create_fftconv_channel_lane_preset({**opts, "outputLayout": "batch-major"})
    return frag


# numpy/scipy-style functional façade: webgpufft_tpu.fft.fft(x) etc.
# (module import is cheap — plans build lazily inside the functions)
from . import fftapi  # noqa: E402
from . import ndimage  # noqa: E402
from . import filtering  # noqa: E402
from . import iirdesign  # noqa: E402
from . import waveforms  # noqa: E402
from . import peaks  # noqa: E402
from . import ltisys  # noqa: E402
from . import splines  # noqa: E402
from . import windows  # noqa: E402
from .shorttime import ShortTimeFFT  # noqa: E402
from .scipy_backend import (ScipyFftBackend, scipy_fft_backend,  # noqa: E402
                            install_scipy_fft_backend,
                            uninstall_scipy_fft_backend)
from . import torch_fft  # noqa: E402  (torch itself imports lazily)
from . import fftpack  # noqa: E402  (legacy scipy.fftpack surface)
from . import pyfftw  # noqa: E402  (pyfftw-compatible bridge)
from . import nufft  # noqa: E402  (non-uniform FFT, finufft-style)
from . import linalg  # noqa: E402  (FFT-based scipy.linalg surface)
fft = fftapi
