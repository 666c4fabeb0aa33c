"""AOT plan export: serialize a plan's compiled pipeline for serving.

The production-deployment analog of the reference's pipeline-cache snapshot
(reference: src/runtime/pipeline_cache.js exports shader SOURCE for driver
prewarm): here the whole jitted pipeline — plan constants baked in — is
exported as a versioned StableHLO artifact via ``jax.export``.  A serving
process can load and run it without the plan builder, spec machinery, or
table precompute, and with jax's cross-version compatibility guarantees.

Artifact layout: 8-byte big-endian header length, JSON header (schema,
version, plan-spec descriptor, platforms, i/o shape metadata), then the
raw ``jax.export`` payload.
"""

from __future__ import annotations

import json
from typing import Any, Dict, Optional


from ..spec import PlanError, spec_to_dict

AOT_SCHEMA = "webgpufft-tpu.aot-plan"
AOT_VERSION = 1


def _example_structs(plan, input_length: Optional[int],
                     complex_input: bool):
    import jax
    import jax.numpy as jnp

    spec = plan.spec
    if plan._expect_input is None:
        # conv2d: input is (batch, Hin, Win[, 2]), real/complex decided at
        # trace time — the exported artifact pins one via complex_input
        shape = ((spec.batch,) + tuple(plan.in_shape)
                 + ((2,) if complex_input else ()))
    else:
        expect, interleaved = plan._expect_input
        if expect == (None,):
            if input_length is None:
                raise PlanError(
                    "export_plan: this plan has a flat-layout input side; pass "
                    "input_length= (flat element count) to fix the traced shape")
            shape = (input_length, 2) if interleaved else (input_length,)
        else:
            shape = tuple(expect)
    from ..plans import stages
    x = jax.ShapeDtypeStruct(shape, stages.expect_dtype(spec.precision))
    if not plan.needs_kernel:
        return (x,), {"input": list(shape)}
    fc = spec.fft_conv
    if fc is not None:
        kshape = tuple(fc.kernel_shape) if fc.kernel_shape is not None else spec.shape
        k = jax.ShapeDtypeStruct((fc.kernel_count,) + kshape + (2,), jnp.float32)
    elif spec.conv is not None:
        ks = spec.conv.kernel_size
        comps = (2,) if spec.conv.kernel_type == "complex" else ()
        k = jax.ShapeDtypeStruct((ks, ks) + comps, jnp.float32)
    else:  # pragma: no cover - only fftconv/conv2d need kernels
        raise PlanError("export_plan: unknown kernel-taking plan type")
    return (x, k), {"input": list(shape), "kernel": list(k.shape)}


def export_plan(plan, *, input_length: Optional[int] = None,
                complex_input: bool = True,
                path: Optional[str] = None) -> bytes:
    """Serialize ``plan``'s pipeline (constants baked) for the CURRENT
    backend platform.  Returns the artifact bytes; also writes ``path``
    when given.

    The exported function has the plan's canonical signature — ``f(x)`` or
    ``f(x, kernel)`` — with concrete shapes (use ``input_length`` for
    flat-layout input sides; ``complex_input`` pins conv2d's real-vs-
    complex data mode).  Runtime exec offsets and ``out=`` merging are
    build-time features and are not part of the exported artifact.
    """
    import jax
    from jax import export as jexport

    consts = plan._consts
    if plan.needs_kernel:
        def fn(x, kernel):
            return plan._fn(consts, x, plan._coerce_kernel(kernel))
    else:
        def fn(x):
            return plan._fn(consts, x)

    args, shape_meta = _example_structs(plan, input_length, complex_input)
    exp = jexport.export(jax.jit(fn))(*args)
    payload = exp.serialize()
    header = json.dumps({
        "schema": AOT_SCHEMA,
        "version": AOT_VERSION,
        "spec": spec_to_dict(plan.spec),
        "platforms": list(exp.platforms),
        "shapes": shape_meta,
        "route_mode": plan.route.mode,
    }).encode("utf-8")
    blob = len(header).to_bytes(8, "big") + header + bytes(payload)
    if path is not None:
        with open(path, "wb") as f:
            f.write(blob)
    return blob


def export_distributed_plan(dplan, *, path: Optional[str] = None) -> bytes:
    """Serialize a sequence-parallel DistributedPlan's whole multi-chip
    pipeline (collectives included) as a versioned ``jax.export`` artifact.

    The artifact records the mesh axes and device count; a serving process
    loads it with :func:`load_exported_plan` and calls it with inputs
    placed on an equivalent mesh (``ep(x, mesh=serving_mesh)`` places the
    batch sharding automatically).  Batch-sharded (dp-only) plans wrap a
    local plan — export that with :func:`export_plan` instead.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    if getattr(dplan, "seq_axis", None) is None:
        raise PlanError(
            "export_distributed_plan: a batch-sharded (dp-only) plan wraps "
            "the local single-chip plan; export that plan with export_plan "
            "and shard its inputs at serving time")
    spec = dplan.spec
    t = spec.plan_type
    if t == "c2r":
        shape = (spec.batch, spec.shape[0] // 2 + 1, *spec.shape[1:], 2)
    elif t == "r2c" or t.startswith(("dct", "dst")):
        shape = (spec.batch, *spec.shape)
    else:
        shape = (spec.batch,) + tuple(spec.shape) + (2,)
    x = jax.ShapeDtypeStruct(shape, jnp.float32)
    args = (x,)
    shape_meta: Dict[str, Any] = {"input": list(shape)}
    if dplan.needs_kernel:
        fc = spec.fft_conv
        kshape = (tuple(fc.kernel_shape) if fc.kernel_shape is not None
                  else spec.shape)
        k = jax.ShapeDtypeStruct((fc.kernel_count,) + kshape + (2,),
                                 jnp.float32)
        args = (x, k)
        shape_meta["kernel"] = list(k.shape)
    exp = jexport.export(dplan._jit)(*args)
    header = json.dumps({
        "schema": AOT_SCHEMA,
        "version": AOT_VERSION,
        "spec": spec_to_dict(spec),
        "platforms": list(exp.platforms),
        "shapes": shape_meta,
        "route_mode": dplan.route.mode,
        "distributed": {
            "mesh": {k: int(v) for k, v in dplan.mesh.shape.items()},
            "batch_axis": dplan.batch_axis,
            "seq_axis": dplan.seq_axis,
            "nr_devices": int(exp.nr_devices),
        },
    }).encode("utf-8")
    blob = len(header).to_bytes(8, "big") + header + bytes(exp.serialize())
    if path is not None:
        with open(path, "wb") as f:
            f.write(blob)
    return blob


class ExportedPlan:
    """A loaded AOT artifact: ``ep(x[, kernel])`` runs the pipeline.

    Distributed artifacts take ``mesh=`` (an equivalent
    ``jax.sharding.Mesh`` in the serving process) to place the recorded
    batch sharding on the inputs before the call; alternatively pre-place
    inputs yourself and omit it.
    """

    def __init__(self, meta: Dict[str, Any], exported):
        self.meta = meta
        self.platforms = tuple(meta.get("platforms", ()))
        self.shapes = meta.get("shapes", {})
        self.route_mode = meta.get("route_mode")
        self.distributed = meta.get("distributed")
        self._exported = exported

    def _place(self, x, mesh):
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec

        x = jnp.asarray(x)
        ba = self.distributed.get("batch_axis")
        if ba is None:
            spec = PartitionSpec()
        else:
            spec = PartitionSpec(ba, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    def __call__(self, x, kernel=None, *, mesh=None):
        if kernel is not None:
            # match the live plan's ergonomics: a bare (*kshape, 2) kernel
            # gains the leading kernel-count dim the artifact was traced
            # with (kernelCount == 1 plans accept both forms at exec)
            import jax.numpy as jnp
            kernel = jnp.asarray(kernel)
            want = self.shapes.get("kernel")
            if (want and kernel.ndim == len(want) - 1
                    and int(want[0]) == 1):
                kernel = kernel[None]
        if mesh is not None:
            if self.distributed is None:
                raise PlanError(
                    "mesh= is only meaningful for distributed artifacts")
            want = self.distributed.get("mesh", {})
            if dict(mesh.shape) != {k: int(v) for k, v in want.items()}:
                raise PlanError(
                    f"serving mesh axes {dict(mesh.shape)} do not match the "
                    f"exported mesh {want}")
            x = self._place(x, mesh)
            if kernel is not None:
                # replicate the kernel explicitly — implicit replication
                # works on single-host meshes but is fragile on multi-host
                # serving meshes
                import jax
                import jax.numpy as jnp
                from jax.sharding import NamedSharding, PartitionSpec
                kernel = jax.device_put(jnp.asarray(kernel),
                                        NamedSharding(mesh, PartitionSpec()))
        if kernel is not None:
            return self._exported.call(x, kernel)
        return self._exported.call(x)

    @property
    def spec_dict(self) -> Dict[str, Any]:
        return self.meta.get("spec", {})


def load_exported_plan(data) -> ExportedPlan:
    """Load an artifact produced by :func:`export_plan` (bytes or a path)."""
    import os
    from jax import export as jexport

    if isinstance(data, (str, os.PathLike)):
        with open(data, "rb") as f:
            data = f.read()
    if not isinstance(data, (bytes, bytearray)) or len(data) < 9:
        raise PlanError("load_exported_plan: expected artifact bytes or a path")
    hlen = int.from_bytes(data[:8], "big")
    if hlen <= 0 or 8 + hlen > len(data):
        raise PlanError("load_exported_plan: corrupt artifact header")
    try:
        meta = json.loads(data[8:8 + hlen].decode("utf-8"))
    except Exception as e:
        raise PlanError(f"load_exported_plan: bad header JSON: {e}")
    if meta.get("schema") != AOT_SCHEMA:
        raise PlanError(f"unrecognized AOT artifact schema: {meta.get('schema')!r}")
    if meta.get("version") != AOT_VERSION:
        raise PlanError(f"unsupported AOT artifact version {meta.get('version')}")
    exported = jexport.deserialize(bytearray(data[8 + hlen:]))
    return ExportedPlan(meta, exported)


PIPELINE_SCHEMA = "webgpufft-tpu-aot-pipeline"


def export_pipeline(fn, *example_args, path: Optional[str] = None) -> bytes:
    """Serialize ANY jit-compatible pipeline built on the framework —
    a facade chain (stft -> mask -> istft), a filter bank, an envelope
    detector — as a versioned jax.export artifact for the CURRENT
    backend platform.  ``example_args`` fix the traced shapes/dtypes
    (arrays or jax.ShapeDtypeStruct).  The generic sibling of
    :func:`export_plan` for pipelines that are not single plans."""
    import jax
    from jax import export as jexport

    import numpy as _np
    structs = [a if isinstance(a, jax.ShapeDtypeStruct)
               else jax.ShapeDtypeStruct(
                   _np.shape(a),
                   jax.dtypes.canonicalize_dtype(_np.asarray(a).dtype))
               for a in example_args]
    exp = jexport.export(jax.jit(fn))(*structs)
    header = json.dumps({
        "schema": PIPELINE_SCHEMA,
        "version": AOT_VERSION,
        "platforms": list(exp.platforms),
        "shapes": [{"shape": list(s.shape), "dtype": str(s.dtype)}
                   for s in structs],
    }).encode("utf-8")
    blob = len(header).to_bytes(8, "big") + header + bytes(exp.serialize())
    if path is not None:
        with open(path, "wb") as f:
            f.write(blob)
    return blob


class ExportedPipeline:
    """A deserialized :func:`export_pipeline` artifact: call it like the
    original function (shapes must match the recorded ones)."""

    def __init__(self, meta, exported):
        self.meta = meta
        self._exported = exported

    @property
    def platforms(self):
        return tuple(self.meta["platforms"])

    @property
    def shapes(self):
        return [tuple(s["shape"]) for s in self.meta["shapes"]]

    def __call__(self, *args):
        return self._exported.call(*args)


def load_exported_pipeline(data) -> ExportedPipeline:
    """Load an :func:`export_pipeline` artifact (bytes, path string, or
    os.PathLike)."""
    import os
    from jax import export as jexport

    if isinstance(data, (str, os.PathLike)):
        with open(data, "rb") as f:
            data = f.read()
    if len(data) < 8:
        raise PlanError("pipeline artifact truncated (no header)")
    hlen = int.from_bytes(data[:8], "big")
    if hlen <= 0 or 8 + hlen > len(data):
        raise PlanError("pipeline artifact corrupt (bad header length)")
    try:
        meta = json.loads(data[8:8 + hlen].decode("utf-8"))
    except (UnicodeDecodeError, json.JSONDecodeError) as e:
        raise PlanError(f"pipeline artifact corrupt: {e}") from None
    if meta.get("schema") != PIPELINE_SCHEMA:
        raise ValueError(f"not a pipeline artifact: {meta.get('schema')}")
    if meta.get("version") != AOT_VERSION:
        raise PlanError(
            f"pipeline artifact version {meta.get('version')} != "
            f"supported {AOT_VERSION}")
    exported = jexport.deserialize(bytearray(data[8 + hlen:]))
    return ExportedPipeline(meta, exported)
