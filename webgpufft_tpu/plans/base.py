"""Plan object + staged execution pipeline.

TPU-native counterpart of the reference's plan classes
(src/runtime/base_plan.js, src/runtime/plans/*.js).  Inversions:

- A plan is *functional*: ``plan(x)`` returns a fresh array; there is no
  command encoder, no workspace arena (XLA manages temporaries), and
  ``inPlace`` maps to XLA buffer donation instead of aliased bindings.
- All staging (strides/ioView/zeroPad/bf16) happens as XLA ops around the
  matmul-FFT core; the reference's chunking fallbacks are unnecessary on TPU
  because XLA tiles HBM-resident tensors itself (see runtime/policy.py for
  the routing metadata that replaces `_largeRouteMode`).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..spec import PlanError, PlanSpec
from . import stages


@dataclass
class RouteInfo:
    """Routing/diagnostic metadata — the analog of the reference's
    `_largeRouteMode` / `_largeRouteReasons` / axis-kind introspection
    (reference: src/runtime/plans/c2c.js:664-666, large_policy.js:276-299)."""
    mode: str = "xla"                      # "xla" | "pallas-fused" | "four-step-hbm"
    impl: str = "xla"
    axis_kinds: Tuple[str, ...] = ()
    reasons: Tuple[str, ...] = ()
    attempts: Tuple[str, ...] = ()


class Plan:
    """Executable transform plan.

    ``plan(x, kernel=None)`` runs the jitted pipeline.  ``out=`` may be given
    for strided-scatter outputs to merge results into an existing flat buffer
    (the functional analog of writing into a caller-provided GPUBuffer).
    """

    def __init__(self, spec: PlanSpec, consts: Dict[str, np.ndarray],
                 fn: Callable, route: RouteInfo, *,
                 needs_kernel: bool = False,
                 input_desc: str = "", output_desc: str = "",
                 workspace_bytes: int = 0,
                 donate: bool = False):
        self.spec = spec
        self.route = route
        self.needs_kernel = needs_kernel
        self.input_desc = input_desc
        self.output_desc = output_desc
        self._workspace_bytes = workspace_bytes
        # Constant tables stay HOST numpy at build time: a plan may be
        # built lazily inside a CALLER's jit trace (facade calls compose
        # under jit), and jnp.asarray there would capture tracers in the
        # long-lived plan cache — the first eager exec after that trace
        # then dies with UnexpectedTracerError.  Device copies are
        # materialized lazily, only outside any active trace (see the
        # _consts property); inside a trace the numpy tables embed as
        # jaxpr constants, which is exactly right.
        self._consts_np = {k: np.asarray(v) for k, v in consts.items()}
        self._consts_dev = None
        self._fn = fn
        # static side metadata attached by build_staged_fn (None for plans
        # with bespoke pipelines like fftconv/conv2d)
        self._in_need = getattr(fn, "in_need", None)
        self._out_need = getattr(fn, "out_need", None)
        self.accepts_out = getattr(fn, "accepts_out", False)
        donate_args = (1,) if donate else ()
        self._jit = jax.jit(fn, donate_argnums=donate_args)
        self._donate = donate
        self._jit_out = None  # lazily created variant taking an out buffer
        self._jit_variants = {}

    @property
    def _consts(self):
        """Constant tables for exec: device arrays once materialized
        (committed arrays embed safely as constants inside later traces
        too); before that, materialize only when no trace is active —
        inside a caller's jit trace the raw numpy tables are returned
        and embed as jaxpr constants.  The numpy copies are dropped at
        materialization (no double-residency per cached plan)."""
        if self._consts_dev is not None:
            return self._consts_dev
        try:
            from jax._src import core as _jax_core
            trace_clean = _jax_core.trace_state_clean()
        except (ImportError, AttributeError):
            # private-API fallback: numpy consts are always safe (they
            # just re-upload per eager exec)
            return self._consts_np
        if not trace_clean:
            return self._consts_np
        self._consts_dev = {k: jnp.asarray(v)
                            for k, v in self._consts_np.items()}
        self._consts_np = {}
        return self._consts_dev

    # -- execution ---------------------------------------------------------

    def __call__(self, x, kernel=None, out=None, **kw):
        return self.exec(x, kernel=kernel, out=out, **kw)

    # set by plan builders: (expected shape tuple or (None,), interleaved)
    _expect_input = None
    supports_exec_offsets = False  # staged transforms override

    def exec(self, x, kernel=None, out=None,
             input_offset_elements=None, output_offset_elements=None):
        """Run the plan.

        ``input_offset_elements`` / ``output_offset_elements`` are RUNTIME
        offsets — the element-unit analog of exec-time inputOffsetBytes/
        outputOffsetBytes in the reference (docs/API.md:115-116).  On
        flat-layout sides they add to every gather/scatter index; on shaped
        sides that side lowers to a contiguous flat view read/written at
        the offset (output requires ``out=`` there).  Validated eagerly
        against the concrete buffer lengths.
        """
        from ..utils.bufferview import BufferView
        out_view = None
        if isinstance(x, BufferView):
            x = x.pack()          # Tier-A segmented assemble (segmented_io.js analog)
        if isinstance(out, BufferView):
            out_view = out
            out = out_view.pack()
        x = jnp.asarray(x)
        y = self._exec_inner(x, kernel, out, input_offset_elements,
                             output_offset_elements)
        if out_view is not None:
            return out_view.unpack(y)
        return y

    def _exec_inner(self, x, kernel=None, out=None, in_off=None, out_off=None):
        # Eager misuse checks: these conditions would otherwise be silent
        # no-ops or dropped scatter writes inside the jitted pipeline.
        if out is not None and not (self.accepts_out or out_off is not None):
            raise PlanError(
                f"{self.spec.plan_type}: out= requires an output side that "
                "can merge (custom strides/whdcn, an ioView output, or an "
                "exec-time output offset); this plan returns fresh arrays")
        if in_off is not None or out_off is not None:
            if not self.supports_exec_offsets:
                raise PlanError(
                    f"{self.spec.plan_type}: exec offsets require a staged "
                    "transform plan")
            if in_off is not None:
                in_off = int(in_off)
                if in_off < 0:
                    raise PlanError("input_offset_elements must be >= 0")
                if self._expect_input is not None:
                    want_rank = 2 if self._expect_input[1] else 1
                    if x.ndim != want_rank:
                        raise PlanError(
                            f"{self.spec.plan_type}: input_offset_elements "
                            f"expects a flat buffer of rank {want_rank}, got "
                            f"shape {tuple(x.shape)}")
                if self._in_need is not None and x.shape[0] < in_off + self._in_need:
                    raise PlanError(
                        "flat input too small for runtime offset: need "
                        f"{in_off + self._in_need} elements, got {x.shape[0]}",
                        input_offset_elements=in_off, need=self._in_need)
            if out_off is not None:
                out_off = int(out_off)
                if out_off < 0:
                    raise PlanError("output_offset_elements must be >= 0")
                if out is None:
                    raise PlanError(
                        "output_offset_elements requires out= (a concrete "
                        "output buffer to offset into)")
                if self._out_need is not None and out.shape[0] < out_off + self._out_need:
                    raise PlanError(
                        "out buffer too small for runtime offset: need "
                        f"{out_off + self._out_need} elements, got {out.shape[0]}",
                        output_offset_elements=out_off, need=self._out_need)
        if self._expect_input is not None and in_off is None:
            validate_input_shape(self, x, self._expect_input[0],
                                 self._expect_input[1], self.spec.precision)
        if self._expect_input is not None:
            want = stages.expect_dtype(self.spec.precision)
            if x.dtype != want:
                raise PlanError(
                    f"{self.spec.plan_type}: expected input dtype {want} for "
                    f"precision {self.spec.precision!r}, got {x.dtype}",
                    precision=self.spec.precision)
        if self.needs_kernel:
            if kernel is None:
                raise PlanError(f"{self.spec.plan_type} exec requires kernel=")
            kernel = self._coerce_kernel(kernel)
            args = (self._consts, x, kernel)
        else:
            if kernel is not None:
                raise PlanError(f"{self.spec.plan_type} exec does not take kernel=")
            args = (self._consts, x)
        if in_off is not None or out_off is not None:
            # (misuse already rejected by the eager checks above)
            key = ("off", out is not None, in_off is not None, out_off is not None)
            fnv = self._jit_variants.get(key)
            if fnv is None:
                def wrapper(consts, x_, *rest):
                    r = list(rest)
                    kwargs = {}
                    if key[1]:
                        kwargs["out"] = r.pop(0)
                    if key[2]:
                        kwargs["in_off"] = r.pop(0)
                    if key[3]:
                        kwargs["out_off"] = r.pop(0)
                    return self._fn(consts, x_, **kwargs)
                fnv = jax.jit(wrapper)
                self._jit_variants[key] = fnv
            extra = []
            if out is not None:
                extra.append(out)
            if in_off is not None:
                extra.append(jnp.asarray(in_off, dtype=jnp.int32))
            if out_off is not None:
                extra.append(jnp.asarray(out_off, dtype=jnp.int32))
            return fnv(args[0], *args[1:], *extra)
        if out is not None:
            if self._jit_out is None:
                self._jit_out = jax.jit(lambda consts, *a: self._fn(consts, *a[:-1], out=a[-1]))
            return self._jit_out(args[0], *args[1:], out)
        return self._jit(*args)

    def _coerce_kernel(self, kernel):
        return jnp.asarray(kernel)

    # -- introspection (API parity: plan.getWorkspaceSizeBytes/destroy) ----

    def get_workspace_size_bytes(self) -> int:
        """Estimated peak intermediate footprint.  Informational: XLA owns
        temporary allocation on TPU (the reference returns its arena size,
        src/runtime/base_plan.js:44-49)."""
        return self._workspace_bytes

    _plan_cache = None  # set by PlanCache.get_or_create

    def get_pipeline_cache_snapshot(self):
        """Snapshot of the plan cache this plan was created through
        (reference: plan.getPipelineCacheSnapshot(), docs/API.md:121) —
        pass it to a later ``create_plan(..., cache={"snapshot": snap})``
        or ``import_plan_cache_snapshot`` to prewarm."""
        from ..runtime.cache import export_plan_cache_snapshot
        return export_plan_cache_snapshot(cache=self._plan_cache)

    def destroy(self):
        """Release references to device constants (buffers are freed by the
        runtime once unreferenced; parity no-op otherwise)."""
        self._consts_np = {}
        self._consts_dev = {}
        self._jit = None
        self._jit_out = None

    def lower_hlo(self, *example_args) -> str:
        """Debug helper: textual HLO of the jitted pipeline."""
        return jax.jit(self._fn).lower(self._consts, *example_args).as_text()

    @property
    def large_route_mode(self) -> str:
        return self.route.mode

    @property
    def large_route_reasons(self) -> Tuple[str, ...]:
        return self.route.reasons


# ---------------------------------------------------------------------------
# Staged pipeline builder shared by c2c / r2c / c2r / dct plans
# ---------------------------------------------------------------------------

@dataclass
class SideInfo:
    domain: Tuple[int, ...]          # logical domain of this side
    interleaved: bool                # complex (trailing 2) vs real
    strides: Optional[Tuple[int, ...]] = None
    offset: int = 0
    batch_stride: int = 0
    has_layout: bool = False         # flat-buffer mode for this side


def resolve_sides(spec: PlanSpec, in_domain, out_domain,
                  in_interleaved: bool, out_interleaved: bool):
    """Resolve per-side layout and physical shapes."""
    lay = spec.layout
    in_view = spec.io_view.input
    out_view = spec.io_view.output
    in_phys = tuple(in_view.shape) if in_view else tuple(in_domain)
    out_phys = tuple(out_view.shape) if out_view else tuple(out_domain)

    def side(phys, strides, offset, bstride, lane, interleaved, domain):
        has = (strides is not None or offset != 0 or bstride is not None
               or lane is not None)
        if has:
            st, off, bs = stages.resolve_side_layout(phys, strides, offset, bstride, lane)
            return SideInfo(tuple(domain), interleaved, st, off, bs, True)
        return SideInfo(tuple(domain), interleaved)

    s_in = side(in_phys, lay.input_strides, lay.input_offset,
                lay.input_batch_stride, lay.whdcn_input, in_interleaved, in_domain)
    s_out = side(out_phys, lay.output_strides, lay.output_offset,
                 lay.output_batch_stride, lay.whdcn_output, out_interleaved, out_domain)
    return s_in, s_out, in_phys, out_phys


def build_staged_fn(spec: PlanSpec, core_fn: Callable,
                    in_domain, out_domain,
                    in_interleaved: bool, out_interleaved: bool):
    """Wrap a core transform with the full staging pipeline:

    storage-load -> [strided gather] -> [ioView embed] -> zeroPad.read ->
    core -> zeroPad.write -> [ioView extract] -> [strided scatter] ->
    storage-store
    """
    import math as _math

    s_in, s_out, in_phys, out_phys = resolve_sides(
        spec, in_domain, out_domain, in_interleaved, out_interleaved)
    batch = spec.batch
    zp = spec.zero_pad
    in_view, out_view = spec.io_view.input, spec.io_view.output

    def fn(consts, x, out=None, in_off=None, out_off=None):
        x = stages.load_storage(x, spec.precision)
        if s_in.has_layout:
            x = stages.gather_flat(
                x, shape=in_phys, strides=s_in.strides, offset=s_in.offset,
                batch_stride=s_in.batch_stride, batch=batch,
                interleaved=in_interleaved, extra_offset=in_off)
        elif in_off is not None:
            # exec-time offset on a shaped side: a contiguous dynamic slice
            # of the flat buffer (the reference's inputOffsetBytes works on
            # any buffer exec, docs/API.md:115-116) — no index tensor
            need = batch * _math.prod(in_phys)
            x = jax.lax.dynamic_slice_in_dim(x, in_off, need, axis=0)
            x = x.reshape((batch,) + tuple(in_phys)
                          + ((2,) if in_interleaved else ()))
        if in_view is not None:
            x = stages.embed_view(x, in_view, in_domain, in_interleaved)
        x = stages.zero_pad_apply(x, zp.read, in_domain, in_interleaved)
        y = core_fn(x, consts)
        y = stages.zero_pad_apply(y, zp.write, out_domain, out_interleaved)
        if out_view is not None:
            y = stages.extract_view(y, out_view, out_domain, out_interleaved)
        if (not s_out.has_layout and out_off is not None
                and (out_view is None or out_view.clear_outside)):
            # shaped side + exec-time offset, whole-block write: one
            # contiguous dynamic update into the caller buffer (out= is
            # required by exec for runtime output offsets)
            vals = y.reshape((-1, 2) if out_interleaved else (-1,))
            y = jax.lax.dynamic_update_slice_in_dim(
                out, vals.astype(out.dtype), out_off, axis=0)
        elif s_out.has_layout or out_off is not None:
            if s_out.has_layout:
                st, off, bs = s_out.strides, s_out.offset, s_out.batch_stride
            else:  # shaped side + offset + keep-outside crop: strided scatter
                st = stages.default_strides(out_phys)
                off, bs = 0, _math.prod(out_phys)
            vals, sh = y, tuple(out_phys)
            if out_view is not None and not out_view.clear_outside and out is not None:
                # keep-outside: restrict the scatter to the view/logical
                # overlap so preexisting data outside it survives
                ov = stages.view_overlap(out_view, out_domain)
                if ov is None:
                    return stages.store_storage(out, spec.precision)
                vsl, _ = ov
                tail = (slice(None),) if out_interleaved else ()
                vals = y[(slice(None),) + vsl + tail]
                sh = tuple(s.stop - s.start for s in vsl)
                off = off + sum(vsl[d].start * st[d] for d in range(len(st)))
            y = stages.scatter_flat(
                vals, shape=sh, strides=st, offset=off, batch_stride=bs,
                batch=batch, interleaved=out_interleaved, out=out,
                min_len=None if out is not None else _need(out_phys, st, off, bs),
                extra_offset=out_off)
        elif out_view is not None and out is not None:
            if not out_view.clear_outside:
                y = stages.merge_view_into(y, out_view, out_domain,
                                           out_interleaved, out)
            # clearOutside=true: the extracted view (zeros outside the
            # logical overlap) IS the result; the caller buffer is replaced
        y = stages.store_storage(y, spec.precision)
        return y

    def _need(phys, st, off, bs):
        return off + bs * (batch - 1) + stages.layout_span(phys, st)

    in_shape = ((None,) if s_in.has_layout
                else (batch,) + tuple(in_phys) + ((2,) if in_interleaved else ()))
    out_shape = ((None,) if s_out.has_layout
                 else (batch,) + tuple(out_phys) + ((2,) if out_interleaved else ()))
    # static metadata for eager exec-time validation (Plan._exec_inner):
    # minimum flat-element footprint of each side, excluding runtime offsets
    fn.in_need = (_need(in_phys, s_in.strides, s_in.offset, s_in.batch_stride)
                  if s_in.has_layout else batch * _math.prod(in_phys))
    fn.out_need = (_need(out_phys, s_out.strides, s_out.offset, s_out.batch_stride)
                   if s_out.has_layout else batch * _math.prod(out_phys))
    fn.accepts_out = s_out.has_layout or out_view is not None
    fn.in_phys, fn.out_phys = tuple(in_phys), tuple(out_phys)
    return fn, in_shape, out_shape, s_in, s_out


def validate_input_shape(plan: Plan, x, expect_shape, interleaved: bool, precision: str):
    """Eager-side shape/dtype validation with reference-style rich errors."""
    if expect_shape == (None,):
        want_rank = 2 if interleaved else 1
        if x.ndim != want_rank:
            raise PlanError(
                f"{plan.spec.plan_type}: strided layout expects a flat buffer of "
                f"rank {want_rank}, got shape {tuple(x.shape)}")
        return
    if tuple(x.shape) != tuple(expect_shape):
        raise PlanError(
            f"{plan.spec.plan_type}: expected input shape {tuple(expect_shape)} "
            f"(batch, *physical{', 2' if interleaved else ''}), got {tuple(x.shape)}",
            plan_type=plan.spec.plan_type, shape=plan.spec.shape,
            batch=plan.spec.batch, precision=precision,
            route_mode=plan.route.mode, route_reasons=plan.route.reasons)
