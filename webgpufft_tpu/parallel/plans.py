"""Plan-level distributed execution: ``create_distributed_plan``.

The reference is a single-device library (SURVEY.md §2.9), so this surface
is new TPU work: it composes the building blocks of parallel/sharded.py
(distributed four-step FFT over ICI, half-complex r2c/c2r, distributed FFT
convolution, batch sharding) behind the same options dict ``create_plan``
takes, returning a plan-like object:

    mesh = sharded.make_mesh({"dp": 2, "sp": 4})
    plan = create_distributed_plan({"type": "c2c", "shape": [1 << 20],
                                    "batch": 8, "normalize": "unitary"},
                                   mesh=mesh, batch_axis="dp", seq_axis="sp")
    y = plan(x)          # flat (batch, n, 2), standard bin order

Modes:
- ``seq_axis`` given: the transform itself is distributed over that mesh
  axis (sequence parallel).  Supported: c2c any rank and ANY axis-0
  length (four-step digit plan when a mesh-divisible smooth split
  exists, Bluestein chirp-Z embedding otherwise; remaining axes run
  locally on the still-sharded grid); r2c/c2r any rank and ANY length
  (axis 0 packed — reference real_complex.js conventions — via the
  half-complex trick on the distributed half-length plan when it wins,
  complex widening otherwise); all eight dct/dst types any rank
  (distributed axis-0 trig wrappers — types 1/4 via their symmetric/odd
  extension or 2N half-sample embeddings — + the local matmul/FFT
  per-axis routing for the rest); fftconv any rank with every boundary
  mode (linear =
  smooth-padded circular + crop) and multi-kernel ``kernelCount`` (data
  spectrum computed once).
- ``seq_axis=None``: pure batch sharding — the local plan runs on every
  device's batch shard, collective-free (works for every plan type).

Inputs/outputs are flat logical arrays in the standard order; the digit
grids used internally never leak.  The returned plan jits once and lets the
partitioner insert the collectives (all_to_all over ICI for the digit
exchange; no DCN unless the mesh spans hosts).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..plans.base import RouteInfo
from ..spec import PlanError, PlanSpec, normalize_spec
from . import sharded


class DistributedPlan:
    """Executable distributed transform plan (plan-like surface: __call__/
    exec/destroy/route/spec, mirroring plans.base.Plan)."""

    def __init__(self, spec: PlanSpec, mesh: Mesh, route: RouteInfo, fn,
                 *, needs_kernel: bool = False,
                 batch_axis: Optional[str] = None,
                 seq_axis: Optional[str] = None,
                 jit: bool = True):
        self.spec = spec
        self.mesh = mesh
        self.route = route
        self.needs_kernel = needs_kernel
        self.batch_axis = batch_axis
        self.seq_axis = seq_axis
        self._jit = jax.jit(fn) if jit else fn

    def __call__(self, x, kernel=None):
        return self.exec(x, kernel=kernel)

    def exec(self, x, kernel=None):
        x = jnp.asarray(x)
        sh = self._placement_for(x)
        if sh is not None:
            x = jax.device_put(x, sh)
        if self.needs_kernel:
            if kernel is None:
                raise PlanError(f"{self.spec.plan_type} exec requires kernel=")
            return self._jit(x, jnp.asarray(kernel))
        if kernel is not None:
            raise PlanError(
                f"{self.spec.plan_type} exec does not take kernel=")
        return self._jit(x)

    def _placement_for(self, x) -> Optional[NamedSharding]:
        """Batch placement derived from the concrete input array.

        Inputs may be shaped ``(batch, *shape, [2])`` or flat
        ``(batch, n_total, 2)`` — and batch-sharded local plans also accept
        flat 1-D buffers with layout strides, where the leading dim is NOT
        the batch.  Shard dim 0 over batch_axis only when it really is the
        batch dim; otherwise leave placement to the partitioner.
        """
        if self.batch_axis is None or x.ndim < 2 or x.shape[0] != self.spec.batch:
            return None
        return NamedSharding(
            self.mesh, P(self.batch_axis, *([None] * (x.ndim - 1))))

    def destroy(self):
        self._jit = None

    def get_workspace_size_bytes(self) -> int:
        # XLA manages distributed temporaries; report the per-device digit
        # grid estimate (informational, like plans.base.Plan)
        ndev = 1
        if self.seq_axis is not None:
            names = (self.seq_axis if isinstance(self.seq_axis, (tuple, list))
                     else (self.seq_axis,))
            for nm in names:
                ndev *= self.mesh.shape[nm]
        return 2 * self.spec.batch * self.spec.n_total * 8 // ndev


def _staging_needed(spec: PlanSpec) -> bool:
    return (spec.io_view.input is not None
            or spec.io_view.output is not None
            or spec.zero_pad.read is not None
            or spec.zero_pad.write is not None
            or not spec.layout.is_trivial
            or spec.precision != "f32")


def _maybe_stage_distributed(spec: PlanSpec, fn, route):
    """Compose the single-chip staging pipeline (plans/base.build_staged_fn:
    storage load -> [strided gather] -> [ioView embed] -> zeroPad.read ->
    core -> zeroPad.write -> [ioView extract] -> [strided scatter] ->
    storage store) around a distributed core.  The staging stages are
    elementwise/gather ops on the LOGICAL array executed inside the same
    jit — the partitioner runs them shard-locally (batch-dim staging is
    embarrassingly parallel; axis-spanning gathers lower to the partitioner's
    own collectives).  Cross-shard cases with no sound lowering are rejected
    up front in _reject_unsupported."""
    if not _staging_needed(spec):
        return fn
    from ..plans.base import build_staged_fn
    from ..plans.transforms import packed_shape
    t = spec.plan_type
    if t == "r2c":
        doms = (spec.shape, packed_shape(spec.shape), False, True)
    elif t == "c2r":
        doms = (packed_shape(spec.shape), spec.shape, True, False)
    elif t == "c2c":
        doms = (spec.shape, spec.shape, True, True)
    else:  # dct/dst kinds (fftconv stages via _wrap_fftconv_zero_pad)
        doms = (spec.shape, spec.shape, False, False)

    staged, _in, _out, _si, _so = build_staged_fn(
        spec, lambda x, _c: fn(x), *doms)

    def wrapped(x):
        return staged(None, x)

    _copy_route_attrs(wrapped, fn)
    route.reasons = route.reasons + ("distributed-staging",)
    return wrapped


def _reject_unsupported(spec: PlanSpec, seq_axis):
    if seq_axis is None:
        return  # batch sharding wraps the local plan: full option surface
    if isinstance(seq_axis, (tuple, list)):
        if len(seq_axis) != 2:
            raise PlanError(
                "seq_axis accepts one mesh axis name or a pair (pencil "
                f"decomposition over axes 0 and 1); got {len(seq_axis)}")
        if spec.plan_type in ("c2c", "r2c", "c2r", "fftconv"):
            if spec.rank < 2:
                raise PlanError(
                    f"pencil seq_axis needs rank >= 2 for {spec.plan_type}")
        else:
            # trig types: the pre/post embeddings (even/odd reorder,
            # symmetric extension) are axis-length-changing gathers; on a
            # pencil BOTH decomposed axes would need their embedding
            # applied on a dim sharded over the other mesh axis's digit
            # grid — a cross-shard regather per axis that the single-axis
            # route avoids by construction.  Trig transforms therefore
            # distribute over ONE mesh axis (any length); see
            # docs/PARITY.md §2.9.
            raise PlanError(
                f"pencil seq_axis supports c2c/r2c/c2r/fftconv (got "
                f"{spec.plan_type!r}); use a single seq_axis or batch_axis")
    # Staging (ioView/zeroPad/layout/bf16-storage) composes with seq-axis
    # plans by running shard-locally around the distributed core
    # (_maybe_stage_distributed) — the genuinely cross-shard cases below
    # are the only rejections (VERDICT r3 missing #4).
    if spec.in_place:
        raise PlanError("seq-axis plans do not support inPlace (donation "
                        "has no meaning for a logically-sharded exec)")
    # ioView.output.clearOutside=false without a caller out= buffer
    # behaves exactly like the single-chip exec(x) path: there is nothing
    # to merge into, so the plain extract is returned (the distributed
    # exec surface never takes out=).
    if spec.plan_type not in ("c2c", "r2c", "c2r", "fftconv",
                              "dct1", "dct2", "dct3", "dct4",
                              "dst1", "dst2", "dst3", "dst4"):
        raise PlanError(
            f"seq_axis sharding is not supported for type "
            f"{spec.plan_type!r} (batch sharding via batch_axis works for "
            "every type)", plan_type=spec.plan_type)


def _validate_axes(mesh: Mesh, batch_axis: Optional[str],
                   seq_axis, batch: int):
    seq_names = (tuple(seq_axis) if isinstance(seq_axis, (tuple, list))
                 else (seq_axis,) if seq_axis is not None else ())
    if len(set(seq_names)) != len(seq_names):
        raise PlanError("pencil seq_axis needs two distinct mesh axes")
    for name, label in ((batch_axis, "batch_axis"),
                        *((s, "seq_axis") for s in seq_names)):
        if name is not None and name not in mesh.shape:
            raise PlanError(f"{label} {name!r} is not a mesh axis "
                            f"(mesh has {tuple(mesh.shape)})")
    if batch_axis is not None and batch_axis in seq_names:
        raise PlanError("batch_axis and seq_axis must be distinct mesh axes")
    if batch_axis is not None and batch % mesh.shape[batch_axis]:
        raise PlanError(
            f"batch ({batch}) must divide evenly over mesh axis "
            f"{batch_axis!r} (size {mesh.shape[batch_axis]})",
            batch=batch, devices=mesh.shape[batch_axis])


def _build_pencil_c2c(spec: PlanSpec, mesh: Mesh, batch_axis, axes):
    """c2c rank >= 2 with axes 0 and 1 each spanning a mesh axis (2-D
    pencil decomposition); remaining axes transform locally, parallel over
    both shardings."""
    from ..core.engine import plan_scale
    shape = spec.shape
    inner = _wrap_builder_errors(
        sharded.build_distributed_pencil_axes01, shape, mesh, axes,
        spec.direction, batch_axis)
    rest = shape[2:]
    rest_plans, consts = sharded._local_rest_axis_plans(
        rest, spec.direction, spec.tuning)
    scale = plan_scale(spec.normalize, spec.direction, spec.n_total)
    from ..core.axis import slabbed_axis_apply

    def fn(x):
        b = x.shape[0]
        y = x.reshape(b, *shape, 2)
        # riding axes first: unsharded contractions stay fully local on
        # the incoming pencil layout (no collectives); descending order
        # (r17c, see engine.apply_nd)
        for d in range(len(rest_plans) - 1, -1, -1):
            ap = rest_plans[d]
            if ap.n > 1:
                y = slabbed_axis_apply(y, ap, 3 + d, consts)
        y = inner(y)
        if scale != 1.0:
            y = y * jnp.asarray(scale, y.dtype)
        return y.reshape(b, *shape, 2)

    return fn, inner.split


def _build_seq_c2c(spec: PlanSpec, mesh: Mesh, batch_axis, seq_axis):
    from ..core.engine import plan_scale
    shape = spec.shape
    if spec.rank == 1:
        # four-step digit plan for splittable smooth lengths; Bluestein
        # chirp-Z embedding otherwise (any length distributes).  The
        # builder already returns flat (batch, n, 2).
        inner = sharded.build_distributed_fft_any_1d(
            shape[0], mesh, seq_axis, spec.direction, spec.normalize,
            batch_axis)
        return inner, inner.split

    # ND: axis 0 spans chips; remaining axes transform locally per shard
    # (embarrassingly parallel over the k1 sharding — no extra collectives).
    # Splittable n0 keeps the (k2, k1) digit-grid form so the riding-axis
    # transforms run on the still-sharded grid; unsplittable n0 (odd/prime
    # on a power-of-two mesh) takes the axis-0 Bluestein embedding, whose
    # output is inherently flat.
    if sharded.choose_distributed_split(
            shape[0], mesh.shape[seq_axis]) is not None:
        fft0 = sharded.build_distributed_fft_axis0(
            shape, mesh, seq_axis, spec.direction, "none", batch_axis)
        rest_base = 3                             # (b, k2, k1, *rest, 2)
    else:
        fft0 = _wrap_builder_errors(
            sharded.build_distributed_bluestein_axis0, shape, mesh,
            seq_axis, spec.direction, "none", batch_axis)
        rest_base = 2                             # (b, n0, *rest, 2)
    from ..core.axis import build_axis_plan, slabbed_axis_apply
    consts: Dict[str, Any] = {}
    plans = []
    for d, m in enumerate(shape[1:]):
        ap = build_axis_plan(m, d + 1, spec.direction, spec.tuning, f"dx{d}")
        consts.update(ap.consts())
        plans.append(ap)
    consts = {k: jnp.asarray(v) for k, v in consts.items()}
    scale = plan_scale(spec.normalize, spec.direction, spec.n_total)

    def fn(x):
        b = x.shape[0]
        y = fft0(x.reshape(b, *shape, 2))
        # descending order (r17c, see engine.apply_nd)
        for d in range(len(plans) - 1, -1, -1):
            ap = plans[d]
            if ap.n > 1:
                y = slabbed_axis_apply(y, ap, rest_base + d, consts)
        if scale != 1.0:
            y = y * jnp.asarray(scale, y.dtype)
        return y.reshape(b, *shape, 2)

    return fn, fft0.split


def _wrap_builder_errors(builder, *args, **kwargs):
    """Surface sharded-builder ValueErrors (unsplittable axis-0 lengths,
    operand-size bounds) as PlanErrors."""
    try:
        return builder(*args, **kwargs)
    except ValueError as e:
        raise PlanError(str(e)) from None


def _smooth_distributed_len(m0: int, mesh: Mesh, seq_axis: str) -> int:
    """sharded.smooth_distributed_len_at_least with a PlanError surface."""
    try:
        return sharded.smooth_distributed_len_at_least(
            m0, mesh.shape[seq_axis])
    except ValueError as e:
        raise PlanError(f"{e} (mesh axis {seq_axis!r})") from None


_ROUTE_ATTRS = ("split", "halo", "padded_work_len", "staged",
                "pencil_fallback")


def _copy_route_attrs(dst, src):
    """Propagate route-metadata attributes through an fn wrapper (the
    caller reads them off the OUTERMOST fn to build route reasons)."""
    for attr in _ROUTE_ATTRS:
        if hasattr(src, attr):
            setattr(dst, attr, getattr(src, attr))
    return dst


def _wrap_kernel_layout(inner, fc, kshape):
    """Validate the runtime kernel's leading kcount dim and apply the
    output layout (inner builders return kernel-major (kc, b, ..., 2)).
    A channelPolicy output side takes precedence over outputLayout (the
    local plan's rule, plans/fftconv.py output path) — the scatter
    addresses lanes itself."""
    kc = fc.kernel_count
    krank = len(kshape)

    def fn(x, kernel):
        kernel = jnp.asarray(kernel)
        if kc > 1 and (kernel.ndim != krank + 2 or kernel.shape[0] != kc):
            raise PlanError(
                f"fftconv with kernelCount={kc} expects kernel shaped "
                f"(kcount, *kernelShape, 2), got {tuple(kernel.shape)}")
        y = inner(x, kernel)
        if (kc > 1 and fc.output_layout == "batch-major"
                and fc.channel_output is None):
            y = jnp.moveaxis(y, 0, 1)
        return y

    return _copy_route_attrs(fn, inner)


def _wrap_channel_lanes(inner, spec: PlanSpec, out_shape):
    """Channel-lane frames around the distributed conv pipeline — the
    multi-chip composition of the reference's channelPolicy preset surface
    (src/runtime/fftconv_channel_lane_presets.js:139-206, lowered exactly
    like the local plan, plans/fftconv.py input gather / output scatter).

    The input gather extracts (batch, *shape, 2) from the flat lane frames
    and the output scatter writes each kernel's result into its lane; both
    are static index maps on the batch-sharded side of the pipeline, so
    they add no collectives to the route they wrap (halo or spectrum).
    ``inner`` must be the kernel-major form.
    """
    import math as _math

    from ..plans import stages
    fc = spec.fft_conv
    ch_in, ch_out = fc.channel_input, fc.channel_output
    shape, batch, kcount = spec.shape, spec.batch, fc.kernel_count
    out_shape = tuple(out_shape)
    if ch_in is not None:
        in_st, in_off, in_bs = stages.resolve_side_layout(
            shape, None, 0, None, ch_in)
    if ch_out is not None:
        cs = (ch_out.channel_stride_elements
              if ch_out.channel_stride_elements is not None
              else _math.prod(out_shape))
        bs = (ch_out.batch_stride_elements
              if ch_out.batch_stride_elements is not None
              else ch_out.channels * cs)
        st = stages.default_strides(out_shape)
        offs = tuple(
            ch_out.offset_elements
            + (ch_out.channel_index + k * ch_out.kernel_step_channels) * cs
            for k in range(kcount))
        need = max((bs * batch,)
                   + tuple(o + bs * (batch - 1)
                           + stages.layout_span(out_shape, st)
                           for o in offs))

    def fn(x, kernel):
        if ch_in is not None:
            x = stages.gather_flat(
                x, shape=shape, strides=in_st, offset=in_off,
                batch_stride=in_bs, batch=batch, interleaved=True)
        y = inner(x, kernel)
        if ch_out is None:
            return y
        y = y.reshape((kcount, batch) + out_shape + (2,))
        res = None
        for k in range(kcount):
            res = stages.scatter_flat(
                y[k], shape=out_shape, strides=st, offset=offs[k],
                batch_stride=bs, batch=batch, interleaved=True,
                out=res, min_len=need)
        return res

    return _copy_route_attrs(fn, inner)


def _halo_conv_eligible(spec: PlanSpec, mesh: Mesh, seq_axis: str) -> bool:
    """Short-kernel 1-D convolution takes the halo-exchange route: one
    (k-1)-sample ppermute instead of two whole-signal all_to_alls.
    Geometry feasibility is the builder's own rule
    (sharded.halo_conv_geometry), so gate and builder cannot drift."""
    fc = spec.fft_conv
    if (fc.kernel_count != 1 or fc.mode != "convolution"
            or fc.kernel_shape is None):
        return False
    n, k = spec.shape[0], fc.kernel_shape[0]
    if 8 * k > n:
        return False
    return sharded.halo_conv_geometry(
        n, k, mesh.shape[seq_axis], fc.boundary) is not None


def _wrap_fftconv_zero_pad(fn, spec: PlanSpec):
    """zeroPad.read/write for distributed fftconv, composed shard-locally.

    fftconv zeroPad rects live in the FFT logical domain (fftShape —
    spec.py domain rule; the reference fuses them into the three internal
    C2C plans, src/runtime/plans/fftconv.js:532-567).  Because the data
    embeds at the ORIGIN of fftShape and the output crop starts at
    ``out_off``, both stages reduce to elementwise masks on the logical
    data/output arrays the distributed routes already pass around:

    - read: positions >= shape are zero already, so zeroing fftShape
      outside the rect == masking the data with the rect clipped per-axis
      to [0, shape[d]).
    - write: cropped output index i sits at fftShape index out_off+i, so
      zeroing before the crop == masking the cropped result with the rect
      shifted by out_off (clamped to the out domain).

    Both masks are static 0/1 broadcasts inside the same jit — the
    partitioner runs them shard-locally on every route (halo exchange,
    padded-circular, direct spectrum) with no extra collectives.
    """
    zp = spec.zero_pad
    if zp.read is None and zp.write is None:
        return fn
    from ..utils.mathref import fftconv_out_shape
    fc = spec.fft_conv
    kshape = (tuple(fc.kernel_shape) if fc.kernel_shape is not None
              else tuple(spec.shape))
    _, out_shape, out_off = fftconv_out_shape(
        spec.shape, list(kshape), fc.boundary)
    shape, rank = spec.shape, spec.rank

    def rect_mask(stage, domain, shift):
        """f32 mask of shape ``domain + (1,)``: 1 inside the shifted/
        clamped rect, 0 outside (trailing-aligned broadcast, so it applies
        under any leading batch/kernel dims)."""
        mask = np.ones(tuple(domain) + (1,), np.float32)
        trivial = True
        for d in range(rank):
            s = min(max(stage.start[d] - shift[d], 0), domain[d])
            e = min(max(stage.end[d] - shift[d], 0), domain[d])
            if s == 0 and e == domain[d]:
                continue
            trivial = False
            iota = np.arange(domain[d])
            m = ((iota >= s) & (iota < e)).astype(np.float32)
            mask = mask * m.reshape([1] * d + [domain[d]]
                                    + [1] * (rank - d))
        return None if trivial else jnp.asarray(mask)

    read_mask = (rect_mask(zp.read, shape, (0,) * rank)
                 if zp.read is not None else None)
    write_mask = (rect_mask(zp.write, out_shape, out_off)
                  if zp.write is not None else None)
    if read_mask is None and write_mask is None:
        return fn

    def wrapped(x, kernel):
        if read_mask is not None:
            b = x.shape[0]
            x = x.reshape(b, *shape, 2) * read_mask
        y = fn(x, kernel)
        if write_mask is not None:
            y = y * write_mask
        return y

    _copy_route_attrs(wrapped, fn)
    # non-trivial masks actually applied: the caller turns this into the
    # "distributed-staging" route reason (single source of truth — a
    # full-domain rect above returns fn unchanged and is NOT staged)
    wrapped.staged = True
    return wrapped


def _build_seq_fftconv(spec: PlanSpec, mesh: Mesh, batch_axis, seq_axis):
    """Distributed fftconv: route construction + the zeroPad masks + the
    channel-lane frame wrapper (reference channelPolicy presets compose
    with sp since r3; zeroPad composes shard-locally since r5)."""
    fc = spec.fft_conv
    fn, split = _build_seq_fftconv_route(spec, mesh, batch_axis, seq_axis)
    fn = _wrap_fftconv_zero_pad(fn, spec)
    if fc.channel_input is not None or fc.channel_output is not None:
        from ..utils.mathref import fftconv_out_shape
        kshape = (tuple(fc.kernel_shape) if fc.kernel_shape is not None
                  else spec.shape)
        _, out_shape, _ = fftconv_out_shape(spec.shape, list(kshape),
                                            fc.boundary)
        fn = _wrap_channel_lanes(fn, spec, out_shape)
    return fn, split


def _build_seq_fftconv_route(spec: PlanSpec, mesh: Mesh, batch_axis,
                             seq_axis):
    fc = spec.fft_conv
    pencil = isinstance(seq_axis, (tuple, list))
    if not pencil and _halo_conv_eligible(spec, mesh, seq_axis):
        if spec.rank == 1:
            inner = _wrap_builder_errors(
                sharded.build_distributed_fftconv_halo_1d,
                spec.shape[0], fc.kernel_shape[0], spec.batch, mesh,
                seq_axis, fc.boundary, batch_axis, tuning=spec.tuning,
                overlap_save=fc.overlap_save,
                overlap_block=fc.overlap_block)
        else:
            inner = _wrap_builder_errors(
                sharded.build_distributed_fftconv_halo_nd,
                spec.shape, fc.kernel_shape, spec.batch, mesh, seq_axis,
                fc.boundary, batch_axis, tuning=spec.tuning)

        def fn(x, kernel):
            return inner(x.reshape(x.shape[0], *spec.shape, 2), kernel)

        fn.split = inner.split
        fn.halo = inner.halo
        return fn, inner.split
    if fc.boundary != "circular":
        return _build_seq_fftconv_linear(spec, mesh, batch_axis, seq_axis)
    if fc.kernel_shape is not None and tuple(fc.kernel_shape) != spec.shape:
        raise PlanError(
            "distributed circular fftconv requires kernelShape == shape "
            "(circular kernels are full-length)")
    if pencil:
        try:
            inner = sharded.build_distributed_fftconv_pencil(
                spec.shape, mesh, tuple(seq_axis), fc.mode, batch_axis)
        except sharded.UnsplittableAxisError:
            # documented fallback (build_distributed_fftconv_pencil
            # docstring): a circular length with no smooth mesh-divisible
            # split on its pencil axis cannot pad (padding breaks circular
            # wrap-around on a 2-D digit grid) — run the single-axis
            # route over the FIRST pencil axis instead, whose
            # padded-circular fold covers any length.  ONLY that
            # condition falls back: other builder ValueErrors (e.g. the
            # per-device operand bound) would be strictly worse on the
            # single-axis route and surface as PlanErrors below.
            inner = _wrap_builder_errors(
                sharded.build_distributed_fftconv_nd,
                spec.shape, mesh, seq_axis[0], fc.mode, batch_axis)
            inner.pencil_fallback = seq_axis[0]
        except ValueError as e:
            raise PlanError(str(e)) from None
    elif spec.rank == 1:
        inner = _wrap_builder_errors(
            sharded.build_distributed_fftconv_1d,
            spec.shape[0], mesh, seq_axis, fc.mode, batch_axis)
    else:
        inner = _wrap_builder_errors(
            sharded.build_distributed_fftconv_nd,
            spec.shape, mesh, seq_axis, fc.mode, batch_axis)
    wrapped = _wrap_kernel_layout(inner, fc, spec.shape)
    return wrapped, wrapped.split


def _build_seq_fftconv_linear(spec: PlanSpec, mesh: Mesh, batch_axis,
                              seq_axis):
    """Linear-boundary distributed fftconv: circular convolution at a
    smooth-padded working shape >= shape + kernelShape - 1, then the
    boundary crop (same shape math as the local plan,
    utils/mathref.fftconv_out_shape; reference: fftconv.js:353-373)."""
    from ..utils import factors
    from ..utils.mathref import fftconv_out_shape
    fc = spec.fft_conv
    kshape = (tuple(fc.kernel_shape) if fc.kernel_shape is not None
              else spec.shape)
    try:
        _, out_shape, out_off = fftconv_out_shape(
            spec.shape, kshape, fc.boundary)
    except ValueError as e:
        raise PlanError(str(e), boundary=fc.boundary,
                        kernel_shape=kshape) from None
    need = [spec.shape[d] + kshape[d] - 1 for d in range(spec.rank)]
    if isinstance(seq_axis, (tuple, list)):
        # pencil: BOTH decomposed axes pad to smooth lengths splittable
        # over their own mesh axis
        work = (_smooth_distributed_len(need[0], mesh, seq_axis[0]),
                _smooth_distributed_len(need[1], mesh, seq_axis[1]),
                *(factors.next_smooth_at_least(v) for v in need[2:]))
        inner = _wrap_builder_errors(
            sharded.build_distributed_fftconv_pencil,
            work, mesh, tuple(seq_axis), fc.mode, batch_axis)
    elif spec.rank == 1:
        work = (_smooth_distributed_len(need[0], mesh, seq_axis),)
        inner = _wrap_builder_errors(
            sharded.build_distributed_fftconv_1d,
            work[0], mesh, seq_axis, fc.mode, batch_axis)
    else:
        work = (_smooth_distributed_len(need[0], mesh, seq_axis),
                *(factors.next_smooth_at_least(v) for v in need[1:]))
        inner = _wrap_builder_errors(
            sharded.build_distributed_fftconv_nd,
            work, mesh, seq_axis, fc.mode, batch_axis)
    rank = spec.rank

    def pad_to(a, lead_dims: int):
        pad = [(0, 0)] * a.ndim
        for d, w in enumerate(work):
            pad[lead_dims + d] = (0, w - a.shape[lead_dims + d])
        return jnp.pad(a, pad)

    # Output extraction per axis.  Convolution results are lag-positional
    # and unaffected by extra padding: a plain [off, off+out) slice.
    # Correlation wraps negative lags to the END of the transform length,
    # so oracle index j (defined at length n+k-1) lives at j when j < n
    # (positive lags) and at j + (m - (n+k-1)) when j >= n (the wrapped
    # negative-lag tail shifts with the padded length m) — a static gather.
    gathers = []
    for d in range(rank):
        j = np.arange(out_off[d], out_off[d] + out_shape[d])
        if fc.mode == "correlation":
            g = np.where(j < spec.shape[d], j, j + (work[d] - need[d]))
        else:
            g = j
        gathers.append(jnp.asarray(g.astype(np.int32)))

    kc = fc.kernel_count

    def raw(x, kernel):
        b = x.shape[0]
        xp = pad_to(x.reshape(b, *spec.shape, 2), 1)
        if kc > 1:
            kp = pad_to(kernel.reshape(kc, *kshape, 2), 1)
        else:
            kp = pad_to(kernel.reshape(*kshape, 2), 0)
        y = inner(xp, kp)                       # circular at work shape
        lead = (kc, b) if kc > 1 else (b,)
        y = y.reshape(*lead, *work, 2)
        for d in range(rank):
            y = jnp.take(y, gathers[d], axis=len(lead) + d)
        return y

    raw.split = inner.split
    wrapped = _wrap_kernel_layout(raw, fc, kshape)
    return wrapped, wrapped.split


def create_distributed_plan(opts: Optional[Dict[str, Any]] = None, *,
                            mesh: Mesh,
                            batch_axis: Optional[str] = None,
                            seq_axis: Optional[str] = None,
                            **kwargs) -> DistributedPlan:
    """Create a multi-chip transform plan from reference-style options.

    ``mesh``: the jax.sharding.Mesh to run over.  ``batch_axis`` shards the
    batch dim (data parallel); ``seq_axis`` distributes single transforms
    over chips (sequence parallel, all_to_all digit exchange).  At least one
    must be given.  See module docstring for supported combinations.
    """
    merged = dict(opts or {})
    merged.update(kwargs)
    spec = normalize_spec(merged)
    if batch_axis is None and seq_axis is None:
        raise PlanError("give batch_axis and/or seq_axis (a mesh axis name)")
    if isinstance(seq_axis, (tuple, list)) and len(seq_axis) == 1:
        seq_axis = seq_axis[0]
    pencil = isinstance(seq_axis, (tuple, list))
    _validate_axes(mesh, batch_axis, seq_axis, spec.batch)
    _reject_unsupported(spec, seq_axis)
    measure_note = ()
    if spec.tuning.rigor == "measure":
        # the measured planner times single-chip candidates; distributed
        # route choice is structural (split/digit geometry) — record the
        # degradation rather than silently accepting the knob
        import dataclasses as _dc
        spec = _dc.replace(spec, tuning=_dc.replace(spec.tuning,
                                                    rigor="estimate"))
        measure_note = ("measure-unsupported:distributed",)

    route = RouteInfo(
        mode=("distributed-pencil" if pencil
              else "distributed-sp" if seq_axis else "distributed-dp"),
        impl="xla+ici",
        reasons=((f"mesh:{dict(mesh.shape)}",)
                 + ((f"batch-axis:{batch_axis}",) if batch_axis else ())
                 + ((f"seq-axis:{seq_axis}",) if seq_axis else ())
                 + measure_note))

    needs_kernel = spec.plan_type in ("fftconv", "conv2d")

    if seq_axis is None:
        # batch sharding of the local single-chip plan (works for any type);
        # exec places inputs on the batch sharding and the local plan's
        # jitted pipeline partitions automatically (shard_batch semantics)
        from .. import create_plan
        local = create_plan(merged)
        route.axis_kinds = local.route.axis_kinds
        route.reasons = route.reasons + ("local:" + local.route.mode,)

        def fn(x, kernel=None):
            return local.exec(x, kernel=kernel) if needs_kernel \
                else local.exec(x)

        return DistributedPlan(
            spec, mesh, route, fn, needs_kernel=needs_kernel,
            batch_axis=batch_axis, seq_axis=None, jit=False)

    t = spec.plan_type
    if pencil:
        axes = tuple(seq_axis)
        if t == "c2c":
            fn, split = _build_pencil_c2c(spec, mesh, batch_axis, axes)
        elif t == "r2c":
            inner = _wrap_builder_errors(
                sharded.build_distributed_r2c_nd, spec.shape, mesh,
                axes[0], spec.normalize, batch_axis, tuning=spec.tuning,
                pencil_axes=axes)
            fn, split = inner, inner.split
        elif t == "c2r":
            inner = _wrap_builder_errors(
                sharded.build_distributed_c2r_nd, spec.shape, mesh,
                axes[0], spec.normalize, batch_axis, tuning=spec.tuning,
                pencil_axes=axes)
            fn, split = inner, inner.split
        else:  # fftconv (guarded by _reject_unsupported)
            fn, split = _build_seq_fftconv(spec, mesh, batch_axis, axes)
            if getattr(fn, "staged", False):
                route.reasons = route.reasons + ("distributed-staging",)
        fb = getattr(fn, "pencil_fallback", None)
        if fb is not None:
            # unsplittable circular length: the documented single-axis
            # fallback ran instead of the 2-D pencil decomposition
            route.reasons = route.reasons + (
                f"pencil-fallback-single-axis({fb})",
                f"digit-split:{split}")
            if hasattr(fn, "padded_work_len"):
                # same reason the single-axis tail emits for this route:
                # the digits factor the PADDED circular work length
                route.reasons = route.reasons + (
                    f"fftconv-padded-circular:{fn.padded_work_len}",)
        else:
            route.reasons = route.reasons + (f"pencil-split:{split}",)
        if not needs_kernel:
            fn = _maybe_stage_distributed(spec, fn, route)
        return DistributedPlan(
            spec, mesh, route, fn, needs_kernel=needs_kernel,
            batch_axis=batch_axis, seq_axis=axes)
    if t == "c2c":
        fn, split = _build_seq_c2c(spec, mesh, batch_axis, seq_axis)
    elif t == "r2c":
        if spec.rank == 1:
            inner = sharded.build_distributed_r2c_1d(
                spec.shape[0], mesh, seq_axis, spec.normalize, batch_axis)
        else:
            inner = _wrap_builder_errors(
                sharded.build_distributed_r2c_nd, spec.shape, mesh,
                seq_axis, spec.normalize, batch_axis, tuning=spec.tuning)
        fn, split = inner, inner.split
    elif t == "c2r":
        if spec.rank == 1:
            inner = sharded.build_distributed_c2r_1d(
                spec.shape[0], mesh, seq_axis, spec.normalize, batch_axis)
        else:
            inner = _wrap_builder_errors(
                sharded.build_distributed_c2r_nd, spec.shape, mesh,
                seq_axis, spec.normalize, batch_axis, tuning=spec.tuning)
        fn, split = inner, inner.split
    elif t in ("dct1", "dct2", "dct3", "dct4",
               "dst1", "dst2", "dst3", "dst4"):
        if spec.rank == 1:
            inner = sharded.build_distributed_trig_1d(
                spec.shape[0], t, mesh, seq_axis, spec.direction,
                spec.normalize, batch_axis)
        else:
            inner = _wrap_builder_errors(
                sharded.build_distributed_trig_nd, spec.shape, t, mesh,
                seq_axis, spec.direction, spec.normalize, batch_axis,
                tuning=spec.tuning)
        fn, split = inner, inner.split
    else:  # fftconv
        fn, split = _build_seq_fftconv(spec, mesh, batch_axis, seq_axis)
        if getattr(fn, "staged", False):
            route.reasons = route.reasons + ("distributed-staging",)

    if hasattr(fn, "halo"):
        # (split) is the (ndev, shard_len) SHARD geometry here, not a
        # digit factorization — label it accordingly
        route.reasons = route.reasons + (
            f"shard-split:{split}", f"fftconv-halo({fn.halo})")
    else:
        route.reasons = route.reasons + (f"digit-split:{split}",)
        if hasattr(fn, "padded_work_len"):
            # the digits factor the PADDED circular work length, not the
            # logical shape (unsplittable length folded back mod n)
            route.reasons = route.reasons + (
                f"fftconv-padded-circular:{fn.padded_work_len}",)
    if not needs_kernel:
        fn = _maybe_stage_distributed(spec, fn, route)
    return DistributedPlan(
        spec, mesh, route, fn, needs_kernel=needs_kernel,
        batch_axis=batch_axis, seq_axis=seq_axis)
