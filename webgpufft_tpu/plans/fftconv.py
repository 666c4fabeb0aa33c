"""FFT convolution / correlation plan.

Reference counterpart: src/runtime/plans/fftconv.js (1715 LoC) +
src/kernels/fft_conv.js + fftconv_channel_lane_presets.js.  The reference
compiles three internal C2CPlans (data fwd / kernel fwd / data inv) and
chunks a pointwise-multiply kernel through binding-size windows; here the
whole pipeline — embed -> forward FFT -> pointwise complex multiply ->
inverse FFT -> boundary crop -> output placement — is a single jitted XLA
program, with the 1/N of the backward inverse folded into the kernel
spectrum.  Multi-kernel workflows broadcast over a leading kernel dim; XLA
shares the data-side forward FFT across kernels automatically (the
reference has to loop kernels and re-run it per kernel,
fftconv.js:1480-1709).
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..core import engine
from ..core.axis import STATIC_SLAB_MAX, select_axis_kind
from ..spec import PlanError, PlanSpec
from ..utils.mathref import fftconv_out_shape
from . import stages
from .base import Plan, RouteInfo


# Overlap-save auto-selection bounds: the route wins when the direct
# fftShape FFT would be a giant four-step chain but the kernel is short —
# batched small-block FFTs keep every einsum in the 2-contraction sweet
# spot and bound memory to ~B/H (~1.14x) of the signal.  Measured on-chip
# (benches/r3e_overlap_save.py, r4_os_gate.py 18-config sweep): wins
# 1.03-4.85x for n >= 2^15 at every batch and for n = 2^14 at batch >= 4
# (the scipy-shaped oaconvolve sweet spot); the only measured loss is
# n=2^14 batch=1 (0.89x).  A mildly-chunked block tensor (3 serialized
# lax.map groups) still won 2.74x, but heavy serialization loses 2.5x
# (r2 data) — so auto allows at most OS_MAX_GROUPS block groups.
OS_MIN_N = 1 << 14             # absolute floor
OS_SOLO_N = 1 << 15            # below this, need n*batch >= OS_MIN_WORK
OS_MIN_WORK = 1 << 16          # (n=2^14 b=1 measured 0.89x — the one loss)
OS_MAX_TAP = 1 << 12
OS_MAX_GROUPS = 4


def _os_block(fc, k: int) -> int:
    """Resolved smooth block length (seam trick requires B >= 2*(k-1))."""
    from ..utils import factors
    pad_k = max(k - 1, 1)
    b = fc.overlap_block or max(8192, 8 * pad_k)
    return factors.next_smooth_at_least(max(b, 2 * pad_k))


def _os_blocks(fc, n: int, k: int) -> int:
    """Block count nb for the resolved geometry."""
    B = _os_block(fc, k)
    H = B - (k - 1)
    _, out_shape, out_off = fftconv_out_shape([n], [k], fc.boundary)
    wrap = (k - 1) if fc.boundary == "circular" else 0
    return -(-(out_off[0] + wrap + out_shape[0]) // H)


def _os_group_size(fc, n: int, k: int, batch: int, bound: int = None):
    """(group, nb): the lax.map group size the builder will pick so each
    (batch * group * B) block-group einsum stays within the validated
    operand size, and the block count."""
    from .transforms import CHUNK_ELEMS
    bound = bound or CHUNK_ELEMS
    B = _os_block(fc, k)
    nb = _os_blocks(fc, n, k)
    if batch * nb * B <= bound:
        return nb, nb
    cap = max(1, bound // max(1, batch * B))
    group = 1
    for d in range(1, min(nb, cap) + 1):
        if nb % d == 0:
            group = d
    return group, nb


def _os_group_count(fc, n: int, k: int, batch: int, bound: int = None) -> int:
    group, nb = _os_group_size(fc, n, k, batch, bound)
    return nb // group


def _overlap_save_route(spec: PlanSpec, kshape) -> bool:
    fc = spec.fft_conv
    if fc.overlap_save == "off":
        return False
    structural_ok = (
        spec.rank == 1 and fc.kernel_count == 1
        and fc.channel_input is None and fc.channel_output is None
        and fc.output_kernel_stride_elements is None
        and spec.zero_pad.read is None and spec.zero_pad.write is None
        and fc.mode == "convolution" and spec.precision == "f32")
    if fc.overlap_save == "on":
        if not structural_ok:
            raise PlanError(
                "fftConv.tuning.overlapSave='on' requires rank 1, "
                "kernelCount 1, convolution mode, f32, and no "
                "channelPolicy/zeroPad/outputKernelStride")
        if kshape[0] < 2 or kshape[0] >= spec.shape[0]:
            raise PlanError(
                "overlapSave needs 2 <= kernel length < shape")
        return True
    n, k = spec.shape[0], kshape[0]
    if not (structural_ok and n >= OS_MIN_N
            and (n >= OS_SOLO_N or n * spec.batch >= OS_MIN_WORK)
            and 2 <= k and k - 1 <= OS_MAX_TAP and 8 * k <= n):
        return False
    # heavily serialized block groups lose to the standard route
    # (measured 2.5x, benches/r3e); a few groups still win (2.74x at 3
    # groups, r4_os_gate) — auto takes overlap-save up to OS_MAX_GROUPS
    from .transforms import plan_chunk_elems
    return (_os_group_count(fc, n, k, spec.batch, plan_chunk_elems(spec))
            <= OS_MAX_GROUPS)


def _build_fftconv_overlap_save(spec: PlanSpec, kshape) -> Plan:
    """Overlap-save streaming convolution: block FFTs of length B with
    (k-1)-sample overlap instead of one length-(n+k-1) FFT.

    The single-chip analog of the reference's long-sequence line-window
    chunking (src/plan.js:597-838, large_policy.js:95-163) applied to
    convolution: cost O(n log B) instead of O(n log n), memory bounded by
    the block expansion B/(B-k+1).  Circular boundaries prepend the
    (k-1)-sample wrap so every mode reduces to a crop of the linear-full
    result.
    """
    from ..core.axis import MixedAxisPlan, mxu_precision
    from ..utils import factors

    fc = spec.fft_conv
    n = spec.shape[0]
    k = kshape[0]
    batch = spec.batch
    pad_k = k - 1
    B = _os_block(fc, k)
    H = B - pad_k
    if H < max(pad_k, 1):
        raise PlanError(
            f"overlapSave block ({B}) must be >= twice the kernel "
            f"overlap ({pad_k})")
    _, out_shape, out_off = fftconv_out_shape([n], [k], fc.boundary)
    out_len = out_shape[0]
    # the linear-full result of the (possibly wrap-extended) input
    wrap = pad_k if fc.boundary == "circular" else 0
    L = n + wrap
    s0 = out_off[0] + wrap            # crop start in linear-full indices
    nb = -(-(s0 + out_len) // H)      # blocks needed to cover the crop
    total = (nb + 1) * H              # shifted-reshape span (>= pad_k + L)
    right = total - pad_k - L
    prec = mxu_precision(spec.tuning)
    fwd = MixedAxisPlan(B, "forward", "os/f", spec.tuning.max_sub_length,
                        prec=prec)
    inv = MixedAxisPlan(B, "inverse", "os/i", spec.tuning.max_sub_length,
                        prec=prec)
    consts: Dict[str, np.ndarray] = {}
    consts.update(fwd.consts())
    consts.update(inv.consts())

    from ..runtime.policy import knob_reasons
    route = RouteInfo(
        mode="overlap-save", impl="xla", axis_kinds=("mixed",),
        reasons=("fftconv-overlap-save", f"os-block({B})", f"os-hop({H})",
                 f"os-blocks({nb})") + knob_reasons(spec),
        attempts=("overlap-save",))

    # bound einsum operands: process block groups through lax.map so each
    # group's (batch * group * B) stays within the validated size
    from .transforms import plan_chunk_elems
    group, _ = _os_group_size(fc, n, k, batch, plan_chunk_elems(spec))
    if group != nb:
        route.reasons = route.reasons + (f"os-block-chunk({group})",)

    def fn(consts_, x, kernel, out=None):
        b = x.shape[0]
        if wrap:
            x = jnp.concatenate([x[:, n - wrap:, :], x], axis=1)
        xp = jnp.pad(x, ((0, 0), (pad_k, right), (0, 0)))
        # seam-trick overlapping windows: window i is the contiguous
        # [i*H, i*H+H) hop plus the next hop's first pad_k samples — two
        # free reshapes and a concat instead of a (slow) overlap gather
        hops = xp[:, :nb * H, :].reshape(b, nb, H, 2)
        seam = xp[:, H:(nb + 1) * H, :].reshape(b, nb, H, 2)[:, :, :pad_k, :]
        blocks = jnp.concatenate([hops, seam], axis=2)   # (b, nb, B, 2)
        ke = jnp.pad(kernel.reshape(k, 2), ((0, B - k), (0, 0)))
        kf = fwd.apply(ke, consts_) * jnp.asarray(1.0 / B, jnp.float32)

        def one(blk):                 # (b, g, B, 2) -> valid (b, g, H, 2)
            xf = fwd.apply(blk, consts_)
            ar, ai = xf[..., 0], xf[..., 1]
            br, bi = kf[..., 0], kf[..., 1]
            yf = jnp.stack([ar * br - ai * bi, ar * bi + ai * br], axis=-1)
            yt = inv.apply(yf, consts_)
            return yt[..., pad_k:, :]

        ngroups = nb // group
        if group == nb:
            valid = one(blocks)
        elif ngroups <= STATIC_SLAB_MAX:
            # static unroll (1.32x over lax.map on slab programs, r10;
            # lax.map serialization measured 2.5x on THIS route, r3g).
            # NOTE: the transform batch-chunk sites dropped their unroll
            # after the r29-31 XLA-TPU miscompile (geometry-dependent,
            # silent); this route keeps it for the measured 2.5x — its
            # per-group operands are bounded by the validated size and
            # `selftest --deep` guards the unrolled branch at 2^20-class
            # scale on-chip.  If that check ever fails, switch this
            # branch to the lax.map path below.
            blk5 = blocks.reshape(b, ngroups, group, B, 2)
            valid = jnp.stack([one(blk5[:, g]) for g in range(ngroups)],
                              axis=1).reshape(b, nb, H, 2)
        else:
            xs = jnp.moveaxis(
                blocks.reshape(b, ngroups, group, B, 2), 1, 0)
            valid = jnp.moveaxis(jax.lax.map(one, xs), 0, 1)
            valid = valid.reshape(b, nb, H, 2)
        y = valid.reshape(b, nb * H, 2)
        return jax.lax.slice_in_dim(y, s0, s0 + out_len, axis=1)

    ws = 2 * batch * nb * B * 8
    plan = Plan(spec, consts, fn, route, needs_kernel=True,
                workspace_bytes=ws)
    plan.accepts_out = False
    plan._expect_input = ((batch, n, 2), True)
    plan.fft_shape = (B,)
    plan.out_shape = (out_len,)

    def coerce_kernel(kernel):
        kernel = jnp.asarray(kernel, dtype=jnp.float32)
        if kernel.shape == (k, 2):
            return kernel
        if kernel.shape == (1, k, 2):
            return kernel[0]
        if kernel.ndim == 1 and kernel.size == k * 2:
            return kernel.reshape(k, 2)
        raise PlanError(
            f"fftconv kernel shape {tuple(kernel.shape)} not understood; "
            f"expected ({k}, 2)")

    plan._coerce_kernel = coerce_kernel
    return plan


def build_fftconv(spec: PlanSpec) -> Plan:
    fc = spec.fft_conv
    shape = spec.shape
    rank = spec.rank
    kshape = tuple(fc.kernel_shape) if fc.kernel_shape is not None else tuple(shape)
    if _overlap_save_route(spec, kshape):
        return _build_fftconv_overlap_save(spec, kshape)
    fft_shape, out_shape, out_off = fftconv_out_shape(shape, kshape, fc.boundary)
    fft_shape, out_shape = tuple(fft_shape), tuple(out_shape)
    nf = math.prod(fft_shape)
    batch, kcount = spec.batch, fc.kernel_count

    fwd = engine.build_axis_plans(fft_shape, "forward", spec.tuning, prefix="f/ax")
    inv = engine.build_axis_plans(fft_shape, "inverse", spec.tuning, prefix="i/ax")
    consts: Dict[str, np.ndarray] = {}
    consts.update(engine.collect_consts(fwd))
    consts.update(engine.collect_consts(inv))

    kinds = tuple(select_axis_kind(n, d, spec.tuning) for d, n in enumerate(fft_shape))
    from ..runtime.policy import knob_reasons
    route = RouteInfo(mode="xla", impl="xla", axis_kinds=kinds,
                      reasons=("fftconv-xla-pipeline",) + knob_reasons(spec),
                      attempts=("xla",))

    # channel-lane input gather (reference: fftconv.js:213-281 channelPolicy
    # -> whdcn lowering); input side shape is the data `shape`
    ch_in, ch_out = fc.channel_input, fc.channel_output
    if ch_in is not None:
        in_st, in_off, in_bs = stages.resolve_side_layout(shape, None, 0, None, ch_in)
    out_kernel_stride = fc.output_kernel_stride_elements

    def _pad_to(arr, target, lead_dims):
        pads = [(0, 0)] * lead_dims + [
            (0, target[d] - arr.shape[lead_dims + d]) for d in range(rank)
        ] + [(0, 0)]
        return jnp.pad(arr, pads)

    # Large-batch chunk mode (see plans/transforms.CHUNK_ELEMS): the data-side
    # FFT/pointwise/inverse carry a kcount factor, so chunk the batch such
    # that kcount*chunk_b*nf stays within the validated einsum-operand size.
    from .transforms import plan_chunk_elems
    bound_ = plan_chunk_elems(spec)
    if spec.tuning.chunk_elems is not None:
        route.reasons = route.reasons + (f"chunk-elems-override({bound_})",)
    chunk_b = batch
    if kcount * batch * nf > bound_:
        cap = max(1, bound_ // max(1, kcount * nf))
        chunk_b = 1
        for d_ in range(1, min(batch, cap) + 1):
            if batch % d_ == 0:
                chunk_b = d_
        route.reasons = route.reasons + (f"large-batch-chunk({chunk_b})",)

    def fn(consts_, x, kernel, out=None):
        # ---- input staging -> (batch, *fft_shape, 2)
        if ch_in is not None:
            x = stages.gather_flat(x, shape=shape, strides=in_st, offset=in_off,
                                   batch_stride=in_bs, batch=batch, interleaved=True)
        xe = _pad_to(x, fft_shape, 1)
        xe = stages.zero_pad_apply(xe, spec.zero_pad.read, fft_shape, True)

        # ---- kernel-side forward FFT (once, shared across batch chunks)
        ke = _pad_to(kernel, fft_shape, 1)                        # (kcount, *fft, 2)
        kf = engine.apply_nd(ke, fwd, consts_)
        if fc.mode == "correlation":
            kf = kf * jnp.asarray([1.0, -1.0], dtype=kf.dtype)    # conj spectrum
        kf = kf * jnp.asarray(1.0 / nf, dtype=kf.dtype)           # fold backward 1/N

        def data_pipeline(xc):
            cb = xc.shape[0]
            xf = engine.apply_nd(xc, fwd, consts_)                # (cb, *fft, 2)
            # pointwise complex multiply, broadcast (kcount, cb, ...)
            a = xf[None, ...]
            b = kf[:, None, ...]
            ar, ai = a[..., 0], a[..., 1]
            br, bi = b[..., 0], b[..., 1]
            yf = jnp.stack([ar * br - ai * bi, ar * bi + ai * br], axis=-1)
            yc = engine.apply_nd(yf, inv, consts_, batch_dims=2)
            yc = stages.zero_pad_apply(
                yc.reshape((kcount * cb,) + fft_shape + (2,)),
                spec.zero_pad.write, fft_shape, True)
            return yc.reshape((kcount, cb) + fft_shape + (2,))

        if chunk_b == batch:
            y = data_pipeline(xe)
        else:
            xs = xe.reshape(batch // chunk_b, chunk_b, *xe.shape[1:])
            ys = jax.lax.map(data_pipeline, xs)        # (nc, kc, cb, *fft, 2)
            y = jnp.moveaxis(ys, 1, 0).reshape((kcount, batch) + fft_shape + (2,))
        crop = (slice(None), slice(None)) + tuple(
            slice(out_off[d], out_off[d] + out_shape[d]) for d in range(rank))
        y = y[crop]                                                # (kc, b, *out, 2)

        # ---- output placement
        if ch_out is not None:
            cs = (ch_out.channel_stride_elements
                  if ch_out.channel_stride_elements is not None else math.prod(out_shape))
            bs = (ch_out.batch_stride_elements
                  if ch_out.batch_stride_elements is not None else ch_out.channels * cs)
            st = stages.default_strides(out_shape)
            res = out
            need = bs * batch  # full channel-lane frames for all batches
            for k in range(kcount):
                off_k = (ch_out.offset_elements
                         + (ch_out.channel_index + k * ch_out.kernel_step_channels) * cs)
                need = max(need, off_k + bs * (batch - 1) + stages.layout_span(out_shape, st))
            for k in range(kcount):
                off_k = (ch_out.offset_elements
                         + (ch_out.channel_index + k * ch_out.kernel_step_channels) * cs)
                res = stages.scatter_flat(
                    y[k], shape=out_shape, strides=st, offset=off_k,
                    batch_stride=bs, batch=batch, interleaved=True,
                    out=res, min_len=need)
            return res
        if out_kernel_stride is not None:
            st = stages.default_strides(out_shape)
            span = math.prod(out_shape)
            res = out
            need = max(out_kernel_stride * (kcount - 1) + span * batch,
                       out_kernel_stride * kcount)
            for k in range(kcount):
                res = stages.scatter_flat(
                    y[k], shape=out_shape, strides=st, offset=k * out_kernel_stride,
                    batch_stride=span, batch=batch, interleaved=True,
                    out=res, min_len=need)
            return res
        if kcount == 1:
            return y[0]                                            # (b, *out, 2)
        if fc.output_layout == "batch-major":
            return jnp.moveaxis(y, 0, 1)                           # (b, kc, *out, 2)
        return y                                                   # (kc, b, *out, 2)

    ws = (2 * batch + 2 * kcount + 2 * kcount * batch) * nf * 8
    plan = Plan(spec, consts, fn, route, needs_kernel=True, workspace_bytes=ws)
    # out= merging is meaningful only for the flat-scatter output modes
    plan.accepts_out = ch_out is not None or out_kernel_stride is not None
    plan._expect_input = ((None,), True) if ch_in is not None else (
        (batch,) + tuple(shape) + (2,), True)
    plan.fft_shape = fft_shape
    plan.out_shape = out_shape

    def coerce_kernel(kernel):
        """Accept (kc, *kshape, 2) | (*kshape, 2) [kc=1] | packed flat
        (kc*prod(kshape), 2) | list of per-kernel payloads
        (reference: docs/API.md:279-287)."""
        if isinstance(kernel, (list, tuple)):
            if len(kernel) != kcount:
                raise PlanError(f"kernel list must have {kcount} entries")
            kernel = jnp.stack([jnp.asarray(k).reshape(kshape + (2,)) for k in kernel])
            return kernel.astype(jnp.float32)
        kernel = jnp.asarray(kernel, dtype=jnp.float32)
        want = (kcount,) + kshape + (2,)
        kn = math.prod(kshape)
        if kernel.shape == want:
            return kernel
        if kcount == 1 and kernel.shape == kshape + (2,):
            return kernel[None]
        if kernel.ndim == 2 and kernel.shape == (kcount * kn, 2):
            return kernel.reshape(want)
        if kernel.ndim == 1 and kernel.size == kcount * kn * 2:
            return kernel.reshape(want)
        raise PlanError(
            f"fftconv kernel shape {tuple(kernel.shape)} not understood; "
            f"expected {want}, {kshape + (2,)} (kcount=1), packed ({kcount * kn}, 2), "
            f"or a list of {kcount} payloads")

    plan._coerce_kernel = coerce_kernel
    return plan
