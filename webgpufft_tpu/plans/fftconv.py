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
from ..core.axis import select_axis_kind
from ..spec import PlanError, PlanSpec
from ..utils.mathref import fftconv_out_shape
from . import stages
from .base import Plan, RouteInfo


def build_fftconv(spec: PlanSpec) -> Plan:
    fc = spec.fft_conv
    shape = spec.shape
    rank = spec.rank
    kshape = tuple(fc.kernel_shape) if fc.kernel_shape is not None else tuple(shape)
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
    from .transforms import CHUNK_ELEMS
    chunk_b = batch
    if kcount * batch * nf > CHUNK_ELEMS:
        cap = max(1, CHUNK_ELEMS // max(1, kcount * nf))
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
