"""Direct small spatial convolution plan (k in {1,2,3}, stride 1, zero pad).

Reference counterpart: src/runtime/plans/conv2d.js + src/kernels/conv2d.js
(naive per-output-element WGSL loops).  On TPU this lowers to
`lax.conv_general_dilated` — XLA's native convolution hits the MXU; complex
inputs/kernels become channel-mixing real convolutions (C=2 in/out with the
[[re, im], [-im, re]] mixing kernel), so no complex arithmetic is needed.

Note the index convention: the reference computes cross-correlation (no
kernel flip, src/utils/math.js:440-447), which matches XLA's convolution
convention exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..spec import PlanError, PlanSpec
from .base import Plan, RouteInfo

_PRECISION = jax.lax.Precision.HIGHEST


def conv2d_geometry(spec: PlanSpec):
    """Derive pads and input shape from the output shape
    (reference: src/runtime/plans/conv2d.js:42-68)."""
    c = spec.conv
    k = c.kernel_size
    hout, wout = spec.shape
    if c.padding == "same":
        p = k // 2
        pt, pb = p, k - 1 - p
        pl, pr = p, k - 1 - p
    elif c.padding == "valid":
        pt = pb = pl = pr = 0
    else:
        pt, pb, pl, pr = c.pad
    hin = hout + (k - 1) - pt - pb
    win = wout + (k - 1) - pl - pr
    if hin <= 0 or win <= 0:
        raise PlanError(f"derived conv2d input shape invalid: Hin={hin} Win={win}")
    if c.padding == "valid" and (hin - k + 1 != hout or win - k + 1 != wout):
        raise PlanError('padding="valid" requires output [Hin-k+1, Win-k+1]')
    return (pt, pb, pl, pr), (hin, win)


def build_conv2d(spec: PlanSpec) -> Plan:
    c = spec.conv
    k = c.kernel_size
    complex_data = True  # default layout.interleavedComplex in the reference
    # our API: complex iff input has trailing component dim; decided by
    # kernel_type + an explicit flag on the conv spec.  We follow the
    # reference: data is complex unless the plan is built for real arrays.
    pads, (hin, win) = conv2d_geometry(spec)
    pt, pb, pl, pr = pads
    batch = spec.batch
    ktype = c.kernel_type

    from ..runtime.policy import knob_reasons
    route = RouteInfo(mode="xla", impl="xla", axis_kinds=(),
                      reasons=("conv2d-xla-conv",) + knob_reasons(spec),
                      attempts=("xla",))

    dn = jax.lax.conv_dimension_numbers((batch, hin, win, 1), (k, k, 1, 1),
                                        ("NHWC", "HWIO", "NHWC"))
    padding = ((pt, pb), (pl, pr))

    def conv(x_nhwc, w_hwio, groups=1):
        return jax.lax.conv_general_dilated(
            x_nhwc, w_hwio, window_strides=(1, 1), padding=padding,
            dimension_numbers=dn, feature_group_count=groups,
            precision=_PRECISION)

    def fn(consts_, x, kernel, out=None):
        if x.ndim == 3:  # real data (batch, Hin, Win)
            if ktype == "complex":
                raise PlanError("real input does not support complex kernel")
            w = kernel.reshape(k, k, 1, 1)
            y = conv(x[..., None], w)
            return y[..., 0]
        # complex interleaved (batch, Hin, Win, 2)
        if ktype == "real":
            # depthwise: each component convolved with the same real kernel
            w = jnp.tile(kernel.reshape(k, k, 1, 1), (1, 1, 1, 2))
            return conv(x, w, groups=2)
        # complex kernel (k, k, 2): channel-mixing real convolution
        wr, wi = kernel[..., 0], kernel[..., 1]
        w = jnp.stack([jnp.stack([wr, wi], axis=-1),
                       jnp.stack([-wi, wr], axis=-1)], axis=-2)  # (k, k, I=2, O=2)
        return conv(x, w)

    ws = batch * hin * win * 8
    plan = Plan(spec, {}, fn, route, needs_kernel=True, workspace_bytes=ws)
    plan.in_shape = (hin, win)
    plan.pad = pads

    def coerce_kernel(kernel):
        kernel = jnp.asarray(kernel, dtype=jnp.float32)
        if ktype == "real":
            if kernel.size != k * k:
                raise PlanError(f"conv2d real kernel must have {k * k} taps")
            return kernel.reshape(k, k)
        if kernel.size != k * k * 2:
            raise PlanError(f"conv2d complex kernel must have {k * k} complex taps")
        return kernel.reshape(k, k, 2)

    plan._coerce_kernel = coerce_kernel
    return plan
