"""c2c / r2c / c2r / dct-dst plan builders.

Reference counterparts: src/runtime/plans/c2c.js (4212 LoC), r2c.js, c2r.js,
dct_fft.js — collapsed here to compact functional pipelines because XLA
subsumes the reference's workspace arenas, chunked staging and large-mode
routing (see plans/base.py docstring and runtime/policy.py).
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..core import engine
from ..core.axis import select_axis_kind
from ..spec import PlanSpec
from ..utils.mathref import trig_matrix
from .base import Plan, RouteInfo, build_staged_fn

_PRECISION = jax.lax.Precision.HIGHEST


def _scale_mul(y, scale: float):
    return y if scale == 1.0 else y * jnp.asarray(scale, dtype=y.dtype)


def _route_for(spec: PlanSpec) -> RouteInfo:
    kinds = tuple(select_axis_kind(n, d, spec.tuning) for d, n in enumerate(spec.shape))
    from ..runtime.policy import resolve_route
    return resolve_route(spec, kinds)


# ---------------------------------------------------------------------------
# c2c
# ---------------------------------------------------------------------------

def build_c2c(spec: PlanSpec) -> Plan:
    """ND complex FFT (reference: src/runtime/plans/c2c.js)."""
    axis_plans = engine.build_axis_plans(spec.shape, spec.direction, spec.tuning)
    consts = engine.collect_consts(axis_plans)
    scale = engine.plan_scale(spec.normalize, spec.direction, spec.n_total)
    route = _route_for(spec)

    use_fused = route.mode == "pallas-fused"
    if use_fused:
        from ..core import fused
        # normalize scale is folded into the kernel's stage-B matrix
        fused_fn = fused.build_fused_1d(spec, consts, scale)

    def core(x, c):
        if use_fused:
            return fused_fn(x, c)
        return _scale_mul(engine.apply_nd(x, axis_plans, c), scale)

    fn, in_shape, out_shape, s_in, s_out = build_staged_fn(
        spec, core, spec.shape, spec.shape, True, True)

    donate = (spec.in_place and not s_in.has_layout and not s_out.has_layout
              and spec.io_view.input is None and spec.io_view.output is None)
    ws = 2 * spec.batch * spec.n_total * 8  # ping-pong estimate, bytes
    plan = Plan(spec, consts, fn, route, workspace_bytes=ws, donate=donate)
    plan._expect_input = (in_shape, True)
    plan.output_shape = out_shape
    return plan


# ---------------------------------------------------------------------------
# r2c / c2r (packed half-spectrum along logical axis 0;
# reference: src/runtime/plans/r2c.js, c2r.js, src/kernels/real_complex.js)
# ---------------------------------------------------------------------------

def packed_shape(shape):
    return (shape[0] // 2 + 1,) + tuple(shape[1:])


def build_r2c(spec: PlanSpec) -> Plan:
    axis_plans = engine.build_axis_plans(spec.shape, "forward", spec.tuning)
    consts = engine.collect_consts(axis_plans)
    scale = engine.plan_scale(spec.normalize, "forward", spec.n_total)
    route = _route_for(spec)
    p0 = spec.shape[0] // 2 + 1

    def core(x, c):
        # widen real -> interleaved complex (reference: real_complex.js:1-19)
        xi = jnp.stack([x, jnp.zeros_like(x)], axis=-1)
        y = engine.apply_nd(xi, axis_plans, c)
        y = y[:, :p0, ...]  # pack non-negative bins of axis 0
        return _scale_mul(y, scale)

    fn, in_shape, out_shape, _, _ = build_staged_fn(
        spec, core, spec.shape, packed_shape(spec.shape), False, True)
    ws = 3 * spec.batch * spec.n_total * 8
    plan = Plan(spec, consts, fn, route, workspace_bytes=ws)
    plan._expect_input = (in_shape, False)
    plan.output_shape = out_shape
    return plan


def build_c2r(spec: PlanSpec) -> Plan:
    axis_plans = engine.build_axis_plans(spec.shape, "inverse", spec.tuning)
    consts = engine.collect_consts(axis_plans)
    scale = engine.plan_scale(spec.normalize, "inverse", spec.n_total)
    route = _route_for(spec)
    n0 = spec.shape[0]
    k_max_mirror = n0 // 2 - 1 if n0 % 2 == 0 else n0 // 2

    def core(xp, c):
        # ND Hermitian mirror X[(N-k) mod N] = conj(X[k]): flip axis 0 over
        # the mirrored bin range, flip+wrap every other logical axis
        # (reference: generateUnpackC2RWGSL per-axis mirrored coords,
        # real_complex.js:116-201)
        if k_max_mirror >= 1:
            mirror = jnp.flip(xp[:, 1:k_max_mirror + 1, ...], axis=1)
            mirror = mirror * jnp.asarray([1.0, -1.0], dtype=xp.dtype)  # conj
            for d in range(2, mirror.ndim - 1):  # skip batch, axis0, component
                mirror = jnp.roll(jnp.flip(mirror, axis=d), 1, axis=d)
            full = jnp.concatenate([xp, mirror], axis=1)
        else:
            full = xp
        y = engine.apply_nd(full, axis_plans, c)
        return _scale_mul(y[..., 0], scale)  # real part

    fn, in_shape, out_shape, _, _ = build_staged_fn(
        spec, core, packed_shape(spec.shape), spec.shape, True, False)
    ws = 3 * spec.batch * spec.n_total * 8
    plan = Plan(spec, consts, fn, route, workspace_bytes=ws)
    plan._expect_input = (in_shape, True)
    plan.output_shape = out_shape
    return plan


# ---------------------------------------------------------------------------
# DCT / DST 1-4
# ---------------------------------------------------------------------------
# Device path: dense trig-matrix contraction per axis on the MXU.  For the
# reference's sizes (8x8 blocks, 512^2 images) the O(N^2) matmul is at or
# below the memory-bound roofline on TPU, so this *is* the fast path — the
# reference's length-M FFT embedding (src/runtime/plans/dct_fft.js:21-265)
# only wins for very large N, where the mixed-radix FFT route takes over
# (tracked in runtime/policy.py as "dct-fft" mode; trig matrices are exact
# f64-precomputed either way).

def build_dct(spec: PlanSpec) -> Plan:
    kind = spec.plan_type
    route = _route_for(spec)
    consts: Dict[str, np.ndarray] = {}
    self_inverse = kind in ("dct1", "dst1", "dct4", "dst4")
    mdir = "forward" if self_inverse else spec.direction
    for d, n in enumerate(spec.shape):
        m = trig_matrix(kind, n, mdir)
        consts[f"trig{d}"] = m.T.astype(np.float32)  # (n_in, n_out): apply as x @ T
    scale = engine.plan_scale(spec.normalize, spec.direction, spec.n_total)

    def core(x, c):
        y = x
        for d in range(spec.rank):
            if spec.shape[d] == 1:
                # 1-point transforms: dct1 undefined (validated), dst1/dct4/
                # dst4/dct2 reduce to identity-like matrices handled below
                pass
            ax = 1 + d
            y = jnp.moveaxis(y, ax, -1)
            y = jnp.matmul(y, c[f"trig{d}"], precision=_PRECISION)
            y = jnp.moveaxis(y, -1, ax)
        return _scale_mul(y, scale)

    fn, in_shape, out_shape, _, _ = build_staged_fn(
        spec, core, spec.shape, spec.shape, False, False)
    ws = 2 * spec.batch * spec.n_total * 4
    plan = Plan(spec, consts, fn, route, workspace_bytes=ws)
    plan._expect_input = (in_shape, False)
    plan.output_shape = out_shape
    return plan
