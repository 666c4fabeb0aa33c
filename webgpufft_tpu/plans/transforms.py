"""c2c / r2c / c2r / dct-dst plan builders.

Reference counterparts: src/runtime/plans/c2c.js (4212 LoC), r2c.js, c2r.js,
dct_fft.js — collapsed here to compact functional pipelines because XLA
subsumes the reference's workspace arenas, chunked staging and large-mode
routing (see plans/base.py docstring and runtime/policy.py).
"""

from __future__ import annotations

import math
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..core import engine
from ..core.axis import (make_smooth_plan, select_axis_kind,
                         slabbed_axis_apply, OPERAND_CHUNK_ELEMS)
from ..core.cplx import cmul_const, const_pair as cplx_const_pair
from ..spec import PlanError, PlanSpec
from ..utils.mathref import trig_matrix
from .base import Plan, RouteInfo, build_staged_fn

_PRECISION = jax.lax.Precision.HIGHEST


def _scale_mul(y, scale: float):
    return y if scale == 1.0 else y * jnp.asarray(scale, dtype=y.dtype)


# Largest batch*N (complex elements) a single core invocation may process.
# Two reasons (see build_c2c): backend-validated einsum operand sizes
# (silent miscompilation observed at 2^24 on the target stack) and bounded
# intermediate HBM footprint — the reference's large-batch chunk mode analog.
# Within-transform chunking (four-step slabs, slabbed_axis_apply) bounds
# operands when a single item exceeds this.
CHUNK_ELEMS = OPERAND_CHUNK_ELEMS


def plan_chunk_elems(spec_or_tuning) -> int:
    """The plan's effective operand/batch-chunk bound: the per-plan
    tuning.chunkElements override when set, the validated global otherwise.

    Scope: honored by single-chip transform plans (c2c/r2c/c2r/dct/fftconv
    and their internal four-step/slab routes).  Distributed plans
    (parallel/sharded.py, parallel/plans.py) and NUFFT tap chunking keep
    the validated global — their shard-local operands are already bounded
    by the mesh split, so the per-plan knob is intentionally not plumbed
    through (documented in spec.TuningSpec.chunk_elems)."""
    tun = getattr(spec_or_tuning, "tuning", spec_or_tuning)
    ce = getattr(tun, "chunk_elems", None) if tun is not None else None
    return ce or CHUNK_ELEMS


def chunked_batch(batch: int, items_elems: int, bound: int = None):
    """Per-chunk batch size (== batch when no chunking needed)."""
    bound = bound or CHUNK_ELEMS
    if batch * items_elems <= bound:
        return batch
    cap = max(1, bound // max(items_elems, 1))
    chunk = 1
    for d in range(1, min(batch, cap) + 1):
        if batch % d == 0:
            chunk = d
    return chunk


def maybe_chunk_core(core, batch: int, items_elems: int, route: RouteInfo,
                     bound: int = None, unroll_ok: bool = False):
    """Wrap ``core(x, c)`` to run per batch-slice when the total size
    exceeds the chunk bound (tuning.chunkElements or CHUNK_ELEMS).
    Records the chunk size in route reasons.

    Serialization is PER CORE TYPE (``unroll_ok``), both legs with
    on-chip evidence:

    - r2c/c2r/trig cores (unroll_ok=False) MUST serialize through
      lax.map: XLA-TPU miscompiles the statically-unrolled
      slice->core->concat program at the 256^3 production geometry —
      silently wrong results (rel ~1.2-1.5) at EVERY chunk size, on the
      r2c forward and the c2r inverse, while the identical trace is
      correct on CPU, correct per-dispatch, correct at 128^3.
      optimization_barrier between chunk outputs does NOT fix it, so it
      is not cross-chunk fusion.  Evidence: benches/r29_r2c_tpu_bisect.py,
      r30_chunk_bisect.py, r31_chunk_fix.py (logs benches/logs/r5/).
      Trig cores ride the safe leg untested (their suite geometries
      never chunk).
    - the c2c core (unroll_ok=True) keeps the round-4 static unroll for
      groups <= STATIC_SLAB_MAX: the r30 bisect verified it CORRECT
      on-chip at the miscompile geometry (256^3 b3 unrolled c2c leg),
      and the lax.map spelling COMPILE-OOMs at c2c_1d_4096_b4096 —
      XLA materializes remat copies of the (4096, 4096, 2) operand in a
      T(8,128) layout that pads the trailing-2 dim 64x (2x 8 GB HLO
      temps for a 128 MB array; benches/logs/r5/session4.log, the
      trailing-2 relayout pathology class from CLAUDE.md).  The unroll
      is also 1.32x faster on slab-class programs (r10).
    """
    chunk = chunked_batch(batch, items_elems, bound)
    if chunk == batch:
        return core
    route.reasons = route.reasons + (f"large-batch-chunk({chunk})",)
    groups = batch // chunk

    from ..core.axis import STATIC_SLAB_MAX

    def chunked(x, c):
        if unroll_ok and groups <= STATIC_SLAB_MAX:
            outs = [core(jax.lax.slice_in_dim(x, g * chunk, (g + 1) * chunk,
                                              axis=0), c)
                    for g in range(groups)]
            return jnp.concatenate(outs, axis=0)
        xs = x.reshape(groups, chunk, *x.shape[1:])
        ys = jax.lax.map(lambda xc: core(xc, c), xs)
        return ys.reshape(batch, *ys.shape[2:])

    return chunked


def _route_for(spec: PlanSpec) -> RouteInfo:
    kinds = tuple(select_axis_kind(n, d, spec.tuning) for d, n in enumerate(spec.shape))
    from ..runtime.policy import resolve_route
    return resolve_route(spec, kinds)


# ---------------------------------------------------------------------------
# c2c
# ---------------------------------------------------------------------------

def build_c2c(spec: PlanSpec) -> Plan:
    """ND complex FFT (reference: src/runtime/plans/c2c.js).

    Per-axis kernel strategy, chosen by measurement (see runtime/policy.py):

    - default ("auto"): XLA everywhere — last axis via the einsum pipeline
      with digit-reversal and normalize scale folded into the final
      contraction; earlier smooth axes via the W4 mid-axis form
      (core/axis.MixedAxisPlan.apply_mid — lanes ride through every
      contraction, no moveaxis transposes).
    - impl="pallas"/"pallas-auto": last axis via the fused 1D VMEM kernel
      (core/fused.py), earlier axes via the Pallas columns kernel
      (core/fused_cols.py), per-axis XLA fallback.
    - primes/Bluestein/unsupported tilings always use the staged einsum
      path for that axis.

    Batches beyond CHUNK_ELEMS execute per batch-slice (large-batch chunk
    mode).  The normalize scale folds into whichever kernel runs last.
    """
    from ..core import fused, fused_cols

    scale = engine.plan_scale(spec.normalize, spec.direction, spec.n_total)
    route = _route_for(spec)
    rank = spec.rank
    shape = spec.shape
    batch = spec.batch
    tun = spec.tuning

    consts: Dict[str, np.ndarray] = {}
    # Measured on the target stack: XLA's einsum pipeline outruns the
    # Pallas kernels (the Pallas block pipeline tops out at ~130 GB/s vs
    # XLA's 420 GB/s even for a pure VMEM passthrough), so "auto" routes to
    # XLA; the fused kernels remain available via impl="pallas"/"pallas-auto"
    # for stacks where Pallas streams at full rate.
    allow_pallas = tun.impl in ("pallas", "pallas-auto")
    if allow_pallas and rank > 1:
        # scoped VMEM appears to be budgeted per-program, not per-kernel:
        # a plan with multiple fused kernels must split the budget between
        # them or Mosaic's stack allocation overflows at compile time
        import dataclasses as _dc
        from ..core.fused import DEFAULT_VMEM_BUDGET as _DVB
        base = tun.vmem_limit_bytes or _DVB
        tun = _dc.replace(tun, vmem_limit_bytes=max(1 << 20, base // rank))

    # Large-batch chunk mode (the TPU reading of the reference's
    # large-batch chunking, c2c.js large-chunk routes); see CHUNK_ELEMS.
    bound = plan_chunk_elems(spec)
    if tun.chunk_elems is not None:
        route.reasons = route.reasons + (f"chunk-elems-override({bound})",)
    chunk_b = chunked_batch(batch, spec.n_total, bound)
    eff_batch = chunk_b

    # A single item past the operand budget needs within-transform chunking
    # (four-step internal slabs / slabbed_axis_apply, possibly composed) —
    # the analog of the reference's out-of-core routes.  Validate
    # feasibility at build time with the ACTUAL axis plans, mirroring
    # slabbed_axis_apply's decision exactly.
    giant = eff_batch * spec.n_total > bound
    if giant:
        allow_pallas = False

    # decide per-axis strategy (scale folds into the last axis's kernel)
    strategies = []  # (kind, fn_or_axisplan)
    axis_plans = engine.build_axis_plans(shape, spec.direction, tun)
    if giant:
        from ..core.axis import slab_apply_feasible
        arr_shape = (eff_batch,) + tuple(shape)
        for d in range(rank):
            if shape[d] == 1:
                continue
            if not slab_apply_feasible(arr_shape, 1 + d, axis_plans[d], bound):
                raise PlanError(
                    f"c2c axis {d} (n={shape[d]}): a single transform of "
                    f"{spec.n_total} complex elements exceeds the validated "
                    f"einsum operand size ({bound}) and cannot be "
                    "chunked (no four-step split, no divisible complementary "
                    "axis)", axis=d, n=shape[d], n_total=spec.n_total,
                    chunk_elems=bound)
        route.reasons = route.reasons + ("single-item-exceeds-chunk",)
    for d in range(rank):
        n = shape[d]
        want_scale = scale if d == rank - 1 else 1.0
        strat = None
        if allow_pallas and n > 1:
            try:
                if d == rank - 1:
                    lines = eff_batch * math.prod(shape[:-1])
                    split = fused.choose_split(n)
                    # multi-kernel programs with tiny digit matrices overflow
                    # Mosaic's program-wide scoped VMEM; require >=16 digits
                    # when another fused kernel shares the program
                    if split is not None and rank > 1 and min(split) < 16:
                        split = None
                    if split is not None and lines >= 8:
                        fn = fused.build_fused_lines(
                            n, lines, spec.direction, tun, consts,
                            want_scale, prefix=f"fl{d}")
                        strat = ("fused-lines", fn)
                else:
                    lanes = 2 * math.prod(shape[d + 1:])
                    pre = eff_batch * math.prod(shape[:d])
                    csplit = fused_cols.choose_split(n)
                    if (csplit is not None and lanes >= 128
                            and (rank == 1 or min(csplit) >= 16)):
                        fn = fused_cols.build_fused_cols(
                            pre, n, lanes, spec.direction, want_scale,
                            consts, f"fc{d}", tun)
                        strat = ("fused-cols", fn)
            except ValueError:
                strat = None
        if strat is None:
            # non-last smooth axes run the W4 mid-axis form inside
            # apply_along_axis (lanes ride through the contractions; no
            # moveaxis transpose passes) — the default "xla" strategy
            ap = axis_plans[d]
            if (d == rank - 1 and scale != 1.0
                    and ap.kind in ("mixed", "four-step") and n > 1):
                # fold the normalize scale into the last sub-DFT table
                ap = make_smooth_plan(n, spec.direction, ap.prefix,
                                      tun.max_sub_length, out_scale=scale,
                                      tuning=tun)
                axis_plans[d] = ap
            consts.update(ap.consts())
            strat = ("xla-four-step" if ap.kind == "four-step" else "xla", ap)
        strategies.append(strat)

    kinds = tuple(k for k, _ in strategies)
    route.reasons = route.reasons + tuple(
        f"c2c-axis{d}-{k}" for d, k in enumerate(kinds))
    if (tun.large_route == "out-of-core"
            and not any(k == "xla-four-step" for k in kinds)):
        # forced out-of-core but no axis is smooth/splittable/big enough —
        # record it instead of silently doing nothing (the reference
        # validates forced largeRoute with reason codes)
        route.reasons = route.reasons + ("four-step-impossible",)
    if all(k.startswith("fused") for k in kinds) and rank >= 1:
        route.mode = "pallas-fused"
        route.impl = "pallas"
    elif any(k.startswith("fused") for k in kinds):
        route.mode = "pallas-mixed"
        route.impl = "pallas+xla"
    elif any(k == "xla-four-step" for k in kinds):
        # the reference reports a plan-level large-route mode; any four-step
        # axis makes this the out-of-core analog (c2c.js "large-out-of-core")
        route.mode = "four-step-hbm"
        route.impl = "xla"
    else:
        route.mode = "xla"
        route.impl = "xla"
    if tun.impl == "pallas" and route.mode != "pallas-fused":
        raise PlanError(
            "tuning.impl='pallas' but the fused kernels cannot serve every "
            f"axis of this plan (per-axis: {kinds})",
            axis_kinds=kinds, reasons=route.reasons)
    scale_in_kernel = (kinds[-1].startswith("fused")
                       or (kinds[-1] in ("xla", "xla-four-step")
                           and getattr(strategies[-1][1], "out_scale", 1.0) == scale))

    def core_chunk(x, c):
        y = x
        # descending axis order: a leading-axis pass poisons the layout
        # every later last-axis-form pass sees (83 ms vs 33 ms at 256^3;
        # benches/r17c_triple_barrier.py — see engine.apply_nd)
        for d in range(len(strategies) - 1, -1, -1):
            kind, obj = strategies[d]
            n = shape[d]
            if n == 1 and kind.startswith("xla"):
                continue
            if kind == "fused-lines":
                lines = eff_batch * math.prod(shape[:-1])
                y = obj(y.reshape(lines, n, 2), c).reshape(
                    eff_batch, *shape, 2)
            elif kind == "fused-cols":
                lanes = 2 * math.prod(shape[d + 1:])
                pre = eff_batch * math.prod(shape[:d])
                y = obj(y.reshape(pre, n, lanes), c).reshape(
                    eff_batch, *shape, 2)
            else:
                y = slabbed_axis_apply(y, obj, 1 + d, c, bound)
        if not scale_in_kernel:
            y = _scale_mul(y, scale)
        return y

    core = maybe_chunk_core(core_chunk, batch, spec.n_total, route, bound,
                            unroll_ok=True)  # c2c core: r30-verified

    fn, in_shape, out_shape, s_in, s_out = build_staged_fn(
        spec, core, spec.shape, spec.shape, True, True)

    donate = (spec.in_place and not s_in.has_layout and not s_out.has_layout
              and spec.io_view.input is None and spec.io_view.output is None)
    ws = 2 * spec.batch * spec.n_total * 8  # ping-pong estimate, bytes
    plan = Plan(spec, consts, fn, route, workspace_bytes=ws, donate=donate)
    plan.supports_exec_offsets = True
    plan._expect_input = (in_shape, True)
    plan.output_shape = out_shape
    return plan


# ---------------------------------------------------------------------------
# r2c / c2r (packed half-spectrum along logical axis 0;
# reference: src/runtime/plans/r2c.js, c2r.js, src/kernels/real_complex.js)
# ---------------------------------------------------------------------------

def packed_shape(shape):
    return (shape[0] // 2 + 1,) + tuple(shape[1:])


def _conj_pair(q: np.ndarray):
    """(ca, cb) such that cmul_const(z, ca, cb) == q * conj(z):
    out_re = qr*zr + qi*zi; out_im = qi*zr - qr*zi."""
    ca = np.stack([q.real, -q.real], axis=-1).astype(np.float32)
    cb = np.stack([q.imag, q.imag], axis=-1).astype(np.float32)
    return ca, cb


def _re_pair(q: np.ndarray):
    """(ca, cb) such that cmul_const(z, ca, cb) == q * Re(z)."""
    zero = np.zeros_like(q.real)
    ca = np.stack([q.real, zero], axis=-1).astype(np.float32)
    cb = np.stack([zero, q.imag], axis=-1).astype(np.float32)
    return ca, cb


def _half_trick_consts(n0: int, inverse: bool) -> Dict[str, np.ndarray]:
    """Constants for the even-N0 half-complex real FFT trick.

    Forward untangle (k = 0..n0/2, Z periodic n0/2, w = exp(-2*pi*i/n0),
    c = -i w^k / 2), FUSED per-bin form (benches/r23_untangle_fuse.py):
      X[k] = P[k] Z[k] + Q[k] conj(Z[-k]),   P = 1/2 + c, Q = 1/2 - c
    Inverse re-tangle (k = 0..n0/2-1, unnormalized-inverse convention
    with the factor 2 folded in, d = i w^{-k}):
      Z[k] = R[k] X[k] + S[k] conj(X[n0/2 - k]),   R = 1 + d, S = 1 - d
    The conj folds into the constant pairs (_conj_pair), so each output
    bin is two cmul_consts — one on the straight operand, one on a plain
    jnp.flip of the same operand — with no concat-built mirror copy, no
    explicit conj pass, and no sub/add intermediates (the r22 prefix
    attribution measured the old spelling at 3-4x its fused-elementwise
    floor).  The k=0 inverse bin folds the self-conjugate-bin zeroing
    (reference real_complex.js:116-201) into Re-projection pairs instead
    of two jnp.where masks.  The legacy ca/cb pairs remain for the
    distributed builders (parallel/sharded.py).

    Mirror accesses are spelled as jnp.flip (XLA ``rev``) rather than an
    index gather: the gather spelling measured 5.8x off elementwise
    bandwidth at 256^3 (benches/r15_untangle_rev.py).
    """
    h = n0 // 2
    if not inverse:
        k = np.arange(h + 1)
        w = np.exp(-2j * np.pi * k / n0)
        c = -0.5j * w
        ca, cb = cplx_const_pair(c)
        pa, pb = cplx_const_pair(0.5 + c)
        qa, qb = _conj_pair(0.5 - c)
        return {"rc/ca": ca, "rc/cb": cb,
                "rc/pa": pa, "rc/pb": pb, "rc/qa": qa, "rc/qb": qb}
    k = np.arange(h)
    d = 1j * np.exp(2j * np.pi * k / n0)
    ca, cb = cplx_const_pair(d)
    ra, rb = cplx_const_pair(1.0 + d)
    sa, sb = _conj_pair(1.0 - d)
    r0a, r0b = _re_pair(1.0 + d[:1])
    s0a, s0b = _re_pair(1.0 - d[:1])
    return {"cr/ca": ca, "cr/cb": cb,
            "cr/ra": ra, "cr/rb": rb, "cr/sa": sa, "cr/sb": sb,
            "cr/r0a": r0a, "cr/r0b": r0b, "cr/s0a": s0a, "cr/s0b": s0b}


def build_r2c(spec: PlanSpec) -> Plan:
    scale = engine.plan_scale(spec.normalize, "forward", spec.n_total)
    route = _route_for(spec)
    bound = plan_chunk_elems(spec)
    if spec.tuning.chunk_elems is not None:
        route.reasons = route.reasons + (f"chunk-elems-override({bound})",)
    n0 = spec.shape[0]
    p0 = n0 // 2 + 1
    rank = spec.rank
    # half-complex trick: even n0 runs a length-n0/2 complex FFT on axis 0
    # (halves compute and traffic); odd n0 widens to a full complex FFT
    # (reference always widens: real_complex.js:1-19)
    use_half = n0 % 2 == 0 and n0 >= 4
    if use_half:
        half_shape = (n0 // 2,) + spec.shape[1:]
        axis_plans = engine.build_axis_plans(half_shape, "forward", spec.tuning)
        consts = engine.collect_consts(axis_plans)
        consts.update(_half_trick_consts(n0, inverse=False))
    else:
        axis_plans = engine.build_axis_plans(spec.shape, "forward", spec.tuning)
        consts = engine.collect_consts(axis_plans)

    def core(x, c):
        if use_half:
            b = x.shape[0]
            # pair adjacent axis-0 reals into interleaved complex:
            # v[m] = x[2m] + i*x[2m+1]
            v = x.reshape(b, n0 // 2, 2, *spec.shape[1:])
            v = jnp.moveaxis(v, 2, -1)                  # (b, n0/2, rest, 2)
            z = slabbed_axis_apply(v, axis_plans[0], 1, c, bound)  # FFT axis 0
            # untangle to the packed half-spectrum, SPLIT into the h-bin
            # body and the lone Nyquist bin (k = n0/2 reads Z[0]) so every
            # rest-axis pass below runs on the 2^k body geometry — an axis
            # pass on the odd (h+1)-bin array measured 37 GB/s where the
            # same pass on the body shape runs 100-148 (r9_attrib; A/B in
            # benches/r21_half_split.py).  FUSED per-bin spelling
            # X[k] = P Z[k] + Q conj(Z[-k]) (tables in _half_trick_consts;
            # A/B in benches/r23_untangle_fuse.py): the straight operand
            # and a plain jnp.flip of it, no concat-built mirror copy.
            h = n0 // 2
            tshape = (1, p0) + (1,) * (rank - 1) + (2,)
            pa = c["rc/pa"].reshape(tshape)
            pb = c["rc/pb"].reshape(tshape)
            qa = c["rc/qa"].reshape(tshape)
            qb = c["rc/qb"].reshape(tshape)
            zb = z[:, 1:]
            z0 = z[:, :1]
            y_body = (cmul_const(zb, pa[:, 1:h], pb[:, 1:h])
                      + cmul_const(jnp.flip(zb, axis=1),
                                   qa[:, 1:h], qb[:, 1:h]))
            y0 = (cmul_const(z0, pa[:, :1], pb[:, :1])
                  + cmul_const(z0, qa[:, :1], qb[:, :1]))
            y = jnp.concatenate([y0, y_body], axis=1)
            y_nyq = (cmul_const(z0, pa[:, h:], pb[:, h:])
                     + cmul_const(z0, qa[:, h:], qb[:, h:]))
            # remaining axes: complex FFT on the (half-size) packed domain,
            # ascending.  NOTE (r18 negative result): running the rest
            # axes BEFORE axis 0 with a conj-mirror untangle
            # (FFT(conj u) = conj(mirror(FFT u)), the r17c descending-
            # order recipe) was implemented and MEASURED WORSE here —
            # NS-3D step 75.5 -> 85.4 ms, roundtrip 22.3 -> 26.1 ms
            # (benches/r18_r2c_reorder.py): at this half-array geometry
            # the axis0-then-last layout tax does not bite, and the
            # mirror's extra rev/roll passes cost real traffic.
            for d in range(1, rank):
                y = slabbed_axis_apply(y, axis_plans[d], 1 + d, c, bound)
                y_nyq = slabbed_axis_apply(y_nyq, axis_plans[d], 1 + d, c,
                                           bound)
            y = jnp.concatenate([y, y_nyq], axis=1)
        else:
            xi = jnp.stack([x, jnp.zeros_like(x)], axis=-1)
            y = engine.apply_nd(xi, axis_plans, c, chunk_elems=bound)
            y = y[:, :p0, ...]  # pack non-negative bins of axis 0
        return _scale_mul(y, scale)

    core = maybe_chunk_core(core, spec.batch, spec.n_total, route, bound)
    fn, in_shape, out_shape, _, _ = build_staged_fn(
        spec, core, spec.shape, packed_shape(spec.shape), False, True)
    ws = 3 * spec.batch * spec.n_total * 8
    plan = Plan(spec, consts, fn, route, workspace_bytes=ws)
    plan.supports_exec_offsets = True
    plan._expect_input = (in_shape, False)
    plan.output_shape = out_shape
    return plan


def build_c2r(spec: PlanSpec) -> Plan:
    scale = engine.plan_scale(spec.normalize, "inverse", spec.n_total)
    route = _route_for(spec)
    bound = plan_chunk_elems(spec)
    if spec.tuning.chunk_elems is not None:
        route.reasons = route.reasons + (f"chunk-elems-override({bound})",)
    n0 = spec.shape[0]
    rank = spec.rank
    k_max_mirror = n0 // 2 - 1 if n0 % 2 == 0 else n0 // 2
    use_half = n0 % 2 == 0 and n0 >= 4
    if use_half:
        half_shape = (n0 // 2,) + spec.shape[1:]
        axis_plans = engine.build_axis_plans(half_shape, "inverse", spec.tuning)
        consts = engine.collect_consts(axis_plans)
        consts.update(_half_trick_consts(n0, inverse=True))
    else:
        axis_plans = engine.build_axis_plans(spec.shape, "inverse", spec.tuning)
        consts = engine.collect_consts(axis_plans)

    def core_half(xp, c):
        h = n0 // 2
        b = xp.shape[0]
        # SPLIT the packed input into the h-bin body and the lone Nyquist
        # bin, then inverse-FFT the non-packed axes on each (last axis
        # first, the axis-0 half-length pass dead last — the descending
        # order every later pass tolerates, r17c).  An axis pass on the odd
        # (h+1)-bin packed array measured 37 GB/s where the same pass on
        # the 2^k body geometry runs 100-148 (r9_attrib; A/B in
        # benches/r21_half_split.py) — so no device pass ever sees h+1.
        body = xp[:, :h]
        nyq = xp[:, h:]
        for d in range(rank - 1, 0, -1):
            body = slabbed_axis_apply(body, axis_plans[d], 1 + d, c, bound)
            nyq = slabbed_axis_apply(nyq, axis_plans[d], 1 + d, c, bound)
        # re-tangle packed bins into the half-length complex line, FUSED
        # per-bin spelling Z[k] = R X[k] + S conj(X[n0/2-k]) (tables in
        # _half_trick_consts; A/B in benches/r23_untangle_fuse.py):
        # z_pre = 2*E + 2i*O = 2*Z, and IFFT_unnorm(2Z) = n0 * v, which is
        # exactly the unnormalized-inverse output pairs.  Bins 0 and n0/2
        # are self-conjugate spectra of real lines; the reference zeroes
        # them in the unpack kernel (real_complex.js:116-201) — here the
        # k=0 tables are Re-projection pairs, so residual imag in X[0] /
        # X[n0/2] never enters (no jnp.where masks).
        cshape = (1, h) + (1,) * (rank - 1) + (2,)
        ra = c["cr/ra"].reshape(cshape)
        rb = c["cr/rb"].reshape(cshape)
        sa = c["cr/sa"].reshape(cshape)
        sb = c["cr/sb"].reshape(cshape)
        bb = body[:, 1:]
        z_body = (cmul_const(bb, ra[:, 1:], rb[:, 1:])
                  + cmul_const(jnp.flip(bb, axis=1), sa[:, 1:], sb[:, 1:]))
        t0 = (1, 1) + (1,) * (rank - 1) + (2,)
        z0 = (cmul_const(body[:, :1], c["cr/r0a"].reshape(t0),
                         c["cr/r0b"].reshape(t0))
              + cmul_const(nyq, c["cr/s0a"].reshape(t0),
                           c["cr/s0b"].reshape(t0)))
        z = jnp.concatenate([z0, z_body], axis=1)
        z = slabbed_axis_apply(z, axis_plans[0], 1, c, bound)  # inverse axis 0
        z = jnp.moveaxis(z, -1, 2)                          # (b, h, 2, rest)
        out = z.reshape(b, n0, *spec.shape[1:])
        return _scale_mul(out, scale)

    def core(xp, c):
        if use_half:
            return core_half(xp, c)
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
        y = engine.apply_nd(full, axis_plans, c, chunk_elems=bound)
        return _scale_mul(y[..., 0], scale)  # real part

    core = maybe_chunk_core(core, spec.batch, spec.n_total, route, bound)
    fn, in_shape, out_shape, _, _ = build_staged_fn(
        spec, core, packed_shape(spec.shape), spec.shape, True, False)
    ws = 3 * spec.batch * spec.n_total * 8
    plan = Plan(spec, consts, fn, route, workspace_bytes=ws)
    plan.supports_exec_offsets = True
    plan._expect_input = (in_shape, True)
    plan.output_shape = out_shape
    return plan


# ---------------------------------------------------------------------------
# DCT / DST 1-4
# ---------------------------------------------------------------------------
# Two device routes per axis (reference builds everything on length-M FFT
# embeddings, src/runtime/plans/dct_fft.js:21-265):
#
# - "matmul": dense trig-matrix contraction on the MXU.  For the reference's
#   headline sizes (8x8 blocks, 512^2 images) the O(N^2) matmul is at or near
#   the memory-bound roofline, so it IS the fast path on TPU.
# - "fft": for large axes (>= tuning.dct_fft_min_n), every type lowers to a
#   complex-FFT embedding — O(N log N) (reference work lengths,
#   src/runtime/plans/dct_fft.js:10-14: dct1 -> 2(N-1), dst1 -> 2(N+1),
#   others -> 2N; typeKind build/post kernel bodies src/kernels/dct_fft.js:
#   30-131, 171-233):
#     dct2/dct3/dst2/dst3: length-N FFT with even/odd reorder + half-sample
#       phase twist (half the reference's 2N work length);
#     dct1: symmetric extension to M=2(N-1), y = Re(FFT(v))[:N];
#     dst1: odd extension to M=2(N+1), y = -Im(FFT(v))[1:N+1] / 2;
#     dct4/dst4: pre-twiddle e^{-i pi n/(2N)}, zero-pad to M=2N,
#       post-twiddle e^{-i pi (2k+1)/(4N)} — y = Re / -Im of the product.
#
# Matmul trig tables are guarded at DCT_MATMUL_MAX_ELEMS: an axis that
# would build a larger dense table raises at plan build instead of silently
# materializing a multi-GB constant (VERDICT r3 missing #1).

_DCT_FFT_KINDS = {"dct1", "dct2", "dct3", "dct4",
                  "dst1", "dst2", "dst3", "dst4"}
DCT_MATMUL_MAX_ELEMS = 1 << 24


def _dct_reorder_perms(n: int):
    """Even/odd reorder: v[m] = x[2m], v[n-1-m] = x[2m+1]."""
    perm = np.concatenate([np.arange(0, n, 2), np.arange(1, n, 2)[::-1]])
    inv = np.argsort(perm)
    return perm.astype(np.int32), inv.astype(np.int32)


def _dct_axis_fft_consts(n: int, eff_kind: str, prefix: str, tuning):
    """Constants + axis FFT plans for one FFT-routed DCT axis.

    eff_kind is "dct2"-like (forward trig) or "dct3"-like (inverse trig);
    dst variants add sign/reverse wrappers at apply time.
    """
    from ..core.axis import build_axis_plan
    if eff_kind == "dct1":
        # symmetric extension, work length 2(N-1) (dct_fft.js:10)
        ap = build_axis_plan(2 * n - 2, 0, "forward", tuning, f"{prefix}/f")
        consts = ap.consts()
        return ap, consts
    if eff_kind == "dst1":
        # odd extension, work length 2(N+1) (dct_fft.js:11)
        ap = build_axis_plan(2 * n + 2, 0, "forward", tuning, f"{prefix}/f")
        consts = ap.consts()
        return ap, consts
    if eff_kind in ("dct4", "dst4"):
        # pre/post half-sample twiddles around a length-2N FFT
        # (dct_fft.js:107-131 dct4/dst4 typeKind bodies)
        ap = build_axis_plan(2 * n, 0, "forward", tuning, f"{prefix}/f")
        nn = np.arange(n, dtype=np.float64)
        pre = np.exp(-1j * np.pi * nn / (2 * n))
        post = np.exp(-1j * np.pi * (2 * nn + 1) / (4 * n))
        consts = {f"{prefix}/p_re": pre.real.astype(np.float32),
                  f"{prefix}/p_im": pre.imag.astype(np.float32),
                  f"{prefix}/t_re": post.real.astype(np.float32),
                  f"{prefix}/t_im": post.imag.astype(np.float32)}
        consts.update(ap.consts())
        return ap, consts
    perm, inv = _dct_reorder_perms(n)
    w = np.exp(-1j * np.pi * np.arange(n) / (2 * n))
    consts: Dict[str, np.ndarray] = {f"{prefix}/perm": perm, f"{prefix}/inv": inv}
    if eff_kind in ("dct2", "dst2"):
        ap = build_axis_plan(n, 0, "forward", tuning, f"{prefix}/f")
        wa, wb = cplx_const_pair(w)
        consts[f"{prefix}/wa"] = wa
        consts[f"{prefix}/wb"] = wb
    else:
        ap = build_axis_plan(n, 0, "inverse", tuning, f"{prefix}/i")
        # U[k] = 0.5 * conj(w_k) * (X[k] - i*X[n-k]);  X[n-0] := 0
        ua, ub = cplx_const_pair(0.5 * np.conj(w))
        consts[f"{prefix}/ua"] = ua
        consts[f"{prefix}/ub"] = ub
        xm_idx = np.concatenate([[0], np.arange(n - 1, 0, -1)]).astype(np.int32)
        consts[f"{prefix}/xm"] = xm_idx
        consts[f"{prefix}/xm0"] = np.concatenate(
            [[0.0], np.ones(n - 1)]).astype(np.float32)  # masks X[n-0] to 0
    consts.update(ap.consts())
    return ap, consts


def _apply_dct_fft_axis(x, c, ap, prefix: str, eff_kind: str, n: int,
                        mid: bool = False):
    """Apply one FFT-routed DCT/DST axis.

    mid=False: along the LAST axis of real x.
    mid=True: the axis sits at axis -2 of real x (..., n, L) with trailing
    dims riding in L — gathers/flips address axis -2, constants broadcast
    over L, and the inner FFT runs in the W4 mid-axis form
    (MixedAxisPlan.apply_mid).  No moveaxis passes either way.
    """
    ax = -2 if mid else -1
    cax = -3 if mid else -2          # the same axis on interleaved (.., 2)
    fft = ap.apply_mid if mid else ap.apply

    def bc(t):       # per-n real constant: ride the lane dim in mid form
        return t[:, None] if mid else t

    def bc2(t):      # per-n complex const pair (n, 2): (n, 1, 2) rides L
        return t[:, None, :] if mid else t

    def rsl(t, a, b):  # slice [a:b) along the transform axis of a REAL array
        return t[..., a:b, :] if mid else t[..., a:b]

    def csl(t, a, b):  # same slice on an interleaved complex array
        return t[..., a:b, :, :] if mid else t[..., a:b, :]

    if eff_kind == "dct1":
        # v = [x_0..x_{N-1}, x_{N-2}..x_1], M=2(N-1): Re(FFT(v))[k] ==
        # x_0 + (-1)^k x_{N-1} + 2 sum cos == trig_matrix("dct1") row k
        v = jnp.concatenate([x, jnp.flip(rsl(x, 1, n - 1), axis=ax)], axis=ax)
        vi = jnp.stack([v, jnp.zeros_like(v)], axis=-1)
        return csl(fft(vi, c), 0, n)[..., 0]
    if eff_kind == "dst1":
        # v = [0, x, 0, -rev(x)], M=2(N+1): FFT(v)[k+1] = -2i sum sin, and
        # trig_matrix("dst1") has no factor 2 -> y = -Im(FFT(v))[1:N+1]/2
        z1 = jnp.zeros_like(rsl(x, 0, 1))
        v = jnp.concatenate([z1, x, z1, -jnp.flip(x, axis=ax)], axis=ax)
        vi = jnp.stack([v, jnp.zeros_like(v)], axis=-1)
        return csl(fft(vi, c), 1, n + 1)[..., 1] * (-0.5)
    if eff_kind in ("dct4", "dst4"):
        # u[m] = x[m] e^{-i pi m / 2N} zero-padded to 2N;
        # y = Re / -Im of e^{-i pi (2k+1)/(4N)} FFT(u)[k], k < N
        u = jnp.stack([x * bc(c[f"{prefix}/p_re"]),
                       x * bc(c[f"{prefix}/p_im"])], axis=-1)
        ui = jnp.concatenate([u, jnp.zeros_like(u)], axis=cax)
        U = csl(fft(ui, c), 0, n)
        ur, ui_ = U[..., 0], U[..., 1]
        tr, ti = bc(c[f"{prefix}/t_re"]), bc(c[f"{prefix}/t_im"])
        if eff_kind == "dct4":
            return ur * tr - ui_ * ti
        return -(ui_ * tr + ur * ti)

    dst = eff_kind.startswith("dst")
    if dst and eff_kind == "dst2":
        # dst2(x)[k] = reverse(dct2(altsign(x)))[k]
        sgn = np.where(np.arange(n) % 2 == 0, 1.0, -1.0).astype(np.float32)
        x = x * bc(sgn)
    if dst and eff_kind == "dst3":
        x = jnp.flip(x, axis=ax)
    if eff_kind in ("dct2", "dst2"):
        v = jnp.take(x, c[f"{prefix}/perm"], axis=ax)
        vi = jnp.stack([v, jnp.zeros_like(v)], axis=-1)
        V = fft(vi, c)
        y = cmul_const(V, bc2(c[f"{prefix}/wa"]),
                       bc2(c[f"{prefix}/wb"]))[..., 0]
        if eff_kind == "dst2":
            y = jnp.flip(y, axis=ax)
        return y
    # dct3 / dst3
    xm = jnp.take(x, c[f"{prefix}/xm"], axis=ax) * bc(c[f"{prefix}/xm0"])
    u = jnp.stack([x, -xm], axis=-1)                    # X[k] - i*X[n-k]
    u = cmul_const(u, bc2(c[f"{prefix}/ua"]), bc2(c[f"{prefix}/ub"]))
    v = fft(u, c)[..., 0]                               # Re(IFFT_unnorm(U))
    y = jnp.take(v, c[f"{prefix}/inv"], axis=ax)
    if eff_kind == "dst3":
        sgn = np.where(np.arange(n) % 2 == 0, 1.0, -1.0).astype(np.float32)
        y = y * bc(sgn)
    return y


def build_dct(spec: PlanSpec) -> Plan:
    kind = spec.plan_type
    route = _route_for(spec)
    consts: Dict[str, np.ndarray] = {}
    self_inverse = kind in ("dct1", "dst1", "dct4", "dst4")
    mdir = "forward" if self_inverse else spec.direction
    # effective per-direction kind (reference typeKind table,
    # dct_fft.js:48-58): dct2 inv == dct3 fwd etc.
    alias = {"dct2": "dct3", "dct3": "dct2", "dst2": "dst3", "dst3": "dst2"}
    eff_kind = kind if (self_inverse or spec.direction == "forward") else alias[kind]

    axis_mode: List[str] = []
    axis_objs = []
    for d, n in enumerate(spec.shape):
        if (eff_kind in _DCT_FFT_KINDS and n >= spec.tuning.dct_fft_min_n):
            ap, cc = _dct_axis_fft_consts(n, eff_kind, f"dct{d}", spec.tuning)
            consts.update(cc)
            axis_objs.append(ap)
            axis_mode.append("fft")
        else:
            if n * n > DCT_MATMUL_MAX_ELEMS:
                raise PlanError(
                    f"{kind} axis {d} of length {n} would build a dense "
                    f"{n}x{n} trig table ({n * n * 4 / 2**30:.1f} GiB) on "
                    f"the matmul route; the FFT route engages at "
                    f"tuning.dctFftMinN={spec.tuning.dct_fft_min_n} — "
                    "lower it below this axis length instead of "
                    "materializing a multi-GB constant")
            m = trig_matrix(kind, n, mdir)
            consts[f"trig{d}"] = m.T.astype(np.float32)  # apply as x @ T
            axis_objs.append(None)
            axis_mode.append("matmul")
    route.reasons = route.reasons + tuple(
        f"dct-axis{d}-{m}" for d, m in enumerate(axis_mode))
    scale = engine.plan_scale(spec.normalize, spec.direction, spec.n_total)

    from ..core.axis import mxu_precision
    prec = mxu_precision(spec.tuning)

    def core(x, c):
        y = x
        # descending axis order (r17c, see engine.apply_nd) — the trig
        # axes are separable, so order is free
        for d in range(spec.rank - 1, -1, -1):
            ax = 1 + d
            if axis_mode[d] == "fft":
                if ax < y.ndim - 1 and getattr(axis_objs[d], "supports_mid",
                                               False):
                    lead = y.shape[:ax]
                    n = spec.shape[d]
                    v = y.reshape(*lead, n, -1)
                    v = _apply_dct_fft_axis(v, c, axis_objs[d], f"dct{d}",
                                            eff_kind, n, mid=True)
                    y = v.reshape(y.shape)
                    continue
                y = jnp.moveaxis(y, ax, -1)
                y = _apply_dct_fft_axis(y, c, axis_objs[d], f"dct{d}",
                                        eff_kind, spec.shape[d])
                y = jnp.moveaxis(y, -1, ax)
            elif ax == y.ndim - 1:
                y = jnp.matmul(y, c[f"trig{d}"], precision=prec)
            else:
                # mid-axis trig contraction: trailing dims ride as a lane
                # dim — no moveaxis transpose passes (same form as
                # core/axis.MixedAxisPlan.apply_mid)
                lead = y.shape[:ax]
                n = spec.shape[d]
                v = y.reshape(*lead, n, -1)
                v = jnp.einsum("...aL,ak->...kL", v, c[f"trig{d}"],
                               precision=prec)
                y = v.reshape(y.shape)
        return _scale_mul(y, scale)

    bound = plan_chunk_elems(spec)
    if spec.tuning.chunk_elems is not None:
        route.reasons = route.reasons + (f"chunk-elems-override({bound})",)
    core = maybe_chunk_core(core, spec.batch, spec.n_total, route, bound)
    fn, in_shape, out_shape, _, _ = build_staged_fn(
        spec, core, spec.shape, spec.shape, False, False)
    ws = 2 * spec.batch * spec.n_total * 4
    plan = Plan(spec, consts, fn, route, workspace_bytes=ws)
    plan.supports_exec_offsets = True
    plan._expect_input = (in_shape, False)
    plan.output_shape = out_shape
    return plan
