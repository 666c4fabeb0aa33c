#!/usr/bin/env python
"""Bisect the TPU-only r2c 256^3 b=3 miscompile (r29: library plan FAILS
rel=1.2-1.5 at every chunkElements through the large-batch-chunk route;
the identical unchunked core passes, and 128^3 b=3 passes through the
SAME route).

The only delta between the passing hand leg (r29) and the failing
library leg is maybe_chunk_core (static-unrolled batch slices + concat)
plus build_staged_fn.  Legs (correctness only):

  handchunk_256_b3     hand core + manual static-unroll chunk + concat
                       (= maybe_chunk_core without plan staging)
  handsep_256_b3       hand core jitted per slice, host-side concat
                       (3 separate XLA programs)
  lib_c2c_256_b3       c2c through the library chunk route (is it
                       r2c-specific or generic?)
  libmap_256_b3        library r2c with STATIC_SLAB_MAX=0 -> lax.map
                       chunk route instead of static unroll
  lib_256_b3_locate    library r2c, per-batch-element + per-region rel
                       (body bins vs Nyquist plane; which k ranges)

Run to completion (never under timeout):
  nohup python benches/r30_chunk_bisect.py > benches/logs/r5/r30.log 2>&1 &
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def cx(yk):
    return yk[..., 0] + 1j * yk[..., 1]


def rel_err(yk, yref):
    return np.max(np.abs(cx(yk) - yref)) / np.max(np.abs(yref))


def build_hand_core(n, b, bound):
    from webgpufft_tpu.core import engine
    from webgpufft_tpu.core.axis import slabbed_axis_apply
    from webgpufft_tpu.core.cplx import cmul_const
    from webgpufft_tpu.plans.transforms import _half_trick_consts
    from webgpufft_tpu.spec import TuningSpec

    h, p = n // 2, n // 2 + 1
    tuning = TuningSpec()
    fplans = engine.build_axis_plans((h, n, n), "forward", tuning)
    c = {k: jnp.asarray(v) for k, v in
         engine.collect_consts(fplans).items()}
    c.update({k: jnp.asarray(v) for k, v in
              _half_trick_consts(n, inverse=False).items()})
    tshape = (1, p, 1, 1, 2)
    pa = c["rc/pa"].reshape(tshape)
    pb = c["rc/pb"].reshape(tshape)
    qa = c["rc/qa"].reshape(tshape)
    qb = c["rc/qb"].reshape(tshape)

    def core(x):
        bb = x.shape[0]
        v = x.reshape(bb, h, 2, n, n)
        v = jnp.moveaxis(v, 2, -1)
        z = slabbed_axis_apply(v, fplans[0], 1, c, bound)
        zb = z[:, 1:]
        z0 = z[:, :1]
        y_body = (cmul_const(zb, pa[:, 1:h], pb[:, 1:h])
                  + cmul_const(jnp.flip(zb, axis=1),
                               qa[:, 1:h], qb[:, 1:h]))
        y0 = (cmul_const(z0, pa[:, :1], pb[:, :1])
              + cmul_const(z0, qa[:, :1], qb[:, :1]))
        y = jnp.concatenate([y0, y_body], axis=1)
        ynyq = (cmul_const(z0, pa[:, h:], pb[:, h:])
                + cmul_const(z0, qa[:, h:], qb[:, h:]))
        for d in (1, 2):
            y = slabbed_axis_apply(y, fplans[d], 1 + d, c, bound)
            ynyq = slabbed_axis_apply(ynyq, fplans[d], 1 + d, c, bound)
        return jnp.concatenate([y, ynyq], axis=1)

    return core


def main():
    import webgpufft_tpu as W
    from webgpufft_tpu.core import axis as core_axis

    backend = jax.default_backend()
    print(f"# backend={backend}", flush=True)
    rng = np.random.default_rng(0)
    n = int(os.environ.get("R30_N", "256"))
    b = int(os.environ.get("R30_B", "3"))
    p = n // 2 + 1
    bound = 1 << 22

    x_np = rng.standard_normal((b, n, n, n)).astype(np.float32)
    yref = np.fft.fftn(np.asarray(x_np, np.float64), axes=(1, 2, 3))[:, :p]
    x = jnp.asarray(x_np)

    core = build_hand_core(n, b, bound)

    # Leg 1: hand core + static-unroll chunk + concat (one program)
    @jax.jit
    def handchunk(xx):
        outs = [core(jax.lax.slice_in_dim(xx, g, g + 1, axis=0))
                for g in range(b)]
        return jnp.concatenate(outs, axis=0)

    yk = np.asarray(handchunk(x), np.float64)
    r = rel_err(yk, yref)
    print(f"# handchunk_256_b3: rel={r:.3e} {'FAIL' if r > 1e-5 else 'ok'}",
          flush=True)

    # Leg 2: hand core per slice, separate dispatches, host concat
    jcore = jax.jit(core)
    parts = [np.asarray(jcore(x[g:g + 1]), np.float64) for g in range(b)]
    yk = np.concatenate(parts, axis=0)
    r = rel_err(yk, yref)
    print(f"# handsep_256_b3: rel={r:.3e} {'FAIL' if r > 1e-5 else 'ok'}",
          flush=True)

    # Leg 3: c2c through the library chunk route
    plan = W.create_plan(type="c2c", shape=[n, n, n], batch=b)
    xc = jnp.stack([x, jnp.zeros_like(x)], axis=-1)
    yk = np.asarray(plan.exec(xc), np.float64)
    ycref = np.fft.fftn(np.asarray(x_np, np.float64), axes=(1, 2, 3))
    r = np.max(np.abs(cx(yk) - ycref)) / np.max(np.abs(ycref))
    print(f"# lib_c2c_256_b3: rel={r:.3e} route={plan.route.reasons} "
          f"{'FAIL' if r > 1e-5 else 'ok'}", flush=True)
    del plan, xc, yk, ycref

    # Leg 4: library r2c with the lax.map chunk route (no static unroll)
    old = core_axis.STATIC_SLAB_MAX
    try:
        core_axis.STATIC_SLAB_MAX = 0
        plan = W.create_plan(type="r2c", shape=[n, n, n], batch=b)
    finally:
        core_axis.STATIC_SLAB_MAX = old
    yk = np.asarray(plan.exec(x), np.float64)
    r = rel_err(yk, yref)
    print(f"# libmap_256_b3: rel={r:.3e} route={plan.route.reasons} "
          f"{'FAIL' if r > 1e-5 else 'ok'}", flush=True)
    del plan, yk

    # Leg 5: library r2c, localize the error
    plan = W.create_plan(type="r2c", shape=[n, n, n], batch=b)
    yk = np.asarray(plan.exec(x), np.float64)
    denom = np.max(np.abs(yref))
    for g in range(b):
        e = np.abs(cx(yk[g]) - yref[g]) / denom
        body = e[:p - 1]
        nyq = e[p - 1]
        # localize along axis-0 bins
        kmax = int(np.argmax(body.reshape(p - 1, -1).max(axis=1)))
        print(f"# lib_locate elem{g}: body_max={body.max():.3e} "
              f"(worst k={kmax}) nyq_max={nyq.max():.3e} "
              f"k0_max={e[0].max():.3e}", flush=True)
        bad_k = np.where(body.reshape(p - 1, -1).max(axis=1) > 1e-5)[0]
        if bad_k.size:
            print(f"#   bad k bins: count={bad_k.size} "
                  f"range=[{bad_k.min()},{bad_k.max()}]", flush=True)
    print("# done", flush=True)


if __name__ == "__main__":
    main()
