#!/usr/bin/env python
"""Correctness bisect: the fused r2c untangle (commit 5537a13) fails on
the TPU backend at 256^3 b=3 through the LIBRARY plan (r28: rel=1.2)
while the identical hand-rolled core passed on TPU (r23: rel 1.8e-7)
and the library plan passes on CPU (trace is backend-independent —
no jax.default_backend() branch exists in the plan path).

Suspects: XLA-TPU miscompile of flip+cmul under the slab/batch-chunk
composition, or a layout/padding interaction specific to the packed
concat.  Legs (ALL correctness-only, no timing):

  lib_<shape>_<batch>         library plan vs numpy
  lib_256_b3_c25              library plan, chunkElements=2^25 override
  hand_256_b3_slab22          r23 fused core + slabbed passes bound=2^22
  hand_256_b3_noslab          r23 fused core, bound=None (r23 replica)

Run to completion (never under timeout):
  nohup python benches/r29_r2c_tpu_bisect.py > benches/logs/r5/r29.log 2>&1 &
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def rel_err(yk, yref):
    return (np.max(np.abs((yk[..., 0] + 1j * yk[..., 1]) - yref))
            / np.max(np.abs(yref)))


def main():
    import webgpufft_tpu as W
    from webgpufft_tpu.core import engine
    from webgpufft_tpu.core.axis import slabbed_axis_apply
    from webgpufft_tpu.core.cplx import cmul_const
    from webgpufft_tpu.plans.transforms import _half_trick_consts
    from webgpufft_tpu.spec import TuningSpec

    backend = jax.default_backend()
    print(f"# backend={backend}", flush=True)
    rng = np.random.default_rng(0)

    def lib_leg(name, n, b, tuning=None, raise_bound=None):
        # raise_bound: reproduce a bound ABOVE the validated 2^22 cap by
        # patching the module default — spec validation now rejects raised
        # tuning.chunkElements values (commit b2a884d), so the historical
        # 2^25 leg can no longer go through the public knob.
        import webgpufft_tpu.plans.transforms as T
        kw = {"tuning": tuning} if tuning else {}
        old_bound = T.CHUNK_ELEMS
        if raise_bound is not None:
            T.CHUNK_ELEMS = raise_bound
        try:
            plan = W.create_plan(type="r2c", shape=[n, n, n], batch=b, **kw)
        finally:
            T.CHUNK_ELEMS = old_bound
        x = jnp.asarray(rng.standard_normal((b, n, n, n)), jnp.float32)
        yk = np.asarray(plan.exec(x), np.float64)
        yref = np.fft.fftn(np.asarray(x, np.float64),
                           axes=(1, 2, 3))[:, :n // 2 + 1]
        r = rel_err(yk, yref)
        print(f"# {name}: rel={r:.3e} route={plan.route.reasons} "
              f"{'FAIL' if r > 1e-5 else 'ok'}", flush=True)

    def hand_leg(name, n, b, bound):
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

        @jax.jit
        def core(x):
            v = x.reshape(b, h, 2, n, n)
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

        x = jnp.asarray(rng.standard_normal((b, n, n, n)), jnp.float32)
        yk = np.asarray(core(x), np.float64)
        yref = np.fft.fftn(np.asarray(x, np.float64),
                           axes=(1, 2, 3))[:, :p]
        r = rel_err(yk, yref)
        print(f"# {name}: rel={r:.3e} {'FAIL' if r > 1e-5 else 'ok'}",
              flush=True)

    lib_leg("lib_64_b2", 64, 2)
    lib_leg("lib_128_b3", 128, 3)
    lib_leg("lib_256_b1", 256, 1)
    lib_leg("lib_256_b3", 256, 3)
    lib_leg("lib_256_b3_c25", 256, 3, raise_bound=1 << 25)
    lib_leg("lib_256_b3_c20", 256, 3, tuning={"chunkElements": 1 << 20})
    hand_leg("hand_256_b3_slab22", 256, 3, 1 << 22)
    hand_leg("hand_256_b3_noslab", 256, 3, None)
    print("# done", flush=True)


if __name__ == "__main__":
    main()
