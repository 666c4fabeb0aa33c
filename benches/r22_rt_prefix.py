#!/usr/bin/env python
"""Cumulative-prefix attribution of the r2c/c2r cores at 256^3 b=3 (v2).

r21 found the isolated 129-geometry rest passes 1.89x slower than the
split form, yet the FULL roundtrip did not move (22.3 ms before and
after) — so the composed plan never paid the isolated tax (XLA likely
propagated the untangle concat through the einsums already).  Attribute
the real 22.3 ms by timing PREFIXES of each core end-to-end: every row
jits from the real plan input through stage k; deltas between rows
attribute stages in context.

Run to completion (never under timeout):
  nohup python benches/r22_rt_prefix.py > benches/logs/r22.log 2>&1 &
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "benches", "results_r4.jsonl")

TRIALS = int(os.environ.get("R22_TRIALS", "2"))


def emit(row):
    row = {"bench": f"r22_prefix/{row.pop('leg')}", "protocol": "v2", **row}
    print(json.dumps(row), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")


def main():
    from webgpufft_tpu.core import engine
    from webgpufft_tpu.core.axis import slabbed_axis_apply
    from webgpufft_tpu.core.cplx import cmul_const
    from webgpufft_tpu.plans.transforms import _half_trick_consts
    from webgpufft_tpu.runtime import profile
    from webgpufft_tpu.spec import TuningSpec

    backend = jax.default_backend()
    print(f"# backend={backend}", flush=True)
    rng = np.random.default_rng(0)
    n = 256
    h, p = n // 2, n // 2 + 1
    b = 3

    tuning = TuningSpec()
    fplans = engine.build_axis_plans((h, n, n), "forward", tuning)
    fc = engine.collect_consts(fplans)
    fc.update(_half_trick_consts(n, inverse=False))
    iplans = engine.build_axis_plans((h, n, n), "inverse", tuning)
    ic = engine.collect_consts(iplans)
    ic.update(_half_trick_consts(n, inverse=True))
    fc = {k: jnp.asarray(v) for k, v in fc.items()}
    ic = {k: jnp.asarray(v) for k, v in ic.items()}
    bound = None

    xr = jnp.asarray(rng.standard_normal((b, n, n, n)), jnp.float32)
    xp_ = jnp.asarray(rng.standard_normal((b, p, n, n, 2)), jnp.float32)

    # ---- r2c core stages (mirrors plans/transforms.build_r2c core) ----
    def r2c_to(stage):
        def fn(x):
            v = x.reshape(b, h, 2, n, n)
            v = jnp.moveaxis(v, 2, -1)                        # pair
            if stage == 1:
                return v * 2.0
            z = slabbed_axis_apply(v, fplans[0], 1, fc, bound)  # ax0 half
            if stage == 2:
                return z
            zf = jnp.concatenate([z[:, :1], jnp.flip(z[:, 1:], axis=1)],
                                 axis=1)
            zf = zf * jnp.asarray([1.0, -1.0], dtype=z.dtype)
            cshape = (1, p, 1, 1, 2)
            ca = fc["rc/ca"].reshape(cshape)
            cb = fc["rc/cb"].reshape(cshape)
            y = (z + zf) * 0.5 + cmul_const(z - zf, ca[:, :h], cb[:, :h])
            z0 = z[:, :1]
            zf0 = z0 * jnp.asarray([1.0, -1.0], dtype=z.dtype)
            ynyq = (z0 + zf0) * 0.5 + cmul_const(z0 - zf0, ca[:, h:],
                                                 cb[:, h:])
            if stage == 3:
                return y + ynyq[:, :1]                        # untangle
            for d in (1, 2):
                y = slabbed_axis_apply(y, fplans[d], 1 + d, fc, bound)
                ynyq = slabbed_axis_apply(ynyq, fplans[d], 1 + d, fc, bound)
            if stage == 4:
                return y + ynyq[:, :1]                        # rest axes
            return jnp.concatenate([y, ynyq], axis=1)         # 5: concat
        return fn

    # ---- c2r core stages (mirrors build_c2r core_half) ----
    def c2r_to(stage):
        def fn(xp):
            body, nyq = xp[:, :h], xp[:, h:]
            if stage == 1:
                return body * 2.0 + nyq[:, :1]                # slice
            for d in (2, 1):
                body = slabbed_axis_apply(body, iplans[d], 1 + d, ic, bound)
                nyq = slabbed_axis_apply(nyq, iplans[d], 1 + d, ic, bound)
            if stage == 2:
                return body + nyq[:, :1]                      # rest axes
            bin_iota = jnp.arange(h).reshape(1, h, 1, 1, 1)
            comp = jnp.arange(2).reshape(1, 1, 1, 1, 2)
            body = jnp.where((bin_iota == 0) & (comp == 1), 0.0, body)
            nyq = jnp.where(comp == 1, 0.0, nyq)
            xk = body
            xf = jnp.concatenate([nyq, jnp.flip(body[:, 1:], axis=1)], axis=1)
            xf = xf * jnp.asarray([1.0, -1.0], dtype=xp.dtype)
            cshape = (1, h, 1, 1, 2)
            z = (xk + xf) + cmul_const(xk - xf, ic["cr/ca"].reshape(cshape),
                                       ic["cr/cb"].reshape(cshape))
            if stage == 3:
                return z                                      # retangle
            z = slabbed_axis_apply(z, iplans[0], 1, ic, bound)
            if stage == 4:
                return z                                      # ax0 half
            z = jnp.moveaxis(z, -1, 2)
            return z.reshape(b, n, n, n)                      # 5: out
        return fn

    # hbm_stream_time scans fn as a carry: output must match input
    # shape/dtype.  Wrap each prefix as x*(1 + eps*mean(prefix(x))): the
    # mean forces the FULL stage chain (no DCE — every element feeds the
    # reduce), adds ~one read pass + a broadcast rescale uniformly across
    # prefixes, and keeps values stable over thousands of rounds
    # (eps=1e-24).  The `wrap0` leg measures the wrapper alone.
    def wrap(fn):
        def g(x):
            return x * (1.0 + 1e-24 * jnp.mean(fn(x)))
        return g

    legs = ([("wrap0_real", wrap(lambda x: x * 2.0), xr),
             ("wrap0_packed", wrap(lambda x: x * 2.0), xp_)]
            + [(f"r2c_s{k}", wrap(r2c_to(k)), xr) for k in range(1, 6)]
            + [(f"c2r_s{k}", wrap(c2r_to(k)), xp_) for k in range(1, 6)])

    # correctness anchor: full prefixes match numpy
    yref = np.fft.fftn(np.asarray(xr), axes=(1, 2, 3))[:, :p]
    yfull = np.asarray(r2c_to(5)(xr))
    rel = np.max(np.abs((yfull[..., 0] + 1j * yfull[..., 1]) - yref)) / \
        np.max(np.abs(yref))
    print(f"# r2c full vs numpy rel={rel:.3e}", flush=True)

    results = {name: [] for name, _f, _x in legs}
    ceilings = []
    for t in range(TRIALS):
        try:
            ceilings.append(profile.measured_copy_ceiling_gbps(
                xr, unroll=8, reps=4))
        except Exception as ex:
            print(f"# ceiling failed: {ex!r}"[:120], flush=True)
            ceilings.append(0.0)
        print(f"# trial{t} copy(v2)={ceilings[-1]:.0f} GB/s", flush=True)
        for name, fn, x in legs:
            try:
                dt = profile.hbm_stream_time(fn, x, copies=1, reps=4)
            except Exception as ex:
                print(f"#   {name} failed: {ex!r}"[:160], flush=True)
                continue
            results[name].append(dt)
            print(f"#   {name}: {dt*1e3:.3f} ms", flush=True)

    ceiling = max(ceilings) if ceilings else 0.0
    for name, _f, _x in legs:
        if not results[name]:
            emit({"leg": name, "backend": backend, "error": True})
            continue
        emit({"leg": name, "backend": backend,
              "avg_ms": round(min(results[name]) * 1e3, 3),
              "copy_ceiling_gbps": round(ceiling, 1)})
    print("# done", flush=True)


if __name__ == "__main__":
    main()
