#!/usr/bin/env python
"""Transpose fast-path A/B under protocol v2 (VERDICT r4 missing #5).

The reference routes axis-1 FFTs through a tiled transpose -> axis-0 FFT
-> transpose back (src/runtime/plans/c2c.js:3921-3957, gated by
transposeMinElements=4096).  This repo's mid-axis W4 einsum forms were
assumed to dominate that route, and `transposeMinElements` /
`disableTranspose` are recorded as ignored knobs (spec.py) — but round-4
data shows explicit transposes run at 277-303 GB/s while mid-axis einsum
passes sit relayout-bound at 90-150.  One honest composed A/B:

per-axis legs (x -> same shape):
    ax{0,1}_mid   : current in-place mid-axis einsum pass
    ax{0,1}_tr    : moveaxis to last -> last-axis einsum -> moveaxis back
    ax2_last      : the last-axis pass (shared baseline)
    tr_only       : the bare transpose roundtrip (cost of the route's tax)
composed legs:
    chain_cur     : descending in-place chain (engine.apply_nd order)
    chain_tr      : cyclic-transpose chain — every pass in last-axis
                    position, 3 transposes incl. final order restore

Geometries: (3, 128, 256, 256, 2) — the r2c flagship half-grid — and
(1, 256, 256, 256, 2) — the c2c-3D production shape.

Run to completion (never under timeout):
  nohup python benches/r24_transpose_ab.py > benches/logs/r5/r24.log 2>&1 &
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "benches", "results_r5.jsonl")

TRIALS = int(os.environ.get("R24_TRIALS", "2"))


def emit(row):
    row = {"bench": f"r24_transpose/{row.pop('leg')}", "protocol": "v2",
           **row}
    print(json.dumps(row), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")


def main():
    from webgpufft_tpu.core import engine
    from webgpufft_tpu.core.axis import slabbed_axis_apply
    from webgpufft_tpu.runtime import profile
    from webgpufft_tpu.spec import TuningSpec

    backend = jax.default_backend()
    print(f"# backend={backend}", flush=True)
    rng = np.random.default_rng(0)
    tuning = TuningSpec()

    geoms = [("halfgrid", (3, 128, 256, 256)),
             ("cube", (1, 256, 256, 256))]

    legs = []
    for gname, (b, n0, n1, n2) in geoms:
        plans = engine.build_axis_plans((n0, n1, n2), "forward", tuning)
        consts = {k: jnp.asarray(v)
                  for k, v in engine.collect_consts(plans).items()}
        x = jnp.asarray(rng.standard_normal((b, n0, n1, n2, 2)),
                        jnp.float32)
        p0, p1, p2 = plans

        def mk(pl, ax, cs=consts):
            return lambda v: slabbed_axis_apply(v, pl, ax, cs)

        def tr(pl, ax, cs=consts):
            def f(v):
                w = jnp.moveaxis(v, ax, -2)
                w = slabbed_axis_apply(w, pl, w.ndim - 2, cs)
                return jnp.moveaxis(w, -2, ax)
            return f

        def tr_only(v):
            w = jnp.moveaxis(v, 1, -2)
            return jnp.moveaxis(w * 1.000001, -2, 1)

        def chain_cur(v, ps=plans, cs=consts):
            return engine.apply_nd(v, ps, cs)

        def chain_tr(v, ps=plans, cs=consts):
            w = slabbed_axis_apply(v, ps[2], 3, cs)     # n2, last form
            w = jnp.swapaxes(w, 2, 3)                   # (b, n0, n2, n1)
            w = slabbed_axis_apply(w, ps[1], 3, cs)     # n1, last form
            w = jnp.swapaxes(w, 1, 3)                   # (b, n1, n2, n0)
            w = slabbed_axis_apply(w, ps[0], 3, cs)     # n0, last form
            return jnp.moveaxis(w, 3, 1)                # restore order

        # correctness anchor per geometry (composed chain vs numpy)
        zx = np.asarray(x[..., 0], np.float64) + 1j * np.asarray(
            x[..., 1], np.float64)
        ref = np.fft.fftn(zx, axes=(1, 2, 3))
        for nm, f in (("cur", chain_cur), ("tr", chain_tr)):
            got = np.asarray(f(x), np.float64)
            rel = (np.max(np.abs((got[..., 0] + 1j * got[..., 1]) - ref))
                   / np.max(np.abs(ref)))
            print(f"# {gname} chain_{nm} vs numpy rel={rel:.3e}",
                  flush=True)
            assert rel < 1e-5, rel

        legs += [
            (f"{gname}/ax0_mid", mk(p0, 1), x),
            (f"{gname}/ax0_tr", tr(p0, 1), x),
            (f"{gname}/ax1_mid", mk(p1, 2), x),
            (f"{gname}/ax1_tr", tr(p1, 2), x),
            (f"{gname}/ax2_last", mk(p2, 3), x),
            (f"{gname}/tr_only", tr_only, x),
            (f"{gname}/chain_cur", chain_cur, x),
            (f"{gname}/chain_tr", chain_tr, x),
        ]

    if TRIALS == 0:
        print("# correctness-only run (R24_TRIALS=0)", flush=True)
        return

    results = {name: [] for name, _f, _x in legs}
    ceilings = []
    for t in range(TRIALS):
        try:
            ceilings.append(profile.measured_copy_ceiling_gbps(
                legs[0][2], unroll=8, reps=4))
        except Exception as ex:
            print(f"# ceiling failed: {ex!r}"[:120], flush=True)
            ceilings.append(0.0)
        print(f"# trial{t} copy(v2)={ceilings[-1]:.0f} GB/s", flush=True)
        for name, fn, x in legs:
            wrapped = (lambda f: lambda v: v * (
                1.0 + 1e-24 * jnp.mean(f(v))))(fn)
            try:
                dt = profile.hbm_stream_time(wrapped, x, copies=1, reps=4)
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
