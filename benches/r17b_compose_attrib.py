#!/usr/bin/env python
"""Why does the composed 3-axis c2c take 2.5x its sum-of-parts under v2?

r17 (benches/results_r4.jsonl r17_v2 rows) measured, same session:
  axis1 mid-pass alone     10.9 ms
  c2c_3d (3 passes)        82.9 ms   (~2.5x the 3x10.9 sum)
  ns3d_step_256^3          72.8 ms   (~1.9x its parts)
but the v2 watcher was dispatching concurrently during r17 — contention
may have poisoned the long legs.  This probe re-measures CLEAN (nothing
else on the chip) and attributes the composition: each axis pass alone,
adjacent pairs, the full 3-axis chain, and the NS step.  All legs are
shape-preserving jitted fns timed with profile.hbm_stream_time.

Run to completion (never under timeout):
  nohup python benches/r17b_compose_attrib.py > benches/logs/r17b.log 2>&1 &
"""

import importlib.util
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "benches", "results_r4.jsonl")

TRIALS = int(os.environ.get("R17B_TRIALS", "2"))


def emit(row):
    row = {"bench": f"r17b_compose/{row.pop('leg')}", "protocol": "v2", **row}
    print(json.dumps(row), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")


def _load_ns3d():
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples", "navier_stokes3d.py")
    spec = importlib.util.spec_from_file_location("ns3d_r17b", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main():
    import webgpufft_tpu as W
    from webgpufft_tpu.core import engine
    from webgpufft_tpu.core import axis as A
    from webgpufft_tpu.runtime import profile
    from webgpufft_tpu.spec import normalize_spec

    backend = jax.default_backend()
    print(f"# backend={backend}", flush=True)
    rng = np.random.default_rng(0)
    n, b = 256, 6

    full = jnp.asarray(rng.standard_normal((b, n, n, n, 2)), jnp.float32)
    tuning = normalize_spec({"type": "c2c", "shape": [n]}).tuning
    fwd = engine.build_axis_plans((n, n, n), "forward", tuning)
    cf = engine.collect_consts(fwd)
    bytes_full = full.size * 4

    def ax(i):
        return lambda v: A.slabbed_axis_apply(v, fwd[i], 1 + i, cf)

    def pair(i, j):
        return lambda v: A.slabbed_axis_apply(
            A.slabbed_axis_apply(v, fwd[i], 1 + i, cf), fwd[j], 1 + j, cf)

    legs = [
        ("axis0", ax(0), 2 * bytes_full),
        ("axis1", ax(1), 2 * bytes_full),
        ("axis2_last", ax(2), 2 * bytes_full),
        ("pair01", pair(0, 1), 4 * bytes_full),
        ("pair12", pair(1, 2), 4 * bytes_full),
        ("c2c_3d", lambda v: engine.apply_nd(v, fwd, cf), 6 * bytes_full),
    ]

    ns = _load_ns3d()
    step, to_spec, _ = ns.make_stepper3(256, 1e-3, 1e-3)
    u0 = rng.standard_normal((3, 256, 256, 256)).astype(np.float32)
    uh = to_spec(u0)
    real = 256 ** 3 * 4
    packed = 129 * 256 * 256 * 8
    ns_bytes = 18 * (real + packed) + 2 * 3 * packed

    results = {name: [] for name, *_ in legs}
    ns_res = []
    ceilings = []
    for t in range(TRIALS):
        try:
            ceilings.append(profile.measured_copy_ceiling_gbps(
                full, unroll=8, reps=4))
        except Exception as ex:
            print(f"# ceiling failed: {ex!r}"[:120], flush=True)
            ceilings.append(0.0)
        print(f"# trial{t} copy(v2)={ceilings[-1]:.0f} GB/s", flush=True)
        for name, fn, _nb in legs:
            try:
                dt = profile.hbm_stream_time(fn, full, copies=1, reps=4)
            except Exception as ex:
                print(f"#   {name} failed: {ex!r}"[:160], flush=True)
                continue
            results[name].append(dt)
            print(f"#   {name}: {dt*1e3:.3f} ms", flush=True)
        try:
            dt = profile.hbm_stream_time(step, uh, copies=1, reps=4)
            ns_res.append(dt)
            print(f"#   ns3d_step_256^3: {dt*1e3:.3f} ms", flush=True)
        except Exception as ex:
            print(f"#   ns step failed: {ex!r}"[:160], flush=True)

    ceiling = max(ceilings) if ceilings else 0.0
    rows = [(name, nb, results[name]) for name, _fn, nb in legs]
    rows.append(("ns3d_step_256^3", ns_bytes, ns_res))
    for name, nb, dts in rows:
        if not dts:
            emit({"leg": name, "backend": backend, "error": True})
            continue
        dt = min(dts)
        eff = nb / dt / 1e9
        emit({"leg": name, "backend": backend,
              "avg_ms": round(dt * 1e3, 3), "min_bytes": int(nb),
              "eff_gbps": round(eff, 1),
              "copy_ceiling_gbps": round(ceiling, 1),
              "vs_copy": round(eff / max(ceiling, 1e-9), 3)})
    print("# done", flush=True)


if __name__ == "__main__":
    main()
