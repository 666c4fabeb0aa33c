#!/usr/bin/env python
"""Protocol-v2 re-baseline of the 256^3 flagship and the floor legs.

Every earlier 256^3 row (r8/r9/r10/r13) is protocol-v1: its copy ceiling
was inflated by the unroll factor (chain folding) and its transform time
carried ~26/unroll ms of dispatch overhead (r16 errata,
docs/PERFORMANCE.md).  This probe re-measures with profile.hbm_stream_time
(stable to ~5%):

  - elementwise multiply on the 1.6 GB interleaved volume (floor ref),
  - one mid-axis n=256 einsum pass on the same volume (floor numerator),
  - full 3-axis c2c forward on the volume,
  - the r2c+c2r b=3 roundtrip (shape-preserving composite of the two
    shape-changing plans, post rev-untangle change),
  - one 3-D Navier-Stokes step at 128^3 and 256^3,

with a v2 copy ceiling interleaved per trial.  Appends rows to
benches/results_r4.jsonl.  Run to completion (never under timeout):
  nohup python benches/r17_v2_rebaseline.py > benches/logs/r17.log 2>&1 &
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

TRIALS = int(os.environ.get("R17_TRIALS", "2"))


def emit(row):
    row = {"bench": f"r17_v2/{row.pop('leg')}", "protocol": "v2", **row}
    print(json.dumps(row), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")


def _load_ns3d():
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples", "navier_stokes3d.py")
    spec = importlib.util.spec_from_file_location("ns3d_r17", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def step_min_bytes(n: int) -> float:
    real = n * n * n * 4
    packed = (n // 2 + 1) * n * n * 8
    return 18 * (real + packed) + 2 * 3 * packed


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

    legs = []  # (name, fn, x, min_bytes, copies)
    legs.append(("ew_1p6gb", lambda v: v * jnp.float32(1.0001), full,
                 2 * bytes_full, 1))
    legs.append(("axis1_mid_pass",
                 lambda v: A.slabbed_axis_apply(v, fwd[1], 2, cf), full,
                 2 * bytes_full, 1))
    legs.append(("c2c_3d_fwd",
                 lambda v: engine.apply_nd(v, fwd, cf), full,
                 6 * bytes_full, 1))

    cache = W.PlanCache()
    r2c = W.create_plan({"type": "r2c", "shape": [n, n, n], "batch": 3,
                         "direction": "forward", "normalize": "none"},
                        cache=cache)
    c2r = W.create_plan({"type": "c2r", "shape": [n, n, n], "batch": 3,
                         "direction": "inverse", "normalize": "backward"},
                        cache=cache)
    xr = jnp.asarray(rng.standard_normal((3, n, n, n)), jnp.float32)
    p = n // 2 + 1
    rt_bytes = 2 * (3 * n ** 3 * 4) + 2 * (3 * p * n * n * 8)

    def roundtrip(v):
        return c2r._fn(c2r._consts, r2c._fn(r2c._consts, v))

    legs.append(("r2c_c2r_roundtrip_b3", roundtrip, xr, rt_bytes, 1))

    ns = _load_ns3d()
    for g, cop in ((128, 8), (256, 1)):
        step, to_spec, _ = ns.make_stepper3(g, 1e-3, 1e-3)
        u0 = rng.standard_normal((3, g, g, g)).astype(np.float32)
        uh = to_spec(u0)
        legs.append((f"ns3d_step_{g}^3", step, uh, step_min_bytes(g), cop))

    results = {name: [] for name, *_ in legs}
    ceilings = []
    for t in range(TRIALS):
        try:
            ceilings.append(profile.measured_copy_ceiling_gbps(
                full, unroll=8, reps=4))
        except Exception as ex:
            print(f"# ceiling failed: {ex!r}"[:120], flush=True)
            ceilings.append(0.0)
        print(f"# trial{t} copy(v2)={ceilings[-1]:.0f} GB/s", flush=True)
        for name, fn, x, _nb, cop in legs:
            try:
                dt = profile.hbm_stream_time(fn, x, copies=cop, reps=4)
            except Exception as ex:
                print(f"#   {name} failed: {ex!r}"[:160], flush=True)
                continue
            results[name].append(dt)
            print(f"#   {name}: {dt*1e3:.3f} ms", flush=True)

    ceiling = max(ceilings) if ceilings else 0.0
    spec_roof = profile.device_hbm_gbps()
    for name, _fn, _x, nb, _c in legs:
        if not results[name]:
            emit({"leg": name, "backend": backend, "error": True})
            continue
        dt = min(results[name])
        eff = nb / dt / 1e9
        emit({"leg": name, "backend": backend,
              "avg_ms": round(dt * 1e3, 3), "min_bytes": int(nb),
              "eff_gbps": round(eff, 1),
              "copy_ceiling_gbps": round(ceiling, 1),
              "vs_copy": round(eff / max(ceiling, 1e-9), 3),
              "pct_roofline": round(100 * eff / spec_roof, 2)})
    print("# done", flush=True)


if __name__ == "__main__":
    main()
