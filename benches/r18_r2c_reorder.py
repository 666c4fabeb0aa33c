#!/usr/bin/env python
"""Post-fix measure: r2c rest-axes-first (conj-mirror untangle) at 256^3.

Pre-fix v2 numbers (r17/r17b/r17d rows): r2c+c2r roundtrip b3 22.3 ms,
NS-3D step 256^3 76-77.5 ms.  The r2c core previously ran
axis0 -> ax1 -> ax2 (the r17c-pathological ascending pattern, forced by
the half trick needing real input); it now runs ax2 -> ax1 -> ax0 with
the untangle mirroring the rest axes (FFT(conj u) = conj(mirror(FFT u))).

Run to completion (never under timeout):
  nohup python benches/r18_r2c_reorder.py > benches/logs/r18.log 2>&1 &
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

TRIALS = int(os.environ.get("R18_TRIALS", "2"))


def emit(row):
    row = {"bench": f"r18_r2c/{row.pop('leg')}", "protocol": "v2", **row}
    print(json.dumps(row), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")


def _load_ns3d():
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples", "navier_stokes3d.py")
    spec = importlib.util.spec_from_file_location("ns3d_r18", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main():
    import webgpufft_tpu as W
    from webgpufft_tpu.runtime import profile

    backend = jax.default_backend()
    print(f"# backend={backend}", flush=True)
    rng = np.random.default_rng(0)
    n = 256

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

    # correctness spot-check on-chip (roundtrip == identity)
    y = roundtrip(xr)
    rel = float(jnp.max(jnp.abs(y - xr)) / jnp.max(jnp.abs(xr)))
    print(f"# roundtrip identity rel={rel:.3e}", flush=True)

    ns = _load_ns3d()
    legs = [("r2c_c2r_roundtrip_b3", roundtrip, xr, rt_bytes, 1)]
    for g, cop in ((128, 8), (256, 1)):
        step, to_spec, _ = ns.make_stepper3(g, 1e-3, 1e-3)
        u0 = rng.standard_normal((3, g, g, g)).astype(np.float32)
        uh = to_spec(u0)
        real = g ** 3 * 4
        packed = (g // 2 + 1) * g * g * 8
        nb = 18 * (real + packed) + 2 * 3 * packed
        legs.append((f"ns3d_step_{g}^3", step, uh, nb, cop))

    results = {name: [] for name, *_ in legs}
    ceilings = []
    for t in range(TRIALS):
        try:
            ceilings.append(profile.measured_copy_ceiling_gbps(
                xr, unroll=8, reps=4))
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
              "roundtrip_rel": rel})
    print("# done", flush=True)


if __name__ == "__main__":
    main()
