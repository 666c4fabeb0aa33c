#!/usr/bin/env python
"""A/B the packed-domain geometry split at 256^3 (protocol v2).

Hypothesis (r9_attrib): rest-axis passes on the odd (h+1)=129-bin packed
array run ~37 GB/s where the same passes on the 2^k body geometry run
100-148 — the odd leading dim poisons the layout.  The fix (this round)
splits the packed domain into the h-bin body + the lone Nyquist plane so
no axis pass ever sees 129.

Legs (alternating within one session):
  rest129   — axes 1,2 passes on (3,129,256,256,2)   [old geometry]
  rest_split— body+nyq passes + concat               [new geometry]
  r2c/c2r roundtrip b3, ns3d 128^3/256^3 on the NEW plans
  (cross-session anchors: r17_v2 roundtrip 22.3 ms, ns3d-256 72.8 ms)

Run to completion (never under timeout):
  nohup python benches/r21_half_split.py > benches/logs/r21.log 2>&1 &
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

TRIALS = int(os.environ.get("R21_TRIALS", "2"))


def emit(row):
    row = {"bench": f"r21_split/{row.pop('leg')}", "protocol": "v2", **row}
    print(json.dumps(row), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")


def _load_ns3d():
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples", "navier_stokes3d.py")
    spec = importlib.util.spec_from_file_location("ns3d_r21", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main():
    import webgpufft_tpu as W
    from webgpufft_tpu.core import engine
    from webgpufft_tpu.core.axis import slabbed_axis_apply
    from webgpufft_tpu.runtime import profile
    from webgpufft_tpu.spec import TuningSpec

    backend = jax.default_backend()
    print(f"# backend={backend}", flush=True)
    rng = np.random.default_rng(0)
    n = 256
    h, p = n // 2, n // 2 + 1

    tuning = TuningSpec()
    axis_plans = engine.build_axis_plans((h, n, n), "forward", tuning)
    consts = engine.collect_consts(axis_plans)
    bound = None  # default chunk bound

    xp_ = jnp.asarray(rng.standard_normal((3, p, n, n, 2)), jnp.float32)

    def rest129(v):
        for d in (2, 1):
            v = slabbed_axis_apply(v, axis_plans[d], 1 + d, consts, bound)
        return v

    def rest_split(v):
        body, nyq = v[:, :h], v[:, h:]
        for d in (2, 1):
            body = slabbed_axis_apply(body, axis_plans[d], 1 + d, consts,
                                      bound)
            nyq = slabbed_axis_apply(nyq, axis_plans[d], 1 + d, consts, bound)
        return jnp.concatenate([body, nyq], axis=1)

    # numeric agreement on-chip
    ya, yb = rest129(xp_), rest_split(xp_)
    rel = float(jnp.max(jnp.abs(ya - yb)) / jnp.max(jnp.abs(ya)))
    print(f"# rest129 vs rest_split rel={rel:.3e}", flush=True)

    cache = W.PlanCache()
    r2c = W.create_plan({"type": "r2c", "shape": [n, n, n], "batch": 3,
                         "direction": "forward", "normalize": "none"},
                        cache=cache)
    c2r = W.create_plan({"type": "c2r", "shape": [n, n, n], "batch": 3,
                         "direction": "inverse", "normalize": "backward"},
                        cache=cache)
    xr = jnp.asarray(rng.standard_normal((3, n, n, n)), jnp.float32)
    rt_bytes = 2 * (3 * n ** 3 * 4) + 2 * (3 * p * n * n * 8)

    def roundtrip(v):
        return c2r._fn(c2r._consts, r2c._fn(r2c._consts, v))

    y = roundtrip(xr)
    rt_rel = float(jnp.max(jnp.abs(y - xr)) / jnp.max(jnp.abs(xr)))
    print(f"# roundtrip identity rel={rt_rel:.3e}", flush=True)

    pass_bytes = 2 * 2 * (3 * p * n * n * 8)  # 2 axis passes, read+write
    legs = [
        ("rest129", rest129, xp_, pass_bytes, 1),
        ("rest_split", rest_split, xp_, pass_bytes, 1),
        ("r2c_c2r_roundtrip_b3", roundtrip, xr, rt_bytes, 1),
    ]
    ns = _load_ns3d()
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
              "agree_rel": rel, "roundtrip_rel": rt_rel})
    print("# done", flush=True)


if __name__ == "__main__":
    main()
