#!/usr/bin/env python
"""bf16-storage on the real-input 3-D flagship family (round-5 closing
datapoint): docs/PERFORMANCE.md r28 point 3 argues the only lever left
below the per-axis materialization floor is halved bytes — this probe
measures it at the flagship geometry, same-session as f32 legs.

Legs (protocol v2, alternating, same session):
  rt_f32_b3       library r2c+c2r roundtrip 256^3 b3, f32
  rt_bf16_b3      same plans with precision="bf16-storage" (bf16 io;
                  eff GB/s on its own HALVED byte model)
  ns256_f32       NS-3D 256^3 Heun step, f32 (examples/navier_stokes3d)
  ns256_bf16      same stepper with precision="bf16-storage" (transform
                  traffic halved; solver state/pointwise stays f32)
  + accuracy: bf16 step vs f32 step relative error at the same state.

Run to completion (never under timeout):
  nohup python benches/r34_bf16_flagship.py > benches/logs/r5/r34.log 2>&1 &
"""

import importlib.util
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "benches", "results_r5.jsonl")


def emit(row):
    row = {"bench": f"r34_bf16/{row.pop('leg')}", "protocol": "v2", **row}
    print(json.dumps(row), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")


def _load_ns3d():
    path = os.path.join(REPO, "examples", "navier_stokes3d.py")
    spec = importlib.util.spec_from_file_location("ns3d_r34", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def rt_bytes(n: int, b: int, elem_scale: float) -> float:
    real = n * n * n * 4 * elem_scale
    packed = (n // 2 + 1) * n * n * 8 * elem_scale
    return 2 * b * (real + packed)


def step_min_bytes(n: int, elem_scale: float) -> float:
    """18 transform-equivalents at the storage width + f32 pointwise."""
    real = n * n * n * 4
    packed = (n // 2 + 1) * n * n * 8
    return 18 * (real + packed) * elem_scale + 2 * 3 * packed


def main():
    import webgpufft_tpu as W
    from webgpufft_tpu.runtime import profile

    backend = jax.default_backend()
    print(f"# backend={backend}", flush=True)
    rng = np.random.default_rng(0)
    n = 256
    p = n // 2 + 1

    # --- plans ---
    r2c_f = W.create_plan(type="r2c", shape=[n, n, n], batch=3)
    c2r_f = W.create_plan(type="c2r", shape=[n, n, n], batch=3,
                          direction="inverse", normalize="backward")
    r2c_b = W.create_plan(type="r2c", shape=[n, n, n], batch=3,
                          precision="bf16-storage")
    c2r_b = W.create_plan(type="c2r", shape=[n, n, n], batch=3,
                          direction="inverse", normalize="backward",
                          precision="bf16-storage")

    xr = jnp.asarray(rng.standard_normal((3, n, n, n)), jnp.float32)
    xr_b = xr.astype(jnp.bfloat16)

    def rt_f(x):
        return c2r_f.exec(r2c_f.exec(x))

    def rt_b(x):
        return c2r_b.exec(r2c_b.exec(x))

    # correctness anchors
    y = np.asarray(rt_f(xr), np.float64)
    rel_f = np.max(np.abs(y - np.asarray(xr, np.float64))) / np.max(np.abs(y))
    yb = np.asarray(rt_b(xr_b).astype(jnp.float32), np.float64)
    rel_b = np.max(np.abs(yb - np.asarray(xr, np.float64))) / np.max(np.abs(y))
    print(f"# rt f32 rel={rel_f:.3e}  rt bf16 rel={rel_b:.3e}", flush=True)
    assert rel_f < 1e-5, rel_f
    assert rel_b < 5e-2, rel_b

    ns = _load_ns3d()
    step_f, to_spec, _ = ns.make_stepper3(n, nu=1e-3, dt=1e-3)
    step_b, _, _ = ns.make_stepper3(n, nu=1e-3, dt=1e-3,
                                    precision="bf16-storage")
    u = to_spec(jnp.asarray(rng.standard_normal((3, n, n, n)) * 0.1,
                            jnp.float32))
    vf = step_f(u)
    vb = step_b(u)
    rel_s = float(jnp.max(jnp.abs(vb - vf)) / (jnp.max(jnp.abs(vf)) + 1e-30))
    print(f"# ns step bf16-vs-f32 rel={rel_s:.3e}", flush=True)

    def wrap(fn):
        def g(x):
            # scalar feedback keeps the chain data-dependent; cast back
            # to x.dtype so the hbm_stream_time scan carry type is stable
            # for bf16 working sets
            s = 1.0 + 1e-24 * jnp.mean(fn(x).astype(jnp.float32))
            return x * s.astype(x.dtype)
        return g

    legs = [
        ("rt_f32_b3", wrap(rt_f), xr, rt_bytes(n, 3, 1.0)),
        ("rt_bf16_b3", wrap(rt_b), xr_b, rt_bytes(n, 3, 0.5)),
        ("ns256_f32", wrap(step_f), u, step_min_bytes(n, 1.0)),
        ("ns256_bf16", wrap(step_b), u, step_min_bytes(n, 0.5)),
    ]
    results = {name: [] for name, _f, _x, _b in legs}
    ceilings = []
    for t in range(2):
        try:
            ceilings.append(profile.measured_copy_ceiling_gbps(
                xr, unroll=8, reps=4))
        except Exception as ex:  # noqa: BLE001
            print(f"# ceiling failed: {ex!r}"[:120], flush=True)
            ceilings.append(0.0)
        print(f"# trial{t} copy(v2)={ceilings[-1]:.0f} GB/s", flush=True)
        for name, fn, x, _bb in legs:
            try:
                dt = profile.hbm_stream_time(fn, x, copies=1, reps=3)
            except Exception as ex:  # noqa: BLE001
                print(f"#   {name} failed: {ex!r}"[:160], flush=True)
                continue
            results[name].append(dt)
            print(f"#   {name}: {dt*1e3:.3f} ms", flush=True)

    ceiling = max(ceilings) if ceilings else 0.0
    for name, _f, _x, bb in legs:
        if not results[name]:
            emit({"leg": name, "backend": backend, "error": True})
            continue
        best = min(results[name])
        eff = bb / best / 1e9
        emit({"leg": name, "backend": backend,
              "avg_ms": round(best * 1e3, 3),
              "eff_gbps": round(eff, 1),
              "vs_copy": round(eff / ceiling, 3) if ceiling else None,
              "copy_ceiling_gbps": round(ceiling, 1),
              "accuracy": {"rt_bf16_rel": float(rel_b),
                           "step_bf16_vs_f32_rel": rel_s}})
    print("# done", flush=True)


if __name__ == "__main__":
    main()
