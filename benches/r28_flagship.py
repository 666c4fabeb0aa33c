#!/usr/bin/env python
"""Flagship re-measure after the fused r2c/c2r untangle (r23 -> library).

VERDICT r4 item 1: NS-3D 256^3 step was 77.7 ms at vs_copy 0.074-0.081;
target <= 55 ms at a ~490 GB/s ceiling, or a pass-by-pass floor account.
r23 measured the fused untangle at 1.21x on the hand-rolled 256^3
roundtrip (21.5 -> 17.8 ms); this probe measures the LIBRARY plans (the
fused spelling landed in plans/transforms.py, commit 5537a13) and the
full Navier-Stokes step (examples/navier_stokes3d.py: 2 RHS = 2 batch-6
c2r + 2 batch-3 r2c per step = 18 transform-equivalents).

Legs (protocol v2, hbm_stream_time + same-session copy ceiling):
    r2c_plan_b3, c2r_plan_b6, rt_plan_b3, ns256_step, ns128_step.

Run to completion (never under timeout):
  nohup python benches/r28_flagship.py > benches/logs/r5/r28.log 2>&1 &
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
TRIALS = int(os.environ.get("R28_TRIALS", "2"))


def emit(row):
    row = {"bench": f"r28_flagship/{row.pop('leg')}", "protocol": "v2", **row}
    print(json.dumps(row), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")


def _load_ns3d():
    path = os.path.join(REPO, "examples", "navier_stokes3d.py")
    spec = importlib.util.spec_from_file_location("ns3d_r28", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def step_min_bytes(n: int) -> float:
    """Minimal HBM bytes for one NS step: 18 transform-equivalents
    (each reads + writes ~a full grid) + the RHS pointwise traffic."""
    real = n * n * n * 4
    packed = (n // 2 + 1) * n * n * 8
    return 18 * (real + packed) + 2 * 3 * packed


def rt_bytes(n: int, b: int) -> float:
    """r2c+c2r roundtrip on b fields: 2*b transforms, in+out each."""
    real = n * n * n * 4
    packed = (n // 2 + 1) * n * n * 8
    return 2 * b * (real + packed)


def main():
    import webgpufft_tpu as W
    from webgpufft_tpu.runtime import profile

    backend = jax.default_backend()
    print(f"# backend={backend}", flush=True)
    rng = np.random.default_rng(0)
    n = 256
    p = n // 2 + 1

    r2c3 = W.create_plan(type="r2c", shape=[n, n, n], batch=3)
    c2r6 = W.create_plan(type="c2r", shape=[n, n, n], batch=6,
                         direction="inverse", normalize="backward")
    c2r3 = W.create_plan(type="c2r", shape=[n, n, n], batch=3,
                         direction="inverse", normalize="backward")

    xr3 = jnp.asarray(rng.standard_normal((3, n, n, n)), jnp.float32)
    xp6 = jnp.asarray(rng.standard_normal((6, p, n, n, 2)) * 0.1,
                      jnp.float32)

    # correctness anchor: library plan vs numpy on the flagship shape
    yk = np.asarray(r2c3.exec(xr3), np.float64)
    yref = np.fft.fftn(np.asarray(xr3, np.float64), axes=(1, 2, 3))[:, :p]
    rel = (np.max(np.abs((yk[..., 0] + 1j * yk[..., 1]) - yref))
           / np.max(np.abs(yref)))
    print(f"# r2c plan vs numpy rel={rel:.3e}", flush=True)
    assert rel < 1e-5, rel
    back = np.asarray(c2r3.exec(jnp.asarray(yk, jnp.float32)), np.float64)
    rel = (np.max(np.abs(back - np.asarray(xr3, np.float64)))
           / np.max(np.abs(np.asarray(xr3))))
    print(f"# roundtrip rel={rel:.3e}", flush=True)
    assert rel < 1e-5, rel

    ns = _load_ns3d()
    step256, to_spec256, _ = ns.make_stepper3(256, nu=1e-3, dt=1e-3)
    step128, to_spec128, _ = ns.make_stepper3(128, nu=1e-3, dt=1e-3)
    u256 = to_spec256(jnp.asarray(
        rng.standard_normal((3, 256, 256, 256)) * 0.1, jnp.float32))
    u128 = to_spec128(jnp.asarray(
        rng.standard_normal((3, 128, 128, 128)) * 0.1, jnp.float32))
    # one step readback as sanity
    s = float(jnp.sum(step256(u256).ravel()[:1]))
    print(f"# ns256 one-step readback {s:.3e}", flush=True)

    if TRIALS == 0:
        print("# correctness-only run (R28_TRIALS=0)", flush=True)
        return

    def wrap(fn):
        def g(x):
            return x * (1.0 + 1e-24 * jnp.mean(fn(x)))
        return g

    legs = [
        ("r2c_plan_b3", wrap(r2c3.exec), xr3, rt_bytes(n, 3) / 2),
        ("c2r_plan_b6", wrap(c2r6.exec), xp6, rt_bytes(n, 6) / 2),
        ("rt_plan_b3", wrap(lambda x: c2r3.exec(r2c3.exec(x))), xr3,
         rt_bytes(n, 3)),
        ("ns256_step", step256, u256, step_min_bytes(256)),
        ("ns128_step", step128, u128, step_min_bytes(128)),
    ]

    results = {name: [] for name, _f, _x, _b in legs}
    ceilings = []
    for t in range(TRIALS):
        try:
            ceilings.append(profile.measured_copy_ceiling_gbps(
                xr3, unroll=8, reps=4))
        except Exception as ex:
            print(f"# ceiling failed: {ex!r}"[:120], flush=True)
            ceilings.append(0.0)
        print(f"# trial{t} copy(v2)={ceilings[-1]:.0f} GB/s", flush=True)
        for name, fn, x, _bb in legs:
            try:
                dt = profile.hbm_stream_time(fn, x, copies=1, reps=4)
            except Exception as ex:
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
        io = bb / best / 1e9
        emit({"leg": name, "backend": backend,
              "avg_ms": round(best * 1e3, 3),
              "io_gbps": round(io, 1),
              "vs_copy": round(io / ceiling, 3) if ceiling else None,
              "copy_ceiling_gbps": round(ceiling, 1)})
    print("# done", flush=True)


if __name__ == "__main__":
    main()
