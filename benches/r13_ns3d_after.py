#!/usr/bin/env python
"""Flagship 256^3 re-measure after the static-slab change, with the
chunkElements A/B at the flagship level (VERDICT r3 next #1/#8).

Times, in alternating healthy-window-aware trials:
  - the isolated c2r-256^3 b=6 and r2c-256^3 b=3 plans (the r9 rows that
    sat at 5.7% / 4.3% of a 370 GB/s ceiling),
  - one 3-D Navier-Stokes step at 128^3 and 256^3
    (examples/navier_stokes3d.py; 18 real transforms + pointwise algebra),
  - the NS step with tuning.chunkElements=2^25 injected into every plan
    (monkeypatched create_plan) — the flagship-level A/B r8 ran before
    the numeric gate existed, now with a validity cross-check against the
    default route's output.

Appends rows to benches/results_r4.jsonl.  Run to completion:
  nohup python benches/r13_ns3d_after.py > benches/logs/r13.log 2>&1 &
"""

import importlib.util
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "benches", "results_r4.jsonl")

UNROLL = 2
REPS = 3
TRIALS = int(os.environ.get("R13_TRIALS", "3"))


def emit(row):
    print(json.dumps(row), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")


def _load_ns3d():
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples", "navier_stokes3d.py")
    spec = importlib.util.spec_from_file_location("ns3d_r13", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def step_min_bytes(n: int) -> float:
    real = n * n * n * 4
    packed = (n // 2 + 1) * n * n * 8
    return 18 * (real + packed) + 2 * 3 * packed


def hetero_chain_time(fn, x, *, unroll=UNROLL, reps=REPS):
    @jax.jit
    def chain(v):
        s = jnp.zeros((), jnp.float32)
        for _ in range(unroll):
            y = fn(v + (s * 1e-30).astype(v.dtype))
            s = y[(0,) * y.ndim].astype(jnp.float32)
        return s

    s = float(chain(x))
    t0 = time.perf_counter()
    for _ in range(reps):
        s = float(chain(x))
    return max((time.perf_counter() - t0) / reps / unroll, 1e-9)


def main():
    import webgpufft_tpu as W
    from webgpufft_tpu.runtime import profile

    backend = jax.default_backend()
    print(f"# backend={backend}", flush=True)
    rng = np.random.default_rng(0)
    ns = _load_ns3d()

    legs = []   # (name, fn, x, min_bytes, validity_ref_or_None)

    # isolated transforms at the r9 geometry
    n = 256
    c2r = W.create_plan({"type": "c2r", "shape": [n, n, n], "batch": 6,
                         "direction": "inverse", "normalize": "none"},
                        cache=W.PlanCache())
    r2c = W.create_plan({"type": "r2c", "shape": [n, n, n], "batch": 3,
                         "direction": "forward", "normalize": "none"},
                        cache=W.PlanCache())
    packed = jnp.asarray(rng.standard_normal((6, n // 2 + 1, n, n, 2)),
                         jnp.float32)
    xr = jnp.asarray(rng.standard_normal((3, n, n, n)), jnp.float32)
    legs.append(("c2r_full_plan_n256_b6",
                 lambda v: c2r._fn(c2r._consts, v), packed,
                 packed.size * 4 + 6 * n ** 3 * 4))
    legs.append(("r2c_full_plan_n256_b3",
                 lambda v: r2c._fn(r2c._consts, v), xr,
                 3 * n ** 3 * 4 + 3 * (n // 2 + 1) * n * n * 8))

    # NS steps, default tuning
    steppers = {}
    for g in (128, 256):
        step, to_spec, _ = ns.make_stepper3(g, 1e-3, 1e-3)
        u0 = rng.standard_normal((3, g, g, g)).astype(np.float32)
        uh = to_spec(u0)
        steppers[g] = (step, uh)
        legs.append((f"ns3d_step_{g}^3", step, uh, step_min_bytes(g)))

    # NS step 256^3 with chunkElements=2^25 in every plan
    real_create = W.create_plan

    def patched(opts=None, **kw):
        if opts is None:
            opts = dict(kw)
            kw = {}
        else:
            opts = dict(opts)
        tun = dict(opts.get("tuning") or {})
        tun.setdefault("chunkElements", 1 << 25)
        opts["tuning"] = tun
        return real_create(opts, **kw)

    W.create_plan = patched
    ns_b = _load_ns3d()
    step_b, to_spec_b, _ = ns_b.make_stepper3(256, 1e-3, 1e-3)
    W.create_plan = real_create
    uh256 = steppers[256][1]
    legs.append(("ns3d_step_256^3_chunk2^25", step_b, uh256,
                 step_min_bytes(256)))

    # validity: the chunk variant's step output vs the default route's
    y_def = steppers[256][0](uh256)
    y_b = step_b(uh256)
    idx = jnp.arange(0, y_def.size, max(1, y_def.size // 4096))
    sd = np.asarray(y_def.ravel()[idx], np.float64)
    sb = np.asarray(y_b.ravel()[idx], np.float64)
    rel = float(np.linalg.norm(sb - sd) / max(np.linalg.norm(sd), 1e-30))
    print(f"# chunk2^25 step validity rel={rel:.3e}", flush=True)
    emit({"bench": "r13_ns3d/chunk2^25_validity", "backend": backend,
          "rel_vs_default": rel, "valid": rel < 1e-4})
    del y_def, y_b

    results = {name: [] for name, *_ in legs}
    ceilings = []
    for t in range(TRIALS):
        try:
            ceilings.append(profile.measured_copy_ceiling_gbps(
                packed, unroll=4, reps=4))
        except Exception as ex:
            print(f"# ceiling failed: {ex!r}"[:120], flush=True)
            ceilings.append(0.0)
        print(f"# trial{t} copy={ceilings[-1]:.0f} GB/s", flush=True)
        for name, fn, x, _nb in legs:
            try:
                if name.startswith("ns3d"):   # step: u_hat -> u_hat
                    dt = profile.unrolled_chain_time(fn, x, unroll=UNROLL,
                                                     reps=REPS)
                else:                         # r2c/c2r change shape
                    dt = hetero_chain_time(fn, x)
            except Exception as ex:
                print(f"#   {name} failed: {ex!r}"[:160], flush=True)
                continue
            results[name].append(dt)
            print(f"#   {name}: {dt*1e3:.2f} ms", flush=True)

    ceiling = max(ceilings) if ceilings else 0.0
    for name, _fn, _x, nb in legs:
        if not results[name]:
            emit({"bench": f"r13_ns3d/{name}", "backend": backend,
                  "error": True})
            continue
        dt = min(results[name])
        eff = nb / dt / 1e9
        emit({"bench": f"r13_ns3d/{name}", "backend": backend,
              "avg_ms": round(dt * 1e3, 3), "min_bytes": nb,
              "eff_gbps": round(eff, 1),
              "copy_ceiling_gbps": round(ceiling, 1),
              "vs_copy": round(eff / max(ceiling, 1e-9), 3)})
    print("# done", flush=True)


if __name__ == "__main__":
    main()
