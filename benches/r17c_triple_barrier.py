#!/usr/bin/env python
"""The 3-axis chain pathology: is it fusion/layout, and do barriers fix it?

r17b (clean chip, protocol v2): single axis passes 10.9-11.9 ms, adjacent
PAIRS compose additively (21.4-22.9 ms), but the TRIPLE (engine.apply_nd,
a plain loop of the same slabbed_axis_apply calls) takes 83 ms — 2.5x its
sum-of-parts.  Since apply_nd adds nothing but the third call, the
pathology lives in how XLA compiles the longer graph (fusion/layout/
scheduling decisions change).

Legs, alternating in one session:
  - triple_plain     ax0.ax1.ax2 exactly as apply_nd
  - triple_barrier   optimization_barrier between passes (blocks
                     cross-pass fusion/layout decisions)
  - triple_rev       ax2.ax1.ax0 (order sensitivity)
  - pair02           axes 0 and 2 (skipping the middle)
plus compiled-HLO op histograms and XLA cost-model bytes for plain vs
barrier triples (written to the log, not the results file).

Run to completion (never under timeout):
  nohup python benches/r17c_triple_barrier.py > benches/logs/r17c.log 2>&1 &
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

TRIALS = int(os.environ.get("R17C_TRIALS", "2"))


def emit(row):
    row = {"bench": f"r17c_triple/{row.pop('leg')}", "protocol": "v2", **row}
    print(json.dumps(row), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")


def hlo_histogram(fn, x, label):
    comp = jax.jit(fn).lower(x).compile()
    txt = comp.as_text()
    counts = {}
    for op in ("fusion(", "copy(", "transpose(", "convolution(",
               "dot(", "bitcast(", "reshape("):
        counts[op.rstrip("(")] = txt.count(op)
    cost = {}
    try:
        ca = comp.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        for k in ("bytes accessed", "optimal_seconds", "flops"):
            if k in ca:
                cost[k] = float(ca[k])
    except Exception as ex:
        cost["error"] = str(ex)[:80]
    print(f"# HLO[{label}] ops={counts} cost={cost}", flush=True)
    return counts, cost


def main():
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

    def ap(v, i):
        return A.slabbed_axis_apply(v, fwd[i], 1 + i, cf)

    def triple_plain(v):
        return ap(ap(ap(v, 0), 1), 2)

    def triple_barrier(v):
        v = jax.lax.optimization_barrier(ap(v, 0))
        v = jax.lax.optimization_barrier(ap(v, 1))
        return ap(v, 2)

    def triple_rev(v):
        return ap(ap(ap(v, 2), 1), 0)

    def pair02(v):
        return ap(ap(v, 0), 2)

    # correctness: barrier variant == plain (slice probe)
    ya = np.asarray(jax.jit(triple_plain)(full[:1]))
    yb = np.asarray(jax.jit(triple_barrier)(full[:1]))
    rel = float(np.abs(ya - yb).max() / max(np.abs(ya).max(), 1e-30))
    print(f"# plain-vs-barrier agreement rel={rel:.2e}", flush=True)

    hlo_histogram(triple_plain, full, "triple_plain")
    hlo_histogram(triple_barrier, full, "triple_barrier")

    legs = [
        ("triple_plain", triple_plain, 6 * bytes_full),
        ("triple_barrier", triple_barrier, 6 * bytes_full),
        ("triple_rev", triple_rev, 6 * bytes_full),
        ("pair02", pair02, 4 * bytes_full),
    ]
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
        for name, fn, _nb in legs:
            try:
                dt = profile.hbm_stream_time(fn, full, copies=1, reps=4)
            except Exception as ex:
                print(f"#   {name} failed: {ex!r}"[:160], flush=True)
                continue
            results[name].append(dt)
            print(f"#   {name}: {dt*1e3:.3f} ms", flush=True)

    ceiling = max(ceilings) if ceilings else 0.0
    for name, _fn, nb in legs:
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
              "agree_rel": rel})
    print("# done", flush=True)


if __name__ == "__main__":
    main()
