#!/usr/bin/env python
"""On-chip probe of the measured planner rigor (runtime/measure.py).

For the headline configs, runs ``tuning.rigor="measure"`` on the live
TPU and records which candidate wins, its margin over the static
policy, and the raw alternating trials — the first real-hardware data
for the FFTW_MEASURE-style planner.  Appends one JSON line per config
to benches/results_r3.jsonl.

Run as `nohup python benches/r5_measure_probe.py > /tmp/r5_measure.log
2>&1 &` — never under a timeout (CLAUDE.md TPU rules).
"""

import json
import time

import jax

import webgpufft_tpu as W

OUT = "benches/results_r3.jsonl"

CONFIGS = [
    ("c2c_1024_b4096", {"type": "c2c", "shape": [1024], "batch": 4096}),
    ("c2c_4096_b4096", {"type": "c2c", "shape": [4096], "batch": 4096}),
    ("c2c_1m_b8", {"type": "c2c", "shape": [1 << 20], "batch": 8}),
    ("c2c_2d_1024_b4", {"type": "c2c", "shape": [1024, 1024], "batch": 4}),
    ("r2c_65536_b64", {"type": "r2c", "shape": [65536], "batch": 64}),
]


def main():
    print(f"# backend={jax.default_backend()}", flush=True)
    for name, opts in CONFIGS:
        cache = W.PlanCache()
        spec = {**opts, "direction": "forward", "normalize": "unitary",
                "tuning": {"rigor": "measure"}}
        t0 = time.perf_counter()
        try:
            plan = W.create_plan(spec, cache=cache)
        except Exception as e:
            print(f"# {name} failed: {str(e)[:200]}", flush=True)
            continue
        plan_s = time.perf_counter() - t0
        rec = next(iter(cache.measured.values()), {})
        row = {
            "bench": f"r5_measure/{name}",
            "backend": jax.default_backend(),
            "winner": rec.get("winner"),
            "trials_ms": rec.get("trials_ms"),
            "route_mode": plan.route.mode,
            "notes": [r for r in plan.route.reasons
                      if r.startswith("measured")],
            "plan_seconds": round(plan_s, 2),
            "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
        }
        with open(OUT, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
