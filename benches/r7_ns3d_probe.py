#!/usr/bin/env python
"""On-chip probe of the flagship 3-D spectral workload: one 3-D
Navier-Stokes pseudo-spectral step (examples/navier_stokes3d.py — two
RHS evaluations = 2 x (batch-6 c2r + batch-3 r2c) = 18 n^3 real
transforms plus the curl / cross-product / Leray-projection pointwise
algebra).  The 3-D real-transform volume is the classic distributed-FFT
benchmark shape; this is its single-chip datapoint.

Methodology is the repo standard (CLAUDE.md): K steps lax.scan'd inside
ONE jit, scalar-readback barrier, alternating copy-ceiling trials;
appends one JSON line per grid to benches/results_r3.jsonl.

Run as `nohup python benches/r7_ns3d_probe.py > /tmp/r7_ns3d.log 2>&1 &`
— never under a timeout (CLAUDE.md TPU rules).
"""

import importlib.util
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from webgpufft_tpu.runtime import profile

OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "benches", "results_r3.jsonl")

GRIDS = (64, 128, 256)
UNROLL = 4
REPS = 6
TRIALS = 3


def _load_example():
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples", "navier_stokes3d.py")
    spec = importlib.util.spec_from_file_location("ns3d_example", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def step_min_bytes(n: int) -> float:
    """Minimal HBM traffic of one 3-D NS step: 18 real<->packed
    transforms (read + write once each; packed side (n//2+1)*n*n
    complex f32 pairs) plus one read+write of the carried 3-component
    spectrum for the pointwise update."""
    real = n * n * n * 4
    packed = (n // 2 + 1) * n * n * 8
    per_transform = real + packed
    return 18 * per_transform + 2 * 3 * packed


def main():
    backend = jax.default_backend()
    print(f"# backend={backend}", flush=True)
    ns = _load_example()
    rng = np.random.default_rng(0)
    for n in GRIDS:
        nu, dt = 1e-3, 1e-3
        try:
            step, to_spectral, _ = ns.make_stepper3(n, nu, dt)
            u0 = rng.standard_normal((3, n, n, n)).astype(np.float32)
            u_hat = to_spectral(u0)

            def one(v, _step=step):
                return _step(v)

            best_dt = float("inf")
            ceiling = 0.0
            for _ in range(TRIALS):
                c = profile.measured_copy_ceiling_gbps(
                    u_hat, unroll=UNROLL, reps=max(4, REPS // 2))
                ceiling = max(ceiling, c)
                t = profile.unrolled_chain_time(one, u_hat,
                                                unroll=UNROLL, reps=REPS)
                best_dt = min(best_dt, t)
            gbps = step_min_bytes(n) / best_dt / 1e9
            row = {
                "bench": f"r7_ns3d/step_{n}^3",
                "avg_ms": round(best_dt * 1e3, 4),
                "eff_gbps": round(gbps, 1),
                "copy_ceiling_gbps": round(ceiling, 1),
                "vs_copy": round(gbps / ceiling, 3) if ceiling else None,
                "transforms_per_step": 18,
                "unroll": UNROLL,
                "trials": TRIALS,
                "backend": backend,
            }
        except Exception as e:  # noqa: BLE001
            row = {"bench": f"r7_ns3d/step_{n}^3", "backend": backend,
                   "error": f"{type(e).__name__}: {str(e)[:200]}"}
        print(json.dumps(row), flush=True)
        with open(OUT, "a") as f:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()


