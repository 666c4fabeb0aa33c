#!/usr/bin/env python
"""On-chip probe of a REAL spectral workload: the Navier-Stokes step.

Times one pseudo-spectral NS step (examples/navier_stokes2d.py: two RHS
evaluations = 2 x (batch-4 c2r + r2c) = 10 n x n real transforms plus
the pointwise spectral algebra) with the repo's unrolled-chain
methodology — K steps lax.scan'd inside ONE jit, scalar-readback
barrier, alternating copy-ceiling trials — and appends one JSON line
per grid to benches/results_r3.jsonl.  This is the end-to-end workload
datapoint the transform-level suite rows cannot give: it includes the
pointwise ops XLA fuses between transforms.

Run as `nohup python benches/r5_ns_probe.py > /tmp/r5_ns.log 2>&1 &` —
never under a timeout (CLAUDE.md TPU rules).
"""

import importlib.util
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from webgpufft_tpu.runtime import profile

OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "benches", "results_r3.jsonl")

GRIDS = (256, 512, 1024)
UNROLL = 8
REPS = 8
TRIALS = 3


def _load_example():
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples", "navier_stokes2d.py")
    spec = importlib.util.spec_from_file_location("ns2d_example", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def step_min_bytes(n: int) -> float:
    """Minimal HBM traffic of one NS step: 10 real<->packed transforms
    (read + write once each, f32; packed side ~ n*(n/2+1) complex) plus
    one read+write of the carried spectrum for the pointwise update."""
    real = n * n * 4
    packed = n * (n // 2 + 1) * 8
    per_transform = real + packed
    return 10 * per_transform + 2 * packed


def main():
    backend = jax.default_backend()
    print(f"# backend={backend}", flush=True)
    ns = _load_example()
    rng = np.random.default_rng(0)
    for n in GRIDS:
        nu, dt = 1e-3, 1e-3
        try:
            step, to_spectral, _ = ns.make_stepper(n, nu, dt)
            w0 = rng.standard_normal((n, n)).astype(np.float32)
            w0 -= w0.mean()
            w_hat = to_spectral(w0)

            def one(v, _step=step):
                return _step(v)

            best_dt = float("inf")
            ceiling = 0.0
            for _ in range(TRIALS):
                c = profile.measured_copy_ceiling_gbps(
                    w_hat, unroll=UNROLL, reps=max(4, REPS // 2))
                ceiling = max(ceiling, c)
                t = profile.unrolled_chain_time(one, w_hat,
                                                unroll=UNROLL, reps=REPS)
                best_dt = min(best_dt, t)
            gbps = step_min_bytes(n) / best_dt / 1e9
            row = {
                "bench": f"r5_ns/step_{n}x{n}",
                "avg_ms": round(best_dt * 1e3, 4),
                "eff_gbps": round(gbps, 1),
                "copy_ceiling_gbps": round(ceiling, 1),
                "vs_copy": round(gbps / ceiling, 3) if ceiling else None,
                "transforms_per_step": 10,
                "unroll": UNROLL,
                "trials": TRIALS,
                "backend": backend,
            }
        except Exception as e:  # noqa: BLE001
            row = {"bench": f"r5_ns/step_{n}x{n}", "backend": backend,
                   "error": f"{type(e).__name__}: {str(e)[:200]}"}
        print(json.dumps(row), flush=True)
        with open(OUT, "a") as f:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
