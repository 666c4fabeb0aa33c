#!/usr/bin/env python
"""Measurement-protocol audit: folding, per-dispatch overhead, slope timing.

Two threats to every GB/s number this repo reports:

1. **Algebraic folding**: XLA's simplifier folds a chain of identical
   constant multiplies into ONE multiply (verified on the CPU backend:
   8-deep ``v*c`` chain compiles to a single fused mul).  If the TPU
   backend does the same, ``measured_copy_ceiling_gbps`` (an unrolled
   ``v*c`` chain) times 1 HBM pass while dividing by ``unroll`` —
   ceilings inflated by the unroll factor.
2. **Per-dispatch overhead**: the tunnel's per-call cost is NOT a
   constant 0.2-0.4 ms — the healthy watcher read 22-25 GB/s on a 33 MB
   probe in the same minutes an 811 MB probe read 429 GB/s, consistent
   with ~10 ms/call. Dividing a fixed cost by ``unroll`` under-reports
   small-array bandwidth by whatever the overhead happens to be.

This probe settles both with data:

- compiles the copy chain on the REAL backend and counts multiplies in
  the optimized HLO (folding: yes/no, with and without
  ``lax.optimization_barrier`` between applications);
- sweeps unroll k in {1,2,4,8,16,32} for three subjects — 33 MB copy,
  811 MB copy, 33 MB c2c-1024 plan — with barriers, and fits
  T(k) = overhead + k*slope per dispatch.  The slope is the honest
  per-application device time; the intercept is today's per-dispatch
  overhead.

Run to completion (never under timeout):
  nohup python benches/r16_protocol.py > benches/logs/r16.log 2>&1 &
"""

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

KS = (1, 2, 4, 8, 16, 32)
REPS = 3


def emit(row):
    row = {"bench": f"r16_protocol/{row.pop('leg')}", **row}
    print(json.dumps(row), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")


def chain_total_time(fn, x, k, reps=REPS, barrier_steps=True):
    """Wall seconds for ONE dispatch of a k-deep chain (averaged over reps,
    scalar-readback barrier per dispatch so dispatches don't overlap)."""
    @jax.jit
    def chain(v):
        for _ in range(k):
            v = fn(v)
            if barrier_steps:
                v = jax.lax.optimization_barrier(v)
        return v

    def sync(v):
        return float(v[(0,) * v.ndim])

    sync(chain(x))                      # compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(chain(x))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def fit_line(ks, ts):
    ks = np.asarray(ks, np.float64)
    ts = np.asarray(ts, np.float64)
    a = np.vstack([ks, np.ones_like(ks)]).T
    slope, intercept = np.linalg.lstsq(a, ts, rcond=None)[0]
    return float(slope), float(intercept)


def main():
    import webgpufft_tpu as W

    backend = jax.default_backend()
    print(f"# backend={backend}", flush=True)

    mul = lambda v: v * jnp.float32(1.000001)  # noqa: E731

    # ---- folding audit on the real backend ---------------------------------
    small = jnp.zeros((4096, 2048), jnp.float32)          # 33.5 MB
    for name, bar in (("nobarrier", False), ("barrier", True)):
        def chain8(v):
            for _ in range(8):
                v = mul(v)
                if bar:
                    v = jax.lax.optimization_barrier(v)
            return v
        hlo = jax.jit(chain8).lower(small).compile().as_text()
        nmul = hlo.count("multiply(")
        nfus = hlo.count("fusion(")
        emit({"leg": f"hlo_mulcount_{name}", "backend": backend,
              "unroll": 8, "multiplies": nmul, "fusions": nfus})

    # ---- unroll sweeps ------------------------------------------------------
    big = jnp.zeros((6, 129 * 256 * 256 * 2), jnp.float32)  # 811 MB
    rng = np.random.default_rng(0)
    xfft = jnp.asarray(rng.standard_normal((4096, 1024, 2)), jnp.float32)
    plan = W.create_plan({"type": "c2c", "shape": [1024], "batch": 4096,
                          "direction": "forward", "normalize": "unitary"},
                         cache=W.PlanCache())
    fftfn = lambda v: plan._fn(plan._consts, v)  # noqa: E731

    subjects = [
        ("copy33mb", mul, small, 2 * small.size * 4),
        ("copy811mb", mul, big, 2 * big.size * 4),
        ("fft1024b4096", fftfn, xfft, 5 * xfft.size * 4),  # ~5-pass model
    ]
    for name, fn, x, nbytes in subjects:
        ts = []
        for k in KS:
            t = chain_total_time(fn, x, k)
            ts.append(t)
            print(f"#   {name} k={k}: {t*1e3:.2f} ms total "
                  f"({t/k*1e3:.3f} ms/app naive)", flush=True)
        slope, intercept = fit_line(KS, ts)
        eff = nbytes / max(slope, 1e-12) / 1e9
        naive8 = ts[KS.index(8)] / 8
        emit({"leg": f"sweep_{name}", "backend": backend,
              "ks": list(KS), "totals_ms": [round(t * 1e3, 3) for t in ts],
              "slope_ms": round(slope * 1e3, 4),
              "overhead_ms": round(intercept * 1e3, 3),
              "naive8_ms": round(naive8 * 1e3, 4),
              "min_bytes": nbytes,
              "eff_gbps_slope": round(eff, 1),
              "eff_gbps_naive8": round(nbytes / naive8 / 1e9, 1)})

    # also: the old protocol's number for the 33 MB copy, for the record
    from webgpufft_tpu.runtime import profile
    old = profile.measured_copy_ceiling_gbps(xfft, unroll=8, reps=4)
    emit({"leg": "old_ceiling_33mb", "backend": backend,
          "eff_gbps": round(old, 1)})
    old_big = profile.measured_copy_ceiling_gbps(
        jnp.zeros((6, 129 * 256 * 256, 2), jnp.float32), unroll=4, reps=3)
    emit({"leg": "old_ceiling_811mb", "backend": backend,
          "eff_gbps": round(old_big, 1)})
    print("# done", flush=True)


if __name__ == "__main__":
    main()
