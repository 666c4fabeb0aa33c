#!/usr/bin/env python
"""Validate the HBM-stream protocol (profile.hbm_stream_time) on-chip.

Expectations if the protocol is right (from the r16 sweep):
  - copy 33 MB with the replicated working set reads ~= the 811 MB
    single-buffer slope (both HBM-streaming), NOT the 3.6 TB/s
    VMEM-resident figure;
  - copy 811 MB (copies=1 path) matches the r16 slope row;
  - the c2c-1024 b4096 headline reads its true HBM-streaming number.

Run to completion (never under timeout):
  nohup python benches/r16b_stream_validate.py > benches/logs/r16b.log 2>&1 &
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

TRIALS = int(os.environ.get("R16B_TRIALS", "3"))


def emit(row):
    row = {"bench": f"r16b_stream/{row.pop('leg')}", **row}
    print(json.dumps(row), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")


def main():
    import webgpufft_tpu as W
    from webgpufft_tpu.runtime import profile

    backend = jax.default_backend()
    print(f"# backend={backend}", flush=True)

    mul = lambda v: v * jnp.float32(1.000001)  # noqa: E731
    small = jnp.zeros((4096, 2048), jnp.float32)            # 33.5 MB
    big = jnp.zeros((6, 129 * 256 * 256 * 2), jnp.float32)  # 811 MB

    rng = np.random.default_rng(0)
    xfft = jnp.asarray(rng.standard_normal((4096, 1024, 2)), jnp.float32)
    plan = W.create_plan({"type": "c2c", "shape": [1024], "batch": 4096,
                          "direction": "forward", "normalize": "unitary"},
                         cache=W.PlanCache())
    fftfn = lambda v: plan._fn(plan._consts, v)  # noqa: E731

    subjects = [
        ("copy33mb_stream", mul, small, 2 * small.size * 4),
        ("copy811mb_stream", mul, big, 2 * big.size * 4),
        ("fft1024b4096_stream", fftfn, xfft, profile.fft_min_bytes(1024, 4096)),
    ]
    spec_roof = profile.device_hbm_gbps()
    for name, fn, x, nbytes in subjects:
        dts = []
        for t in range(TRIALS):
            dt = profile.hbm_stream_time(fn, x, reps=3)
            dts.append(dt)
            print(f"#   {name} trial{t}: {dt*1e3:.4f} ms/app "
                  f"({nbytes/dt/1e9:.0f} GB/s)", flush=True)
        dt = min(dts)
        eff = nbytes / dt / 1e9
        emit({"leg": name, "backend": backend,
              "avg_ms": round(dt * 1e3, 4), "min_bytes": int(nbytes),
              "eff_gbps": round(eff, 1),
              "pct_roofline": round(100 * eff / spec_roof, 2)})

    # end-to-end ceiling helper on the small subject
    ceil = profile.measured_copy_ceiling_gbps(xfft, unroll=8, reps=4)
    emit({"leg": "ceiling_api_33mb", "backend": backend,
          "eff_gbps": round(ceil, 1)})
    print("# done", flush=True)


if __name__ == "__main__":
    main()
