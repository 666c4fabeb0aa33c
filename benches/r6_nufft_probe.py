#!/usr/bin/env python
"""On-chip probe of the NUFFT layer at MRI scale.

Times the NORMAL OPERATOR A^H A = type1(type2(f)) — the conjugate-
gradient hot op of iterative non-Cartesian reconstruction
(examples/mri_gridding.py) and the only modes->modes composition the
unrolled-chain methodology can chain — at radial-MRI-like sizes
(K applications lax-unrolled inside ONE jit, scalar-readback barrier,
alternating copy-ceiling trials), appending one JSON line per config
to benches/results_r3.jsonl.

The interesting number is spread+interp throughput — Mtaps/s, points *
(2*Msp)^2 Gaussian taps scattered AND gathered per application —
because the scatter/gather pair is the one op class with no dense
reformulation (module docstring, webgpufft_tpu/nufft.py); the fine
FFTs ride the already-benchmarked transform kernels.

Run as `nohup python benches/r6_nufft_probe.py > /tmp/r6_nufft.log 2>&1 &`
— never under a timeout (CLAUDE.md TPU rules).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from webgpufft_tpu import nufft as NU
from webgpufft_tpu.runtime import profile

OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "benches", "results_r3.jsonl")

# (n_modes per side, number of nonuniform points, eps)
CONFIGS = (
    (128, 51_200, 1e-6),     # the examples/mri_gridding.py geometry
    (256, 204_800, 1e-6),    # clinically-sized radial stack
    (256, 204_800, 1e-4),    # budget tap count (Msp 6 vs 8)
)
UNROLL = 4
REPS = 6
TRIALS = 3


def main():
    backend = jax.default_backend()
    print(f"# backend={backend}", flush=True)
    rng = np.random.default_rng(0)
    for n, m, eps in CONFIGS:
        try:
            msp = NU._msp_for(eps)
            taps = (2 * msp) ** 2
            kx = rng.uniform(0, 2 * np.pi, m)
            ky = rng.uniform(0, 2 * np.pi, m)
            f = jnp.asarray(
                rng.standard_normal((n, n, 2)).astype(np.float32))

            def aha(v):
                s = NU.nufft2d2(kx, ky, v, eps=eps)
                return NU.nufft2d1(kx, ky, s, (n, n), eps=eps)

            best = float("inf")
            ceiling = 0.0
            for _ in range(TRIALS):
                cc = profile.measured_copy_ceiling_gbps(
                    f, unroll=UNROLL, reps=max(4, REPS // 2))
                ceiling = max(ceiling, cc)
                t = profile.unrolled_chain_time(
                    aha, f, unroll=UNROLL, reps=REPS)
                best = min(best, t)
            row = {
                "bench": f"r6_nufft/aha_2d_{n}_{m}pts_eps{eps:g}",
                "avg_ms": round(best * 1e3, 4),
                "mpts_per_s": round(m / best / 1e6, 2),
                "mtaps_per_s": round(2 * m * taps / best / 1e6, 1),
                "msp": msp,
                "copy_ceiling_gbps": round(ceiling, 1),
                "unroll": UNROLL,
                "trials": TRIALS,
                "backend": backend,
            }
            print(json.dumps(row), flush=True)
            with open(OUT, "a") as fh:
                fh.write(json.dumps(row) + "\n")
        except Exception as e:  # noqa: BLE001
            row = {"bench": f"r6_nufft/2d_{n}_{m}pts", "backend": backend,
                   "error": f"{type(e).__name__}: {str(e)[:200]}"}
            print(json.dumps(row), flush=True)
            with open(OUT, "a") as fh:
                fh.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
