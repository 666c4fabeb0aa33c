#!/usr/bin/env python
"""Background TPU experiment runner: long-chain perf of fused vs xla routes.

Writes progress lines to stdout continuously so a supervisor can tail it.
Designed to run to completion (never kill mid-flight: a killed in-flight
process wedges the tunneled device for ~20 minutes).
"""
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import webgpufft_tpu as W

    rng = np.random.default_rng(0)

    def measure(plan, x, iters, label):
        y = plan(x)
        float(jnp.sum(y[..., :1, :1]))  # warm + drain
        t0 = time.perf_counter()
        z = x
        for _ in range(iters):
            z = plan(z)
        float(jnp.sum(z[..., :1, :1]))
        t = time.perf_counter() - t0
        per = t / iters
        bw = 2 * x.size * 4 / per / 1e9
        print(f"{label}: iters={iters} per={per*1e3:.3f}ms effBW={bw:.0f} GB/s "
              f"({bw/8.19:.1f}% roofline)", flush=True)
        return per

    n, batch = 1024, 4096
    x = jnp.asarray(rng.standard_normal((batch, n, 2)).astype(np.float32))

    for impl, tuning in [
        ("xla", {"impl": "xla"}),
        ("fused-tb64", {"batchTile": 64}),
        ("fused-tb32", {"batchTile": 32}),
        ("fused-tb16", {"batchTile": 16}),
        ("fused-tb128-v", {"batchTile": 128, "vmemLimitBytes": 32 * 1024 * 1024}),
    ]:
        try:
            cache = W.PlanCache()
            plan = W.create_plan({"type": "c2c", "shape": [n], "batch": batch,
                                  "normalize": "unitary", "tuning": tuning},
                                 cache=cache)
            print(f"--- {impl} route={plan.route.mode}", flush=True)
            measure(plan, x, 40, f"{impl} warmchain")
            measure(plan, x, 200, f"{impl} long")
        except Exception as e:
            lines = [l for l in str(e).split("\n") if l.strip()][:2]
            print(f"{impl} FAILED: {lines}", flush=True)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
