#!/usr/bin/env python
"""Benchmark driver — prints ONE JSON line with the headline metric.

Headline: batched c2c N=1024 (batch 4096, forward, f32 interleaved) percent
of HBM-bandwidth roofline on one chip.  BASELINE.md target: >= 70%.
vs_baseline = value / 70.0 (>= 1.0 means target met).

Methodology: chained execution (y = plan(y)) with a scalar-readback
completion barrier; in-flight work stays bounded (the tunneled runtime's
block_until_ready is not a reliable barrier and unbounded async queues can
wedge the device).  Supplementary configs from BASELINE.md print to stderr.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import webgpufft_tpu as W
    from webgpufft_tpu.runtime import profile

    backend = jax.default_backend()
    dev = jax.devices()[0]
    print(f"# backend={backend} device={getattr(dev, 'device_kind', dev)}",
          file=sys.stderr)

    rng = np.random.default_rng(0)

    def run_c2c(n, batch, iters, impl="auto"):
        plan = W.create_plan(type="c2c", shape=[n], batch=batch,
                            direction="forward", normalize="unitary",
                            tuning={"impl": impl} if impl != "auto" else None)
        x = jnp.asarray(rng.standard_normal((batch, n, 2)).astype(np.float32))
        r = profile.bench_transform(plan, x, n, batch, iters=iters)
        print(f"# c2c n={n} batch={batch} impl={plan.route.mode}: "
              f"{r.avg_ms:.3f} ms, {r.gflops:.0f} GFLOP/s, "
              f"{r.eff_gbps:.0f} GB/s eff ({r.pct_roofline:.1f}% roofline)",
              file=sys.stderr)
        return r

    # ---- headline: c2c-1024 batch 4096
    iters = 30 if backend == "tpu" else 3
    best = None
    for impl in ("auto", "xla"):
        try:
            r = run_c2c(1024, 4096, iters, impl)
            if best is None or r.pct_roofline > best.pct_roofline:
                best = r
        except Exception as e:  # pragma: no cover - keep bench resilient
            print(f"# impl={impl} failed: {e}", file=sys.stderr)
    if best is None:
        print(json.dumps({"metric": "c2c1024_pct_hbm_roofline", "value": 0.0,
                          "unit": "percent", "vs_baseline": 0.0,
                          "error": "all impls failed"}))
        return

    # ---- supplementary configs (BASELINE.md), stderr only
    if backend == "tpu":
        try:
            for n in (256, 4096):
                run_c2c(n, 4096, 15)
        except Exception as e:
            print(f"# supplementary c2c failed: {e}", file=sys.stderr)
        try:
            import math
            plan = W.create_plan(type="dct2", shape=[8, 8], batch=4096,
                                direction="forward")
            x = jnp.asarray(rng.standard_normal((4096, 8, 8)).astype(np.float32))
            dt = profile.time_chained(plan, x, 15)
            print(f"# dct2 8x8 blocks batch=4096: {dt*1e3:.3f} ms "
                  f"({2*4096*64*4/dt/1e9:.0f} GB/s eff)", file=sys.stderr)
        except Exception as e:
            print(f"# dct bench failed: {e}", file=sys.stderr)

    print(json.dumps({
        "metric": "c2c1024_pct_hbm_roofline",
        "value": round(best.pct_roofline, 2),
        "unit": "percent",
        "vs_baseline": round(best.pct_roofline / 70.0, 3),
        "avg_ms": round(best.avg_ms, 4),
        "gflops": round(best.gflops, 1),
        "eff_gbps": round(best.eff_gbps, 1),
        "backend": backend,
    }))


if __name__ == "__main__":
    main()
