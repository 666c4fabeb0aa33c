#!/usr/bin/env python
"""Full benchmark suite — every BASELINE.md config, one JSON line each.

(bench.py at the repo root prints only the headline metric for the driver;
this suite is the complete roofline-instrumented matrix, the analog of the
reference's bench/bench.js:474-480 list plus its forced-large matrices.)

Usage: python benches/suite.py [--iters N] [--quick]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def emit(rec):
    print(json.dumps(rec))
    sys.stdout.flush()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=None)
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import webgpufft_tpu as W
    from webgpufft_tpu.runtime import profile

    backend = jax.default_backend()
    iters = args.iters or (20 if backend == "tpu" else 2)
    rng = np.random.default_rng(0)
    roof = profile.device_hbm_gbps()

    def record(name, plan, x, n_total, batch, extra=None):
        r = profile.bench_transform(plan, x, n_total, batch, iters=iters)
        emit({"bench": name, "avg_ms": round(r.avg_ms, 4),
              "gflops": round(r.gflops, 1), "eff_gbps": round(r.eff_gbps, 1),
              "pct_roofline": round(r.pct_roofline, 2),
              "route": plan.route.mode, "backend": backend,
              **(extra or {})})

    # ---- 1. c2c 1D N=1024 batch=1 (reference bench_1d_1024.js config)
    plan = W.create_plan(type="c2c", shape=[1024], batch=1, direction="forward",
                        normalize="unitary")
    x = jnp.asarray(rng.standard_normal((1, 1024, 2)).astype(np.float32))
    record("c2c_1d_1024_b1", plan, x, 1024, 1)

    # ---- 2. batched c2c/r2c/c2r sweep N=256..4096, batch=4096
    batch = 512 if args.quick else 4096
    for n in (256, 1024, 4096):
        plan = W.create_plan(type="c2c", shape=[n], batch=batch,
                            direction="forward", normalize="unitary")
        x = jnp.asarray(rng.standard_normal((batch, n, 2)).astype(np.float32))
        record(f"c2c_1d_{n}_b{batch}", plan, x, n, batch)
    n = 1024
    # r2c+c2r roundtrip timing (chained as a pair to keep shapes closed)
    r2c = W.create_plan(type="r2c", shape=[n], direction="forward", batch=batch,
                       normalize="unitary")
    c2r = W.create_plan(type="c2r", shape=[n], direction="inverse", batch=batch,
                       normalize="unitary")
    xr = jnp.asarray(rng.standard_normal((batch, n)).astype(np.float32))
    pair = lambda v: c2r(r2c(v))
    dt = profile.time_chained(pair, xr, iters)
    emit({"bench": f"r2c_c2r_roundtrip_{n}_b{batch}", "avg_ms": round(dt * 1e3, 4),
          "eff_gbps": round(2 * 2 * batch * n * 4 / dt / 1e9, 1),
          "backend": backend})

    # ---- 3. dct2/dct3/dst2/dst3: 8x8 blocks and 512^2 images
    bb = 1024 if args.quick else 16384
    for kind in ("dct2", "dst2"):
        plan = W.create_plan(type=kind, shape=[8, 8], direction="forward",
                            batch=bb, normalize="unitary")
        x = jnp.asarray(rng.standard_normal((bb, 8, 8)).astype(np.float32))
        dt = profile.time_chained(plan, x, iters)
        emit({"bench": f"{kind}_8x8_b{bb}", "avg_ms": round(dt * 1e3, 4),
              "eff_gbps": round(2 * bb * 64 * 4 / dt / 1e9, 1), "backend": backend})
    ib = 1 if args.quick else 8
    for kind in ("dct2", "dct3"):
        plan = W.create_plan(type=kind, shape=[512, 512], direction="forward",
                            batch=ib, normalize="unitary")
        x = jnp.asarray(rng.standard_normal((ib, 512, 512)).astype(np.float32))
        dt = profile.time_chained(plan, x, iters)
        emit({"bench": f"{kind}_512sq_b{ib}", "avg_ms": round(dt * 1e3, 4),
              "eff_gbps": round(2 * ib * 512 * 512 * 4 / dt / 1e9, 1),
              "backend": backend})

    # ---- 4. fftconv multi-kernel channel-lane preset (shape 256, batch 4,
    #         64 -> 128 ch) + reference node-bench config 16x8x4
    preset = W.create_fftconv_kernel_major_channel_lane_preset({
        "shape": [256], "batch": 4, "kernelCount": 2,
        "input": {"channels": 64, "channelIndex": 0},
        "output": {"channels": 128, "channelIndex": 0, "kernelStepChannels": 64},
    })
    plan = W.create_plan({"type": "fftconv", **preset})
    lanes = rng.standard_normal((4, 64, 256, 2)).astype(np.float32)
    flat = jnp.asarray(lanes.reshape(-1, 2))
    kern = jnp.asarray(rng.standard_normal((2, 256, 2)).astype(np.float32))
    import time
    y = plan.exec(flat, kernel=kern)  # warm (incl. the barrier expression!)
    float(jnp.sum(y[:1]))
    t0 = time.perf_counter()
    for _ in range(iters):
        y = plan.exec(flat, kernel=kern)
    float(jnp.sum(y[:1]))
    dt = (time.perf_counter() - t0) / iters
    emit({"bench": "fftconv_preset_256_b4_64to128", "avg_ms": round(dt * 1e3, 4),
          "backend": backend})

    plan = W.create_plan(type="fftconv", shape=[16, 8, 4], batch=2,
                        fftConv={"kernelCount": 3})
    x = jnp.asarray(rng.standard_normal((2, 16, 8, 4, 2)).astype(np.float32))
    k3 = jnp.asarray(rng.standard_normal((3, 16, 8, 4, 2)).astype(np.float32))
    y = plan.exec(x, kernel=k3)  # warm incl. barrier
    float(jnp.sum(y[:1, :1]))
    t0 = time.perf_counter()
    for _ in range(iters):
        y = plan.exec(x, kernel=k3)
    float(jnp.sum(y[:1, :1]))
    dt = (time.perf_counter() - t0) / iters
    emit({"bench": "fftconv_3d_16x8x4_b2_k3", "avg_ms": round(dt * 1e3, 4),
          "backend": backend})

    # ---- 5. large-mode c2c N=2^20 (+ bf16 storage)
    n = 2 ** 20
    b = 1 if args.quick else 4
    plan = W.create_plan(type="c2c", shape=[n], batch=b, direction="forward",
                        normalize="unitary", tuning={"impl": "xla"})
    x = jnp.asarray(rng.standard_normal((b, n, 2)).astype(np.float32))
    record(f"c2c_1d_2pow20_b{b}", plan, x, n, b)
    plan = W.create_plan(type="c2c", shape=[n], batch=b, direction="forward",
                        normalize="unitary", precision="bf16-storage",
                        tuning={"impl": "xla"})
    xb = x.astype(jnp.bfloat16)
    dt = profile.time_chained(plan, xb, iters)
    emit({"bench": f"c2c_2pow20_bf16_b{b}", "avg_ms": round(dt * 1e3, 4),
          "eff_gbps": round(2 * b * n * 4 / dt / 1e9, 1), "backend": backend})


if __name__ == "__main__":
    main()
