#!/usr/bin/env python
"""bf16-storage headline rows under v2 with the FIXED copy probe.

The r5 suite's first bf16 capture used the 1.000001-multiply copy chain,
which bf16 rounds to an identity program (ceiling read 1128 GB/s > the
819 GB/s spec).  This re-measures the two bf16 BASELINE configs and
their f32 twins in ONE session with the negation probe, so the bf16
vs_copy and the f32/bf16 wall-clock ratio are same-session honest.

Accuracy ladder context (benches/r3_precision_transpose.py): bf16
STORAGE with f32 HIGHEST compute measures ~3e-3 rel vs numpy at n=1024
(storage rounding dominates); the 1e-5 bar applies to the f32 mode only.

Run to completion (never under timeout):
  nohup python benches/r25_bf16_rows.py > benches/logs/r5/r25.log 2>&1 &
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "benches", "results_r5.jsonl")


def emit(rec):
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def main():
    import jax
    import jax.numpy as jnp

    import webgpufft_tpu as W
    from webgpufft_tpu.runtime import profile

    backend = jax.default_backend()
    print(f"# backend={backend}", flush=True)
    rng = np.random.default_rng(0)

    def record(name, fn, x, min_bytes, extra=None):
        r = profile.robust_bench(fn, x, min_bytes, reps=8, trials=3)
        emit({"bench": f"r25_bf16/{name}", "avg_ms": round(r.avg_ms, 4),
              "eff_gbps": round(r.eff_gbps, 1),
              "pct_roofline": round(r.pct_roofline, 2),
              "copy_ceiling_gbps": round(r.copy_ceiling_gbps, 1),
              "vs_copy": round(r.vs_copy_ceiling, 3),
              "protocol": "v2", "backend": backend, **(extra or {})})

    batch, n = 4096, 1024
    x32 = jnp.asarray(rng.standard_normal((batch, n, 2)).astype(np.float32))
    p32 = W.create_plan(type="c2c", shape=[n], batch=batch,
                        direction="forward", normalize="unitary")
    record(f"c2c_1d_{n}_b{batch}_f32", p32, x32, 2 * batch * n * 8)
    p16 = W.create_plan(type="c2c", shape=[n], batch=batch,
                        direction="forward", normalize="unitary",
                        precision="bf16-storage")
    record(f"c2c_1d_{n}_b{batch}_bf16", p16, x32.astype(jnp.bfloat16),
           2 * batch * n * 4)

    n2, b2 = 2 ** 20, 4
    x2 = jnp.asarray(rng.standard_normal((b2, n2, 2)).astype(np.float32))
    p32 = W.create_plan(type="c2c", shape=[n2], batch=b2,
                        direction="forward", normalize="unitary",
                        tuning={"impl": "xla"})
    record(f"c2c_2pow20_b{b2}_f32", p32, x2, 2 * b2 * n2 * 8,
           extra={"route": p32.route.mode})
    p16 = W.create_plan(type="c2c", shape=[n2], batch=b2,
                        direction="forward", normalize="unitary",
                        precision="bf16-storage", tuning={"impl": "xla"})
    record(f"c2c_2pow20_b{b2}_bf16", p16, x2.astype(jnp.bfloat16),
           2 * b2 * n2 * 4, extra={"route": p16.route.mode})
    print("# done", flush=True)


if __name__ == "__main__":
    main()
