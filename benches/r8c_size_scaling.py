#!/usr/bin/env python
"""Does throughput scale with transfer size through this tunnel stack?

Run-H observations: the 32 MB headline tensor (c2c-1024 b4096) tops out
at 147-148 GB/s with its size-matched copy probe agreeing, while a
100 MB tensor's copy probe in the SAME session hit 370.8 GB/s and a
256 MB tensor's hit 298.7.  If attainable bandwidth rises with tensor
size, the headline's 18%-of-spec is a small-transfer stack artifact and
larger batches should demonstrate materially higher roofline fractions.

Sweep: c2c-1024 at batch 4096/8192/16384/32768 —
  * size-matched copy ceiling (alternating trials),
  * production route (large-batch-chunk(4096) above b4096),
  * bound-raised route (2^25 — validated correct for EXACTLY these 1-D
    shapes by r2_operand_bound_probe; re-gated here with oracle rows).

Run to completion: nohup python benches/r8c_size_scaling.py > log 2>&1 &
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "benches", "results_r3.jsonl")

N = 1024
BATCHES = (4096, 8192, 16384, 32768)
UNROLL = int(os.environ.get("R8C_UNROLL", "4"))
REPS = int(os.environ.get("R8C_REPS", "6"))
TRIALS = int(os.environ.get("R8C_TRIALS", "3"))
RAISED = 1 << 25


def set_bound(elems: int) -> None:
    from webgpufft_tpu.plans import transforms as T
    from webgpufft_tpu.core import axis as A
    T.CHUNK_ELEMS = elems
    A.OPERAND_CHUNK_ELEMS = elems


def main():
    import webgpufft_tpu as W
    from webgpufft_tpu.runtime import profile

    backend = jax.default_backend()
    print(f"# backend={backend}", flush=True)
    default_bound = 1 << 22
    rng = np.random.default_rng(0)

    for batch in BATCHES:
        z = (rng.standard_normal((batch, N))
             + 1j * rng.standard_normal((batch, N))).astype(np.complex64)
        x = jnp.asarray(np.stack([z.real, z.imag], -1).astype(np.float32))
        mb = batch * N * 8 / 1e6

        variants = {}
        rows_idx = np.linspace(0, batch - 1, 16, dtype=int)
        ref = np.fft.fft(z[rows_idx], axis=1)
        for name, bound in (("chunked", default_bound), ("raised", RAISED)):
            set_bound(bound)
            plan = W.create_plan({"type": "c2c", "shape": [N],
                                  "batch": batch, "direction": "forward",
                                  "normalize": "none"}, cache=W.PlanCache())
            y = np.asarray(plan(x)[rows_idx])
            got = y[..., 0] + 1j * y[..., 1]
            rel = float(np.max(np.abs(got - ref)) / np.max(np.abs(ref)))
            variants[name] = {
                "plan": plan, "bound": bound, "ok": bool(rel < 1e-5),
                "rel": rel,
                "chunks": ";".join(r for r in plan.route.reasons
                                   if "chunk" in r) or "none"}

        times = {}
        ceiling = 0.0
        for _ in range(TRIALS):
            ceiling = max(ceiling, profile.measured_copy_ceiling_gbps(
                x, unroll=UNROLL, reps=max(4, REPS // 2)))
            for name, v in variants.items():
                if not v["ok"]:
                    continue
                set_bound(v["bound"])
                plan = v["plan"]
                dt = profile.unrolled_chain_time(
                    lambda u, _p=plan: _p(u), x, unroll=UNROLL, reps=REPS)
                times[name] = min(times.get(name, float("inf")), dt)
        set_bound(default_bound)

        minb = profile.fft_min_bytes(N, batch)
        row = {"bench": f"r8c_size/c2c_{N}_b{batch}", "backend": backend,
               "tensor_mb": round(mb, 1),
               "copy_ceiling_gbps": round(ceiling, 1)}
        for name, v in variants.items():
            row[f"{name}_ok"] = v["ok"]
            row[f"{name}_rel"] = round(v["rel"], 9)
            row[f"{name}_chunks"] = v["chunks"]
            if name in times:
                row[f"{name}_ms"] = round(times[name] * 1e3, 4)
                row[f"{name}_eff_gbps"] = round(minb / times[name] / 1e9, 1)
        if "chunked" in times and "raised" in times:
            row["speedup_raised"] = round(times["chunked"] / times["raised"],
                                          3)
        print(json.dumps(row), flush=True)
        with open(OUT, "a") as f:
            f.write(json.dumps(row) + "\n")
    print(json.dumps({"bench": "r8c_size/done"}), flush=True)


if __name__ == "__main__":
    main()
