"""Overlap-save gate sweep (VERDICT r2 #6): standard route vs forced
overlap-save at moderate n (2^14..2^19) and batches, the scipy-shaped
oaconvolve sweet spot, with two block-length variants.

The r2 data said: 1.16x win at n=2^20 b=1, par at 2^18 b=4, 2.5x LOSS
when block groups serialize — this sweep fills in the moderate-n region
so OS_MIN_N is set from data instead of conservatively at 2^18.

Run on the real TPU as a to-completion background script:
    nohup python benches/r4_os_gate.py > /tmp/r4_osgate.log 2>&1 &
Appends one JSON line per config to benches/results_r3.jsonl.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def bench_plan(plan, x, k, unroll=4, reps=6):
    from webgpufft_tpu.runtime.profile import unrolled_chain_time
    kern = jnp.asarray(k)

    def fn(v):
        y = plan.exec(v, kernel=kern)
        # same-shaped chain: out is linear-full (n + ktaps - 1); crop back
        return jax.lax.slice_in_dim(y, 0, v.shape[1], axis=1)

    return unrolled_chain_time(fn, x, unroll=unroll, reps=reps)


def main():
    import webgpufft_tpu as W

    rng = np.random.default_rng(0)
    rows = []
    ktaps = 129
    k = np.stack([rng.standard_normal(ktaps), rng.standard_normal(ktaps)],
                 -1).astype(np.float32)
    for n_log in (14, 15, 16, 17, 18, 19):
        n = 1 << n_log
        for b in (1, 4, 16):
            if b * n > (1 << 22):        # serialized groups: known 2.5x loss
                continue
            x = jnp.asarray(
                rng.standard_normal((b, n, 2)).astype(np.float32))
            variants = {}
            std = W.create_plan(type="fftconv", shape=[n], batch=b,
                                fftConv={"boundary": "linear-full",
                                         "kernelShape": [ktaps],
                                         "tuning": {"overlapSave": "off"}})
            variants["std"] = bench_plan(std, x, k)
            for B in (2048, 8192):
                if B <= 2 * (ktaps - 1):
                    continue
                osp = W.create_plan(type="fftconv", shape=[n], batch=b,
                                    fftConv={"boundary": "linear-full",
                                             "kernelShape": [ktaps],
                                             "tuning": {"overlapSave": "on",
                                                        "overlapBlock": B}})
                variants[f"os{B}"] = bench_plan(osp, x, k)
            best_os = min(v for kk, v in variants.items() if kk != "std")
            row = {"bench": "os_gate", "n": n, "batch": b, "ktaps": ktaps,
                   **{f"{kk}_ms": v * 1e3 for kk, v in variants.items()},
                   "os_speedup": variants["std"] / max(best_os, 1e-12),
                   "backend": jax.devices()[0].platform,
                   "ts": time.strftime("%Y-%m-%dT%H:%M:%S")}
            rows.append(row)
            print(json.dumps(row), flush=True)

    with open("benches/results_r3.jsonl", "a") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
