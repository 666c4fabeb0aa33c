#!/usr/bin/env python
"""Attribute the headline's gap to its 4-pass structural floor (VERDICT
r4 weak #3): c2c-1024-b4096 measures ~78-80% of the W4 form's floor
(2 contractions x read+write at the same-session copy ceiling).  Where do
the remaining ~20% live?

Legs (same session, alternating with the copy probe):
    copy        : negation chain (the ceiling itself)
    stage_a     : ONLY the first W4 contraction of the n=1024 plan
    stage_b     : ONLY the second (dftB) contraction
    both        : the two chained (the full FFT core)
    plan        : the full plan fn (adds scale/reshape staging, if any)

If stage_a and stage_b each stream at the same fraction of copy as the
composed plan, the gap is the dot pipeline's intrinsic cost vs a pure
elementwise stream (attribution complete — einsum passes on this stack
feed the MXU at ~80% of copy bandwidth, nothing left to fuse).  If the
stages are faster in isolation, the composition loses something real
(inter-stage layout), and that is the lever.

Run to completion (never under timeout):
  nohup python benches/r27_headline_attrib.py > benches/logs/r5/r27.log 2>&1 &
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "benches", "results_r5.jsonl")

TRIALS = int(os.environ.get("R27_TRIALS", "3"))


def emit(row):
    row = {"bench": f"r27_attrib/{row.pop('leg')}", "protocol": "v2", **row}
    print(json.dumps(row), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")


def main():
    import webgpufft_tpu as W
    from webgpufft_tpu.core.axis import MixedAxisPlan, _einsum
    from webgpufft_tpu.runtime import profile
    from webgpufft_tpu.spec import TuningSpec

    backend = jax.default_backend()
    print(f"# backend={backend}", flush=True)
    rng = np.random.default_rng(0)
    n, batch = 1024, 4096
    tuning = TuningSpec()

    ap = MixedAxisPlan(n, "forward", "hx", tuning.max_sub_length)
    n1, n2 = ap.subs
    print(f"# subs={ap.subs}", flush=True)
    consts = {k: jnp.asarray(v) for k, v in ap.consts().items()}
    x = jnp.asarray(rng.standard_normal((batch, n, 2)), jnp.float32)

    def stage_a(v):
        xm = v.reshape(batch, n1, n2, 2)
        y = _einsum("...abi,aicj->...cbj", xm, consts["hx/dft0"])
        return y.reshape(batch, n, 2)

    def stage_b(v):
        y = v.reshape(batch, n1, n2, 2)
        z = _einsum("...abi,abicj->...caj", y, consts["hx/dftB0"])
        return z.reshape(batch, n, 2)

    def both(v):
        return stage_b(stage_a(v))

    # correctness anchor for `both` (it IS the axis plan)
    got = np.asarray(ap.apply(x, consts), np.float64)
    zx = (np.asarray(x[..., 0], np.float64)
          + 1j * np.asarray(x[..., 1], np.float64))
    ref = np.fft.fft(zx, axis=1)
    rel = (np.max(np.abs((got[..., 0] + 1j * got[..., 1]) - ref))
           / np.max(np.abs(ref)))
    print(f"# plan-apply vs numpy rel={rel:.3e}", flush=True)
    assert rel < 1e-5, rel

    plan = W.create_plan(type="c2c", shape=[n], batch=batch,
                         direction="forward", normalize="unitary")

    def plan_fn(v):
        return plan._fn(plan._consts, v)

    legs = [("stage_a", stage_a), ("stage_b", stage_b), ("both", both),
            ("plan", plan_fn)]
    if TRIALS == 0:
        print("# correctness-only run (R27_TRIALS=0)", flush=True)
        return

    results = {name: [] for name, _f in legs}
    ceilings = []
    for t in range(TRIALS):
        try:
            ceilings.append(profile.measured_copy_ceiling_gbps(x, reps=4))
        except Exception as ex:
            print(f"# ceiling failed: {ex!r}"[:120], flush=True)
            ceilings.append(0.0)
        print(f"# trial{t} copy(v2)={ceilings[-1]:.0f} GB/s", flush=True)
        for name, fn in legs:
            wrapped = (lambda f: lambda v: v * (
                1.0 + 1e-24 * jnp.mean(f(v))))(fn)
            try:
                dt = profile.hbm_stream_time(wrapped, x, reps=4)
            except Exception as ex:
                print(f"#   {name} failed: {ex!r}"[:160], flush=True)
                continue
            results[name].append(dt)
            io = 2 * batch * n * 8
            print(f"#   {name}: {dt*1e3:.4f} ms "
                  f"({io / dt / 1e9:.0f} GB/s io)", flush=True)

    ceiling = max(ceilings) if ceilings else 0.0
    for name, _f in legs:
        if not results[name]:
            emit({"leg": name, "backend": backend, "error": True})
            continue
        best = min(results[name])
        io = 2 * batch * n * 8
        emit({"leg": name, "backend": backend,
              "avg_ms": round(best * 1e3, 4),
              "io_gbps": round(io / best / 1e9, 1),
              "pct_copy": round(100 * io / best / 1e9 / ceiling, 1)
              if ceiling else None,
              "copy_ceiling_gbps": round(ceiling, 1)})
    print("# done", flush=True)


if __name__ == "__main__":
    main()
