#!/usr/bin/env python
"""c2c batch-chunk serialization at the one suite config it touches:
c2c_1d_4096_b4096 (16.8M elems) chunks into 16 batch groups.

History: round 4 unrolled these groups statically; the r29-31 r2c/c2r
miscompile fix briefly moved ALL batch chunks to lax.map; the session-4
suite run then showed the map spelling COMPILE-OOMs at this config under
the v2 measurement chain (XLA remat copies materialize the (4096,4096,2)
operand in a T(8,128) layout padding the trailing-2 dim 64x — 2x 8 GB
HLO temps for a 128 MB array; benches/logs/r5/session4.log).  The c2c
core is r30-verified correct under the unroll, so maybe_chunk_core now
unrolls c2c and maps r2c/c2r (per-core-type policy, commit d0a7a4f).

Legs (run in this order so the production leg always lands):
  lib_unroll      library plan (current code = static unroll):
                  correctness vs numpy + v2 timing
  map_spelling    maybe_chunk_core monkeypatched to pure lax.map:
                  correctness + timing, guarded.  SKIPPED by default
                  (--with-map to run): the session-4 run already
                  recorded the datapoint at this exact config —
                  correct (rel 2.1e-7) but ~20 min to compile and
                  26.8 ms vs the unroll's 1.787 ms (15x slower;
                  benches/logs/r5/r33.log), and the v2 measurement
                  chain around it compile-OOMs outright
                  (session4.log suite crash)

Run to completion (never under timeout):
  nohup python benches/r33_c2c_chunk_ab.py > benches/logs/r5/r33.log 2>&1 &
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    import webgpufft_tpu as W
    from webgpufft_tpu.runtime import profile
    from webgpufft_tpu.plans import transforms as T
    from webgpufft_tpu.spec import normalize_spec

    backend = jax.default_backend()
    print(f"# backend={backend}", flush=True)
    rng = np.random.default_rng(0)
    n, b = 4096, 4096
    x_np = rng.standard_normal((b, n, 2)).astype(np.float32)
    x = jnp.asarray(x_np)
    zref = np.fft.fft(np.asarray(x_np[..., 0], np.float64)
                      + 1j * np.asarray(x_np[..., 1], np.float64), axis=1)

    def relc(yk):
        yk = np.asarray(yk, np.float64)
        return (np.max(np.abs((yk[..., 0] + 1j * yk[..., 1]) - zref))
                / np.max(np.abs(zref)))

    # --- leg 1: library plan (static unroll) ---
    plan = W.create_plan(type="c2c", shape=[n], batch=b)
    assert any("large-batch-chunk" in r for r in plan.route.reasons), \
        plan.route.reasons
    ra = relc(plan.exec(x))
    print(f"# lib_unroll correctness rel={ra:.3e} "
          f"{'FAIL' if ra > 1e-5 else 'ok'}", flush=True)
    tu = []
    for t in range(3):
        tu.append(profile.hbm_stream_time(plan.exec, x, copies=1, reps=4))
        print(f"# lib_unroll trial{t}: {tu[-1]*1e3:.3f} ms", flush=True)
    print(f"# lib_unroll best: {min(tu)*1e3:.3f} ms", flush=True)

    # --- leg 2: pure lax.map spelling (slow-compile; opt-in) ---
    if "--with-map" not in sys.argv[1:]:
        print("# map_spelling skipped (session-4 datapoint: rel 2.1e-7, "
              "26.8 ms vs 1.787 ms unroll; run with --with-map to repeat)",
              flush=True)
        print("# done", flush=True)
        return
    orig = T.maybe_chunk_core

    def map_chunk_core(core, batch, items_elems, route, bound=None,
                       unroll_ok=False):
        return orig(core, batch, items_elems, route, bound,
                    unroll_ok=False)

    T.maybe_chunk_core = map_chunk_core
    try:
        mplan = T.build_c2c(normalize_spec(
            {"type": "c2c", "shape": [n], "batch": b}))
    finally:
        T.maybe_chunk_core = orig
    try:
        rb = relc(mplan.exec(x))
        print(f"# map_spelling correctness rel={rb:.3e} "
              f"{'FAIL' if rb > 1e-5 else 'ok'}", flush=True)
        tm = []
        for t in range(3):
            tm.append(profile.hbm_stream_time(mplan.exec, x,
                                              copies=1, reps=4))
            print(f"# map_spelling trial{t}: {tm[-1]*1e3:.3f} ms",
                  flush=True)
        print(f"# map_spelling best: {min(tm)*1e3:.3f} ms "
              f"map/unroll={min(tm)/min(tu):.3f}", flush=True)
    except Exception as e:  # noqa: BLE001 - the OOM is the datapoint
        print(f"# map_spelling FAILED (expected negative result): "
              f"{type(e).__name__}: {str(e)[:300]}", flush=True)
    print("# done", flush=True)


if __name__ == "__main__":
    main()
