#!/usr/bin/env python
"""Cost of the safety revert on the one suite config it touches:
c2c_1d_4096_b4096 (16.8M elems) chunks into 16 batch groups, which ran
statically unrolled in round 4 and serialize through lax.map since the
r29-r31 miscompile fix.  The miscompile never reproduced on the c2c
core (r30: unrolled c2c 256^3 b3 correct), so IF the map route costs
real time at this geometry, a per-core-type unroll policy would be
worth considering; if it's within noise, the global map route stands.

Legs (same session, alternating, protocol v2):
  map_4096        library plan (current code = lax.map route)
  unroll_4096     hand-built: same core, static slice unroll + concat
  (+ correctness of both vs numpy at this exact geometry)

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

    plan = W.create_plan(type="c2c", shape=[n], batch=b)
    assert any("large-batch-chunk" in r for r in plan.route.reasons), \
        plan.route.reasons

    # hand unrolled variant: rebuild the plan with maybe_chunk_core
    # monkeypatched to the round-4 static-unroll spelling
    orig = T.maybe_chunk_core

    def unrolled_chunk_core(core, batch, items_elems, route, bound=None):
        chunk = T.chunked_batch(batch, items_elems, bound)
        if chunk == batch:
            return core
        route.reasons = route.reasons + (f"large-batch-chunk({chunk})",)
        groups = batch // chunk

        def chunked(xx, c):
            outs = [core(jax.lax.slice_in_dim(xx, g * chunk,
                                              (g + 1) * chunk, axis=0), c)
                    for g in range(groups)]
            return jnp.concatenate(outs, axis=0)

        return chunked

    T.maybe_chunk_core = unrolled_chunk_core
    try:
        uplan = T.build_c2c(normalize_spec(
            {"type": "c2c", "shape": [n], "batch": b}))
    finally:
        T.maybe_chunk_core = orig

    def relc(yk):
        yk = np.asarray(yk, np.float64)
        return (np.max(np.abs((yk[..., 0] + 1j * yk[..., 1]) - zref))
                / np.max(np.abs(zref)))

    ra = relc(plan.exec(x))
    print(f"# map correctness rel={ra:.3e} {'FAIL' if ra > 1e-5 else 'ok'}",
          flush=True)
    rb = relc(uplan.exec(x))
    print(f"# unroll correctness rel={rb:.3e} "
          f"{'FAIL' if rb > 1e-5 else 'ok'}", flush=True)

    tm, tu = [], []
    for t in range(3):
        tm.append(profile.hbm_stream_time(plan.exec, x, copies=1, reps=4))
        tu.append(profile.hbm_stream_time(uplan.exec, x, copies=1, reps=4))
        print(f"# trial{t}: map={tm[-1]*1e3:.3f} ms "
              f"unroll={tu[-1]*1e3:.3f} ms", flush=True)
    print(f"# best: map={min(tm)*1e3:.3f} ms unroll={min(tu)*1e3:.3f} ms "
          f"map/unroll={min(tm)/min(tu):.3f}", flush=True)
    print("# done", flush=True)


if __name__ == "__main__":
    main()
