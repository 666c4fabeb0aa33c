#!/usr/bin/env python
"""Fix-candidate A/B for the TPU static-unroll batch-chunk miscompile
(r29/r30: r2c 256^3 b=3 rel=1.2 through the unrolled chunk route; the
lax.map route and 3 separate dispatches are correct; c2c unrolled is
correct; CPU is correct).

Candidates for maybe_chunk_core:
  A. static unroll + jax.lax.optimization_barrier on each chunk output
     (blocks whatever cross-chunk fusion miscompiles)
  B. lax.map over batch groups (r30-verified correct)

Legs:
  barrier_r2c_b3   correctness of A on the hand core
  lib_c2r_b6       CURRENT library c2r at 256^3 b6 (scope check:
                   expect FAIL like r2c)
  timing           alternating A vs B on the hand core (only if A
                   is correct), protocol v2

Run to completion (never under timeout):
  nohup python benches/r31_chunk_fix.py > benches/logs/r5/r31.log 2>&1 &
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def cx(yk):
    return yk[..., 0] + 1j * yk[..., 1]


def rel_err(yk, yref):
    return np.max(np.abs(cx(yk) - yref)) / np.max(np.abs(yref))


def main():
    import webgpufft_tpu as W
    from benches.r30_chunk_bisect import build_hand_core

    backend = jax.default_backend()
    print(f"# backend={backend}", flush=True)
    rng = np.random.default_rng(0)
    n, b = 256, 3
    p = n // 2 + 1
    bound = 1 << 22

    x_np = rng.standard_normal((b, n, n, n)).astype(np.float32)
    yref = np.fft.fftn(np.asarray(x_np, np.float64), axes=(1, 2, 3))[:, :p]
    x = jnp.asarray(x_np)
    core = build_hand_core(n, b, bound)

    @jax.jit
    def barrier_chunk(xx):
        outs = [jax.lax.optimization_barrier(
                    core(jax.lax.slice_in_dim(xx, g, g + 1, axis=0)))
                for g in range(b)]
        return jnp.concatenate(outs, axis=0)

    @jax.jit
    def map_chunk(xx):
        xs = xx.reshape(b, 1, *xx.shape[1:])
        ys = jax.lax.map(core, xs)
        return ys.reshape(b, *ys.shape[2:])

    yk = np.asarray(barrier_chunk(x), np.float64)
    ra = rel_err(yk, yref)
    print(f"# barrier_r2c_b3: rel={ra:.3e} {'FAIL' if ra > 1e-5 else 'ok'}",
          flush=True)
    yk = np.asarray(map_chunk(x), np.float64)
    rb = rel_err(yk, yref)
    print(f"# map_r2c_b3: rel={rb:.3e} {'FAIL' if rb > 1e-5 else 'ok'}",
          flush=True)

    # scope check: current library c2r at the flagship b6 config
    # a valid Hermitian-packed spectrum so c2r output is exactly real:
    xr = rng.standard_normal((6, n, n, n)).astype(np.float32)
    xsp = np.fft.fftn(np.asarray(xr, np.float64), axes=(1, 2, 3))[:, :p]
    xp_np = np.stack([xsp.real, xsp.imag], axis=-1).astype(np.float32)
    plan = W.create_plan(type="c2r", shape=[n, n, n], batch=6,
                         direction="inverse", normalize="backward")
    yk = np.asarray(plan.exec(jnp.asarray(xp_np)), np.float64)
    ref = np.asarray(xr, np.float64)
    rc = np.max(np.abs(yk - ref)) / np.max(np.abs(ref))
    print(f"# lib_c2r_b6: rel={rc:.3e} route={plan.route.reasons} "
          f"{'FAIL' if rc > 1e-5 else 'ok'}", flush=True)
    del plan, yk, xp_np, xsp

    if ra > 1e-5:
        print("# barrier variant WRONG -> map is the fix; no timing needed",
              flush=True)
        print("# done", flush=True)
        return

    from webgpufft_tpu.runtime import profile
    ta, tb = [], []
    for t in range(3):
        ta.append(profile.hbm_stream_time(barrier_chunk, x, copies=1, reps=4))
        tb.append(profile.hbm_stream_time(map_chunk, x, copies=1, reps=4))
        print(f"# trial{t}: barrier={ta[-1]*1e3:.3f} ms "
              f"map={tb[-1]*1e3:.3f} ms", flush=True)
    print(f"# best: barrier={min(ta)*1e3:.3f} ms map={min(tb)*1e3:.3f} ms "
          f"ratio={min(tb)/min(ta):.3f}", flush=True)
    print("# done", flush=True)


if __name__ == "__main__":
    main()
