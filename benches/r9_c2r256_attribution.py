#!/usr/bin/env python
"""Stage attribution for the 256^3 3-D pipeline collapse (VERDICT r3 weak #1).

Round-3 facts this probe must explain: NS-3D step at 256^3 runs at
vs_copy ~0.15 and the isolated c2r-256^3 at ~7% of the same-session copy
ceiling (benches/results_r3.jsonl r8_chunk rows), while the chunk-bound
A/B/C was perf-neutral (87.9 ms regardless) — so the lax.map slab
serialization is NOT the whole story.  Remaining suspects, each isolated
here as a shape-preserving jitted leg timed with the repo's
unrolled-chain protocol (runtime/profile.unrolled_chain_time) and
normalized by the bytes IT actually touches:

  - per-axis einsum passes at n=256 rank 3 (last-axis form vs the W4
    mid-axis forms at array axes 1 and 2),
  - the c2r half-trick stages (rest-axes inverse at the packed shape,
    the self-conjugate zero + re-tangle algebra, the axis-0 half-length
    inverse, the interleave->real output reshape),
  - the r2c input pairing moveaxis (a full-volume stride-2 transpose),
  - elementwise traffic on trailing-dim-2 arrays vs a 2-D reshape
    (the 64x-padded-layout trap, CLAUDE.md),

plus the full r2c/c2r plans (hetero chain with scalar feedback, as
runtime/measure._chain_time does) so the legs can be summed against the
whole.  Copy ceiling is interleaved per trial; every row records the
session ceiling so ratios survive tunnel mood swings.

Reference anchor for the problem class: the segmented full-volume rank-3
scheduler, /root/reference/src/runtime/plans/c2c.js:3168-3288.

Run to completion (never under timeout):
  nohup python benches/r9_c2r256_attribution.py > /tmp/r9.log 2>&1 &
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "benches", "results_r4.jsonl")

N = int(os.environ.get("R9_N", "256"))
B = int(os.environ.get("R9_B", "6"))       # matches the r8 c2r row
UNROLL = 2
REPS = 3
TRIALS = int(os.environ.get("R9_TRIALS", "2"))


def emit(row):
    row = {"bench": f"r9_attrib/{row.pop('leg')}", **row}
    print(json.dumps(row), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")


def hetero_chain_time(fn, x, *, unroll=UNROLL, reps=REPS):
    """measure._chain_time protocol for shape-changing fns."""
    @jax.jit
    def chain(v):
        s = jnp.zeros((), jnp.float32)
        for _ in range(unroll):
            y = fn(v + (s * 1e-30).astype(v.dtype))
            s = y[(0,) * y.ndim].astype(jnp.float32)
        return s

    s = float(chain(x))
    t0 = time.perf_counter()
    for _ in range(reps):
        s = float(chain(x))
    return max((time.perf_counter() - t0) / reps / unroll, 1e-9)


def main():
    from webgpufft_tpu.core import axis as A
    from webgpufft_tpu.core import engine
    from webgpufft_tpu.core.cplx import cmul_const
    from webgpufft_tpu.plans.transforms import _half_trick_consts
    from webgpufft_tpu.runtime import profile
    from webgpufft_tpu.spec import normalize_spec
    import webgpufft_tpu as W

    backend = jax.default_backend()
    print(f"# backend={backend} N={N} B={B}", flush=True)
    tuning = normalize_spec({"type": "c2c", "shape": [N]}).tuning
    n, b, h = N, B, N // 2
    rng = np.random.default_rng(0)

    # ---- arrays -----------------------------------------------------------
    full = jnp.asarray(rng.standard_normal((b, n, n, n, 2)), jnp.float32)
    packed = jnp.asarray(rng.standard_normal((b, h + 1, n, n, 2)), jnp.float32)
    halfc = jnp.asarray(rng.standard_normal((b, h, n, n, 2)), jnp.float32)
    real3 = jnp.asarray(rng.standard_normal((b, n, n, n)), jnp.float32)

    # ---- plans ------------------------------------------------------------
    fwd = engine.build_axis_plans((n, n, n), "forward", tuning)
    cf = engine.collect_consts(fwd)
    half_shape = (h, n, n)
    invh = engine.build_axis_plans(half_shape, "inverse", tuning)
    ci = engine.collect_consts(invh)
    ci.update(_half_trick_consts(n, inverse=True))
    # gather index table built locally: the library dropped cr/flip when
    # the rev spelling landed (r15); this probe's retangle leg is the
    # historical gather-cost evidence and must stay runnable
    ci.setdefault("cr/flip", (h - np.arange(h)).astype(np.int32))

    bytes_full = full.size * 4          # one read OR one write of `full`
    bytes_packed = packed.size * 4
    bytes_halfc = halfc.size * 4
    bytes_real = real3.size * 4

    # Each leg: (name, fn, input, min_bytes_one_pass = reads+writes)
    legs = []

    def ew(v):
        return v * jnp.float32(1.0001)

    legs.append(("ew_interleaved", ew, full, 2 * bytes_full))
    flat2d = full.reshape(b * n * n, n * 2)
    legs.append(("ew_2d", ew, flat2d, 2 * bytes_full))

    # per-axis c2c passes on the full interleaved volume
    def ax0(v):
        return A.slabbed_axis_apply(v, fwd[0], 1, cf)

    def ax1(v):
        return A.slabbed_axis_apply(v, fwd[1], 2, cf)

    def ax2(v):
        return A.slabbed_axis_apply(v, fwd[2], 3, cf)

    legs.append(("c2c_axis0_mid", ax0, full, 2 * bytes_full))
    legs.append(("c2c_axis1_mid", ax1, full, 2 * bytes_full))
    legs.append(("c2c_axis2_last", ax2, full, 2 * bytes_full))

    def c2c3d(v):
        return engine.apply_nd(v, fwd, cf)

    legs.append(("c2c_3d", c2c3d, full, 6 * bytes_full))

    # c2r half-trick stages (build_c2r core_half decomposition)
    def c2r_rest(v):     # inverse of axes 1,2 at the packed shape
        v = A.slabbed_axis_apply(v, invh[1], 2, ci)
        return A.slabbed_axis_apply(v, invh[2], 3, ci)

    legs.append(("c2r_rest_axes", c2r_rest, packed, 4 * bytes_packed))

    def c2r_retangle(v):
        bin_iota = jnp.arange(h + 1).reshape(1, h + 1, 1, 1, 1)
        comp = jnp.arange(2).reshape(1, 1, 1, 1, 2)
        selfconj = ((bin_iota == 0) | (bin_iota == h)) & (comp == 1)
        y = jnp.where(selfconj, 0.0, v)
        xk = y[:, :h]
        xf = jnp.take(y, ci["cr/flip"], axis=1)
        xf = xf * jnp.asarray([1.0, -1.0], dtype=y.dtype)
        cshape = (1, h, 1, 1, 2)
        z = (xk + xf) + cmul_const(xk - xf, ci["cr/ca"].reshape(cshape),
                                   ci["cr/cb"].reshape(cshape))
        # pad back to the input shape so the chain stays homogeneous;
        # the pad write is ~1/128 extra traffic
        return jnp.concatenate([z, v[:, h:]], axis=1)

    legs.append(("c2r_retangle", c2r_retangle, packed, 2 * bytes_packed))

    def c2r_ax0(v):      # half-length inverse along axis 0
        return A.slabbed_axis_apply(v, invh[0], 1, ci)

    legs.append(("c2r_ax0_half", c2r_ax0, halfc, 2 * bytes_halfc))

    def c2r_out_reshape(v):
        z = jnp.moveaxis(v, -1, 2)          # (b, h, 2, n, n)
        out = z.reshape(b, n, n, n)
        # invert so the chain stays shape-preserving (2x the real cost)
        back = out.reshape(b, h, 2, n, n)
        return jnp.moveaxis(back, 2, -1)

    legs.append(("c2r_out_reshape_x2", c2r_out_reshape, halfc,
                 4 * bytes_halfc))

    def r2c_pair(v):     # r2c input pairing: stride-2 gather transpose
        w = v.reshape(b, h, 2, n, n)
        w = jnp.moveaxis(w, 2, -1)
        back = jnp.moveaxis(w, -1, 2)
        return back.reshape(b, n, n, n)

    legs.append(("r2c_pair_moveaxis_x2", r2c_pair, real3, 4 * bytes_real))

    # ---- timing: alternating trials, copy ceiling interleaved -------------
    results = {name: [] for name, *_ in legs}
    ceilings = []
    for t in range(TRIALS):
        ceilings.append(profile.measured_copy_ceiling_gbps(
            packed, unroll=4, reps=4))
        print(f"# trial{t} copy_ceiling={ceilings[-1]:.0f} GB/s", flush=True)
        for name, fn, x, _bytes in legs:
            dt = profile.unrolled_chain_time(fn, x, unroll=UNROLL, reps=REPS)
            results[name].append(dt)
            print(f"#   {name}: {dt*1e3:.2f} ms", flush=True)

    ceiling = max(ceilings)
    for name, fn, x, nbytes in legs:
        dt = min(results[name])
        eff = nbytes / dt / 1e9
        emit({"leg": f"{name}_n{n}_b{b}", "backend": backend,
              "avg_ms": round(dt * 1e3, 3), "min_bytes": nbytes,
              "eff_gbps": round(eff, 1),
              "copy_ceiling_gbps": round(ceiling, 1),
              "vs_copy": round(eff / max(ceiling, 1e-9), 3)})

    # ---- full plans (hetero chains) ---------------------------------------
    cache = W.PlanCache()
    c2r = W.create_plan({"type": "c2r", "shape": [n, n, n], "batch": b,
                         "direction": "inverse", "normalize": "none"},
                        cache=cache)
    r2c = W.create_plan({"type": "r2c", "shape": [n, n, n], "batch": b // 2,
                         "direction": "forward", "normalize": "none"},
                        cache=cache)
    xr = jnp.asarray(rng.standard_normal((b // 2, n, n, n)), jnp.float32)
    for name, plan, x, nbytes in (
            ("c2r_full_plan", c2r, packed, bytes_packed + bytes_real),
            ("r2c_full_plan", r2c, xr,
             (b // 2) * n * n * n * 4 + (b // 2) * (h + 1) * n * n * 8)):
        fn = lambda v, p=plan: p._fn(p._consts, v)  # noqa: E731
        dts = []
        for _ in range(TRIALS):
            dts.append(hetero_chain_time(fn, x))
        dt = min(dts)
        eff = nbytes / dt / 1e9
        emit({"leg": f"{name}_n{n}_b{x.shape[0]}", "backend": backend,
              "avg_ms": round(dt * 1e3, 3), "min_bytes": nbytes,
              "eff_gbps": round(eff, 1),
              "copy_ceiling_gbps": round(ceiling, 1),
              "vs_copy": round(eff / max(ceiling, 1e-9), 3)})

    print("# done", flush=True)


if __name__ == "__main__":
    main()
