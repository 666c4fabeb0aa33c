#!/usr/bin/env python
"""Axis-pass formulation shootout at the 256^3 collapse point (r9 follow-up).

r9_c2r256_attribution measured every single-axis n=256 pass on the 256^3
volume at ~91-100 GB/s effective while elementwise/transpose legs on the
same arrays run 277-303 GB/s (results_r4.jsonl).  The W4 2-contraction
chain should cost ~4 byte-passes (x->y->z), i.e. ~2x the 2-pass model's
bytes — yet the observed time is ~2x worse than even that.  Suspects:
XLA relayouts feeding the dot (contracted dims a,i are major/minor-split
in the mid form), lax.map slab serialization, and the HIGHEST-precision
6-pass MXU tax.

This probe times the SAME mathematical pass (forward FFT along axis 1 of
a (6,256,256,256,2) interleaved volume) under competing formulations,
each validity-checked against a strided f64 numpy oracle sample:

  prod           slabbed_axis_apply (lax.map, production route)
  unroll_mid     static Python-unrolled slabs + W4 mid form, one jit
  unroll_rows    static slabs + explicit moveaxis + rows form
  prod_high      production chain, precision HIGH (3-pass) not HIGHEST
  dense_mid      one 256-wide dense W4 contraction (no 2-level split)
  dense_planes   re/im plane split, 4 real (rows,256)@(256,256) matmuls
  noslab_mid     whole-volume mid form, no slabs (operand-bound validity!)
  bound_2^23/24  production with raised slab bound (validity-checked)

Emits one JSON row per variant to benches/results_r4.jsonl with
{avg_ms, eff_gbps (2-pass byte model), vs_copy, rel_err, valid}.

Run to completion (never under timeout):
  nohup python benches/r10_axis_forms.py > /tmp/r10.log 2>&1 &
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "benches", "results_r4.jsonl")

N = int(os.environ.get("R10_N", "256"))
B = int(os.environ.get("R10_B", "6"))
UNROLL = 2
REPS = 3
TRIALS = int(os.environ.get("R10_TRIALS", "2"))
AXIS = 1                      # transform axis (array axis, after batch)


def emit(row):
    row = {"bench": f"r10_forms/{row.pop('leg')}", **row}
    print(json.dumps(row), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")


def main():
    from webgpufft_tpu.core import axis as A
    from webgpufft_tpu.core import dft
    from webgpufft_tpu.core.cplx import to_w4
    from webgpufft_tpu.runtime import profile
    from webgpufft_tpu.spec import normalize_spec

    backend = jax.default_backend()
    n, b = N, B
    print(f"# backend={backend} N={n} B={b}", flush=True)
    tuning = normalize_spec({"type": "c2c", "shape": [n]}).tuning

    rng = np.random.default_rng(0)
    x_np = rng.standard_normal((b, n, n, n, 2)).astype(np.float32)
    x = jnp.asarray(x_np)

    # oracle: f64 FFT along AXIS, strided sample
    zc = (x_np[..., 0] + 1j * x_np[..., 1]).astype(np.complex128)
    ref = np.fft.fft(zc, axis=AXIS)
    sl = (slice(None), slice(None), slice(0, None, 16), slice(0, None, 16))
    ref_s = ref[sl]
    ref_norm = np.linalg.norm(ref_s)

    ap = A.MixedAxisPlan(n, "forward", "ax")
    consts = {k: jnp.asarray(v) for k, v in ap.consts().items()}
    ap_high = A.MixedAxisPlan(n, "forward", "axh",
                              prec=jax.lax.Precision.HIGH)
    consts_h = {k: jnp.asarray(v) for k, v in ap_high.consts().items()}

    w4_dense = jnp.asarray(to_w4(dft.dft_matrix(n, "forward")))
    wmat = dft.dft_matrix(n, "forward")
    wr = jnp.asarray(wmat.real.astype(np.float32))
    wi = jnp.asarray(wmat.imag.astype(np.float32))
    HI = jax.lax.Precision.HIGHEST

    # slab geometry: match production (find_slab_axis with default bound)
    slab = A.find_slab_axis(x.shape[:-1], AXIS)
    s, e = slab if slab else (1, 2)
    step = x.shape[e] // s
    print(f"# slab: s={s} axis={e} step={step}", flush=True)

    def static_slabs(fn_slab):
        def f(v):
            outs = [fn_slab(jax.lax.slice_in_dim(v, i * step, (i + 1) * step,
                                                 axis=e))
                    for i in range(s)]
            return jnp.concatenate(outs, axis=e)
        return f

    def mid_slab(slv, c=consts, plan=ap):
        lead = slv.shape[:AXIS]
        v = slv.reshape(*lead, n, -1, 2)
        return plan.apply_mid(v, c).reshape(slv.shape)

    def rows_slab(slv):
        v = jnp.moveaxis(slv, AXIS, -2)
        y = ap.apply(v, consts)
        return jnp.moveaxis(y, -2, AXIS)

    def dense_mid_slab(slv):
        lead = slv.shape[:AXIS]
        v = slv.reshape(*lead, n, -1, 2)
        y = jnp.einsum("...aLi,aicj->...cLj", v, w4_dense, precision=HI)
        return y.reshape(slv.shape)

    def planes_slab(slv):
        v = jnp.moveaxis(slv, AXIS, -2)          # (..., n, 2)
        xr, xi_ = v[..., 0], v[..., 1]
        # X[k] = sum_n x[n] W[k, n]  (dft_matrix row k? validated vs oracle)
        yr = (jnp.einsum("...n,kn->...k", xr, wr, precision=HI)
              - jnp.einsum("...n,kn->...k", xi_, wi, precision=HI))
        yi = (jnp.einsum("...n,kn->...k", xr, wi, precision=HI)
              + jnp.einsum("...n,kn->...k", xi_, wr, precision=HI))
        y = jnp.stack([yr, yi], axis=-1)
        return jnp.moveaxis(y, -2, AXIS)

    variants = [
        ("prod", lambda v: A.slabbed_axis_apply(v, ap, AXIS, consts)),
        ("unroll_mid", static_slabs(mid_slab)),
        ("unroll_rows", static_slabs(rows_slab)),
        ("prod_high", lambda v: A.slabbed_axis_apply(v, ap_high, AXIS,
                                                     consts_h)),
        ("dense_mid", static_slabs(dense_mid_slab)),
        ("dense_planes", static_slabs(planes_slab)),
        ("noslab_mid", mid_slab),
        ("bound_2^23", lambda v: A.slabbed_axis_apply(v, ap, AXIS, consts,
                                                      1 << 23)),
        ("bound_2^24", lambda v: A.slabbed_axis_apply(v, ap, AXIS, consts,
                                                      1 << 24)),
    ]

    # validity pass first (one exec each; strided sample vs oracle)
    rels = {}
    for name, fn in variants:
        try:
            y = jax.jit(fn)(x)
            ys = np.asarray(y[sl])
            got = (ys[..., 0] + 1j * ys[..., 1]).astype(np.complex128)
            rels[name] = float(np.linalg.norm(got - ref_s) / ref_norm)
        except Exception as ex:
            rels[name] = None
            print(f"# {name} FAILED: {ex!r}"[:200], flush=True)
        print(f"# validity {name}: rel={rels[name]}", flush=True)

    nbytes = 2 * x.size * 4            # 2-pass byte model (read + write)
    results = {name: [] for name, _ in variants}
    failed = set()
    ceilings = []
    for t in range(TRIALS):
        try:
            ceilings.append(profile.measured_copy_ceiling_gbps(
                x, unroll=4, reps=4))
        except Exception as ex:
            print(f"# ceiling probe failed: {ex!r}"[:160], flush=True)
            ceilings.append(0.0)
        print(f"# trial{t} copy={ceilings[-1]:.0f} GB/s", flush=True)
        for name, fn in variants:
            if rels[name] is None or name in failed:
                continue
            try:
                # one compiled program can demand a pathologically tiled
                # entry layout (observed: f32[6,256,256,256,2] copy at
                # {0,4,3,2,1:T(2,128)} -> 21x padding -> 16G OOM); a
                # failed variant must not kill the whole shootout
                dt = profile.unrolled_chain_time(fn, x, unroll=UNROLL,
                                                 reps=REPS)
            except Exception as ex:
                print(f"#   {name} TIMING FAILED: {ex!r}"[:160], flush=True)
                failed.add(name)
                emit({"leg": f"{name}_n{n}_b{b}_oom", "backend": backend,
                      "error": str(ex)[:120]})
                continue
            results[name].append(dt)
            print(f"#   {name}: {dt*1e3:.2f} ms", flush=True)

    ceiling = max(ceilings)
    for name, _fn in variants:
        if rels[name] is None or not results[name]:
            emit({"leg": f"{name}_n{n}_b{b}", "backend": backend,
                  "error": True})
            continue
        dt = min(results[name])
        eff = nbytes / dt / 1e9
        emit({"leg": f"{name}_n{n}_b{b}", "backend": backend,
              "avg_ms": round(dt * 1e3, 3), "eff_gbps": round(eff, 1),
              "copy_ceiling_gbps": round(ceiling, 1),
              "vs_copy": round(eff / max(ceiling, 1e-9), 3),
              "rel_err": rels[name],
              "valid": bool(rels[name] is not None and rels[name] < 1e-5)})
    print("# done", flush=True)


if __name__ == "__main__":
    main()
