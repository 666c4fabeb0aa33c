#!/usr/bin/env python
"""Round-2 TPU perf experiments (VERDICT #2 and #4).

Part 1 — XLA formulation shoot-out for the headline c2c-1024 b4096:
hunting the 2-materialized-pass structure (round-1 chain analysis pinned
the production einsum pipeline at 3 passes of 67 MB).

Part 2 — Pallas decisive experiment: bare streaming ceiling of a Pallas
copy kernel (grid pipeline and emit_pipeline DMA variants) vs XLA copy,
plus the existing fused FFT kernel, all in the same session.

All variants measured with the unrolled-chain method in ROUND-ROBIN trials
(alternating, 3 rounds, best-of) so device-throughput swings hit every
variant equally.  Prints one JSON line per variant.  Run to completion:
    nohup python benches/r2_perf_experiments.py > /tmp/r2perf.log 2>&1 &
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/benches/", 1)[0])


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import webgpufft_tpu as W
    from webgpufft_tpu.core import dft
    from webgpufft_tpu.core.cplx import to_w4, const_pair
    from webgpufft_tpu.runtime import profile

    hi = jax.lax.Precision.HIGHEST
    rng = np.random.default_rng(0)
    n, batch = 1024, 4096
    n1 = n2 = 32
    x = jnp.asarray(rng.standard_normal((batch, n, 2)).astype(np.float32))
    zref = np.fft.fft(np.asarray(x)[..., 0] + 1j * np.asarray(x)[..., 1], axis=-1)
    bytes_per_app = 2 * x.size * 4  # read + write

    # ---------------- Part 1 variants ----------------
    variants = {}

    # A: production plan
    plan = W.create_plan(type="c2c", shape=[n], batch=batch, tuning={"impl": "xla"})
    variants["A-production"] = plan

    # B: PQ dot_general rows form (xla_forms form B)
    g1 = jnp.asarray(to_w4(dft.dft_matrix(n1, "forward")).reshape(2 * n1, 2 * n1))
    w2 = dft.dft_matrix(n2, "forward")
    f2re = jnp.asarray(np.ascontiguousarray(w2.real.astype(np.float32)))
    f2im = jnp.asarray(np.ascontiguousarray(w2.imag.astype(np.float32)))
    tw = np.exp(-2j * np.pi * (np.outer(np.arange(n2), np.arange(n1)) % n) / n)
    ta_, tb_ = const_pair(tw)
    ta = jnp.asarray(ta_.reshape(n2, 2 * n1))
    tb = jnp.asarray(tb_.reshape(n2, 2 * n1))
    sgn = jnp.asarray(np.tile(np.array([-1.0, 1.0], np.float32), n1))

    def swapadj(z):
        even = (jax.lax.broadcasted_iota(jnp.int32, z.shape, z.ndim - 1) % 2) == 0
        return jnp.where(even, jnp.roll(z, -1, axis=-1), jnp.roll(z, 1, axis=-1))

    def form_b(v):
        v = v.reshape(batch, n2, 2 * n1)
        dn = (((1,), (0,)), ((), ()))
        p = jnp.swapaxes(jax.lax.dot_general(v, f2re, dn, precision=hi), 1, 2)
        q = jnp.swapaxes(jax.lax.dot_general(v, f2im, dn, precision=hi), 1, 2)
        u = p + swapadj(q) * sgn
        u = u * ta + swapadj(u) * tb
        w = jax.lax.dot_general(u, g1, (((2,), (0,)), ((), ())), precision=hi)
        return w.reshape(batch, n2, n1, 2).swapaxes(1, 2).reshape(batch, n, 2)

    variants["B-pq-rows"] = form_b

    # C: form B, digit reversal via flat gather instead of transpose
    rev = np.arange(n).reshape(n2, n1).T.reshape(-1)  # k = n? out[k1,k2]
    rev_idx = jnp.asarray(rev.astype(np.int32))

    def form_c(v):
        v = v.reshape(batch, n2, 2 * n1)
        dn = (((1,), (0,)), ((), ()))
        p = jnp.swapaxes(jax.lax.dot_general(v, f2re, dn, precision=hi), 1, 2)
        q = jnp.swapaxes(jax.lax.dot_general(v, f2im, dn, precision=hi), 1, 2)
        u = p + swapadj(q) * sgn
        u = u * ta + swapadj(u) * tb
        w = jax.lax.dot_general(u, g1, (((2,), (0,)), ((), ())), precision=hi)
        w = w.reshape(batch, n, 2)  # flat order k2*n1 + k1 (digit-scrambled)
        return jnp.take(w, rev_idx, axis=1)

    variants["C-pq-gather"] = form_c

    # D: planar split re/im — 4 real matmuls/stage on clean (b, n2, n1) tiles,
    # digit transpose at the end, components stacked on a leading dim
    w1m = dft.dft_matrix(n1, "forward")
    f1re = jnp.asarray(w1m.real.astype(np.float32))
    f1im = jnp.asarray(w1m.imag.astype(np.float32))
    twg = np.exp(-2j * np.pi * (np.outer(np.arange(n1), np.arange(n2)) % n) / n)
    tg_re = jnp.asarray(twg.real.astype(np.float32))   # (n1/k1?, n2)
    tg_im = jnp.asarray(twg.imag.astype(np.float32))

    def form_d(v):
        # v (b, n, 2) -> planar (b, n1, n2) re/im; digit n = a1*n2 + a2
        xr = v[..., 0].reshape(batch, n1, n2)
        xi = v[..., 1].reshape(batch, n1, n2)
        # stage 1: contract a1 (dim 1 of (b, a1, a2)): out (b, a2, k1)
        dn = (((1,), (0,)), ((), ()))
        ar = jax.lax.dot_general(xr, f1re, dn, precision=hi)
        ai = jax.lax.dot_general(xi, f1im, dn, precision=hi)
        br = jax.lax.dot_general(xi, f1re, dn, precision=hi)
        bi = jax.lax.dot_general(xr, f1im, dn, precision=hi)
        yr = (ar - ai).swapaxes(1, 2)   # (b, k1, a2)
        yi = (br + bi).swapaxes(1, 2)
        # twiddle W_N^(k1 a2)
        tr, ti = tg_re, tg_im
        ur = yr * tr - yi * ti
        ui = yr * ti + yi * tr
        # stage 2: contract a2 (axis 2) with DFT(n2)
        cr = jax.lax.dot_general(ur, f2re, (((2,), (0,)), ((), ())), precision=hi)
        ci = jax.lax.dot_general(ui, f2im, (((2,), (0,)), ((), ())), precision=hi)
        dr = jax.lax.dot_general(ui, f2re, (((2,), (0,)), ((), ())), precision=hi)
        di = jax.lax.dot_general(ur, f2im, (((2,), (0,)), ((), ())), precision=hi)
        zr = cr - ci                    # (b, k1, k2)
        zi = dr + di
        # out flat k = k1 + n1*k2: transpose digits and interleave
        z = jnp.stack([zr, zi], axis=-1)          # (b, k1, k2, 2)
        return z.swapaxes(1, 2).reshape(batch, n, 2)

    variants["D-planar"] = form_d

    # E: production plan under AUTO I/O layouts (boundary effect probe)
    from jax.experimental.layout import Format, Layout
    auto_jit = jax.jit(lambda v: plan._fn(plan._consts, v),
                       in_shardings=Format(Layout.AUTO),
                       out_shardings=Format(Layout.AUTO))
    compiled = auto_jit.lower(x).compile()
    in_fmt = compiled.input_formats[0][0]
    out_fmt = compiled.output_formats
    emit(kind="auto-layout-solved", in_fmt=str(in_fmt), out_fmt=str(out_fmt))
    # a second jit PINNED to the solved concrete formats is callable with
    # layout-pinned concrete arrays (AUTO itself only accepts ShapeDtypeStructs)
    pinned_jit = jax.jit(lambda v: plan._fn(plan._consts, v),
                         in_shardings=in_fmt, out_shardings=out_fmt)
    x_auto = jax.device_put(x, in_fmt)
    variants["E-auto-layout"] = ("special", pinned_jit, x_auto)

    # correctness gate for B/C/D
    for name in ("B-pq-rows", "C-pq-gather", "D-planar"):
        y = np.asarray(variants[name](x))
        z = y[..., 0] + 1j * y[..., 1]
        err = float(np.max(np.abs(z - zref)) / np.max(np.abs(zref)))
        emit(kind="correctness", variant=name, rel_err=err)
        if err > 1e-4:
            del variants[name]

    # HLO materialized-op census per variant (optimized TPU HLO)
    def hlo_census(fn, arg):
        try:
            txt = jax.jit(fn).lower(arg).compile().as_text()
        except Exception as e:  # noqa
            return {"error": str(e)[:100]}
        return {"fusions": txt.count(" fusion("), "copies": txt.count(" copy("),
                "transposes": txt.count(" transpose("),
                "kloop": txt.count("kind=kLoop"), "kinput": txt.count("kind=kInput")}

    for name, fn in list(variants.items()):
        if isinstance(fn, tuple):
            continue
        emit(kind="hlo", variant=name, **hlo_census(fn, x))

    def eager_chain_time(fn, arg, iters=48):
        """Per-call eager chain time (y = fn(y)); includes the ~0.2-0.4 ms
        per-dispatch tunnel overhead — only for comparing variants that
        differ at the CALL boundary (layout pinning)."""
        y = fn(arg)
        float(jnp.sum(y.ravel()[:1]))
        t0 = time.perf_counter()
        z = arg
        for _ in range(iters):
            z = fn(z)
        float(jnp.sum(z.ravel()[:1]))
        return (time.perf_counter() - t0) / iters

    # round-robin timing, 3 rounds, best-of
    results = {k: [] for k in variants}
    ceil = []
    for rnd in range(3):
        for name, fn in variants.items():
            if isinstance(fn, tuple):
                # AUTO-layout boundary probe: time EAGER repeated calls with
                # layout-pinned input (jit-of-jit would inline the formats
                # away), against an eager production baseline
                _, aj, xa = fn
                dt = eager_chain_time(aj, xa)
                results.setdefault("A-production-eager", []).append(
                    eager_chain_time(plan, x))
            else:
                dt = profile.unrolled_chain_time(fn, x, unroll=8, reps=10)
            results[name].append(dt)
        ceil.append(profile.measured_copy_ceiling_gbps(x, unroll=8, reps=6))
    best_ceil = max(ceil)
    for name, dts in results.items():
        dt = min(dts)
        emit(kind="xla-variant", variant=name, ms=round(dt * 1e3, 4),
             eff_gbps=round(bytes_per_app / dt / 1e9, 1),
             vs_copy=round(bytes_per_app / dt / 1e9 / best_ceil, 3),
             copy_ceiling=round(best_ceil, 1), all_ms=[round(d * 1e3, 4) for d in dts])

    # ---------------- Part 2: Pallas streaming ceiling ----------------
    flat = x.reshape(batch, n * 2)

    # P1: plain grid-pipelined Pallas copy (the round-1 structure)
    def copy_kernel(xr, yr):
        yr[...] = xr[...]

    tb = 128
    p_copy = pl.pallas_call(
        copy_kernel,
        grid=(batch // tb,),
        in_specs=[pl.BlockSpec((tb, n * 2), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((tb, n * 2), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct(flat.shape, flat.dtype),
    )
    y = p_copy(flat)
    err = float(jnp.max(jnp.abs(y - flat)))
    emit(kind="correctness", variant="P1-pallas-grid-copy", rel_err=err)

    def time_copy(fn, label):
        # pallas_call is opaque to XLA — a pure copy chain cannot be elided
        dts = []
        xc = []
        for rnd in range(3):
            dts.append(profile.unrolled_chain_time(fn, flat, unroll=8, reps=10))
            xc.append(profile.measured_copy_ceiling_gbps(flat, unroll=8, reps=6))
        dt = min(dts)
        bw = 2 * flat.size * 4 / dt / 1e9
        emit(kind="pallas", variant=label, ms=round(dt * 1e3, 4),
             gbps=round(bw, 1), xla_copy_gbps=round(max(xc), 1),
             ratio=round(bw / max(xc), 3))

    time_copy(p_copy, "P1-pallas-grid-copy-tb128")

    # P2: bigger blocks (whole rows, tb=512)
    tb2 = 512
    p_copy2 = pl.pallas_call(
        copy_kernel,
        grid=(batch // tb2,),
        in_specs=[pl.BlockSpec((tb2, n * 2), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((tb2, n * 2), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct(flat.shape, flat.dtype),
    )
    time_copy(p_copy2, "P2-pallas-grid-copy-tb512")

    # P3: explicit emit_pipeline DMA double buffering
    try:
        def body(_, ref_in, ref_out):
            def inner(x_ref, y_ref):
                y_ref[...] = x_ref[...]
            pltpu.emit_pipeline(
                inner,
                grid=(batch // tb,),
                in_specs=[pl.BlockSpec((tb, n * 2), lambda i: (i, 0))],
                out_specs=[pl.BlockSpec((tb, n * 2), lambda i: (i, 0))],
            )(ref_in, ref_out)

        p_copy3 = pl.pallas_call(
            lambda xr, yr: body(None, xr, yr),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            out_shape=jax.ShapeDtypeStruct(flat.shape, flat.dtype),
        )
        y3 = p_copy3(flat)
        err3 = float(jnp.max(jnp.abs(y3 - flat)))
        emit(kind="correctness", variant="P3-emit-pipeline", rel_err=err3)
        if err3 == 0.0:
            time_copy(p_copy3, "P3-emit-pipeline-copy")
    except Exception as e:
        emit(kind="error", variant="P3-emit-pipeline", error=str(e)[:200])

    # P4: the existing fused FFT kernel vs production XLA, same session
    try:
        pplan = W.create_plan(type="c2c", shape=[n], batch=batch,
                             tuning={"impl": "pallas"})
        dts = []
        adts = []
        for rnd in range(3):
            dts.append(profile.unrolled_chain_time(pplan, x, unroll=8, reps=10))
            adts.append(profile.unrolled_chain_time(plan, x, unroll=8, reps=10))
        emit(kind="pallas", variant="P4-fused-fft-vs-xla",
             pallas_ms=round(min(dts) * 1e3, 4), xla_ms=round(min(adts) * 1e3, 4),
             ratio=round(min(dts) / min(adts), 3))
    except Exception as e:
        emit(kind="error", variant="P4-fused-fft", error=str(e)[:200])

    emit(kind="done", ts=time.strftime("%H:%M:%S"))


if __name__ == "__main__":
    main()
