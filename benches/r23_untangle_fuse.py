#!/usr/bin/env python
"""A/B the r2c untangle / c2r retangle spellings at 256^3 b=3 (v2).

r22's prefix attribution put the untangle at +4.9 ms (r2c) / +2.8 ms
(c2r) against a ~1.2 ms fused-elementwise floor (read z straight +
reversed, write y).  Hypothesis: the current spelling materializes the
mirrored copy (zf/xf) because the concat + the two consumers (z+zf,
z-zf) defeat XLA's fusion.  The FUSED spelling algebraically folds the
0.5/c coefficients into per-bin constant pairs so each output bin is

    y[k] = P[k] * z[k] + Q[k] * conj(z[mirror(k)])

one cmul_const on the straight operand + one conj-pair cmul_const on a
plain jnp.flip of the SAME operand — no concat on the hot path, no
explicit conj pass, no sub/add intermediates, and (c2r) the
self-conjugate-bin zeroing folded into the k=0 tables as Re-projection
pairs instead of two jnp.where masks.

Legs (all full cores, composed — r21 lesson: isolated wins can vanish):
    r2c_cur / r2c_fus, c2r_cur / c2r_fus, rt_cur / rt_fus (roundtrip).

Run to completion (never under timeout):
  nohup python benches/r23_untangle_fuse.py > benches/logs/r5/r23.log 2>&1 &
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

TRIALS = int(os.environ.get("R23_TRIALS", "2"))


def emit(row):
    row = {"bench": f"r23_untangle/{row.pop('leg')}", "protocol": "v2", **row}
    print(json.dumps(row), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")


def conj_pair(q: np.ndarray):
    """(ca, cb) such that cmul_const(z, ca, cb) == q * conj(z):
    out_re = qr*zr + qi*zi -> ca0=qr, cb0=qi;
    out_im = qi*zr - qr*zi -> ca1=-qr, cb1=qi."""
    ca = np.stack([q.real, -q.real], axis=-1).astype(np.float32)
    cb = np.stack([q.imag, q.imag], axis=-1).astype(np.float32)
    return ca, cb


def re_pair(q: np.ndarray):
    """(ca, cb) such that cmul_const(z, ca, cb) == q * Re(z)."""
    ca = np.stack([q.real, np.zeros_like(q.real)], axis=-1).astype(np.float32)
    cb = np.stack([np.zeros_like(q.real), q.imag], axis=-1).astype(np.float32)
    return ca, cb


def main():
    from webgpufft_tpu.core import engine
    from webgpufft_tpu.core.axis import slabbed_axis_apply
    from webgpufft_tpu.core.cplx import cmul_const, const_pair
    from webgpufft_tpu.runtime import profile
    from webgpufft_tpu.spec import TuningSpec

    backend = jax.default_backend()
    print(f"# backend={backend}", flush=True)
    rng = np.random.default_rng(0)
    n = 256
    h, p = n // 2, n // 2 + 1
    b = 3

    tuning = TuningSpec()
    fplans = engine.build_axis_plans((h, n, n), "forward", tuning)
    fc = {k: jnp.asarray(v) for k, v in engine.collect_consts(fplans).items()}
    iplans = engine.build_axis_plans((h, n, n), "inverse", tuning)
    ic = {k: jnp.asarray(v) for k, v in engine.collect_consts(iplans).items()}
    bound = None

    # ---- tables -----------------------------------------------------------
    k = np.arange(h + 1)
    c_f = -0.5j * np.exp(-2j * np.pi * k / n)          # forward c[k]
    P, Q = 0.5 + c_f, 0.5 - c_f
    pa_, pb_ = const_pair(P)
    qa_, qb_ = conj_pair(Q)

    def rsh(t, m):
        return jnp.asarray(t.reshape((1, m, 1, 1, 2)))

    pa_b, pb_b = rsh(pa_[1:h], h - 1), rsh(pb_[1:h], h - 1)
    qa_b, qb_b = rsh(qa_[1:h], h - 1), rsh(qb_[1:h], h - 1)
    pa_0, pb_0 = rsh(pa_[:1], 1), rsh(pb_[:1], 1)
    qa_0, qb_0 = rsh(qa_[:1], 1), rsh(qb_[:1], 1)
    pa_h, pb_h = rsh(pa_[h:], 1), rsh(pb_[h:], 1)
    qa_h, qb_h = rsh(qa_[h:], 1), rsh(qb_[h:], 1)

    ki = np.arange(h)
    ci = 1j * np.exp(2j * np.pi * ki / n)              # inverse i*w^{-k}
    R, S = 1.0 + ci, 1.0 - ci
    ra_, rb_ = const_pair(R)
    sa_, sb_ = conj_pair(S)
    ra_b, rb_b = rsh(ra_[1:], h - 1), rsh(rb_[1:], h - 1)
    sa_b, sb_b = rsh(sa_[1:], h - 1), rsh(sb_[1:], h - 1)
    # k = 0: Z0 = R0*Re(X0) + S0*Re(Xh) (self-conjugate bins: imag dropped)
    r0a_, r0b_ = re_pair(R[:1])
    s0a_, s0b_ = re_pair(S[:1])
    r0a, r0b = rsh(r0a_, 1), rsh(r0b_, 1)
    s0a, s0b = rsh(s0a_, 1), rsh(s0b_, 1)

    # current-library tables
    from webgpufft_tpu.plans.transforms import _half_trick_consts
    fcur = {kk: jnp.asarray(v) for kk, v in
            _half_trick_consts(n, inverse=False).items()}
    icur = {kk: jnp.asarray(v) for kk, v in
            _half_trick_consts(n, inverse=True).items()}

    xr = jnp.asarray(rng.standard_normal((b, n, n, n)), jnp.float32)
    xp_ = jnp.asarray(rng.standard_normal((b, p, n, n, 2)), jnp.float32)

    # ---- r2c cores ---------------------------------------------------------
    def r2c_core(x, fused: bool):
        v = x.reshape(b, h, 2, n, n)
        v = jnp.moveaxis(v, 2, -1)
        z = slabbed_axis_apply(v, fplans[0], 1, fc, bound)
        if fused:
            zb = z[:, 1:]
            y_body = (cmul_const(zb, pa_b, pb_b)
                      + cmul_const(jnp.flip(zb, axis=1), qa_b, qb_b))
            z0 = z[:, :1]
            y0 = cmul_const(z0, pa_0, pb_0) + cmul_const(z0, qa_0, qb_0)
            ynyq = cmul_const(z0, pa_h, pb_h) + cmul_const(z0, qa_h, qb_h)
            y = jnp.concatenate([y0, y_body], axis=1)
        else:
            zf = jnp.concatenate([z[:, :1], jnp.flip(z[:, 1:], axis=1)],
                                 axis=1)
            zf = zf * jnp.asarray([1.0, -1.0], dtype=z.dtype)
            ca = fcur["rc/ca"].reshape(1, p, 1, 1, 2)
            cb = fcur["rc/cb"].reshape(1, p, 1, 1, 2)
            y = (z + zf) * 0.5 + cmul_const(z - zf, ca[:, :h], cb[:, :h])
            z0 = z[:, :1]
            zf0 = z0 * jnp.asarray([1.0, -1.0], dtype=z.dtype)
            ynyq = (z0 + zf0) * 0.5 + cmul_const(z0 - zf0, ca[:, h:],
                                                 cb[:, h:])
        for d in (1, 2):
            y = slabbed_axis_apply(y, fplans[d], 1 + d, fc, bound)
            ynyq = slabbed_axis_apply(ynyq, fplans[d], 1 + d, fc, bound)
        return jnp.concatenate([y, ynyq], axis=1)

    # ---- c2r cores ---------------------------------------------------------
    def c2r_core(xp, fused: bool):
        body, nyq = xp[:, :h], xp[:, h:]
        for d in (2, 1):
            body = slabbed_axis_apply(body, iplans[d], 1 + d, ic, bound)
            nyq = slabbed_axis_apply(nyq, iplans[d], 1 + d, ic, bound)
        if fused:
            bb = body[:, 1:]
            z_body = (cmul_const(bb, ra_b, rb_b)
                      + cmul_const(jnp.flip(bb, axis=1), sa_b, sb_b))
            z0 = (cmul_const(body[:, :1], r0a, r0b)
                  + cmul_const(nyq, s0a, s0b))
            z = jnp.concatenate([z0, z_body], axis=1)
        else:
            bin_iota = jnp.arange(h).reshape(1, h, 1, 1, 1)
            comp = jnp.arange(2).reshape(1, 1, 1, 1, 2)
            body = jnp.where((bin_iota == 0) & (comp == 1), 0.0, body)
            nyq = jnp.where(comp == 1, 0.0, nyq)
            xk = body
            xf = jnp.concatenate([nyq, jnp.flip(body[:, 1:], axis=1)],
                                 axis=1)
            xf = xf * jnp.asarray([1.0, -1.0], dtype=xp.dtype)
            cs = (1, h, 1, 1, 2)
            z = (xk + xf) + cmul_const(xk - xf, icur["cr/ca"].reshape(cs),
                                       icur["cr/cb"].reshape(cs))
        z = slabbed_axis_apply(z, iplans[0], 1, ic, bound)
        z = jnp.moveaxis(z, -1, 2)
        return z.reshape(b, n, n, n)

    # ---- correctness anchors ----------------------------------------------
    yref = np.fft.fftn(np.asarray(xr, np.float64), axes=(1, 2, 3))[:, :p]
    for fused in (False, True):
        yk = np.asarray(r2c_core(xr, fused), np.float64)
        rel = (np.max(np.abs((yk[..., 0] + 1j * yk[..., 1]) - yref))
               / np.max(np.abs(yref)))
        print(f"# r2c fused={fused} vs numpy rel={rel:.3e}", flush=True)
        assert rel < 1e-5, rel
    # c2r: feed a packed spectrum of a real field; expect n^3 * field
    xs = np.asarray(r2c_core(xr, False))
    for fused in (False, True):
        back = np.asarray(c2r_core(jnp.asarray(xs), fused), np.float64)
        rel = (np.max(np.abs(back / n ** 3 - np.asarray(xr, np.float64)))
               / np.max(np.abs(np.asarray(xr))))
        print(f"# c2r fused={fused} roundtrip rel={rel:.3e}", flush=True)
        assert rel < 1e-5, rel

    if TRIALS == 0:
        print("# correctness-only run (R23_TRIALS=0)", flush=True)
        return

    # ---- timing ------------------------------------------------------------
    def wrap(fn):
        def g(x):
            return x * (1.0 + 1e-24 * jnp.mean(fn(x)))
        return g

    legs = [
        ("r2c_cur", wrap(lambda x: r2c_core(x, False)), xr),
        ("r2c_fus", wrap(lambda x: r2c_core(x, True)), xr),
        ("c2r_cur", wrap(lambda x: c2r_core(x, False)), xp_),
        ("c2r_fus", wrap(lambda x: c2r_core(x, True)), xp_),
        ("rt_cur", wrap(lambda x: c2r_core(
            r2c_core(x, False).reshape(b, p, n, n, 2), False)), xr),
        ("rt_fus", wrap(lambda x: c2r_core(
            r2c_core(x, True).reshape(b, p, n, n, 2), True)), xr),
    ]

    results = {name: [] for name, _f, _x in legs}
    ceilings = []
    for t in range(TRIALS):
        try:
            ceilings.append(profile.measured_copy_ceiling_gbps(
                xr, unroll=8, reps=4))
        except Exception as ex:
            print(f"# ceiling failed: {ex!r}"[:120], flush=True)
            ceilings.append(0.0)
        print(f"# trial{t} copy(v2)={ceilings[-1]:.0f} GB/s", flush=True)
        for name, fn, x in legs:
            try:
                dt = profile.hbm_stream_time(fn, x, copies=1, reps=4)
            except Exception as ex:
                print(f"#   {name} failed: {ex!r}"[:160], flush=True)
                continue
            results[name].append(dt)
            print(f"#   {name}: {dt*1e3:.3f} ms", flush=True)

    ceiling = max(ceilings) if ceilings else 0.0
    for name, _f, _x in legs:
        if not results[name]:
            emit({"leg": name, "backend": backend, "error": True})
            continue
        emit({"leg": name, "backend": backend,
              "avg_ms": round(min(results[name]) * 1e3, 3),
              "copy_ceiling_gbps": round(ceiling, 1)})
    print("# done", flush=True)


if __name__ == "__main__":
    main()
