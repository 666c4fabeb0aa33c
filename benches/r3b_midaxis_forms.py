#!/usr/bin/env python
"""Round-3 follow-up: W4-form mid-axis contractions vs the rows-form P/Q
einsums, plus 1-level small-N variants.

r3_precision_transpose.py showed fold==swap in HLO for the four-step's
final digit transpose (XLA already folds it), so the 2^20 traffic must be
elsewhere — the rows-form stage 1 runs 4 P/Q dots + 2 combine passes where
a W4-form mid-axis einsum ("...abLi,aicj->...cbLj": contract (digit,
component) jointly, riding dim L untouched) needs 2 dots and no combines.
This script A/Bs that form for the four-step stage 1, 2D axis 0, and the
reference's 64x64 transpose-path config; plus single-level W4 stages for
small N (fewer passes, trivially more MACs).

Run to completion, never under timeout:
    nohup python benches/r3b_midaxis_forms.py > /tmp/r3b.log 2>&1 &
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

    import webgpufft_tpu as W
    from webgpufft_tpu.core import dft
    from webgpufft_tpu.core.cplx import to_w4, const_pair, cmul_const
    from webgpufft_tpu.runtime import profile

    P = jax.lax.Precision
    HI = P.HIGHEST
    rng = np.random.default_rng(0)

    def tables_2level(n, sa, sb, direction, scale):
        w1 = dft.dft_matrix(sa, direction)
        tw = dft.ct_twiddle(sa, sb, direction).astype(np.complex64)
        w2 = dft.dft_matrix(sb, direction) * np.complex64(scale)
        d0 = jnp.asarray(to_w4(w1))
        dB = jnp.asarray(np.stack([to_w4(tw[a][:, None] * w2)
                                   for a in range(sa)]))
        return d0, dB

    def build_last(n, sa, sb, prec, direction="forward", scale=1.0):
        """FFT along the last complex axis; sb=1 -> single-level."""
        if sb == 1:
            d = jnp.asarray(to_w4(dft.dft_matrix(n, direction)
                                  * np.complex64(scale)))

            def fn(x):
                return jnp.einsum("...ai,aicj->...cj", x, d, precision=prec)

            return fn
        d0, dB = tables_2level(n, sa, sb, direction, scale)

        def fn(x):
            lead = x.shape[:-2]
            xm = x.reshape(*lead, sa, sb, 2)
            y = jnp.einsum("...abi,aicj->...cbj", xm, d0, precision=prec)
            z = jnp.einsum("...abi,abicj->...caj", y, dB, precision=prec)
            return z.reshape(*lead, n, 2)

        return fn

    def build_mid(n, sa, sb, prec, direction="forward", scale=1.0):
        """FFT along axis -3 of (..., n, L, 2) — W4 form, riding L."""
        if sb == 1:
            d = jnp.asarray(to_w4(dft.dft_matrix(n, direction)
                                  * np.complex64(scale)))

            def fn(x):
                return jnp.einsum("...aLi,aicj->...cLj", x, d, precision=prec)

            return fn
        d0, dB = tables_2level(n, sa, sb, direction, scale)

        def fn(x):
            lead = x.shape[:-3]
            L = x.shape[-2]
            xm = x.reshape(*lead, sa, sb, L, 2)
            t = jnp.einsum("...abLi,aicj->...cbLj", xm, d0, precision=prec)
            z = jnp.einsum("...abLi,abicj->...caLj", t, dB, precision=prec)
            return z.reshape(*lead, n, L, 2)

        return fn

    def build_rows_pq(n, direction="forward"):
        """Historical rows-form P/Q stage along axis -3 of (..., n, L, 2).

        This was core/rows.py until commit 2e9b5d6 replaced it with the W4
        mid form; the baseline is inlined here (verbatim math) so the
        recorded comparison stays reproducible from this tree.
        """
        from webgpufft_tpu.core.fused_cols import choose_split
        h1, h2 = choose_split(n)
        w2 = dft.dft_matrix(h2, direction)
        w1 = dft.dft_matrix(h1, direction)
        sign = -1.0 if direction == "forward" else 1.0
        tw = np.exp(sign * 2j * np.pi *
                    (np.outer(np.arange(h1), np.arange(h2)) % n) / n)
        m = tw.T[:, :, None] * w1[None, :, :]   # M[k2, h1, k1]
        w2re = jnp.asarray(np.ascontiguousarray(w2.real.astype(np.float32)))
        w2im = jnp.asarray(np.ascontiguousarray(w2.imag.astype(np.float32)))
        bre = jnp.asarray(np.ascontiguousarray(m.real.astype(np.float32)))
        bim = jnp.asarray(np.ascontiguousarray(m.imag.astype(np.float32)))

        def swapadj(z):
            even = (jax.lax.broadcasted_iota(
                jnp.int32, z.shape, z.ndim - 1) % 2) == 0
            return jnp.where(even, jnp.roll(z, -1, axis=-1),
                             jnp.roll(z, 1, axis=-1))

        def combine(p, q):
            lane = jax.lax.broadcasted_iota(
                jnp.int32, q.shape, q.ndim - 1)
            sgn = jnp.where(lane % 2 == 0, -1.0, 1.0).astype(q.dtype)
            return p + swapadj(q) * sgn

        def apply_rows(v):              # (..., H, L2) interleaved lanes
            lead = v.shape[:-2]
            L2 = v.shape[-1]
            v = v.reshape(*lead, h2, h1, L2)
            p = jnp.einsum("...bal,bk->...kal", v, w2re, precision=HI)
            q = jnp.einsum("...bal,bk->...kal", v, w2im, precision=HI)
            u = combine(p, q)
            p2 = jnp.einsum("...bal,bak->...kbl", u, bre, precision=HI)
            q2 = jnp.einsum("...bal,bak->...kbl", u, bim, precision=HI)
            return combine(p2, q2).reshape(*lead, n, L2)

        def fn(x):                      # (..., n, L, 2) -> merge (L,2) lanes
            lead = x.shape[:-3]
            L = x.shape[-2]
            v = x.reshape(*lead, n, L * 2)
            return apply_rows(v).reshape(*lead, n, L, 2)

        return fn

    def accuracy(fn, x, zref):
        y = np.asarray(fn(x), dtype=np.float64)
        z = y[..., 0] + 1j * y[..., 1]
        return float(np.max(np.abs(z - zref)) / np.max(np.abs(zref)))

    def census(fn, x):
        try:
            comp = jax.jit(fn).lower(x).compile()
            txt = comp.as_text()
            ca = comp.cost_analysis() or {}
            return {"fusions": txt.count(" fusion("),
                    "copies": txt.count(" copy("),
                    "transposes": txt.count(" transpose("),
                    "bytes_mb": round(float(ca.get("bytes accessed", 0)) / 1e6, 1)}
        except Exception as e:  # noqa: BLE001
            return {"error": str(e)[:120]}

    def run_config(name, variants, x, logical_bytes, unroll=6, reps=8,
                   rounds=3):
        results = {k: [] for k in variants}
        ceil = []
        for _ in range(rounds):
            for vname, fn in variants.items():
                results[vname].append(
                    profile.unrolled_chain_time(fn, x, unroll=unroll,
                                                reps=reps))
            ceil.append(profile.measured_copy_ceiling_gbps(
                x, unroll=unroll, reps=max(reps // 2, 2)))
        best_ceil = max(ceil)
        for vname, dts in results.items():
            dt = min(dts)
            gb = 2 * logical_bytes / dt / 1e9
            emit(kind="timing", config=name, variant=vname,
                 ms=round(dt * 1e3, 4), eff_gbps=round(gb, 1),
                 vs_copy=round(gb / best_ceil, 3),
                 copy_ceiling=round(best_ceil, 1),
                 all_ms=[round(d * 1e3, 4) for d in dts])

    # ============== config 1: 2^20 b4 four-step stage-1 form ==============
    n, b = 1 << 20, 4
    n1 = n2 = 1024
    scale = 1.0 / np.sqrt(n)
    x = jnp.asarray(rng.standard_normal((b, n, 2)).astype(np.float32))
    xn = np.asarray(x, dtype=np.float64)
    zref = np.fft.fft(xn[..., 0] + 1j * xn[..., 1], axis=-1) * scale

    sign = -1.0
    twc = np.exp(sign * 2j * np.pi *
                 (np.outer(np.arange(n1), np.arange(n2)) % n) / n)
    ta_, tb_ = const_pair(twc)
    ta, tb = jnp.asarray(ta_), jnp.asarray(tb_)
    stage2 = build_last(n2, 32, 32, HI, scale=scale)

    def fourstep_with(stage1):
        def fn(xx):
            bb = xx.shape[0]
            y = xx.reshape(bb, n1, n2, 2)
            y = stage1(y)                       # FFT over the n1 digit
            y = cmul_const(y, ta, tb)
            y = stage2(y)                       # FFT over the n2 digit
            y = jnp.swapaxes(y, -3, -2)
            return y.reshape(bb, n, 2)

        return fn

    plan = W.create_plan(type="c2c", shape=[n], batch=b, direction="forward",
                        normalize="unitary", tuning={"impl": "xla"})
    variants = {"production": plan,
                "rows-pq": fourstep_with(build_rows_pq(n1)),
                "w4-mid-2lvl": fourstep_with(build_mid(n1, 32, 32, HI))}
    for vname, fn in list(variants.items()):
        err = accuracy(fn, x, zref)
        emit(kind="accuracy", config="fourstep_2pow20_b4", variant=vname,
             rel_err=err)
        emit(kind="hlo", config="fourstep_2pow20_b4", variant=vname,
             **census(fn if vname != "production"
                      else (lambda v: plan._fn(plan._consts, v)), x))
        if err > 1e-3:
            del variants[vname]
    run_config("fourstep_2pow20_b4", variants, x, x.size * 4, unroll=4)

    # ============== config 2: 2D 1024x1024 b1 axis-0 form ==============
    d2, b2 = 1024, 1
    scale2 = 1.0 / d2  # unitary over 1024^2
    x2 = jnp.asarray(rng.standard_normal((b2, d2, d2, 2)).astype(np.float32))
    x2n = np.asarray(x2, dtype=np.float64)
    zref2 = np.fft.fft2(x2n[..., 0] + 1j * x2n[..., 1]) * scale2

    plan2 = W.create_plan(type="c2c", shape=[d2, d2], batch=b2,
                         direction="forward", normalize="unitary",
                         tuning={"impl": "xla"})
    last2 = build_last(d2, 32, 32, HI, scale=scale2)

    def twod(axis0):
        def fn(xx):
            return last2(axis0(xx))
        return fn

    variants = {"production": plan2,
                "rows-pq": twod(build_rows_pq(d2)),
                "w4-mid-2lvl": twod(build_mid(d2, 32, 32, HI))}
    for vname, fn in list(variants.items()):
        err = accuracy(fn, x2, zref2)
        emit(kind="accuracy", config="c2c_2d_1024", variant=vname,
             rel_err=err)
        if err > 1e-3:
            del variants[vname]
    run_config("c2c_2d_1024", variants, x2, x2.size * 4)

    # ============== config 3: 64x64 b256 (reference transpose path) =======
    d3, b3 = 64, 256
    scale3 = 1.0 / d3
    x3 = jnp.asarray(rng.standard_normal((b3, d3, d3, 2)).astype(np.float32))
    x3n = np.asarray(x3, dtype=np.float64)
    zref3 = np.fft.fft2(x3n[..., 0] + 1j * x3n[..., 1]) * scale3

    plan3 = W.create_plan(type="c2c", shape=[d3, d3], batch=b3,
                         direction="forward", normalize="unitary",
                         tuning={"impl": "xla"})

    def twod3(axis0, last):
        def fn(xx):
            return last(axis0(xx))
        return fn

    variants = {
        "production": plan3,
        "w4-mid-2lvl": twod3(build_mid(d3, 8, 8, HI),
                             build_last(d3, 8, 8, HI, scale=scale3)),
        "w4-1lvl": twod3(build_mid(d3, d3, 1, HI),
                         build_last(d3, d3, 1, HI, scale=scale3)),
    }
    for vname, fn in list(variants.items()):
        err = accuracy(fn, x3, zref3)
        emit(kind="accuracy", config="c2c_2d_64x64_b256", variant=vname,
             rel_err=err)
        if err > 1e-3:
            del variants[vname]
    run_config("c2c_2d_64x64_b256", variants, x3, x3.size * 4)

    # ============== config 4: 1-level last axis for small N ==============
    for nn, sa, sb in ((256, 16, 16), (64, 8, 8)):
        bb = (1 << 22) // nn
        sc = 1.0 / np.sqrt(nn)
        xs = jnp.asarray(rng.standard_normal((bb, nn, 2)).astype(np.float32))
        xsn = np.asarray(xs, dtype=np.float64)
        zrefs = np.fft.fft(xsn[..., 0] + 1j * xsn[..., 1], axis=-1) * sc
        variants = {
            "2lvl": build_last(nn, sa, sb, HI, scale=sc),
            "1lvl": build_last(nn, nn, 1, HI, scale=sc),
        }
        cfg = f"c2c_1d_{nn}_b{bb}"
        for vname, fn in list(variants.items()):
            err = accuracy(fn, xs, zrefs)
            emit(kind="accuracy", config=cfg, variant=vname, rel_err=err)
            if err > 1e-3:
                del variants[vname]
        run_config(cfg, variants, xs, xs.size * 4)

    emit(kind="done", ts=time.strftime("%H:%M:%S"))


if __name__ == "__main__":
    main()
