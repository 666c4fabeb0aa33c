#!/usr/bin/env python
"""Round-3 TPU perf experiments: MXU precision ladder + four-step transpose
folding.

Motivation (STATUS_r2 round-3 list):
1. Every contraction runs Precision.HIGHEST (6-pass f32).  HIGH (bf16_3x,
   3 passes) halves MXU time; if its accuracy still meets the 1e-5 BASELINE
   bar, compute-heavy rows (c2c_4096_b4096: sum-of-subs 128) get faster.
2. The four-step route ends in a materialized swapaxes digit transpose.
   The 2-level MixedAxisPlan shows einsum-with-permuted-output is cheap on
   this stack ("...caj"), so folding the transpose into stage-2's final
   contraction may drop one full HBM pass from the 2^20 rows.

Self-contained variant functions (explicit tables + precision args), each
correctness-gated vs numpy before timing; HLO census + cost_analysis bytes
per variant; round-robin best-of-3 timing with same-session copy ceilings.

Run to completion, never under timeout:
    nohup python benches/r3_precision_transpose.py > /tmp/r3pt.log 2>&1 &
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

    from webgpufft_tpu.core import dft
    from webgpufft_tpu.core.cplx import to_w4, const_pair, cmul_const
    from webgpufft_tpu.runtime import profile

    P = jax.lax.Precision
    rng = np.random.default_rng(0)

    # ---------------- generic 2-level last-axis FFT builder ----------------
    def build_2level(n, n1, n2, prec, scale=1.0, direction="forward"):
        """MixedAxisPlan 2-level form (dft0 + folded dftB), explicit prec."""
        w1 = dft.dft_matrix(n1, direction)
        tw = dft.ct_twiddle(n1, n2, direction).astype(np.complex64)
        w2 = dft.dft_matrix(n2, direction) * np.complex64(scale)
        d0 = jnp.asarray(to_w4(w1))
        dB = jnp.asarray(np.stack([to_w4(tw[a][:, None] * w2)
                                   for a in range(n1)]))

        def fn(x):
            lead = x.shape[:-2]
            xm = x.reshape(*lead, n1, n2, 2)
            y = jnp.einsum("...abi,aicj->...cbj", xm, d0, precision=prec)
            z = jnp.einsum("...abi,abicj->...caj", y, dB, precision=prec)
            return z.reshape(*lead, n, 2)

        return fn

    def build_3level(n, subs, prec, scale=1.0, direction="forward"):
        """Generic recursion with a twiddle pass (the pre-grouping form)."""
        consts = []
        rem = n
        for lvl, n1 in enumerate(subs[:-1]):
            n2 = rem // n1
            w = jnp.asarray(to_w4(dft.dft_matrix(n1, direction)))
            if lvl == len(subs) - 2:
                tw = dft.ct_twiddle(n1, n2, direction).astype(np.complex64)
                w2 = dft.dft_matrix(n2, direction) * np.complex64(scale)
                dB = jnp.asarray(np.stack([to_w4(tw[a][:, None] * w2)
                                           for a in range(n1)]))
                consts.append(("pair", w, dB))
            else:
                ta, tb = const_pair(dft.ct_twiddle(n1, n2, direction))
                consts.append(("tw", w, jnp.asarray(ta), jnp.asarray(tb)))
            rem = n2

        def rec(x, lvl, rem_subs):
            m = int(np.prod(rem_subs))
            c = consts[lvl]
            n1 = rem_subs[0]
            n2 = m // n1
            lead = x.shape[:-2]
            xm = x.reshape(*lead, n1, n2, 2)
            y = jnp.einsum("...abi,aicj->...cbj", xm, c[1], precision=prec)
            if c[0] == "pair":
                z = jnp.einsum("...abi,abicj->...caj", y, c[2], precision=prec)
            else:
                y = cmul_const(y, c[2], c[3])
                z = rec(y, lvl + 1, rem_subs[1:])
                z = jnp.swapaxes(z, -3, -2)
            return z.reshape(*lead, m, 2)

        return lambda x: rec(x, 0, list(subs))

    # ---------------- four-step 2^20 builders ----------------
    def build_fourstep(n, prec, folded, scale=1.0, direction="forward"):
        """n = n1*n2 giant-axis four-step; stage1 rows-form (contract the n1
        digit in place), twiddle, stage2 2-level along last axis.  folded:
        emit the final digit transpose inside stage-2's last einsum output
        spec instead of a materialized swapaxes."""
        n1 = n2 = 1 << (n.bit_length() - 1).bit_length()  # placeholder
        # balanced split (both 2^10 for n=2^20)
        import math as _m
        r = int(_m.isqrt(n))
        assert r * r == n
        n1 = n2 = r
        sign = -1.0 if direction == "forward" else 1.0
        twc = np.exp(sign * 2j * np.pi *
                     (np.outer(np.arange(n1), np.arange(n2)) % n) / n)
        ta_, tb_ = const_pair(twc)
        ta, tb = jnp.asarray(ta_), jnp.asarray(tb_)

        # stage1: rows-form 2-level over the n1 digit, lanes = n2*2
        s1a = s1b = int(_m.isqrt(n1))
        w2s = dft.dft_matrix(s1b, direction)              # stage-1 high digit
        w1s = dft.dft_matrix(s1a, direction)
        tws = np.exp(sign * 2j * np.pi *
                     (np.outer(np.arange(s1a), np.arange(s1b)) % n1) / n1)
        m1 = tws.T[:, :, None] * w1s[None, :, :]          # (k2, h1, k1)
        w2re = jnp.asarray(np.ascontiguousarray(w2s.real.astype(np.float32)))
        w2im = jnp.asarray(np.ascontiguousarray(w2s.imag.astype(np.float32)))
        bre = jnp.asarray(np.ascontiguousarray(m1.real.astype(np.float32)))
        bim = jnp.asarray(np.ascontiguousarray(m1.imag.astype(np.float32)))

        def swapadj(z):
            even = (jax.lax.broadcasted_iota(jnp.int32, z.shape, z.ndim - 1)
                    % 2) == 0
            return jnp.where(even, jnp.roll(z, -1, axis=-1),
                             jnp.roll(z, 1, axis=-1))

        def signlane(shape, dtype):
            lane = jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)
            return jnp.where(lane % 2 == 0, -1.0, 1.0).astype(dtype)

        def combine(p, q):
            return p + swapadj(q) * signlane(q.shape, q.dtype)

        def stage1_rows(x):                               # (b, n1, L)
            lead = x.shape[:-2]
            L = x.shape[-1]
            v = x.reshape(*lead, s1b, s1a, L)
            p = jnp.einsum("...bal,bk->...kal", v, w2re, precision=prec)
            q = jnp.einsum("...bal,bk->...kal", v, w2im, precision=prec)
            u = combine(p, q)
            p2 = jnp.einsum("...bal,bak->...kbl", u, bre, precision=prec)
            q2 = jnp.einsum("...bal,bak->...kbl", u, bim, precision=prec)
            return combine(p2, q2).reshape(*lead, n1, L)

        # stage2: 2-level along the (contiguous) n2 digit, scale folded
        s2a = s2b = int(_m.isqrt(n2))
        w1_2 = dft.dft_matrix(s2a, direction)
        tw2 = dft.ct_twiddle(s2a, s2b, direction).astype(np.complex64)
        w2_2 = dft.dft_matrix(s2b, direction) * np.complex64(scale)
        d0 = jnp.asarray(to_w4(w1_2))
        dB = jnp.asarray(np.stack([to_w4(tw2[a][:, None] * w2_2)
                                   for a in range(s2a)]))

        def fn(x):                                        # (b, n, 2)
            b = x.shape[0]
            y = x.reshape(b, n1, n2 * 2)
            y = stage1_rows(y)                            # (b, k1, n2*2)
            y = y.reshape(b, n1, n2, 2)
            y = cmul_const(y, ta, tb)                     # W_N^(k1*a2)
            ym = y.reshape(b, n1, s2a, s2b, 2)            # (b, K, a, bb, i)
            t = jnp.einsum("...abi,aicj->...cbj", ym, d0, precision=prec)
            if folded:
                z = jnp.einsum("zKabi,abicj->zcaKj", t, dB, precision=prec)
                return z.reshape(b, n, 2)                 # flat k = K + n1*(a + s2a*c)
            z = jnp.einsum("...abi,abicj->...caj", t, dB, precision=prec)
            z = z.reshape(b, n1, n2, 2)
            z = jnp.swapaxes(z, -3, -2)                   # (k2, k1)
            return z.reshape(b, n, 2)

        return fn

    # ---------------- measurement helpers ----------------
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

    # ================= config 1: c2c 1024 b4096 (headline) =================
    n, b = 1024, 4096
    scale = 1.0 / np.sqrt(n)
    x = jnp.asarray(rng.standard_normal((b, n, 2)).astype(np.float32))
    xn = np.asarray(x, dtype=np.float64)
    zref = np.fft.fft(xn[..., 0] + 1j * xn[..., 1], axis=-1) * scale
    variants = {}
    for pn, pv in (("highest", P.HIGHEST), ("high", P.HIGH),
                   ("default", P.DEFAULT)):
        fn = build_2level(n, 32, 32, pv, scale)
        err = accuracy(fn, x, zref)
        emit(kind="accuracy", config="c2c_1024_b4096", variant=pn, rel_err=err)
        emit(kind="hlo", config="c2c_1024_b4096", variant=pn, **census(fn, x))
        variants[pn] = fn
    run_config("c2c_1024_b4096", variants, x, x.size * 4)

    # ================= config 2: c2c 4096 b4096 (weak row) =================
    n, b = 4096, 4096
    scale = 1.0 / np.sqrt(n)
    x = jnp.asarray(rng.standard_normal((b, n, 2)).astype(np.float32))
    xn = np.asarray(x, dtype=np.float64)
    zref = np.fft.fft(xn[..., 0] + 1j * xn[..., 1], axis=-1) * scale
    variants = {}
    for pn, pv in (("2lvl-highest", P.HIGHEST), ("2lvl-high", P.HIGH),
                   ("2lvl-default", P.DEFAULT)):
        fn = build_2level(n, 64, 64, pv, scale)
        err = accuracy(fn, x, zref)
        emit(kind="accuracy", config="c2c_4096_b4096", variant=pn, rel_err=err)
        emit(kind="hlo", config="c2c_4096_b4096", variant=pn, **census(fn, x))
        variants[pn] = fn
    fn3 = build_3level(n, [16, 16, 16], P.HIGHEST, scale)
    err = accuracy(fn3, x, zref)
    emit(kind="accuracy", config="c2c_4096_b4096", variant="3lvl-16-highest",
         rel_err=err)
    emit(kind="hlo", config="c2c_4096_b4096", variant="3lvl-16-highest",
         **census(fn3, x))
    variants["3lvl-16-highest"] = fn3
    fn3h = build_3level(n, [16, 16, 16], P.HIGH, scale)
    emit(kind="accuracy", config="c2c_4096_b4096", variant="3lvl-16-high",
         rel_err=accuracy(fn3h, x, zref))
    variants["3lvl-16-high"] = fn3h
    run_config("c2c_4096_b4096", variants, x, x.size * 4)

    # ================= config 3: c2c 2^20 b4 (four-step) =================
    n, b = 1 << 20, 4
    scale = 1.0 / np.sqrt(n)
    x = jnp.asarray(rng.standard_normal((b, n, 2)).astype(np.float32))
    xn = np.asarray(x, dtype=np.float64)
    zref = np.fft.fft(xn[..., 0] + 1j * xn[..., 1], axis=-1) * scale
    variants = {}
    for vname, pv, fold in (("swap-highest", P.HIGHEST, False),
                            ("swap-high", P.HIGH, False),
                            ("fold-highest", P.HIGHEST, True),
                            ("fold-high", P.HIGH, True)):
        fn = build_fourstep(n, pv, fold, scale)
        err = accuracy(fn, x, zref)
        emit(kind="accuracy", config="c2c_2pow20_b4", variant=vname,
             rel_err=err)
        emit(kind="hlo", config="c2c_2pow20_b4", variant=vname,
             **census(fn, x))
        if err < 1e-3:
            variants[vname] = fn
    run_config("c2c_2pow20_b4", variants, x, x.size * 4, unroll=4)

    emit(kind="done", ts=time.strftime("%H:%M:%S"))


if __name__ == "__main__":
    main()
