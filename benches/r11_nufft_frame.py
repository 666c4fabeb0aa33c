#!/usr/bin/env python
"""NUFFT performance framing: byte-model bound, direct-NDFT crossover,
and tap-chunk knob A/B (VERDICT r3 weak #4 — raw Mtaps/s rows were
unfalsifiable as "fast" without a bound or a baseline).

Three measurements per config, all on the normal operator A^H A
(type1 o type2, the CG hot op of examples/mri_gridding.py):

1. **Byte-model bound**: minimum HBM traffic of one A^H A application —
   tap gather (m*taps reads) + tap scatter (m*taps read-modify-writes) +
   4 fine-grid FFT axis passes + deconv/pad/crop passes — giving
   eff_gbps and a vs_copy ratio like every other suite row.
2. **Direct-NDFT crossover**: the dense m*n^2 evaluation (chunked
   4-real-einsum MXU form, the best dense alternative on this hardware)
   timed at a small point count and extrapolated linearly in m (its cost
   is exactly linear in m); reports measured direct ms, the extrapolated
   full-m time, the NUFFT speedup at full m, and the crossover point m*
   below which direct wins.  Validated against the NUFFT at small size.
3. **Tap-chunk knob A/B**: _CHUNK_TAP_ELEMS default vs x4 vs /4 on the
   same config in alternating trials (the obvious batching knob).

Appends rows to benches/results_r4.jsonl.  Run to completion:
  nohup python benches/r11_nufft_frame.py > benches/logs/r11.log 2>&1 &
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

CONFIGS = (
    (128, 51_200, 1e-6),
    (256, 204_800, 1e-6),
)
M_DIRECT = 4096          # direct NDFT measured at this point count
UNROLL = 2
REPS = 4
TRIALS = int(os.environ.get("R11_TRIALS", "2"))
HI = jax.lax.Precision.HIGHEST


def emit(row):
    print(json.dumps(row), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")


def cein(pat, A, B):
    """Complex einsum on (re, im) pairs."""
    ar, ai = A
    br, bi = B
    re = (jnp.einsum(pat, ar, br, precision=HI)
          - jnp.einsum(pat, ai, bi, precision=HI))
    im = (jnp.einsum(pat, ar, bi, precision=HI)
          + jnp.einsum(pat, ai, br, precision=HI))
    return re, im


def make_direct_aha(kx, ky, n):
    """Dense A^H A with CMCL mode order and the repo's isign conventions
    (type2 isign=-1, type1 isign=+1): the best dense formulation on this
    hardware — separable phase factors, 4-real-einsum MXU contractions."""
    ks = np.arange(-(n // 2), (n - 1) // 2 + 1, dtype=np.float64)
    px, py = np.outer(kx, ks), np.outer(ky, ks)
    exc = jnp.asarray(np.cos(px), jnp.float32)
    exs = jnp.asarray(np.sin(px), jnp.float32)
    eyc = jnp.asarray(np.cos(py), jnp.float32)
    eys = jnp.asarray(np.sin(py), jnp.float32)

    def aha(f):
        fr, fi = f[..., 0], f[..., 1]
        # c_j = sum_{k1,k2} f e^{-i(k1 x_j + k2 y_j)}
        t1 = cein("ab,jb->ja", (fr, fi), (eyc, -eys))
        cr, ci = cein("ja,ja->j", t1, (exc, -exs))
        # f'_{k1,k2} = sum_j c_j e^{+i(k1 x_j + k2 y_j)}
        t2 = (cr[:, None] * exc - ci[:, None] * exs,
              ci[:, None] * exc + cr[:, None] * exs)
        gr, gi = cein("ja,jb->ab", t2, (eyc, eys))
        return jnp.stack([gr, gi], axis=-1)

    return aha


def byte_model(n, m, mr, taps):
    """Minimum HBM bytes of one A^H A application (8 B per complex f32)."""
    fine_fft = 2 * (2 * 2 * mr * mr * 8)      # 2 FFTs x 2 axes x (r+w)
    gather = m * taps * 8 + m * 8             # interp reads + point writes
    scatter = m * 8 + m * taps * 16           # point reads + grid r-m-w
    stage = 2 * (mr * mr * 8 + n * n * 8)     # deconv/pad + crop/deconv
    return fine_fft + gather + scatter + stage


def main():
    from webgpufft_tpu import nufft as NU
    from webgpufft_tpu.runtime import profile

    backend = jax.default_backend()
    print(f"# backend={backend}", flush=True)
    rng = np.random.default_rng(0)

    # sanity: direct == NUFFT at tiny size (proves same operator)
    n0, m0 = 16, 300
    kx0 = rng.uniform(0, 2 * np.pi, m0)
    ky0 = rng.uniform(0, 2 * np.pi, m0)
    f0 = jnp.asarray(rng.standard_normal((n0, n0, 2)), jnp.float32)
    g_nu = np.asarray(NU.nufft2d1(kx0, ky0,
                                  NU.nufft2d2(kx0, ky0, f0, eps=1e-6),
                                  (n0, n0), eps=1e-6))
    g_d = np.asarray(make_direct_aha(kx0, ky0, n0)(f0))
    rel = np.linalg.norm(g_nu - g_d) / np.linalg.norm(g_d)
    print(f"# direct-vs-nufft sanity rel={rel:.2e}", flush=True)
    assert rel < 1e-4, rel

    for n, m, eps in CONFIGS:
        msp = NU._msp_for(eps)
        taps = (2 * msp) ** 2
        mr, _h, _tau = NU._grid_params(n, msp)
        kx = rng.uniform(0, 2 * np.pi, m)
        ky = rng.uniform(0, 2 * np.pi, m)
        f = jnp.asarray(rng.standard_normal((n, n, 2)), jnp.float32)

        def aha(v, kx=kx, ky=ky, n=n, eps=eps):
            s = NU.nufft2d2(kx, ky, v, eps=eps)
            return NU.nufft2d1(kx, ky, s, (n, n), eps=eps)

        direct = make_direct_aha(kx[:M_DIRECT], ky[:M_DIRECT], n)

        best = {"nufft": float("inf"), "direct": float("inf")}
        ceiling = 0.0
        for t in range(TRIALS):
            ceiling = max(ceiling, profile.measured_copy_ceiling_gbps(
                f, unroll=4, reps=4))
            best["nufft"] = min(best["nufft"], profile.unrolled_chain_time(
                aha, f, unroll=UNROLL, reps=REPS))
            best["direct"] = min(best["direct"], profile.unrolled_chain_time(
                direct, f, unroll=UNROLL, reps=REPS))
            print(f"# trial{t} n={n}: ceil={ceiling:.0f} "
                  f"nufft={best['nufft']*1e3:.1f}ms "
                  f"direct({M_DIRECT}pts)={best['direct']*1e3:.1f}ms",
                  flush=True)

        nbytes = byte_model(n, m, mr, taps)
        eff = nbytes / best["nufft"] / 1e9
        direct_full = best["direct"] * (m / M_DIRECT)
        crossover = m * best["nufft"] / max(direct_full, 1e-12)
        emit({"bench": f"r11_nufft/aha_2d_{n}_{m}pts_eps{eps:g}",
              "backend": backend,
              "avg_ms": round(best["nufft"] * 1e3, 3),
              "model_min_bytes": nbytes,
              "eff_gbps": round(eff, 1),
              "copy_ceiling_gbps": round(ceiling, 1),
              "vs_copy": round(eff / max(ceiling, 1e-9), 3),
              "mtaps_per_s": round(2 * m * taps / best["nufft"] / 1e6, 1),
              "direct_ms_at_4096pts": round(best["direct"] * 1e3, 3),
              "direct_ms_extrap_full_m": round(direct_full * 1e3, 1),
              "speedup_vs_direct": round(direct_full / best["nufft"], 1),
              "crossover_pts": int(crossover)})

    # knob A/B: tap-chunk bound on config 0
    n, m, eps = CONFIGS[0]
    kx = rng.uniform(0, 2 * np.pi, m)
    ky = rng.uniform(0, 2 * np.pi, m)
    f = jnp.asarray(rng.standard_normal((n, n, 2)), jnp.float32)
    default = NU._CHUNK_TAP_ELEMS
    times = {}
    for t in range(TRIALS):
        for label, bound in (("default", default), ("x4", default * 4),
                             ("div4", default // 4)):
            NU._CHUNK_TAP_ELEMS = bound

            def aha(v):
                s = NU.nufft2d2(kx, ky, v, eps=eps)
                return NU.nufft2d1(kx, ky, s, (n, n), eps=eps)

            dt = profile.unrolled_chain_time(aha, f, unroll=UNROLL,
                                             reps=REPS)
            times[label] = min(times.get(label, float("inf")), dt)
            print(f"# trial{t} tapchunk {label}: {dt*1e3:.1f} ms", flush=True)
    NU._CHUNK_TAP_ELEMS = default
    emit({"bench": f"r11_nufft/tapchunk_ab_{n}_{m}pts", "backend": backend,
          **{f"ms_{k}": round(v * 1e3, 3) for k, v in times.items()},
          "winner": min(times, key=times.get)})
    print("# done", flush=True)


if __name__ == "__main__":
    main()
