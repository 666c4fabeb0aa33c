#!/usr/bin/env python
"""A/B: gather-based vs reverse-based half-trick untangle at 256^3.

r9 attribution (benches/results_r4.jsonl r9_attrib rows) showed the c2r
re-tangle stage running at 48 GB/s against 277 GB/s elementwise in the
same session — the only non-contraction stage far off elementwise speed.
Its only non-elementwise op is ``jnp.take(y, flip, axis=1)``, a gather;
gathers are documented catastrophic on this stack (CLAUDE.md, the
overlap-window lesson).  The flip index maps are pure reversals:

  r2c  (len h+1): [0, h-1, h-2, ..., 1, 0]  = concat(z[:1], rev(z[1:]), z[:1])
  c2r  (len h):   [h, h-1, ..., 1]          = rev(y[1:h+1])

so both gathers can be spelled as XLA ``rev`` + slice/concat, which lower
to relayout-class copies.  This probe times both spellings of both
untangles, alternating within one session, and validates they agree to
f32 roundoff.

Run to completion (never under timeout):
  nohup python benches/r15_untangle_rev.py > benches/logs/r15.log 2>&1 &
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

N = int(os.environ.get("R15_N", "256"))
B = int(os.environ.get("R15_B", "6"))
UNROLL = 2
REPS = 3
TRIALS = int(os.environ.get("R15_TRIALS", "3"))


def emit(row):
    row = {"bench": f"r15_untangle/{row.pop('leg')}", **row}
    print(json.dumps(row), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")


def main():
    from webgpufft_tpu.core.cplx import cmul_const
    from webgpufft_tpu.plans.transforms import _half_trick_consts
    from webgpufft_tpu.runtime import profile

    backend = jax.default_backend()
    print(f"# backend={backend} N={N} B={B}", flush=True)
    n, b, h = N, B, N // 2
    rng = np.random.default_rng(0)

    halfc = jnp.asarray(rng.standard_normal((b, h, n, n, 2)), jnp.float32)
    packed = jnp.asarray(rng.standard_normal((b, h + 1, n, n, 2)), jnp.float32)
    cf = _half_trick_consts(n, inverse=False)
    ci = _half_trick_consts(n, inverse=True)
    cf = {k: jnp.asarray(v) for k, v in cf.items()}
    ci = {k: jnp.asarray(v) for k, v in ci.items()}
    # the gather index tables under test, built locally (the library
    # dropped them when the rev spelling landed — this probe is the
    # historical A/B evidence and must stay runnable)
    cf["rc/flip"] = jnp.asarray(((h - np.arange(h + 1)) % h).astype(np.int32))
    ci["cr/flip"] = jnp.asarray((h - np.arange(h)).astype(np.int32))

    # ---- r2c untangle: halfc (b,h,...) -> packed, cropped back to h -------
    def r2c_take(z):
        zf = jnp.take(z, cf["rc/flip"], axis=1)
        zf = zf * jnp.asarray([1.0, -1.0], dtype=z.dtype)
        zpad = jnp.concatenate([z, z[:, :1]], axis=1)
        cshape = (1, h + 1, 1, 1, 2)
        y = (zpad + zf) * 0.5 + cmul_const(
            zpad - zf, cf["rc/ca"].reshape(cshape), cf["rc/cb"].reshape(cshape))
        return y[:, :h]

    def r2c_rev(z):
        zf = jnp.concatenate(
            [z[:, :1], jnp.flip(z[:, 1:], axis=1), z[:, :1]], axis=1)
        zf = zf * jnp.asarray([1.0, -1.0], dtype=z.dtype)
        zpad = jnp.concatenate([z, z[:, :1]], axis=1)
        cshape = (1, h + 1, 1, 1, 2)
        y = (zpad + zf) * 0.5 + cmul_const(
            zpad - zf, cf["rc/ca"].reshape(cshape), cf["rc/cb"].reshape(cshape))
        return y[:, :h]

    # ---- c2r retangle: packed -> half z, padded back to packed shape ------
    def c2r_take(v):
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
        return jnp.concatenate([z, v[:, h:]], axis=1)

    def c2r_rev(v):
        bin_iota = jnp.arange(h + 1).reshape(1, h + 1, 1, 1, 1)
        comp = jnp.arange(2).reshape(1, 1, 1, 1, 2)
        selfconj = ((bin_iota == 0) | (bin_iota == h)) & (comp == 1)
        y = jnp.where(selfconj, 0.0, v)
        xk = y[:, :h]
        xf = jnp.flip(y[:, 1:h + 1], axis=1)
        xf = xf * jnp.asarray([1.0, -1.0], dtype=y.dtype)
        cshape = (1, h, 1, 1, 2)
        z = (xk + xf) + cmul_const(xk - xf, ci["cr/ca"].reshape(cshape),
                                   ci["cr/cb"].reshape(cshape))
        return jnp.concatenate([z, v[:, h:]], axis=1)

    # correctness cross-check first (cheap slice readback)
    ra = np.asarray(jax.jit(r2c_take)(halfc[:1, :, :8, :8]))
    rb = np.asarray(jax.jit(r2c_rev)(halfc[:1, :, :8, :8]))
    rel_r = float(np.abs(ra - rb).max() / max(np.abs(ra).max(), 1e-30))
    ca_ = np.asarray(jax.jit(c2r_take)(packed[:1, :, :8, :8]))
    cb_ = np.asarray(jax.jit(c2r_rev)(packed[:1, :, :8, :8]))
    rel_c = float(np.abs(ca_ - cb_).max() / max(np.abs(ca_).max(), 1e-30))
    print(f"# agreement r2c={rel_r:.2e} c2r={rel_c:.2e}", flush=True)
    assert rel_r < 1e-6 and rel_c < 1e-6

    legs = [
        ("r2c_untangle_take", r2c_take, halfc, 2 * halfc.size * 4),
        ("r2c_untangle_rev", r2c_rev, halfc, 2 * halfc.size * 4),
        ("c2r_retangle_take", c2r_take, packed, 2 * packed.size * 4),
        ("c2r_retangle_rev", c2r_rev, packed, 2 * packed.size * 4),
    ]

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
        emit({"leg": f"{name}_n{n}_b{x.shape[0]}", "backend": backend,
              "avg_ms": round(dt * 1e3, 3), "min_bytes": nbytes,
              "eff_gbps": round(eff, 1),
              "copy_ceiling_gbps": round(ceiling, 1),
              "vs_copy": round(eff / max(ceiling, 1e-9), 3),
              "agree_rel": rel_r if name.startswith("r2c") else rel_c})
    print("# done", flush=True)


if __name__ == "__main__":
    main()
