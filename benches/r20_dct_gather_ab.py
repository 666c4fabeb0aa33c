#!/usr/bin/env python
"""A/B: the three DCT FFT-route gathers vs slice+rev respellings.

The dct2/dst2 Makhoul even-odd reorder, the dct3 input mirror X[n-k],
and the dct3 output inverse-perm are all jnp.take gathers on the DCT
hot path (plans/transforms.py:638-651).  Each has an exact slice/rev/
stack spelling.  The r15 probe showed gathers ~1.1-1.2x slower than rev
at 3-D trailing-2 shapes, but r18 showed respellings can REGRESS at
other geometries — so measure at the BASELINE dct2_512sq geometry
before shipping anything.

Run to completion (never under timeout):
  nohup python benches/r20_dct_gather_ab.py > benches/logs/r20.log 2>&1 &
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "benches", "results_r4.jsonl")

TRIALS = int(os.environ.get("R20_TRIALS", "2"))
N = 512
B = 8


def emit(row):
    row = {"bench": f"r20_dct/{row.pop('leg')}", "protocol": "v2", **row}
    print(json.dumps(row), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")


def main():
    from webgpufft_tpu.plans.transforms import _dct_reorder_perms
    from webgpufft_tpu.runtime import profile

    backend = jax.default_backend()
    print(f"# backend={backend}", flush=True)
    rng = np.random.default_rng(0)
    n = N
    perm, inv = _dct_reorder_perms(n)
    permj = jnp.asarray(perm)
    invj = jnp.asarray(inv)
    xm_idx = jnp.asarray(np.concatenate(
        [[0], np.arange(n - 1, 0, -1)]).astype(np.int32))
    x = jnp.asarray(rng.standard_normal((B, n, n)), jnp.float32)

    def legs_for_axis(ax):
        def mk_take(v):
            return jnp.take(v, permj, axis=ax)

        def mk_rev(v):
            ev = lax.slice_in_dim(v, 0, n, stride=2, axis=ax)
            od = lax.slice_in_dim(v, 1, n, stride=2, axis=ax)
            return jnp.concatenate([ev, jnp.flip(od, axis=ax)], axis=ax)

        def xm_take(v):
            return jnp.take(v, xm_idx, axis=ax)

        def xm_rev(v):
            head = lax.slice_in_dim(v, 0, 1, stride=1, axis=ax)
            tail = jnp.flip(lax.slice_in_dim(v, 1, n, stride=1, axis=ax),
                            axis=ax)
            return jnp.concatenate([head, tail], axis=ax)

        def inv_take(v):
            return jnp.take(v, invj, axis=ax)

        def inv_stack(v):
            h1 = (n + 1) // 2
            a = lax.slice_in_dim(v, 0, h1, stride=1, axis=ax)
            bpart = jnp.flip(lax.slice_in_dim(v, h1, n, stride=1, axis=ax),
                             axis=ax)
            if n % 2:
                bpart = jnp.concatenate(
                    [bpart, lax.slice_in_dim(bpart, 0, 1, stride=1, axis=ax)],
                    axis=ax)
            y = jnp.stack([a, bpart], axis=ax + 1)
            shp = list(v.shape)
            shp[ax] = 2 * h1
            y = y.reshape(shp)
            return lax.slice_in_dim(y, 0, n, stride=1, axis=ax)

        return [(f"mk_take_ax{ax}", mk_take), (f"mk_rev_ax{ax}", mk_rev),
                (f"xm_take_ax{ax}", xm_take), (f"xm_rev_ax{ax}", xm_rev),
                (f"inv_take_ax{ax}", inv_take), (f"inv_stack_ax{ax}", inv_stack)]

    legs = legs_for_axis(1) + legs_for_axis(2)

    # agreement checks (pairs)
    for i in range(0, len(legs), 2):
        na, fa = legs[i]
        nb, fb = legs[i + 1]
        ya = np.asarray(jax.jit(fa)(x[:1]))
        yb = np.asarray(jax.jit(fb)(x[:1]))
        rel = float(np.abs(ya - yb).max())
        print(f"# {na} vs {nb}: maxdiff={rel:.1e}", flush=True)
        assert rel == 0.0, (na, nb)

    nbytes = 2 * x.size * 4
    results = {name: [] for name, _ in legs}
    ceilings = []
    for t in range(TRIALS):
        try:
            ceilings.append(profile.measured_copy_ceiling_gbps(
                x, unroll=8, reps=4))
        except Exception as ex:
            print(f"# ceiling failed: {ex!r}"[:120], flush=True)
            ceilings.append(0.0)
        print(f"# trial{t} copy(v2)={ceilings[-1]:.0f} GB/s", flush=True)
        for name, fn in legs:
            try:
                dt = profile.hbm_stream_time(fn, x, reps=3)
            except Exception as ex:
                print(f"#   {name} failed: {ex!r}"[:160], flush=True)
                continue
            results[name].append(dt)
            print(f"#   {name}: {dt*1e3:.3f} ms", flush=True)

    ceiling = max(ceilings) if ceilings else 0.0
    for name, _fn in legs:
        if not results[name]:
            emit({"leg": name, "backend": backend, "error": True})
            continue
        dt = min(results[name])
        eff = nbytes / dt / 1e9
        emit({"leg": name, "backend": backend,
              "avg_ms": round(dt * 1e3, 3), "min_bytes": nbytes,
              "eff_gbps": round(eff, 1),
              "copy_ceiling_gbps": round(ceiling, 1),
              "vs_copy": round(eff / max(ceiling, 1e-9), 3)})
    print("# done", flush=True)


if __name__ == "__main__":
    main()
