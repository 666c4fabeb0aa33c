#!/usr/bin/env python
"""On-chip A/B/C of the operand-chunk bound on 2^24-element volumes.

First on-chip ns3d data (results_r3.jsonl, r7_ns3d/step_256^3) measured
the 3-D NS step at vs_copy 0.17 — far below every other route.  The
256^3 plans route `large-batch-chunk(1)` + `single-item-exceeds-chunk`:
the batch is serialized through lax.map AND each item is slab-streamed,
both governed by CHUNK_ELEMS = 2^22 (plans/transforms.py).  CLAUDE.md
already records that lax.map group serialization costs more than the
work it bounds; the einsum-operand miscompile that motivated the bound
was re-validated clean up to 2^25 in round 2 (r2_operand_bound_probe).

This probe times the dominant NS transforms and the full NS step under
three bounds in ALTERNATING trials (tunnel drift immunity):

  A "default" 2^22 — production route (chunked)
  B "mid"     2^25 — the validated bound (fewer/looser chunks)
  C "off"     2^28 — fully unchunked (operands to 2^26.6: BEYOND the
                     validated bound, so outputs are cross-checked
                     against A's production route before timing counts)

Correctness gate: strided-slice max-rel-diff + sum-abs checksum vs A.

Run to completion: nohup python benches/r8_chunk_bound.py > log 2>&1 &
(never under a timeout; CLAUDE.md TPU rules).
"""

import importlib.util
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "benches", "results_r3.jsonl")

BOUNDS = (("default", 1 << 22), ("mid", 1 << 25), ("off", 1 << 28))
UNROLL = int(os.environ.get("R8_UNROLL", "4"))
REPS = int(os.environ.get("R8_REPS", "6"))
TRIALS = int(os.environ.get("R8_TRIALS", "3"))
GRID_N = int(os.environ.get("R8_N", "256"))


def set_bound(elems: int) -> None:
    from webgpufft_tpu.plans import transforms as T
    from webgpufft_tpu.core import axis as A
    T.CHUNK_ELEMS = elems
    A.OPERAND_CHUNK_ELEMS = elems


def emit(row: dict) -> None:
    print(json.dumps(row), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")


def _slice_host(y):
    """Small strided sample for cross-variant comparison (bounded host
    transfer; full downloads of 400 MB outputs would stall the tunnel)."""
    idx = tuple(slice(None, None, max(1, s // 16)) for s in y.shape)
    return np.asarray(y[idx])


def _checksum(y) -> float:
    return float(jnp.sum(jnp.abs(y)))


def main():
    backend = jax.default_backend()
    print(f"# backend={backend}", flush=True)
    import webgpufft_tpu as W
    from webgpufft_tpu.runtime import profile

    rng = np.random.default_rng(0)

    # ---------------- isolated transforms: c2r b6 / r2c b3 at 256^3
    n = GRID_N
    for typ, batch, direction in (("c2r", 6, "inverse"),
                                  ("r2c", 3, "forward")):
        if typ == "c2r":
            in_shape = (batch, n // 2 + 1, n, n, 2)
        else:
            in_shape = (batch, n, n, n)
        x = jnp.asarray(rng.standard_normal(in_shape).astype(np.float32))

        variants = {}
        ref_slice = ref_sum = None
        bad = None
        for name, bound in BOUNDS:
            set_bound(bound)
            plan = W.create_plan({"type": typ, "shape": [n, n, n],
                                  "batch": batch, "direction": direction,
                                  "normalize": "none"}, cache=W.PlanCache())
            y = plan(x)
            s, c = _slice_host(y), _checksum(y)
            if name == "default":
                ref_slice, ref_sum = s, c
                ok, rel = True, 0.0
            else:
                rel = float(np.max(np.abs(s - ref_slice))
                            / max(1e-30, np.max(np.abs(ref_slice))))
                rel = max(rel,
                          abs(c - ref_sum) / max(1e-30, abs(ref_sum)))
                ok = rel < 1e-4
            variants[name] = {"plan": plan, "bound": bound, "ok": bool(ok),
                              "rel": rel,
                              "chunk_reasons": [r for r in plan.route.reasons
                                                if "chunk" in r]}
            del y

        times = {}
        ceiling = 0.0
        for _ in range(TRIALS):
            ceiling = max(ceiling, profile.measured_copy_ceiling_gbps(
                x, unroll=UNROLL, reps=max(4, REPS // 2)))
            for name, _b in BOUNDS:
                v = variants[name]
                if not v["ok"]:
                    continue
                set_bound(v["bound"])
                plan = v["plan"]
                # the transform changes shape — chain through a wrapper
                # that folds the output back into an input-shaped array
                # with a TINY nonzero weight (a *0.0 add would let XLA
                # dead-code-eliminate the whole transform)
                if typ == "c2r":
                    def fn(z, _p=plan):
                        y = _p(z)                       # (b, n, n, n) real
                        return z + 1e-12 * y[:, :n // 2 + 1, :, :, None]
                else:
                    def fn(z, _p=plan):
                        y = _p(z)                       # (b, n//2+1, n, n, 2)
                        return z.at[:, :n // 2 + 1].add(1e-12 * y[..., 0])
                dt = profile.unrolled_chain_time(fn, x,
                                                 unroll=UNROLL, reps=REPS)
                times[name] = min(times.get(name, float("inf")), dt)

        real_b = n * n * n * 4
        packed_b = (n // 2 + 1) * n * n * 8
        per = batch * (real_b + packed_b)
        row = {"bench": f"r8_chunk/{typ}_{n}^3_b{batch}", "backend": backend,
               "copy_ceiling_gbps": round(ceiling, 1)}
        for name, _b in BOUNDS:
            v = variants[name]
            row[f"{name}_ms"] = (round(times[name] * 1e3, 4)
                                 if name in times else None)
            row[f"{name}_ok"] = v["ok"]
            row[f"{name}_chunks"] = ";".join(v["chunk_reasons"]) or "none"
            if name in times:
                row[f"{name}_eff_gbps"] = round(per / times[name] / 1e9, 1)
        if "default" in times:
            for name in ("mid", "off"):
                if name in times:
                    row[f"speedup_{name}"] = round(
                        times["default"] / times[name], 3)
        emit(row)

    # ---------------- the full NS step at 256^3
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples", "navier_stokes3d.py")
    spec = importlib.util.spec_from_file_location("ns3d_example", path)
    ns = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ns)

    u0 = rng.standard_normal((3, n, n, n)).astype(np.float32)
    variants = {}
    ref_slice = None
    for name, bound in BOUNDS:
        set_bound(bound)
        step, to_spectral, _ = ns.make_stepper3(n, 1e-3, 1e-3)
        u_hat = to_spectral(u0)
        y = step(u_hat)
        s = _slice_host(y)
        if name == "default":
            ref_slice = s
            ok, rel = True, 0.0
        else:
            rel = float(np.max(np.abs(s - ref_slice))
                        / max(1e-30, np.max(np.abs(ref_slice))))
            ok = rel < 1e-4
        variants[name] = {"step": step, "x": u_hat, "bound": bound,
                          "ok": bool(ok), "rel": rel}
        del y

    times = {}
    ceiling = 0.0
    for _ in range(TRIALS):
        ceiling = max(ceiling, profile.measured_copy_ceiling_gbps(
            variants["default"]["x"], unroll=UNROLL, reps=max(4, REPS // 2)))
        for name, _b in BOUNDS:
            v = variants[name]
            if not v["ok"]:
                continue
            set_bound(v["bound"])
            dt = profile.unrolled_chain_time(v["step"], v["x"],
                                             unroll=UNROLL, reps=REPS)
            times[name] = min(times.get(name, float("inf")), dt)

    real_b = n * n * n * 4
    packed_b = (n // 2 + 1) * n * n * 8
    minb = 18 * (real_b + packed_b) + 2 * 3 * packed_b
    row = {"bench": f"r8_chunk/ns3d_step_{n}^3", "backend": backend,
           "copy_ceiling_gbps": round(ceiling, 1)}
    for name, _b in BOUNDS:
        v = variants[name]
        row[f"{name}_ms"] = (round(times[name] * 1e3, 4)
                             if name in times else None)
        row[f"{name}_ok"] = v["ok"]
        if name in times:
            row[f"{name}_eff_gbps"] = round(minb / times[name] / 1e9, 1)
    if "default" in times:
        for name in ("mid", "off"):
            if name in times:
                row[f"speedup_{name}"] = round(
                    times["default"] / times[name], 3)
    emit(row)
    emit({"bench": "r8_chunk/done", "backend": backend})


if __name__ == "__main__":
    main()
