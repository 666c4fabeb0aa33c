#!/usr/bin/env python
"""Which side is wrong past the operand bound? Oracle check at 256^3.

r8_chunk_bound.py found that raising the operand bound on 3-D shapes
changes results by > 1e-4 (mid/off variants failed their cross-checks
against the production chunked route) while being perf-neutral-to-worse.
This probe decides WHICH route is numerically wrong by comparing a
strided slice of each variant's r2c output against the numpy oracle in
f64, and records the mismatch magnitudes the first probe didn't emit.

If the raised-bound variants are the wrong ones, the round-1 einsum
miscompile still lives above ~2^24-element operands for 3-D mid-axis
forms on this stack, and CHUNK_ELEMS=2^22 is correctness-critical (not
just a footprint bound) — r2_operand_bound_probe.py only validated 1-D
shapes.

Run to completion: nohup python benches/r8b_bound_validity.py > log &
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "benches", "results_r3.jsonl")

BOUNDS = (("default", 1 << 22), ("mid", 1 << 25), ("off", 1 << 28))
N = int(os.environ.get("R8B_N", "256"))


def set_bound(elems: int) -> None:
    from webgpufft_tpu.plans import transforms as T
    from webgpufft_tpu.core import axis as A
    T.CHUNK_ELEMS = elems
    A.OPERAND_CHUNK_ELEMS = elems


def main():
    import jax
    import webgpufft_tpu as W

    backend = jax.default_backend()
    print(f"# backend={backend}", flush=True)
    rng = np.random.default_rng(0)
    n = N
    for typ, batch in (("r2c", 3), ("c2r", 6)):
        if typ == "r2c":
            # the plan packs the FIRST transform axis (shape axis 0)
            x_np = rng.standard_normal((batch, n, n, n)).astype(np.float32)
            x = jnp.asarray(x_np)
            ref = np.fft.fftn(x_np.astype(np.float64),
                              axes=(1, 2, 3))[:, :n // 2 + 1]
        else:
            # convention-free oracle: pack a REAL field's rfftn spectrum,
            # so the unnormalized inverse must return n^3 * field exactly
            r = rng.standard_normal((batch, n, n, n)).astype(np.float32)
            # plan packs along axis 0 of the shape (first transform axis)
            zp = np.fft.fftn(r.astype(np.float64), axes=(1, 2, 3))
            zp = zp[:, :n // 2 + 1].astype(np.complex64)
            x_np = np.stack([zp.real, zp.imag], -1).astype(np.float32)
            x = jnp.asarray(x_np)
            ref = r.astype(np.float64) * (n ** 3)

        sl = (slice(None), slice(0, None, 8), slice(0, None, 8),
              slice(0, None, 8))
        row = {"bench": f"r8b_validity/{typ}_{n}^3_b{batch}",
               "backend": backend}
        for name, bound in BOUNDS:
            set_bound(bound)
            try:
                plan = W.create_plan(
                    {"type": typ, "shape": [n, n, n], "batch": batch,
                     "direction": "forward" if typ == "r2c" else "inverse",
                     "normalize": "none"}, cache=W.PlanCache())
                y = plan(x)
                if typ == "r2c":
                    ys = np.asarray(y[sl + (slice(None),)])
                    got = ys[..., 0] + 1j * ys[..., 1]
                    want = ref[sl]
                else:
                    got = np.asarray(y[sl]).astype(np.float64)
                    want = ref[sl].real
                rel = float(np.max(np.abs(got - want))
                            / max(1e-30, float(np.max(np.abs(want)))))
                row[f"{name}_rel_vs_oracle"] = round(rel, 9)
                row[f"{name}_ok"] = bool(rel < 1e-4)
                row[f"{name}_chunks"] = ";".join(
                    r for r in plan.route.reasons if "chunk" in r) or "none"
            except Exception as e:  # noqa: BLE001
                row[f"{name}_error"] = f"{type(e).__name__}: {str(e)[:160]}"
        print(json.dumps(row), flush=True)
        with open(OUT, "a") as f:
            f.write(json.dumps(row) + "\n")
    print(json.dumps({"bench": "r8b_validity/done"}), flush=True)


if __name__ == "__main__":
    main()
