"""A/B: four-step mid-axis form vs the moveaxis fallback it replaced
(VERDICT r2 #7) on a rank-2 shape with a four-step axis 0.

Run on the real TPU as a to-completion background script:
    nohup python benches/r4_fourstep_mid.py > /tmp/r4_fsmid.log 2>&1 &
Appends one JSON line per config to benches/results_r3.jsonl.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    from webgpufft_tpu.core import axis as A
    from webgpufft_tpu.runtime.profile import unrolled_chain_time

    rng = np.random.default_rng(0)
    rows = []
    for (n0, L, b) in [(1 << 18, 4, 1), (1 << 16, 16, 1), (65536, 8, 2)]:
        ap = A.FourStepAxisPlan(n0, "forward", "fsb")
        consts = {k: jnp.asarray(v) for k, v in ap.consts().items()}
        x = jnp.asarray(
            rng.standard_normal((b, n0, L, 2)).astype(np.float32))

        def via_mid(v):
            return ap.apply_mid(v, consts)

        def via_move(v):
            w = jnp.moveaxis(v, 1, -2)
            w = ap.apply(w, consts)
            return jnp.moveaxis(w, -2, 1)

        t_mid = unrolled_chain_time(via_mid, x, unroll=4, reps=6)
        t_move = unrolled_chain_time(via_move, x, unroll=4, reps=6)
        row = {"bench": "fourstep_mid", "n0": n0, "L": L, "batch": b,
               "mid_ms": t_mid * 1e3, "moveaxis_ms": t_move * 1e3,
               "speedup": t_move / max(t_mid, 1e-12),
               "backend": jax.devices()[0].platform,
               "ts": time.strftime("%Y-%m-%dT%H:%M:%S")}
        rows.append(row)
        print(json.dumps(row), flush=True)

    with open("benches/results_r3.jsonl", "a") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
