"""Alternating-trials re-probe of the four-step mid-axis form vs the
moveaxis fallback (follow-up to r4_fourstep_mid.py, whose sequential
A-then-B layout is exposed to the tunnel's minute-scale throughput
drift; repo practice is alternating trials — CLAUDE.md rule 5).

Run on the real TPU as a to-completion background script:
    nohup python benches/r4_fourstep_mid2.py > /tmp/r4_fsmid2.log 2>&1 &
Appends one JSON line per config to benches/results_r3.jsonl.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def _chain(fn, unroll):
    @jax.jit
    def chain(v):
        for _ in range(unroll):
            v = fn(v)
        return v
    return chain


def _time_once(chain, x, reps):
    z = chain(x)
    float(z[(0,) * z.ndim])          # completion barrier (tunnel-safe)
    t0 = time.perf_counter()
    z = x
    for _ in range(reps):
        z = chain(z)
    float(z[(0,) * z.ndim])
    return time.perf_counter() - t0


def main():
    from webgpufft_tpu.core import axis as A

    rng = np.random.default_rng(0)
    rows = []
    unroll, reps, trials = 4, 3, 5
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

        cm, cv = _chain(via_mid, unroll), _chain(via_move, unroll)
        t_mid, t_move = [], []
        for _ in range(trials):                     # strictly alternating
            t_mid.append(_time_once(cm, x, reps))
            t_move.append(_time_once(cv, x, reps))
        per = 1.0 / (reps * unroll)
        row = {"bench": "fourstep_mid_alt", "n0": n0, "L": L, "batch": b,
               "mid_ms": min(t_mid) * per * 1e3,
               "moveaxis_ms": min(t_move) * per * 1e3,
               "mid_ms_med": sorted(t_mid)[trials // 2] * per * 1e3,
               "moveaxis_ms_med": sorted(t_move)[trials // 2] * per * 1e3,
               "speedup": min(t_move) / max(min(t_mid), 1e-12),
               "backend": jax.devices()[0].platform,
               "ts": time.strftime("%Y-%m-%dT%H:%M:%S")}
        rows.append(row)
        print(json.dumps(row), flush=True)

    with open("benches/results_r3.jsonl", "a") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
