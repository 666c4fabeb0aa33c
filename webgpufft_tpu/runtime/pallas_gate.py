"""One-command Pallas-vs-XLA decision gate (VERDICT r2 #3b).

Runs the fused Pallas kernel against the production XLA pipeline on the
eligible headline configs, verifies accuracy against numpy, and writes
the verdict to ``runtime/pallas_gate.json`` — which ``impl:"auto"``
consults at plan build (runtime/policy.load_pallas_gate).  The day a
stack bump makes Mosaic stream at XLA rates, this re-probe flips the
recorded winner and auto routes to the fused kernel with no code change
(the ~1.5x win measured as waiting there: Pallas copy floor 0.39 ms vs
XLA 0.61 ms on c2c-1024 b4096, docs/PERFORMANCE.md).

Run at the top of each round on the real TPU, to completion:
    nohup python -m webgpufft_tpu.runtime.pallas_gate > /tmp/gate.log 2>&1 &
Also appends the measurement rows to benches/results_r3.jsonl when run
from the repo root.
"""

from __future__ import annotations

import json
import os
import time

# flip only on a clear win: the gate compares best-of trials through a
# tunnel whose throughput swings between minutes
FLIP_MARGIN = 1.05
ACCURACY_BAR = 1e-5


def run_gate(configs=((1024, 4096), (4096, 4096)), trials=3,
             write=True) -> dict:
    import numpy as np

    import jax
    import jax.numpy as jnp

    import webgpufft_tpu as W
    from . import profile
    from .policy import _PALLAS_GATE_CACHE

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    unroll = 8 if on_tpu else 2
    reps = 8 if on_tpu else 2
    rng = np.random.default_rng(0)
    rows = []
    flip_votes = []
    for n, batch in configs:
        x = jnp.asarray(rng.standard_normal((batch, n, 2)).astype(np.float32))
        t: dict = {}
        acc_ok = True
        for impl in ("xla", "pallas"):
            try:
                plan = W.create_plan(
                    {"type": "c2c", "shape": [n], "batch": batch,
                     "normalize": "unitary", "tuning": {"impl": impl}},
                    cache=W.PlanCache())
            except Exception as e:
                t[impl] = None
                rows.append({"n": n, "batch": batch, "impl": impl,
                             "error": str(e)[:200]})
                continue
            if impl == "pallas":
                y = np.asarray(plan(x))[:4]
                z = np.asarray(x[:4, :, 0]) + 1j * np.asarray(x[:4, :, 1])
                ref = np.fft.fft(z, axis=-1) / np.sqrt(n)
                got = y[..., 0] + 1j * y[..., 1]
                err = float(np.max(np.abs(got - ref))
                            / max(np.max(np.abs(ref)), 1e-12))
                acc_ok = err < ACCURACY_BAR
            best = float("inf")
            for _ in range(trials):
                best = min(best, profile.unrolled_chain_time(
                    lambda v: plan._fn(plan._consts, v), x,
                    unroll=unroll, reps=reps))
            t[impl] = best
        if t.get("xla") and t.get("pallas"):
            speedup = t["xla"] / t["pallas"]
            rows.append({"n": n, "batch": batch,
                         "xla_ms": round(t["xla"] * 1e3, 4),
                         "pallas_ms": round(t["pallas"] * 1e3, 4),
                         "speedup": round(speedup, 3),
                         "accuracy_ok": acc_ok})
            flip_votes.append(speedup >= FLIP_MARGIN and acc_ok)
        else:
            flip_votes.append(False)
    winner = "pallas" if flip_votes and all(flip_votes) else "xla"
    speedups = [r["speedup"] for r in rows if "speedup" in r]
    verdict = {
        "winner": winner,
        "speedup": round(min(speedups), 3) if speedups else 0.0,
        "backend": backend,
        "measured": rows,
        "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "source": "python -m webgpufft_tpu.runtime.pallas_gate",
    }
    if write:
        path = os.path.join(os.path.dirname(__file__), "pallas_gate.json")
        with open(path, "w") as f:
            json.dump(verdict, f, indent=2)
            f.write("\n")
        _PALLAS_GATE_CACHE.clear()
        results = os.path.join(os.getcwd(), "benches", "results_r3.jsonl")
        if os.path.isdir(os.path.dirname(results)):
            with open(results, "a") as f:
                f.write(json.dumps({"bench": "pallas_gate", **verdict}) + "\n")
    return verdict


if __name__ == "__main__":
    print(json.dumps(run_gate(), indent=2))
