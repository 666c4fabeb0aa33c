#!/usr/bin/env python
"""Standing healthy-window harvester for the headline c2c-1024 row.

The tunneled chip's throughput swings 60-420 GB/s on a minute scale; the
>=70%-of-roofline BASELINE claim is only falsifiable in a >=300 GB/s
window, and round artifacts captured in degraded windows systematically
under-report the program (VERDICT r3 missing #2).  This watcher wakes
every WATCH_SLEEP seconds, probes the copy ceiling with ONE cheap bounded
measurement, and — only when the window is healthy — times the headline
transform and appends the tagged capture to benches/healthy_roofline.jsonl
(the file bench.py surfaces as ``best_healthy`` in the driver artifact).

Bounded by WATCH_ITERS wake-ups and stops early after WATCH_HITS healthy
captures.  Per wake-up device work is tens of dispatches (CLAUDE.md rule 3).

Run to completion (never under timeout):
  nohup python benches/healthy_watcher.py > benches/logs/watcher.log 2>&1 &
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(HERE, "benches", "healthy_roofline.jsonl")

WATCH_ITERS = int(os.environ.get("WATCH_ITERS", "40"))
WATCH_HITS = int(os.environ.get("WATCH_HITS", "6"))
WATCH_SLEEP = float(os.environ.get("WATCH_SLEEP", "180"))
HEALTHY_GBPS = 300.0


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    import webgpufft_tpu as W
    from webgpufft_tpu.runtime import profile

    backend = jax.default_backend()
    print(f"# watcher backend={backend}", flush=True)
    if backend != "tpu":
        print("# not on tpu; exiting", flush=True)
        return

    n, batch = 1024, 4096
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, n, 2)).astype(np.float32))
    plan = W.create_plan({"type": "c2c", "shape": [n], "batch": batch,
                          "direction": "forward", "normalize": "unitary"},
                         cache=W.PlanCache())
    fn = lambda v: plan._fn(plan._consts, v)  # noqa: E731
    spec_roof = profile.device_hbm_gbps()
    min_bytes = profile.fft_min_bytes(n, batch)

    # warm the compile once so healthy windows are spent measuring —
    # use the SAME fixed-depth stream programs the capture path uses
    # (a pilot-scaled depth would compile a different chain per call)
    _ = profile.hbm_stream_time(fn, x, depth=64, reps=1)

    hits = 0
    for it in range(WATCH_ITERS):
        try:
            ceil = profile.measured_copy_ceiling_gbps(x, unroll=4, reps=4)
        except Exception as ex:
            print(f"# it{it} ceiling probe failed: {ex!r}"[:160], flush=True)
            time.sleep(WATCH_SLEEP)
            continue
        if ceil < HEALTHY_GBPS:
            print(f"# it{it} degraded ({ceil:.0f} GB/s); sleeping", flush=True)
            time.sleep(WATCH_SLEEP)
            continue
        # healthy window: measure the headline NOW, best of 2 quick trials
        # (HBM-stream protocol — cancels the ~26 ms per-dispatch tunnel
        # overhead AND forces the 33 MB subject out of VMEM residency;
        # benches/r16_protocol.py)
        dts = []
        for _ in range(2):
            dts.append(profile.hbm_stream_time(fn, x, depth=64, reps=4))
        dt = min(dts)
        gb = min_bytes / dt / 1e9
        rec = {"healthy_session": True, "bench": "headline",
               "protocol": "v2",
               "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
               "metric": "c2c1024_pct_hbm_roofline",
               "value": round(100 * gb / spec_roof, 2),
               "pct_copy_ceiling": round(100 * gb / max(ceil, gb), 2),
               "copy_ceiling_gbps": round(max(ceil, gb), 1),
               "avg_ms": round(dt * 1e3, 4),
               "eff_gbps": round(gb, 1),
               "route": plan.route.mode, "backend": backend,
               "source": "healthy_watcher"}
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
        hits += 1
        print(f"# it{it} HEALTHY {ceil:.0f} GB/s -> headline {gb:.0f} GB/s "
              f"({rec['pct_copy_ceiling']}% of copy) [{hits}/{WATCH_HITS}]",
              flush=True)
        if hits >= WATCH_HITS:
            break
        time.sleep(WATCH_SLEEP)
    print(f"# watcher done: {hits} healthy captures", flush=True)


if __name__ == "__main__":
    main()
