#!/usr/bin/env python
"""Minimal TPU-tunnel health probe: init backend, run one tiny op, force
completion with a scalar readback (block_until_ready lies through the
tunnel — CLAUDE.md rule 2).  Prints one JSON line; exit 0 iff the default
backend is a live TPU.  Used by the round-5 session watcher scripts."""

import json
import sys
import time

t0 = time.time()
try:
    import jax
    import jax.numpy as jnp

    devs = jax.devices()
    backend = devs[0].platform
    x = jnp.ones((256,), jnp.float32)
    y = float(jnp.sum(x))
    rec = {
        "ok": backend == "tpu" and abs(y - 256.0) < 1e-6,
        "backend": backend,
        "init_s": round(time.time() - t0, 1),
        "y": y,
        "ndev": len(devs),
    }
except Exception as e:  # noqa: BLE001 - report any init failure
    rec = {"ok": False, "err": repr(e)[:200],
           "init_s": round(time.time() - t0, 1)}
print(json.dumps(rec))
sys.exit(0 if rec.get("ok") else 1)
