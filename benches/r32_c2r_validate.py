#!/usr/bin/env python
"""Post-fix validation of the flagship c2r config (256^3 b=6), which the
unrolled batch-chunk route silently miscompiled on TPU (r31: rel=1.43).
After the lax.map fix (plans/transforms.maybe_chunk_core) this must pass.

Run to completion (never under timeout):
  nohup python benches/r32_c2r_validate.py > benches/logs/r5/r32.log 2>&1 &
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    import webgpufft_tpu as W

    print(f"# backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    n, b = 256, 6
    p = n // 2 + 1
    xr = rng.standard_normal((b, n, n, n)).astype(np.float32)
    xsp = np.fft.fftn(np.asarray(xr, np.float64), axes=(1, 2, 3))[:, :p]
    xp_np = np.stack([xsp.real, xsp.imag], axis=-1).astype(np.float32)
    plan = W.create_plan(type="c2r", shape=[n, n, n], batch=b,
                         direction="inverse", normalize="backward")
    yk = np.asarray(plan.exec(jnp.asarray(xp_np)), np.float64)
    r = (np.max(np.abs(yk - np.asarray(xr, np.float64)))
         / np.max(np.abs(xr)))
    print(f"# lib_c2r_b6: rel={r:.3e} route={plan.route.reasons} "
          f"{'FAIL' if r > 1e-5 else 'ok'}", flush=True)
    print("# done", flush=True)


if __name__ == "__main__":
    main()
