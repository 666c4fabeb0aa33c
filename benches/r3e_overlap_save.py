#!/usr/bin/env python
"""On-chip A/B: overlap-save vs the standard fftShape pipeline for long
1-D convolution with a short kernel.

Config: circular boundary (shape-preserving, so the unrolled chain
composes), n in {2^18, 2^20}, k=129, batch 1 and 4.  Alternating
best-of trials per the house methodology; correctness-gated first.

Run to completion, never under timeout:
    nohup python benches/r3e_overlap_save.py > /tmp/r3e.log 2>&1 &
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/benches/", 1)[0])


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    import jax
    import jax.numpy as jnp

    import webgpufft_tpu as W
    from webgpufft_tpu.runtime import profile
    from webgpufft_tpu.utils import mathref as R
    from webgpufft_tpu.core.cplx import interleave, uninterleave

    rng = np.random.default_rng(0)
    k = 129
    kk = rng.standard_normal(k) + 1j * rng.standard_normal(k)
    ki = jnp.asarray(interleave(kk))

    for n, batch in ((1 << 18, 4), (1 << 20, 1), (1 << 20, 4)):
        z = (rng.standard_normal((batch, n))
             + 1j * rng.standard_normal((batch, n))).astype(np.complex64)
        x = jnp.asarray(interleave(z).astype(np.float32))

        plans = {}
        for name, tun in (("standard", {"overlapSave": "off"}),
                          ("overlap-save", {"overlapSave": "auto"}),
                          ("os-32k", {"overlapSave": "on",
                                      "overlapBlock": 32768})):
            plans[name] = W.create_plan(
                type="fftconv", shape=[n], batch=batch,
                fftConv={"boundary": "circular", "kernelShape": [k],
                         "tuning": tun},
                cache=W.PlanCache())
        assert plans["overlap-save"].route.mode == "overlap-save", \
            plans["overlap-save"].route
        assert plans["standard"].route.mode != "overlap-save"

        # correctness gate (small slice of the oracle is enough at 2^20)
        ref = R.fftconv(z[:1, :4096], kk, [4096], batch=1,
                        boundary="circular", kernel_shape=[k])
        for name, p in plans.items():
            pr = W.create_plan(type="fftconv", shape=[4096], batch=1,
                               fftConv={"boundary": "circular",
                                        "kernelShape": [k],
                                        "tuning": {"overlapSave":
                                                   "on" if name != "standard"
                                                   else "off"}},
                               cache=W.PlanCache())
            y = uninterleave(np.asarray(
                pr.exec(jnp.asarray(interleave(z[:1, :4096])), kernel=ki)))
            err = np.max(np.abs(y - ref)) / np.max(np.abs(ref))
            emit(check=name, n=4096, rel_err=float(err))
            assert err < 1e-5, (name, err)

        fns = {name: (lambda v, p=p: p._fn(p._consts, v, p._coerce_kernel(ki)))
               for name, p in plans.items()}
        # warm both jits before timing
        results = {name: [] for name in fns}
        unroll = 4 if n >= (1 << 20) else 6
        for trial in range(3):
            for name, fn in fns.items():
                t = profile.unrolled_chain_time(fn, x, unroll=unroll, reps=6)
                results[name].append(t * 1e3)
                emit(bench=f"osAB_n{n}_b{batch}", variant=name, trial=trial,
                     ms=round(t * 1e3, 4))
        best = {name: min(v) for name, v in results.items()}
        emit(bench=f"osAB_n{n}_b{batch}", best=best,
             speedup=round(best["standard"] / best["overlap-save"], 3))


if __name__ == "__main__":
    main()
