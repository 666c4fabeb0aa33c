#!/usr/bin/env python
"""Overlap-save block-length sweep (round-3 suggestion executed early):
B in {4096, 8192, 16384} at n=2^20 b=1 k=129 circular, alternating
best-of trials, correctness-gated.

Run to completion, never under timeout:
    nohup python benches/r3g_os_block_sweep.py > /tmp/r3g.log 2>&1 &
"""

import json
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/benches/", 1)[0])


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    import jax.numpy as jnp

    import webgpufft_tpu as W
    from webgpufft_tpu.runtime import profile
    from webgpufft_tpu.core.cplx import interleave, uninterleave
    from webgpufft_tpu.utils import mathref as R

    rng = np.random.default_rng(0)
    n, batch, k = 1 << 20, 1, 129
    z = (rng.standard_normal((batch, n))
         + 1j * rng.standard_normal((batch, n))).astype(np.complex64)
    x = jnp.asarray(interleave(z).astype(np.float32))
    kk = rng.standard_normal(k) + 1j * rng.standard_normal(k)
    ki = jnp.asarray(interleave(kk))

    plans = {}
    for B in (4096, 8192, 16384):
        plans[B] = W.create_plan(
            type="fftconv", shape=[n], batch=batch,
            fftConv={"boundary": "circular", "kernelShape": [k],
                     "tuning": {"overlapSave": "on", "overlapBlock": B}},
            cache=W.PlanCache())
        assert plans[B].route.mode == "overlap-save"

    # correctness gate at a reduced size per block length
    ref = R.fftconv(z[:, :16384], kk, [16384], batch=1,
                    boundary="circular", kernel_shape=[k])
    for B in plans:
        pr = W.create_plan(type="fftconv", shape=[16384], batch=1,
                           fftConv={"boundary": "circular",
                                    "kernelShape": [k],
                                    "tuning": {"overlapSave": "on",
                                               "overlapBlock": min(B, 8192)}},
                           cache=W.PlanCache())
        y = uninterleave(np.asarray(
            pr.exec(jnp.asarray(interleave(z[:1, :16384])), kernel=ki)))
        err = float(np.max(np.abs(y - ref)) / np.max(np.abs(ref)))
        emit(check=B, rel_err=err)
        assert err < 1e-5

    fns = {B: (lambda v, p=p: p._fn(p._consts, v, p._coerce_kernel(ki)))
           for B, p in plans.items()}
    results = {B: [] for B in fns}
    for trial in range(3):
        for B, fn in fns.items():
            t = profile.unrolled_chain_time(fn, x, unroll=4, reps=6)
            results[B].append(t * 1e3)
            emit(bench="osB_sweep_2pow20", block=B, trial=trial,
                 ms=round(t * 1e3, 4))
    best = {str(B): min(v) for B, v in results.items()}
    emit(bench="osB_sweep_2pow20", best=best)


if __name__ == "__main__":
    main()
