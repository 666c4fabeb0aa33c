#!/usr/bin/env python
"""Can overlap-save win the chunk-forced config (n=2^20 b=4) if its
operand budget is raised to 2^24 (re-validated safe to 2^25 on this
stack, benches/r2_operand_bound_probe.py)?

Variants at n=2^20 b=4 k=129 circular:
  standard    — the four-step fftShape pipeline (today's auto winner)
  os-grouped  — overlap-save under the 2^22 bound (serialized groups)
  os-bigbound — overlap-save with CHUNK_ELEMS patched to 2^24 (unchunked)

os-bigbound is correctness-checked against the host oracle at FULL size
before timing (this is exactly the operand regime the old miscompile
lived in — a silent wrong answer here must gate the promotion).

Run to completion, never under timeout:
    nohup python benches/r3f_os_bigbound.py > /tmp/r3f.log 2>&1 &
"""

import json
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/benches/", 1)[0])


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    import jax
    import jax.numpy as jnp

    import webgpufft_tpu as W
    import webgpufft_tpu.plans.transforms as T
    from webgpufft_tpu.runtime import profile
    from webgpufft_tpu.core.cplx import interleave, uninterleave

    rng = np.random.default_rng(0)
    n, batch, k = 1 << 20, 4, 129
    z = (rng.standard_normal((batch, n))
         + 1j * rng.standard_normal((batch, n))).astype(np.complex64)
    kk = rng.standard_normal(k) + 1j * rng.standard_normal(k)
    x = jnp.asarray(interleave(z).astype(np.float32))
    ki = jnp.asarray(interleave(kk))

    def mkplan(knob, budget):
        old = T.CHUNK_ELEMS
        T.CHUNK_ELEMS = budget
        try:
            return W.create_plan(
                type="fftconv", shape=[n], batch=batch,
                fftConv={"boundary": "circular", "kernelShape": [k],
                         "tuning": {"overlapSave": knob}},
                cache=W.PlanCache())
        finally:
            T.CHUNK_ELEMS = old

    plans = {
        "standard": mkplan("off", 1 << 22),
        "os-grouped": mkplan("on", 1 << 22),
        "os-bigbound": mkplan("on", 1 << 24),
    }
    for name, p in plans.items():
        emit(variant=name, route=p.route.mode,
             reasons=[r for r in p.route.reasons if r.startswith("os-")])

    # FULL-SIZE correctness gate for the big-operand variant (host oracle
    # via numpy fft at the padded length; circular k<n)
    kf = np.fft.fft(np.concatenate([kk, np.zeros(n - k)]))
    ref = np.fft.ifft(np.fft.fft(z, axis=-1) * kf, axis=-1)
    for name in ("os-bigbound", "standard"):
        y = uninterleave(np.asarray(plans[name].exec(x, kernel=ki)))
        err = float(np.max(np.abs(y - ref)) / np.max(np.abs(ref)))
        emit(check=name, n=n, batch=batch, rel_err=err)
        assert err < 1e-4, (name, err)

    fns = {name: (lambda v, p=p: p._fn(p._consts, v, p._coerce_kernel(ki)))
           for name, p in plans.items()}
    results = {name: [] for name in fns}
    for trial in range(3):
        for name, fn in fns.items():
            t = profile.unrolled_chain_time(fn, x, unroll=4, reps=6)
            results[name].append(t * 1e3)
            emit(bench=f"osBB_n{n}_b{batch}", variant=name, trial=trial,
                 ms=round(t * 1e3, 4))
    best = {name: min(v) for name, v in results.items()}
    emit(bench=f"osBB_n{n}_b{batch}", best=best,
         speedup_vs_standard=round(best["standard"] / best["os-bigbound"], 3))


if __name__ == "__main__":
    main()
