#!/usr/bin/env python
"""A/B the four-step route vs the generic einsum recursion around the
fourStepMinN threshold, round-robin in one session (round-2 follow-up to
the route landing; decides whether 2^18 is the right default).

Run to completion: nohup python benches/r2_fourstep_threshold.py > log &
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

    rng = np.random.default_rng(0)
    for exp in (16, 17, 18, 20):
        n = 1 << exp
        batch = max(1, (1 << 22) // n)  # keep total work comparable
        x = jnp.asarray(rng.standard_normal((batch, n, 2)).astype(np.float32))
        four = W.create_plan(type="c2c", shape=[n], batch=batch,
                            tuning={"fourStepMinN": n}, cache=W.PlanCache())
        gen = W.create_plan(type="c2c", shape=[n], batch=batch,
                           tuning={"largeRoute": "chunk"}, cache=W.PlanCache())
        assert four.route.mode == "four-step-hbm", four.route
        assert gen.route.mode == "xla", gen.route
        t4, tg, ceil = [], [], []
        for _ in range(3):
            t4.append(profile.unrolled_chain_time(four, x, unroll=4, reps=8))
            tg.append(profile.unrolled_chain_time(gen, x, unroll=4, reps=8))
            ceil.append(profile.measured_copy_ceiling_gbps(x, unroll=4, reps=4))
        bytes_app = 2 * x.size * 4
        emit(n=f"2^{exp}", batch=batch,
             four_ms=round(min(t4) * 1e3, 4), gen_ms=round(min(tg) * 1e3, 4),
             speedup=round(min(tg) / min(t4), 3),
             four_gbps=round(bytes_app / min(t4) / 1e9, 1),
             gen_gbps=round(bytes_app / min(tg) / 1e9, 1),
             copy_ceiling=round(max(ceil), 1))
    emit(done=True)


if __name__ == "__main__":
    main()
