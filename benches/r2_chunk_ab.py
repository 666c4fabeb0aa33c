#!/usr/bin/env python
"""A/B chunked vs unchunked execution past the old operand bound, plus
correctness validation up to 2^25 complex elements, round-robin in one
session (follow-up to r2_operand_bound_probe: the 2^24 miscompile is gone
on this stack; decide the new CHUNK_ELEMS).

Run to completion: nohup python benches/r2_chunk_ab.py > log &
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
    from webgpufft_tpu.plans import transforms as T
    from webgpufft_tpu.core import axis as A
    from webgpufft_tpu.runtime import profile

    rng = np.random.default_rng(0)

    # correctness at 2^25 (the probe crashed on a barrier bug before this)
    T.CHUNK_ELEMS = 1 << 30
    A.OPERAND_CHUNK_ELEMS = 1 << 30
    n, batch = 4096, 8192
    z = (rng.standard_normal((batch, n))
         + 1j * rng.standard_normal((batch, n))).astype(np.complex64)
    x = jnp.asarray(np.stack([z.real, z.imag], -1).astype(np.float32))
    plan_u = W.create_plan(type="c2c", shape=[n], batch=batch,
                          tuning={"impl": "xla"}, cache=W.PlanCache())
    y = np.asarray(plan_u(x))
    rows = np.linspace(0, batch - 1, 16, dtype=int)
    ref = np.fft.fft(z[rows], axis=1)
    got = y[rows, :, 0] + 1j * y[rows, :, 1]
    err = float(np.max(np.abs(got - ref)) / np.max(np.abs(ref)))
    emit(kind="correctness", operand_elems_log2=25, rel_err=err, ok=err < 1e-5)
    del y, z, x

    # A/B at 2^24 (the worst suite row): chunked vs unchunked, round-robin
    n, batch = 4096, 4096
    x = jnp.asarray(rng.standard_normal((batch, n, 2)).astype(np.float32))
    plan_u = W.create_plan(type="c2c", shape=[n], batch=batch,
                          tuning={"impl": "xla"}, cache=W.PlanCache())
    T.CHUNK_ELEMS = 1 << 22
    A.OPERAND_CHUNK_ELEMS = 1 << 22
    plan_c = W.create_plan(type="c2c", shape=[n], batch=batch,
                          tuning={"impl": "xla"}, cache=W.PlanCache())
    assert any("chunk" in r for r in plan_c.route.reasons)
    tu, tc, ceil = [], [], []
    for _ in range(3):
        tu.append(profile.unrolled_chain_time(plan_u, x, unroll=4, reps=6))
        tc.append(profile.unrolled_chain_time(plan_c, x, unroll=4, reps=6))
        ceil.append(profile.measured_copy_ceiling_gbps(x, unroll=4, reps=4))
    bytes_app = 2 * x.size * 4
    emit(kind="ab", config="c2c_4096_b4096_2pow24",
         unchunked_ms=round(min(tu) * 1e3, 4), chunked_ms=round(min(tc) * 1e3, 4),
         speedup=round(min(tc) / min(tu), 3),
         unchunked_gbps=round(bytes_app / min(tu) / 1e9, 1),
         copy_ceiling=round(max(ceil), 1))
    emit(done=True)


if __name__ == "__main__":
    main()
