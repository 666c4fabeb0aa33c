#!/usr/bin/env python
"""Re-validate the einsum-operand miscompile bound on the current stack.

Round 1 observed silent miscompilation for einsum operands >= 2^24 complex
elements (CLAUDE.md pitfall; CHUNK_ELEMS=2^22 chunks well under it).  The
stack has moved (Pallas streaming changed between rounds) — this probe runs
the production c2c pipeline UNCHUNKED at operand sizes 2^22..2^25 and
checks rows against numpy.  If the bug is gone, CHUNK_ELEMS can rise and
the chunking overhead on 2^23+-element plans disappears.

Run to completion: nohup python benches/r2_operand_bound_probe.py > log &
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

    # lift the chunking bound for this process so the core runs unchunked
    T.CHUNK_ELEMS = 1 << 30
    A.OPERAND_CHUNK_ELEMS = 1 << 30

    for n, batch in ((1024, 4096), (4096, 2048), (4096, 4096),
                     (4096, 8192), (1024, 32768)):
        elems = n * batch
        z = (rng.standard_normal((batch, n))
             + 1j * rng.standard_normal((batch, n))).astype(np.complex64)
        x = jnp.asarray(np.stack([z.real, z.imag], -1).astype(np.float32))
        plan = W.create_plan(type="c2c", shape=[n], batch=batch,
                            tuning={"impl": "xla"}, cache=W.PlanCache())
        assert not any("chunk" in r for r in plan.route.reasons), plan.route
        y = np.asarray(plan(x))
        got = y[..., 0] + 1j * y[..., 1]
        # spot-check a spread of rows against numpy (full ref is fine too
        # but rows keep host time bounded)
        rows = np.linspace(0, batch - 1, 32, dtype=int)
        ref = np.fft.fft(z[rows], axis=1)
        err = float(np.max(np.abs(got[rows] - ref)) / np.max(np.abs(ref)))
        dt = profile.unrolled_chain_time(plan, x, unroll=4, reps=6)
        emit(n=n, batch=batch, operand_elems_log2=round(np.log2(elems), 1),
             rel_err=err, ok=err < 1e-5, unchunked_ms=round(dt * 1e3, 4),
             eff_gbps=round(2 * elems * 8 / dt / 1e9, 1))
    emit(done=True)


if __name__ == "__main__":
    main()
