#!/usr/bin/env python
"""Pinpoint the fused Pallas FFT kernel's in-kernel cost (round-2, VERDICT #4).

Builds kernels that stop at successive points of the v1 pipeline — copy,
stage-A dots, +twiddle, +stage-B dot, +digit-reversal transposes, +perm
matmul (= full) — all with identical I/O traffic, timed round-robin.  The
deltas attribute the 1.6 ms in-kernel overhead measured in
r2_perf_experiments (fused 2.06 ms vs pallas-copy 0.39 ms vs XLA 0.60 ms).

Run to completion: nohup python benches/r2_pallas_probe.py > log 2>&1 &
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from webgpufft_tpu.core import fused
    from webgpufft_tpu.runtime import profile

    hi = jax.lax.Precision.HIGHEST
    rng = np.random.default_rng(0)
    n, batch = 1024, 4096
    n1, n2 = fused.choose_split(n)
    tb = 64
    cc = fused.fused_consts(n, "forward", 1.0, "p")
    f2re = jnp.asarray(cc["p/f2re"])
    f2im = jnp.asarray(cc["p/f2im"])
    ta1 = jnp.asarray(cc["p/ta1"])
    tb1 = jnp.asarray(cc["p/tb1"])
    g1 = jnp.asarray(cc["p/g1"])
    pil = jnp.asarray(cc["p/pil"])
    x = jnp.asarray(rng.standard_normal((batch, n2, 2 * n1)).astype(np.float32))

    def swapadj(z):
        even = (jax.lax.broadcasted_iota(jnp.int32, z.shape, z.ndim - 1) % 2) == 0
        return jnp.where(even, jnp.roll(z, -1, axis=-1), jnp.roll(z, 1, axis=-1))

    def sgn(shape, dtype):
        lane = jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)
        return jnp.where(lane % 2 == 0, -1.0, 1.0).astype(dtype)

    def make(stage):
        def kern(x_ref, f2re_ref, f2im_ref, ta_ref, tb_ref, g1_ref, pil_ref,
                 o_ref):
            v = x_ref[:]
            if stage >= 1:
                dn = (((1,), (0,)), ((), ()))
                p = jnp.swapaxes(
                    jax.lax.dot_general(v, f2re_ref[:], dn, precision=hi), 1, 2)
                q = jnp.swapaxes(
                    jax.lax.dot_general(v, f2im_ref[:], dn, precision=hi), 1, 2)
                v = p + swapadj(q) * sgn(q.shape, q.dtype)
            if stage >= 2:
                v = v * ta_ref[:] + swapadj(v) * tb_ref[:]
            if stage >= 3:
                v = jnp.einsum("bkj,jl->bkl", v, g1_ref[:], precision=hi)
            if stage >= 4:
                vre = jnp.swapaxes(v[:, :, :n1], 1, 2)
                vim = jnp.swapaxes(v[:, :, n1:], 1, 2)
                v = jnp.concatenate([vre, vim], axis=-1)
            if stage >= 5:
                v = jax.lax.dot_general(v, pil_ref[:], (((2,), (0,)), ((), ())),
                                        precision=hi)
            o_ref[:] = v.reshape(o_ref.shape)

        call = pl.pallas_call(
            kern,
            grid=(batch // tb,),
            in_specs=[
                pl.BlockSpec((tb, n2, 2 * n1), lambda i: (i, 0, 0)),
                pl.BlockSpec((n2, n2), lambda i: (0, 0)),
                pl.BlockSpec((n2, n2), lambda i: (0, 0)),
                pl.BlockSpec((n2, 2 * n1), lambda i: (0, 0)),
                pl.BlockSpec((n2, 2 * n1), lambda i: (0, 0)),
                pl.BlockSpec((2 * n1, 2 * n1), lambda i: (0, 0)),
                pl.BlockSpec((2 * n2, 2 * n2), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((tb, n2, 2 * n1), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
        )
        return lambda v: call(v, f2re, f2im, ta1, tb1, g1, pil)

    stages = {f"S{k}-" + lbl: make(k) for k, lbl in enumerate(
        ["copy", "stageA", "twiddle", "stageB", "revtranspose", "perm-full"])}

    # warm + smoke each
    for name, fn in stages.items():
        y = fn(x)
        float(jnp.sum(y.ravel()[:1]))
        emit(kind="compiled", variant=name)

    results = {k: [] for k in stages}
    for rnd in range(3):
        for name, fn in stages.items():
            results[name].append(profile.unrolled_chain_time(
                fn, x, unroll=8, reps=10))
    prev = None
    for name, dts in results.items():
        dt = min(dts)
        gbps = 2 * x.size * 4 / dt / 1e9
        emit(kind="stage", variant=name, ms=round(dt * 1e3, 4),
             gbps=round(gbps, 1),
             delta_ms=None if prev is None else round((dt - prev) * 1e3, 4))
        prev = dt

    emit(kind="done")


if __name__ == "__main__":
    main()
