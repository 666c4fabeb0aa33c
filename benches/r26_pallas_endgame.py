#!/usr/bin/env python
"""Pallas endgame probes (VERDICT r4 weak #5): the two untried ideas.

Context: the fused VMEM kernel is correct but runs 0.35x of XLA
(pallas_gate.json); r12 showed a manual-DMA copy TIES the ~130 GB/s
Mosaic block-pipeline cap, so the kernel's ~33 GB/s is in-KERNEL stalls,
not DMA.  If a variant reaches the 130 GB/s pipeline cap, the fused
one-read-one-write kernel at n=1024 b=4096 costs 67 MB / 130 GB/s
= 0.52 ms — BELOW XLA's 0.71 ms — and the gate flips.  Ideas:

- ``alias``: input_output_aliases donation (in-place tile update) —
  removes the separate output allocation / write stream.
- ``split``: lane-packed re/im-SPLIT layout — replaces every
  Mosaic-hostile lane shuffle (adjacent-lane roll/where, component
  G-matrix tricks) with plain matmuls on (TB, N1, N2) planes plus two
  minor-dim transposes.  ``split_pre`` takes pre-split planes (pure
  kernel ceiling); ``split_il`` de/re-interleaves in-kernel via 0/1
  permutation matmuls (the honest drop-in variant).
- ``copy``: pure block-pipeline copy (re-confirm the cap this session).

Legs emit per-application ms for n=1024 b=4096 (67 MB in+out) plus the
same-session XLA plan time; vs_xla < 1 means Pallas wins.

Run to completion (never under timeout):
  nohup python benches/r26_pallas_endgame.py > benches/logs/r5/r26.log 2>&1 &
"""

import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "benches", "results_r5.jsonl")

TRIALS = int(os.environ.get("R26_TRIALS", "2"))
HI = jax.lax.Precision.HIGHEST


def emit(row):
    row = {"bench": f"r26_pallas/{row.pop('leg')}", "protocol": "v2", **row}
    print(json.dumps(row), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")


# ---------------------------------------------------------------------------
# split-plane kernel
# ---------------------------------------------------------------------------

def _split_kernel(x_ref, w2re_ref, w2im_ref, tre_ref, tim_ref,
                  w1re_ref, w1im_ref, deint_ref, pil_ref, o_ref,
                  *, n1: int, n2: int, interleaved_io: bool):
    """Stage A/B as 8 plane matmuls; the only non-matmul data movement is
    two minor-dim transposes (digit reversal).  interleaved_io adds the
    de/re-interleave permutation matmuls at the ends."""
    if interleaved_io:
        x = x_ref[:]                                   # (TB, N2, 2N1) il
        xb = jax.lax.dot_general(x, deint_ref[:], (((2,), (0,)), ((), ())),
                                 precision=HI)         # block lanes
        xre = xb[:, :, :n1]                            # (TB, N2, N1)
        xim = xb[:, :, n1:]
    else:
        xre = x_ref[:, 0]                              # (TB, N2, N1)
        xim = x_ref[:, 1]
    dnA = (((1,), (0,)), ((), ()))                     # contract n2 rows
    w2re, w2im = w2re_ref[:], w2im_ref[:]
    are = (jax.lax.dot_general(xre, w2re, dnA, precision=HI)
           - jax.lax.dot_general(xim, w2im, dnA, precision=HI))
    aim = (jax.lax.dot_general(xre, w2im, dnA, precision=HI)
           + jax.lax.dot_general(xim, w2re, dnA, precision=HI))
    # (TB, N1, K2); twiddle T[n1, k2]
    tre, tim = tre_ref[:], tim_ref[:]
    bre = are * tre - aim * tim
    bim = are * tim + aim * tre
    dnB = (((1,), (0,)), ((), ()))                     # contract n1
    w1re, w1im = w1re_ref[:], w1im_ref[:]
    xre2 = (jax.lax.dot_general(bre, w1re, dnB, precision=HI)
            - jax.lax.dot_general(bim, w1im, dnB, precision=HI))
    xim2 = (jax.lax.dot_general(bre, w1im, dnB, precision=HI)
            + jax.lax.dot_general(bim, w1re, dnB, precision=HI))
    # (TB, K2, K1) -> (TB, K1, K2): the digit-reversal minor transpose
    yre = jnp.swapaxes(xre2, 1, 2)
    yim = jnp.swapaxes(xim2, 1, 2)
    if interleaved_io:
        w = jnp.concatenate([yre, yim], axis=-1)       # (TB, K1, 2K2 blk)
        o_ref[:] = jax.lax.dot_general(w, pil_ref[:], (((2,), (0,)), ((), ())),
                                       precision=HI)
    else:
        o_ref[:, 0] = yre
        o_ref[:, 1] = yim


def build_split(n, batch, tb, interleaved_io):
    from webgpufft_tpu.core import dft
    n1 = n2 = int(round(n ** 0.5))
    assert n1 * n2 == n
    w2 = dft.dft_matrix(n2, "forward")
    w1 = dft.dft_matrix(n1, "forward")
    tw = np.exp(-2j * np.pi *
                (np.outer(np.arange(n1), np.arange(n2)) % n) / n)
    deint = np.zeros((2 * n1, 2 * n1), np.float32)   # lane 2k+c -> c*n1+k
    for k in range(n1):
        for c in range(2):
            deint[2 * k + c, c * n1 + k] = 1.0
    pil = np.zeros((2 * n2, 2 * n2), np.float32)     # block -> interleaved
    for l in range(2 * n2):
        k2, c = l % n2, l // n2
        pil[l, 2 * k2 + c] = 1.0
    tables = [w2.real.astype(np.float32), w2.imag.astype(np.float32),
              tw.real.astype(np.float32), tw.imag.astype(np.float32),
              w1.real.astype(np.float32), w1.imag.astype(np.float32),
              deint, pil]
    tables = [jnp.asarray(t) for t in tables]
    kern = functools.partial(_split_kernel, n1=n1, n2=n2,
                             interleaved_io=interleaved_io)
    grid = (batch // tb,)
    interp = jax.default_backend() != "tpu"
    tspecs = [pl.BlockSpec(t.shape, lambda i: (0,) * t.ndim)
              for t in tables]
    if interleaved_io:
        in_spec = pl.BlockSpec((tb, n2, 2 * n1), lambda i: (i, 0, 0))
        out_spec = pl.BlockSpec((tb, n1, 2 * n2), lambda i: (i, 0, 0))
        out_shape = jax.ShapeDtypeStruct((batch, n1, 2 * n2), jnp.float32)
    else:
        in_spec = pl.BlockSpec((tb, 2, n2, n1), lambda i: (i, 0, 0, 0))
        out_spec = pl.BlockSpec((tb, 2, n1, n2), lambda i: (i, 0, 0, 0))
        out_shape = jax.ShapeDtypeStruct((batch, 2, n1, n2), jnp.float32)

    def fn(x):
        return pl.pallas_call(
            kern, grid=grid, in_specs=[in_spec] + tspecs,
            out_specs=out_spec, out_shape=out_shape, interpret=interp,
            compiler_params=None if interp else pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
            cost_estimate=pl.CostEstimate(
                flops=batch * n * (n1 + n2) * 8,
                bytes_accessed=2 * batch * n * 8, transcendentals=0),
        )(x, *tables)

    return fn, (n1, n2)


def _copy_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:]


def build_copy(batch, n, tb):
    interp = jax.default_backend() != "tpu"

    def fn(x):
        return pl.pallas_call(
            _copy_kernel, grid=(batch // tb,),
            in_specs=[pl.BlockSpec((tb, n, 2), lambda i: (i, 0, 0))],
            out_specs=pl.BlockSpec((tb, n, 2), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((batch, n, 2), jnp.float32),
            interpret=interp,
            compiler_params=None if interp else pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
        )(x)

    return fn


def main():
    from webgpufft_tpu.core import fused
    from webgpufft_tpu.runtime import profile
    from webgpufft_tpu.spec import TuningSpec
    import webgpufft_tpu as W

    backend = jax.default_backend()
    print(f"# backend={backend}", flush=True)
    rng = np.random.default_rng(0)
    n, batch = 1024, 4096
    tuning = TuningSpec()
    tb = fused.pick_batch_tile(batch, n, fused.DEFAULT_VMEM_BUDGET)
    print(f"# tile tb={tb}", flush=True)

    x = jnp.asarray(rng.standard_normal((batch, n, 2)), jnp.float32)
    zx = (np.asarray(x[..., 0], np.float64)
          + 1j * np.asarray(x[..., 1], np.float64))
    ref = np.fft.fft(zx, axis=1)

    def check_il(y3, label):
        # (batch, n1, 2n2) interleaved block lines -> flat interleaved
        y = np.asarray(y3, np.float64).reshape(batch, n, 2)
        got = y[..., 0] + 1j * y[..., 1]
        rel = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
        print(f"# {label} rel={rel:.3e}", flush=True)
        assert rel < 1e-5, (label, rel)

    # ---- current kernel + aliasing variant
    consts = {}
    cur = fused.build_fused_lines(n, batch, "forward", tuning, consts)
    cjs = {k: jnp.asarray(v) for k, v in consts.items()}
    n1, n2 = cur.split

    def cur_fn(v):
        return cur(v.reshape(batch, n, 2), cjs).reshape(v.shape)

    check_il(cur_fn(x).reshape(batch, n1, 2 * n2), "cur")

    # aliasing: rebuild the pallas_call with input_output_aliases via the
    # same tables (square split -> in/out block shapes match)
    prec = jax.lax.Precision.HIGHEST
    kern = functools.partial(fused._fft_kernel_v2, n1=n1, n2=n2,
                             precision=prec)
    interp = backend != "tpu"
    tbl = [cjs["fused/f2re"], cjs["fused/f2im"], cjs["fused/ta"],
           cjs["fused/tb"], cjs["fused/g1"], cjs["fused/pil"]]
    tspecs = [pl.BlockSpec(t.shape, lambda i: (0,) * t.ndim) for t in tbl]

    def alias_fn(v):
        xm = v.reshape(batch, n2, 2 * n1)
        out = pl.pallas_call(
            kern, grid=(batch // tb,),
            in_specs=[pl.BlockSpec((tb, n2, 2 * n1),
                                   lambda i: (i, 0, 0))] + tspecs,
            out_specs=pl.BlockSpec((tb, n1, 2 * n2), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((batch, n1, 2 * n2), jnp.float32),
            input_output_aliases={0: 0},
            interpret=interp,
            compiler_params=None if interp else pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            cost_estimate=pl.CostEstimate(
                flops=batch * n * (n1 + n2) * 8,
                bytes_accessed=2 * batch * n * 8, transcendentals=0),
        )(xm, *tbl)
        return out.reshape(v.shape)

    check_il(alias_fn(x).reshape(batch, n1, 2 * n2), "alias")

    # ---- split-plane kernels
    il_fn, _ = build_split(n, batch, tb, interleaved_io=True)

    def split_il(v):
        return il_fn(v.reshape(batch, n2, 2 * n1)).reshape(v.shape)

    check_il(split_il(x).reshape(batch, n1, 2 * n2), "split_il")

    pre_fn, _ = build_split(n, batch, tb, interleaved_io=False)
    xp = jnp.stack([x[..., 0].reshape(batch, n2, n1),
                    x[..., 1].reshape(batch, n2, n1)], axis=1)
    yp = np.asarray(pre_fn(xp), np.float64)
    got = (yp[:, 0] + 1j * yp[:, 1]).reshape(batch, n)
    rel = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
    print(f"# split_pre rel={rel:.3e}", flush=True)
    assert rel < 1e-5, rel

    def split_pre(v):
        return pre_fn(v)

    # ---- XLA reference plan (same session)
    plan = W.create_plan(type="c2c", shape=[n], batch=batch,
                         direction="forward", normalize="none")

    def xla_fn(v):
        return plan._fn(plan._consts, v.reshape(batch, n, 2)).reshape(v.shape)

    copy_fn = build_copy(batch, n, tb)

    if TRIALS == 0:
        print("# correctness-only run (R26_TRIALS=0)", flush=True)
        return

    legs = [("copy", copy_fn, x), ("xla", xla_fn, x), ("cur", cur_fn, x),
            ("alias", alias_fn, x), ("split_il", split_il, x),
            ("split_pre", split_pre, xp)]
    results = {name: [] for name, _f, _x in legs}
    ceilings = []
    for t in range(TRIALS):
        try:
            ceilings.append(profile.measured_copy_ceiling_gbps(
                x.reshape(batch, 2 * n), unroll=8, reps=4))
        except Exception as ex:
            print(f"# ceiling failed: {ex!r}"[:120], flush=True)
            ceilings.append(0.0)
        print(f"# trial{t} copy(v2)={ceilings[-1]:.0f} GB/s", flush=True)
        for name, fn, xin in legs:
            wrapped = (lambda f: lambda v: v * (
                1.0 + 1e-24 * jnp.mean(f(v))))(fn)
            try:
                dt = profile.hbm_stream_time(wrapped, xin, reps=4)
            except Exception as ex:
                print(f"#   {name} failed: {ex!r}"[:160], flush=True)
                continue
            results[name].append(dt)
            gb = 2 * batch * n * 8 / dt / 1e9
            print(f"#   {name}: {dt*1e3:.3f} ms ({gb:.0f} GB/s io)",
                  flush=True)

    ceiling = max(ceilings) if ceilings else 0.0
    xla_best = min(results.get("xla") or [float("inf")])
    for name, _f, _x in legs:
        if not results[name]:
            emit({"leg": name, "backend": backend, "error": True})
            continue
        best = min(results[name])
        emit({"leg": name, "backend": backend,
              "avg_ms": round(best * 1e3, 4),
              "io_gbps": round(2 * batch * n * 8 / best / 1e9, 1),
              "vs_xla": round(best / xla_best, 3),
              "copy_ceiling_gbps": round(ceiling, 1)})
    print("# done", flush=True)


if __name__ == "__main__":
    main()
