"""Roofline accounting + robust timing.

The reference only has a 5*N*log2(N) FLOP model (web/bench_runner.js:75-79);
BASELINE.md requires real roofline accounting: bytes moved per transform vs
HBM bandwidth.  This module provides both, plus a timing harness that forces
device completion via a scalar readback data dependency — necessary because
the tunneled TPU runtime's block_until_ready can return before execution
finishes, and unbounded async queues must be avoided.
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp

# Peak HBM bandwidth per chip, GB/s (TPU v5e: 819 GB/s).
HBM_GBPS = {
    "TPU v5 lite": 819.0,
    "TPU v5e": 819.0,
    "TPU v5p": 2765.0,
    "TPU v4": 1228.0,
    "cpu": 50.0,  # nominal, for dev runs only
}


def device_hbm_gbps() -> float:
    d = jax.devices()[0]
    kind = getattr(d, "device_kind", "cpu")
    for k, v in HBM_GBPS.items():
        if k.lower() in str(kind).lower():
            return v
    return HBM_GBPS.get("cpu", 50.0)


def fft_flops(n_total: int, batch: int) -> float:
    """The reference's FLOP model: 5*N*log2(N) per transform."""
    return 5.0 * n_total * math.log2(max(n_total, 2)) * batch


def fft_min_bytes(n_total: int, batch: int, bytes_per_elem: int = 8) -> float:
    """Minimum HBM traffic: read input once + write output once."""
    return 2.0 * n_total * batch * bytes_per_elem


@dataclass
class BenchResult:
    avg_ms: float
    gflops: float
    eff_gbps: float
    pct_roofline: float
    iters: int


def time_chained(fn: Callable, x, iters: int, *, warmup: int = 2) -> float:
    """Average seconds per call of ``fn`` with a serializing data dependency
    (y = fn(y)) and a scalar-readback completion barrier.

    ``fn`` must map an array to a same-shaped array.  The chain is bounded
    (no unbounded async queue) and the final float() readback cannot complete
    until every chained step has executed on device.
    """
    y = x
    for _ in range(warmup):
        y = fn(y)
    float(jnp.sum(y[..., :1, :1]))          # drain warmup

    # baseline: scalar readback cost without chained work
    t0 = time.perf_counter()
    float(jnp.sum(x[..., :1, :1]))
    t_rb = time.perf_counter() - t0

    y = x
    t0 = time.perf_counter()
    for _ in range(iters):
        y = fn(y)
    float(jnp.sum(y[..., :1, :1]))
    t_total = time.perf_counter() - t0
    # readback-cost subtraction can overshoot for very fast ops; never
    # attribute more than 80% of the wall time to the barrier
    return max(t_total - t_rb, 0.2 * t_total) / iters


def bench_transform(fn: Callable, x, n_total: int, batch: int,
                    iters: int = 30) -> BenchResult:
    dt = time_chained(fn, x, iters)
    gf = fft_flops(n_total, batch) / dt / 1e9
    gb = fft_min_bytes(n_total, batch) / dt / 1e9
    roof = device_hbm_gbps()
    return BenchResult(avg_ms=dt * 1e3, gflops=gf, eff_gbps=gb,
                       pct_roofline=100.0 * gb / roof, iters=iters)


def unrolled_chain_time(fn: Callable, x, *, unroll: int = 8,
                        reps: int = 12, barrier_steps: bool = True) -> float:
    """Per-application seconds with ``unroll`` applications compiled into ONE
    jitted program (y = fn(..fn(x))) and rep-chained dispatches on top.

    This amortizes the per-dispatch overhead of tunneled runtimes (which
    poisons per-call chains) across ``unroll``; it does NOT cancel it — use
    :func:`hbm_stream_time` for absolute bandwidth numbers (per-dispatch
    overhead through the tunnel measured ~26 ms, benches/r16_protocol.py).

    ``barrier_steps`` inserts ``lax.optimization_barrier`` between
    applications.  This is REQUIRED for foldable ``fn`` (an unbarriered
    8-deep ``v*c`` chain compiles to ONE multiply on both the CPU and TPU
    backends — r16 HLO audit: every unbarriered copy-probe chain was timing
    one HBM pass while dividing by ``unroll``) and keeps transform chains
    honest by stopping cross-application boundary fusion.
    ``fn`` must map an array to a same-shaped array.
    """
    @jax.jit
    def chain(v):
        for _ in range(unroll):
            v = fn(v)
            if barrier_steps:
                v = jax.lax.optimization_barrier(v)
        return v

    def barrier(v):
        # scalar readback via pure indexing — NEVER ravel/reshape here: a
        # reshape of a trailing-dim-2 array can pick a 64x-padded tiled
        # layout and allocate gigabytes for the copy (observed: 16 GB OOM
        # on a (8192, 4096, 2) f32 barrier)
        return float(v[(0,) * v.ndim])

    y = chain(x)
    barrier(y)
    t0 = time.perf_counter()
    z = x
    for _ in range(reps):
        z = chain(z)
    barrier(z)
    return max((time.perf_counter() - t0) / reps / unroll, 1e-9)


def slope_chain_time(fn: Callable, x, *, k1: int = 2, k2: int = 8,
                     reps: int = 3, barrier_steps: bool = True) -> float:
    """Per-application seconds via a two-depth unrolled-chain slope fit.

    Times one fully-synced dispatch of a barriered k-deep chain at depths
    ``k1 < k2`` (min over ``reps`` each) and returns
    ``(T(k2) - T(k1)) / (k2 - k1)``.  The subtraction CANCELS every
    per-dispatch fixed cost (tunnel round trip, dispatch, readback) that
    the divide-by-unroll protocol only amortizes — with the ~26 ms
    per-call overhead measured through the tunnel
    (benches/r16_protocol.py), an unroll=8 chain on a 33 MB array
    under-reports bandwidth ~10x.  Falls back to T(k2)/k2 if tunnel noise
    makes the slope non-positive.  ``fn`` must map an array to a
    same-shaped array.
    """
    def total(k):
        @jax.jit
        def chain(v):
            for _ in range(k):
                v = fn(v)
                if barrier_steps:
                    v = jax.lax.optimization_barrier(v)
            return v

        def sync(v):
            # pure indexing readback — NEVER ravel/reshape (see
            # unrolled_chain_time barrier note)
            return float(v[(0,) * v.ndim])

        sync(chain(x))                  # compile + warm
        best = float("inf")
        for _ in range(max(reps, 1)):
            t0 = time.perf_counter()
            sync(chain(x))
            best = min(best, time.perf_counter() - t0)
        return best

    if k2 <= k1:
        raise ValueError(f"slope_chain_time needs k2 > k1, got {k1=} {k2=}")
    t1 = total(k1)
    t2 = total(k2)
    if t2 <= t1:                        # noise swamped the added depth
        return max(t2 / k2, 1e-9)
    return (t2 - t1) / (k2 - k1)


#: Working-set floor for HBM-resident timing.  Subjects smaller than this
#: are replicated into independent round-robin buffers so the chained
#: applications cannot stay VMEM-resident between steps (r16 evidence: a
#: barriered 33 MB copy chain slope-measured 3.6 TB/s — VMEM bandwidth —
#: while an 811 MB subject in the same minutes measured 478 GB/s).
HBM_WORKING_SET_BYTES = 512 * 1024 * 1024


def hbm_stream_time(fn: Callable, x, *, copies: int | None = None,
                    depth: int | None = None, reps: int = 5) -> float:
    """Per-application seconds for an HBM-streaming application of ``fn``.

    The honest roofline quantity for a memory-bound transform is the time
    of one application whose input and output live in HBM.  Through the
    tunnel neither naive protocol measures it (benches/r16_protocol.py):

    - divide-by-unroll absorbs the per-dispatch overhead (~26 ms/dispatch
      measured) — a 33 MB subject reads 20x low;
    - a single-buffer barriered chain cancels the overhead via a two-depth
      slope but lets XLA keep the intermediate in VMEM — the same subject
      reads 4x HIGH (VMEM bandwidth); and overhead VARIANCE between the
      two depth measurements produces absurd outliers (an 8 TB/s "FFT",
      benches/r16b_stream_validate.py first cut).

    Protocol: cycle ``copies`` INDEPENDENT buffers round-robin inside one
    jitted program, with one ``optimization_barrier`` over the whole tuple
    per round — breadth-first scheduling, so each round's working set is
    ``copies * size`` and must stream through HBM.  ``copies`` defaults to
    whatever brings the working set to ``HBM_WORKING_SET_BYTES``.  Rounds
    per dispatch self-scale toward ~300 ms of device work (``depth``, if
    given, CAPS them — bounded device work for callers that need it);
    each dispatch is timed as a median over ``reps``, the directly
    measured null-dispatch cost (median of an empty jitted readback) is
    subtracted, and the result divides by ``rounds * copies``.  The
    subtraction removes the tunnel round trip; the deep chain bounds the
    damage of its variance.

    The rounds run under ``lax.scan`` (one compiled round body, arbitrary
    depth without compile blow-up), and ``depth`` self-scales from a pilot
    measurement so the chain's device time is ~TARGET_S — large enough
    that the overhead's heavy-tailed variance (+-10 ms observed) is a
    few-percent effect.  (A fixed depth=16 chain on a 400 MB copy is only
    ~28 ms of device work; overhead variance produced a 109%-of-spec
    reading — benches/logs/r16c.log.)
    """
    TARGET_S = 0.3
    max_depth = 4096 if depth is None else max(int(depth), 2)
    x = jnp.asarray(x)
    nbytes = x.size * x.dtype.itemsize
    if copies is None:
        # cap the round-robin tuple at 64 buffers — the scan body inlines
        # fn once per copy, and a 256-copy body of a plan graph took the
        # compiler >25 min through the tunnel (suite row 1, r4 session
        # 12).  Subjects under HBM_WORKING_SET_BYTES/64 (~8 MB) cannot be
        # fully forced out of VMEM residency this way — their number
        # reports the throughput of a resident pipeline of small ops
        # (latency-bound anyway), not an HBM stream rate
        copies = max(1, min(64, -(-HBM_WORKING_SET_BYTES // max(nbytes, 1))))
    xs = tuple(x + jnp.zeros_like(x) for _ in range(copies))

    def _median(vals):
        vals = sorted(vals)
        m = len(vals) // 2
        return vals[m] if len(vals) % 2 else 0.5 * (vals[m - 1] + vals[m])

    def _timed(call, arg, sync, nreps):
        sync(call(arg))                 # compile + warm
        ts = []
        for _ in range(max(nreps, 1)):
            t0 = time.perf_counter()
            sync(call(arg))
            ts.append(time.perf_counter() - t0)
        return _median(ts)

    def make_chain(k):
        @jax.jit
        def chain(vs):
            def body(carry, _):
                out = jax.lax.optimization_barrier(
                    tuple(fn(v) for v in carry))
                return out, None
            vs, _ = jax.lax.scan(body, vs, None, length=k)
            return vs
        return chain

    def sync_chain(vs):
        # readback forcing every chain (pure indexing; never ravel/reshape
        # — see unrolled_chain_time barrier note)
        acc = 0.0
        for v in vs:
            acc = acc + v[(0,) * v.ndim]
        return float(acc)

    @jax.jit
    def null(vs):
        return vs[0][(0,) * vs[0].ndim]

    t_null = _timed(null, xs, float, reps)

    def measure(k, nreps):
        t = _timed(make_chain(k), xs, sync_chain, nreps)
        work = t - t_null
        return work if work > 0 else t  # noise swamped the device work

    # cheap pilot, then rescale the depth toward TARGET_S of device work
    # (a heavy pilot costs half a minute on slow subjects; a light final
    # chain lets overhead variance through — r16d vs r16c logs).  An
    # explicit ``depth`` caps BOTH pilot and final chain (bounded device
    # work for callers that need it).
    k_pilot = max(2, min(4, max_depth))
    pilot = measure(k_pilot, 2)
    est_app = max(pilot / (k_pilot * copies), 1e-9)
    if est_app * copies * k_pilot >= TARGET_S:   # pilot already at target
        return est_app
    k = int(max(4, min(max_depth, round(TARGET_S / (est_app * copies)))))
    if k <= k_pilot:
        return est_app
    return max(measure(k, reps) / (k * copies), 1e-9)


@dataclass
class RobustBenchResult:
    avg_ms: float            # best-of-trials per-application time
    eff_gbps: float          # min_bytes / time
    pct_roofline: float      # vs the device spec HBM bandwidth
    copy_ceiling_gbps: float  # best measured same-session copy bandwidth
    vs_copy_ceiling: float   # eff_gbps / copy_ceiling (session-stable metric)
    trials: int
    unroll: int


def robust_bench(fn: Callable, x, min_bytes: float, *, unroll: int = 8,
                 reps: int = 8, trials: int = 3) -> RobustBenchResult:
    """Session-stable benchmark: ``trials`` alternating (transform, copy
    probe) measurements with the protocol-v2 HBM-stream methodology
    (:func:`hbm_stream_time`), best-of over trials for both.

    Interleaving the copy probe with the transform in every trial makes
    ``vs_copy_ceiling`` comparable across sessions (both numerator and
    denominator see the same device conditions).  ``fn`` must map an
    array to a same-shaped array.  ``unroll`` is a legacy v1 knob kept
    for caller compatibility; the v2 protocol self-scales its chain depth
    and ignores it (it is echoed in the result for provenance of OLD
    rows only — new rows should record ``protocol`` instead).
    """
    best_dt = float("inf")
    best_ceil = 0.0
    for _ in range(max(trials, 1)):
        dt = hbm_stream_time(fn, x, reps=max(reps // 2, 2))
        ceil = measured_copy_ceiling_gbps(x, unroll=unroll, reps=max(reps // 2, 2))
        best_dt = min(best_dt, dt)
        best_ceil = max(best_ceil, ceil)
    gb = min_bytes / best_dt / 1e9
    roof = device_hbm_gbps()
    return RobustBenchResult(
        avg_ms=best_dt * 1e3, eff_gbps=gb, pct_roofline=100.0 * gb / roof,
        copy_ceiling_gbps=best_ceil,
        vs_copy_ceiling=gb / best_ceil if best_ceil > 0 else 0.0,
        trials=trials, unroll=unroll)


def measured_copy_ceiling_gbps(x, *, unroll: int = 8, reps: int = 8) -> float:
    """Achievable bandwidth: time a pure elementwise copy (1 read + 1 write)
    of x's data with the same unrolled-chain methodology.  This is the
    *attainable* roofline for the current device+runtime, which may sit well
    below the hardware spec through the tunneled runtime.

    The probe runs on a freshly synthesized 2-D array of x's size — NOT a
    device reshape of x: a trailing dim of 2 can trigger a 64x-padded
    (8,128)-tiled layout on TPU that would under-report bandwidth, and the
    5-D->2-D reshape program itself has been observed to copy its input
    into a {batch-minor, T(2,128)} layout with 21x padding (16 GB HLO temp
    for a 768 MB array -> compile OOM; benches/logs/r10_forms2.log).

    Protocol v2 (benches/r16_protocol.py): the multiply chain is measured
    with :func:`hbm_stream_time` — barriered (an unbarriered chain folds
    to ONE multiply: r16 HLO audit showed every earlier ceiling inflated
    by its unroll factor), slope-differenced (cancels the ~26 ms
    per-dispatch tunnel overhead that made small-array ceilings read 20x
    low in the same minutes big arrays read true), and replicated to an
    HBM-sized working set (a single-buffer chain stays VMEM-resident and
    reads 3.6 TB/s)."""
    x = jnp.asarray(x)
    rows = max(int(x.shape[0]), 1)
    cols = max(int(x.size) // rows, 1)
    flat = jnp.zeros((rows, cols), x.dtype)
    # negation, NOT a near-1 multiply: 1.000001 rounds to exactly 1.0 in
    # bf16, and the algebraic simplifier then folds the whole chain to
    # identity — the r5 suite's first bf16 row read a 1128 GB/s "ceiling"
    # (past the 819 GB/s spec) from that null program.  Negation is exact
    # in every dtype, still 1 read + 1 write, and the per-round
    # optimization_barrier keeps the scan from cancelling -(-v).
    dt = hbm_stream_time(jnp.negative, flat, reps=max(reps // 2, 2))
    return 2 * flat.size * flat.dtype.itemsize / dt / 1e9
