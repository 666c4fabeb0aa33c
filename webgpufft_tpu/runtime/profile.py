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
                        reps: int = 12) -> float:
    """Per-application seconds with ``unroll`` applications compiled into ONE
    jitted program (y = fn(..fn(x))) and rep-chained dispatches on top.

    This isolates device time from the per-dispatch overhead of tunneled
    runtimes (measured ~0.2-0.4 ms/dispatch), which poisons per-call chains.
    ``fn`` must map an array to a same-shaped array.
    """
    @jax.jit
    def chain(v):
        for _ in range(unroll):
            v = fn(v)
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
    probe) measurements with the unrolled-chain methodology, best-of over
    trials for both.

    Device throughput on the tunneled runtime swings 60-420 GB/s between
    minutes (docs/PERFORMANCE.md), so per-dispatch timing with readback
    subtraction is not reproducible; interleaving the copy probe with the
    transform in every trial makes ``vs_copy_ceiling`` comparable across
    sessions (both numerator and denominator see the same throughput
    regime).  ``fn`` must map an array to a same-shaped array.
    """
    best_dt = float("inf")
    best_ceil = 0.0
    for _ in range(max(trials, 1)):
        dt = unrolled_chain_time(fn, x, unroll=unroll, reps=reps)
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
    for a 768 MB array -> compile OOM; benches/logs/r10_forms2.log)."""
    x = jnp.asarray(x)
    rows = max(int(x.shape[0]), 1)
    cols = max(int(x.size) // rows, 1)
    flat = jnp.zeros((rows, cols), x.dtype)
    dt = unrolled_chain_time(lambda v: v * 1.000001, flat, unroll=unroll, reps=reps)
    return 2 * flat.size * flat.dtype.itemsize / dt / 1e9
