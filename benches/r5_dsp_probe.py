#!/usr/bin/env python
"""On-chip probe of the round-3 DSP device paths.

Measures, with the suite's unrolled-chain + alternating-trial protocol
(CLAUDE.md rules), the throughput of the new device compute paths:

- sosfilt (lax.scan IIR) on a long batch — scan-bound, sets the
  expectation for the LTI/spline recursion family;
- lfilter FIR (fftconv plan route) on the same shape — the MXU path the
  scan should be compared against;
- ShortTimeFFT.stft/istft on a 2^20 signal (gcd-block framing + plan
  rfft + block overlap-add);
- envelope (rfft -> band slice -> ifft) on a 2^20 signal.

Appends one JSON line per row to benches/results_r3.jsonl.  Run as
`nohup python benches/r5_dsp_probe.py > /tmp/r5_dsp.log 2>&1 &` — never
under a timeout (CLAUDE.md TPU rules).
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp
import scipy.signal as ss

from webgpufft_tpu import filtering as FL
from webgpufft_tpu import ShortTimeFFT
from webgpufft_tpu.fftapi import envelope
from webgpufft_tpu.runtime.profile import unrolled_chain_time

OUT = "benches/results_r3.jsonl"


def record(row):
    row["bench"] = "r5_dsp/" + row["bench"]
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row), flush=True)


def time_fn(fn, x, unroll=8, trials=3):
    """Median unrolled-chain time per application, seconds.
    ``fn`` must map an array to a same-shaped array."""
    ts = []
    for _ in range(trials):
        ts.append(unrolled_chain_time(fn, x, unroll=unroll))
    return float(np.median(ts))


def main():
    print("backend:", jax.default_backend(), jax.devices())
    rng = np.random.default_rng(0)

    # --- IIR scan vs FIR MXU path, (batch, n) = (64, 2^16)
    x = jnp.asarray(rng.standard_normal((64, 1 << 16)), jnp.float32)
    sos = ss.butter(6, 0.2, output="sos")
    taps = ss.firwin(129, 0.2)
    t_iir = time_fn(lambda v: FL.sosfilt(sos, v), x)
    t_fir = time_fn(lambda v: FL.lfilter(taps, 1.0, v), x)
    nbytes = x.size * 4
    record({"bench": "sosfilt_b64_64k", "ms": t_iir * 1e3,
            "eff_gbps": 2 * nbytes / t_iir / 1e9})
    record({"bench": "lfilter_fir129_b64_64k", "ms": t_fir * 1e3,
            "eff_gbps": 2 * nbytes / t_fir / 1e9,
            "iir_over_fir": t_iir / t_fir})

    # --- ShortTimeFFT on 2^20 samples
    n = 1 << 20
    sig = jnp.asarray(rng.standard_normal(n), jnp.float32)
    A = ShortTimeFFT.from_window("hann", fs=1.0, nperseg=1024,
                                 noverlap=768)
    # the chain needs shape-preserving fns: time the stft+istft ROUNDTRIP
    t_rt = time_fn(lambda v: A.istft(A.stft(v), k1=n, interleaved=True),
                   sig, unroll=4)
    record({"bench": "shorttime_roundtrip_1m", "ms": t_rt * 1e3,
            "eff_gbps": 4 * n * 4 / t_rt / 1e9})

    # --- envelope on 2^20 samples
    t_env = time_fn(lambda v: envelope(v, residual=None), sig,
                    unroll=4)
    record({"bench": "envelope_1m", "ms": t_env * 1e3,
            "eff_gbps": 3 * n * 4 / t_env / 1e9})

    # --- IIR route A/B: sequential lax.scan vs associative parallel
    # prefix (the measured gate for filtering.IIR_ASSOC_MIN_N) —
    # strictly alternating trials per CLAUDE.md
    import webgpufft_tpu.filtering as FLmod
    import scipy.signal as ss2
    b2, a2 = ss2.butter(2, 0.25)
    xi = jnp.asarray(rng.standard_normal((4, 1 << 20)), jnp.float32)
    times = {"scan": [], "assoc": []}
    for _ in range(3):
        for mode in ("scan", "assoc"):
            old = FLmod.IIR_ASSOC_MIN_N
            FLmod.IIR_ASSOC_MIN_N = None if mode == "scan" else 1
            try:
                times[mode].append(unrolled_chain_time(
                    lambda v: FLmod.lfilter(b2, a2, v), xi, unroll=2))
            finally:
                FLmod.IIR_ASSOC_MIN_N = old
    t_scan = float(np.median(times["scan"]))
    t_assoc = float(np.median(times["assoc"]))
    record({"bench": "iir_route_ab_1m_k2",
            "scan_ms": t_scan * 1e3, "assoc_ms": t_assoc * 1e3,
            "assoc_speedup": t_scan / t_assoc,
            "verdict": "flip-to-assoc" if t_assoc < 0.8 * t_scan
            else "keep-scan"})

    print("r5_dsp probe done", time.strftime("%F %T"))


if __name__ == "__main__":
    main()
