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

    print("r5_dsp probe done", time.strftime("%F %T"))


if __name__ == "__main__":
    main()
