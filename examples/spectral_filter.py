#!/usr/bin/env python
"""Example: frequency-domain low-pass filtering with r2c -> mask -> c2r.

Run: python examples/spectral_filter.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import webgpufft_tpu as wft


def main():
    n, batch = 1024, 8
    rng = np.random.default_rng(0)
    t = np.linspace(0, 1, n, endpoint=False)
    # mix of a slow tone and high-frequency noise
    x = (np.sin(2 * np.pi * 5 * t)[None, :]
         + 0.5 * rng.standard_normal((batch, n))).astype(np.float32)

    fwd = wft.create_plan(type="r2c", shape=[n], direction="forward", batch=batch)
    inv = wft.create_plan(type="c2r", shape=[n], direction="inverse",
                          normalize="backward", batch=batch)

    spectrum = fwd(x)                       # (batch, n//2+1, 2)
    cutoff = 20
    mask = (np.arange(n // 2 + 1) <= cutoff).astype(np.float32)[None, :, None]
    filtered = inv(spectrum * mask)         # (batch, n)

    noise_before = np.std(x - np.sin(2 * np.pi * 5 * t))
    noise_after = np.std(np.asarray(filtered) - np.sin(2 * np.pi * 5 * t))
    print(f"residual noise: before={noise_before:.3f} after={noise_after:.3f}")
    assert noise_after < noise_before / 3


if __name__ == "__main__":
    main()
