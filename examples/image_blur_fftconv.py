#!/usr/bin/env python
"""Example: 2-D Gaussian blur via fftconv with linear-same boundary.

Run: python examples/image_blur_fftconv.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import webgpufft_tpu as wft


def gaussian_kernel(k: int, sigma: float) -> np.ndarray:
    ax = np.arange(k) - (k - 1) / 2
    g = np.exp(-(ax ** 2) / (2 * sigma ** 2))
    g2 = np.outer(g, g)
    return (g2 / g2.sum()).astype(np.float32)


def main():
    h, w, k = 128, 128, 9
    rng = np.random.default_rng(0)
    img = rng.random((1, h, w)).astype(np.float32)

    plan = wft.create_plan(type="fftconv", shape=[h, w], batch=1,
                           fftConv={"boundary": "linear-same",
                                    "kernelShape": [k, k]})
    kern = gaussian_kernel(k, 2.0)
    out = plan.exec(wft.interleave(img.astype(np.complex64)),
                    kernel=wft.interleave(kern.astype(np.complex64)))
    blurred = wft.uninterleave(np.asarray(out)).real[0]

    assert blurred.shape == (h, w)
    assert blurred.std() < img[0].std()  # blurring reduces variance
    print(f"std before={img[0].std():.4f} after={blurred.std():.4f}")


if __name__ == "__main__":
    main()
