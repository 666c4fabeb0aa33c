#!/usr/bin/env python
"""numpy/scipy-style usage of webgpufft_tpu via the functional façade.

The plan API (create_plan) is the reference-parity surface; this façade is
for users who think in numpy.fft / scipy.fft / scipy.signal calls.  Each
call runs a plan memoized in the default PlanCache, so the second
same-shape call executes at plan speed.

Runs on the DEFAULT jax backend (the real TPU on this box).  For a CPU
smoke run:  python -c "import jax; jax.config.update('jax_platforms','cpu');
exec(open('examples/scipy_style.py').read())"
"""

import numpy as np

from webgpufft_tpu import fft as wfft

rng = np.random.default_rng(0)

# --- complex spectra: numpy norm conventions, axes, crop/pad
z = rng.standard_normal((8, 1024)) + 1j * rng.standard_normal((8, 1024))
Y = wfft.fft(z, norm="ortho")                 # interleaved (..., 2) out
back = wfft.ascomplex(wfft.ifft(Y, norm="ortho"))
print("fft/ifft ortho roundtrip err:", np.max(np.abs(back - z)))

# --- real transforms: packed half-spectra
x = rng.standard_normal((4, 256, 256)).astype(np.float32)
spec = wfft.rfft2(x)                          # (..., 256, 129, 2)
x2 = np.asarray(wfft.irfft2(spec))
print("rfft2/irfft2 roundtrip err:", np.max(np.abs(x2 - x)))

# --- low-pass filter in the frequency domain
keep = 24
mask = np.zeros((256, 129), np.float32)
mask[:keep, :keep] = 1
mask[-keep:, :keep] = 1
filtered = np.asarray(wfft.irfft2(np.asarray(spec) * mask[..., None]))
print("low-pass output shape:", filtered.shape)

# --- scipy.fft DCT with orthonormal weights
c = wfft.dct(x, type=2, norm="ortho", axis=-1)
x3 = np.asarray(wfft.idct(c, type=2, norm="ortho", axis=-1))
print("dct-II ortho roundtrip err:", np.max(np.abs(x3 - x)))

# --- scipy.signal-style FFT convolution
sig = rng.standard_normal((16, 4096)).astype(np.float32)
kern = np.blackman(129).astype(np.float32)[None, :]
sm = np.asarray(wfft.fftconvolve(sig, kern, mode="same", axes=(1,)))
print("fftconvolve same output:", sm.shape)

print("next_fast_len(1000) ->", wfft.next_fast_len(1000))

# --- short-time Fourier analysis (scipy.signal semantics)
tone = (np.sin(2 * np.pi * 440 * np.arange(16000) / 8000)
        + 0.05 * rng.standard_normal(16000)).astype(np.float32)
f, t, Z = wfft.stft(tone, fs=8000.0, nperseg=512, noverlap=384)
peak = f[np.argmax(np.mean(np.abs(wfft.ascomplex(Z)), axis=1))]
_, back = wfft.istft(Z, fs=8000.0, nperseg=512, noverlap=384)
print(f"stft grid {Z.shape[:-1]}, dominant bin {peak:.0f} Hz, "
      f"istft roundtrip err {np.max(np.abs(np.asarray(back)[:16000] - tone)):.2e}")
