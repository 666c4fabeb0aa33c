#!/usr/bin/env python
"""Signal-analysis workflow on the webgpufft_tpu scipy.signal facade.

A linear chirp buried in noise: locate it with a spectrogram, estimate
the noise floor with Welch, inspect a narrow band with zoom_fft, measure
envelope with hilbert, and denoise via stft -> threshold -> istft.

Runs on the DEFAULT jax backend (the real TPU on this box).  CPU smoke:
    python -c "import jax; jax.config.update('jax_platforms','cpu');
    import runpy; runpy.run_path('examples/signal_toolkit.py', run_name='__main__')"
"""

import numpy as np

from webgpufft_tpu import fft as wfft

fs = 8000.0
t = np.arange(4 * int(fs)) / fs
chirp = np.sin(2 * np.pi * (300 + 200 * t / t[-1]) * t)   # inst. freq 300 -> 700 Hz
rng = np.random.default_rng(0)
x = (chirp + 0.8 * rng.standard_normal(t.size)).astype(np.float32)

# 1. where is the energy? (per-segment PSD)
f, tt, S = wfft.spectrogram(x, fs=fs, nperseg=512)
S = np.asarray(S)
ridge = f[np.argmax(S, axis=0)]
print(f"spectrogram: {S.shape[1]} frames; ridge {ridge[2]:.0f} Hz -> "
      f"{ridge[-3]:.0f} Hz (chirp 300 -> ~700)")

# 2. average spectrum + noise floor
f, P = wfft.welch(x, fs=fs, nperseg=1024)
P = np.asarray(P)
print(f"welch: peak at {f[np.argmax(P)]:.0f} Hz, "
      f"floor {np.median(P):.2e} V^2/Hz")

# 3. zoom into the band of interest with m dense bins
zf = wfft.ascomplex(wfft.zoom_fft(x[:8192], [250 / (fs / 2), 750 / (fs / 2)],
                                  m=256))  # dense bins over the chirp band
print(f"zoom_fft: 256 bins over 250-750 Hz, peak |X| {np.abs(zf).max():.1f}")

# 4. envelope via the analytic signal
env = np.asarray(wfft.hilbert(x[:4096]))
amp = np.sqrt(env[..., 0] ** 2 + env[..., 1] ** 2)
print(f"hilbert envelope mean {amp.mean():.2f} (signal+noise RMS)")

# 5. denoise: stft -> magnitude threshold -> istft
f, tt, Z = wfft.stft(x, fs=fs, nperseg=512, noverlap=384)
Z = np.asarray(Z)
mag = np.sqrt(Z[..., 0] ** 2 + Z[..., 1] ** 2)
gate = (mag > 3 * np.median(mag))[..., None]
_, clean = wfft.istft(Z * gate, fs=fs, nperseg=512, noverlap=384)
clean = np.asarray(clean)[: x.size]
noise_in = np.mean((x - chirp) ** 2)
noise_out = np.mean((clean - chirp) ** 2)
print(f"stft denoise: residual noise power {noise_in:.3f} -> {noise_out:.3f} "
      f"({10 * np.log10(noise_in / noise_out):.1f} dB gain)")
