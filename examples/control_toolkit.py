#!/usr/bin/env python
"""Filter-design / LTI-control workflow on the webgpufft_tpu toolboxes.

Design an anti-aliasing filter three ways (elliptic IIR via iirdesign,
equiripple FIR via remez, Kaiser via kaiserord), apply them on device,
then model a plant (mass-spring-damper), discretize it, simulate a
step + disturbance with the device lsim scans, and place closed-loop
poles with full-state feedback.

Runs on the DEFAULT jax backend (the real TPU on this box).  CPU smoke:
    python -c "import jax; jax.config.update('jax_platforms','cpu');
    import runpy; runpy.run_path('examples/control_toolkit.py', run_name='__main__')"
"""

import numpy as np

from webgpufft_tpu import filtering as flt
from webgpufft_tpu import ltisys as lts

fs = 2000.0
rng = np.random.default_rng(0)
t = np.arange(int(2 * fs)) / fs
x = (np.sin(2 * np.pi * 50 * t) + 0.7 * np.sin(2 * np.pi * 640 * t)
     + 0.1 * rng.standard_normal(t.size)).astype(np.float32)

# --- 1. three anti-aliasing designs for a 4x decimation (keep < 250 Hz)
sos = flt.iirdesign(200, 280, gpass=0.5, gstop=60, ftype="ellip",
                    output="sos", fs=fs)
taps_pm = flt.remez(121, [0, 200, 280, fs / 2], [1, 0], fs=fs)
n_k, beta = flt.kaiserord(60, width=80 / (fs / 2))
taps_k = flt.firwin(n_k | 1, 240, window=("kaiser", beta), fs=fs)
print(f"designs: ellip sos {sos.shape[0]} sections, remez {taps_pm.size} "
      f"taps, kaiser {taps_k.size} taps")

# --- 2. apply on device; compare the 640 Hz leakage after filtering
for name, y in [("ellip", flt.sosfiltfilt(sos, x)),
                ("remez", flt.lfilter(taps_pm, 1.0, x)),
                ("kaiser", flt.lfilter(taps_k, 1.0, x))]:
    Y = np.fft.rfft(np.asarray(y) * np.hanning(y.shape[-1]))
    f = np.fft.rfftfreq(y.shape[-1], 1 / fs)
    leak = np.abs(Y[np.argmin(np.abs(f - 640))])
    keep = np.abs(Y[np.argmin(np.abs(f - 50))])
    print(f"  {name:6s}: 640 Hz suppressed {20*np.log10(leak/keep):7.1f} dB"
          f" relative to the 50 Hz passband tone")

# --- 3. a plant: mass-spring-damper  x'' + 0.4 x' + 4 x = u
A = np.array([[0.0, 1.0], [-4.0, -0.4]])
B = np.array([[0.0], [1.0]])
C = np.array([[1.0, 0.0]])
D = np.array([[0.0]])
plant = lts.lti(A, B, C, D)
w, mag, phase = plant.bode(n=64)
print(f"plant resonance ~{w[np.argmax(mag)]:.2f} rad/s "
      f"({np.max(mag):.1f} dB peak)")

# open-loop step (device lsim scan under the hood)
T = np.linspace(0, 20, 600)
_, y_open = plant.step(T=T)
print(f"open-loop step: overshoot {np.max(np.asarray(y_open)) / 0.25:.2f}x "
      "of the dc gain")

# --- 4. full-state feedback: place the closed-loop poles
fsf = lts.place_poles(A, B, [-2.0 + 1.0j, -2.0 - 1.0j])
K = fsf.gain_matrix
Acl = A - B @ K
print(f"placed poles: {np.sort_complex(fsf.computed_poles)} "
      f"(rtol {fsf.rtol:.1e}), K = {K.ravel()}")
_, y_closed = lts.lti(Acl, B, C, D).step(T=T)
print(f"closed-loop step settles to {float(np.asarray(y_closed)[-1]):.4f} "
      f"with max {float(np.max(np.asarray(y_closed))):.4f}")

# --- 5. discretize and simulate a noisy digital loop at 50 Hz
dsys = lts.lti(Acl, B, C, D).to_discrete(0.02, method="zoh").to_ss()
u = np.ones(300) + 0.05 * rng.standard_normal(300)
td, yd, xd = lts.dlsim((dsys.A, dsys.B, dsys.C, dsys.D, dsys.dt), u)
print(f"digital loop: {yd.shape[0]} steps, final output "
      f"{float(np.asarray(yd)[-1, 0]):.4f}")
print("control_toolkit example OK")
