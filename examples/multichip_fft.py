#!/usr/bin/env python
"""Example: distributed single-transform FFT over a device mesh.

Run (works on CPU with virtual devices):
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/multichip_fft.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    # decide the CPU fallback BEFORE any device query (device_count()
    # initializes the backend; platforms cannot change after that) — the
    # documented virtual-device command sets XLA_FLAGS
    if "xla_force_host_platform_device_count" in os.environ.get("XLA_FLAGS", ""):
        jax.config.update("jax_platforms", "cpu")
    if jax.device_count() < 2:
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    import jax.numpy as jnp
    import webgpufft_tpu as wft
    from webgpufft_tpu.parallel import sharded

    ndev = min(8, jax.device_count())
    mesh = sharded.make_mesh({"sp": ndev})
    n, batch = 2 ** 16, 2

    # plan-level surface: same options as create_plan, plus the mesh
    plan = wft.create_distributed_plan(type="c2c", shape=[n], batch=batch,
                                       direction="forward",
                                       mesh=mesh, seq_axis="sp")
    print(f"devices={ndev} n={n} route={plan.route.mode} "
          f"reasons={plan.route.reasons}")

    rng = np.random.default_rng(0)
    z = rng.standard_normal((batch, n)) + 1j * rng.standard_normal((batch, n))
    got = wft.uninterleave(np.asarray(plan(wft.interleave(z))))
    ref = np.fft.fft(z, axis=-1)
    err = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
    print(f"max rel err vs numpy: {err:.2e}")
    assert err < 1e-5

    # lower-level building block (digit-grid output, reshape to flat)
    fft = sharded.build_distributed_fft_1d(n, mesh, "sp", "forward")
    y = jax.jit(fft)(jnp.asarray(wft.interleave(z)))
    got2 = wft.uninterleave(np.asarray(y).reshape(batch, n, 2))
    assert np.max(np.abs(got2 - ref)) / np.max(np.abs(ref)) < 1e-5
    print(f"building-block digit split: {fft.split}")

    # sequence-parallel spectral analysis: a signal too long for one
    # chip, analyzed where it lives — the time axis stays sharded; only
    # the window-overlap halo (one ppermute) and an nf-float psum move
    from webgpufft_tpu.parallel import (build_distributed_stft,
                                        build_distributed_welch)
    sp_n = mesh.shape["sp"]
    nsig = 64 * (16 * sp_n - 1)          # frame count divides sp
    nw = 64 * 16 * sp_n + 192            # welch framing divides sp
    xs = rng.standard_normal(nw).astype(np.float32)
    f, t, stft_fn = build_distributed_stft(nsig, mesh, "sp",
                                           nperseg=256, noverlap=192)
    fw, welch_fn = build_distributed_welch(nw, mesh, "sp",
                                           nperseg=256, noverlap=192)
    with mesh:
        Z = stft_fn(xs[:nsig])
        P = welch_fn(xs)
    print(f"seq-parallel stft: {np.asarray(Z).shape} "
          f"(frames sharded over sp), welch peak at "
          f"{fw[int(np.argmax(np.asarray(P)))]:.3f}")


if __name__ == "__main__":
    main()