#!/usr/bin/env python
"""Example: TRAINING through the framework — gradient-based system
identification (learned deconvolution kernel) through the fftconv plan,
single-chip and distributed.

An unknown FIR system k_true filters known probe signals:

    y = conv(x, k_true) + noise          (boundary "linear-same")

and we recover k_true by minimizing  L(k) = mean((conv(x, k) - y)^2)
with optax.adam, differentiating straight THROUGH the plan's exec —
the spectral pipeline (pad -> FFT -> pointwise multiply -> inverse ->
crop) is jax-transparent, so one `jax.value_and_grad` gives the exact
adjoint and the whole training loop jits into a single lax.scan
program.  With a mesh, the SAME training step runs data-parallel over
'dp' (batch sharded) and sequence-parallel over 'sp' (signal axis
sharded through the distributed spectrum pipeline) — gradients of
distributed plans are pinned to the single-chip ones
(tests/test_autodiff.py::test_grad_distributed_sp), so the distributed
trajectory matches single-chip to f32 accuracy.

Run (works on CPU with virtual devices):
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/system_identification.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_problem(n: int, klen: int, batch: int, noise: float, seed: int = 0):
    """Probe signals x (batch, n), smooth FIR k_true (klen,), and the
    noisy observations y — all numpy f32, interleaved complex layout."""
    rng = np.random.default_rng(seed)
    t = np.linspace(-2.5, 2.5, klen)
    k_true = (np.exp(-t * t) * np.cos(3.0 * t)).astype(np.float32)
    k_true /= np.abs(k_true).sum()
    x = rng.standard_normal((batch, n)).astype(np.float32)
    return x, k_true, rng.standard_normal((batch, n)).astype(np.float32) \
        * noise


def make_trainer(n: int, klen: int, batch: int, steps: int, lr: float,
                 *, mesh=None):
    """Build fit(x, y, k0) -> (k_hat, losses): `steps` adam iterations,
    the whole loop one jitted lax.scan, gradients through plan.exec."""
    import jax
    import jax.numpy as jnp
    import optax
    import webgpufft_tpu as wft

    conv_opts = {"boundary": "linear-same", "kernelShape": [klen]}
    if mesh is not None:
        plan = wft.create_distributed_plan(
            type="fftconv", shape=[n], batch=batch, fftConv=conv_opts,
            mesh=mesh, batch_axis="dp", seq_axis="sp")
    else:
        plan = wft.create_plan(type="fftconv", shape=[n], batch=batch,
                               fftConv=conv_opts)

    def model(kern, x):
        ki = jnp.stack([kern, jnp.zeros_like(kern)], axis=-1)
        return plan.exec(x, kernel=ki)[..., 0]     # real part

    def loss(kern, x, y):
        return jnp.mean((model(kern, x) - y) ** 2)

    opt = optax.adam(lr)

    @jax.jit
    def fit(x, y, k0):
        xi = jnp.stack([x, jnp.zeros_like(x)], axis=-1)

        def body(carry, _):
            kern, state = carry
            val, g = jax.value_and_grad(loss)(kern, xi, y)
            upd, state = opt.update(g, state, kern)
            return (optax.apply_updates(kern, upd), state), val

        (k_hat, _), losses = jax.lax.scan(
            body, (k0, opt.init(k0)), None, length=steps)
        return k_hat, losses

    return fit


def run(n: int, klen: int, batch: int, steps: int, lr: float = 2e-2,
        noise: float = 1e-3, *, mesh=None, seed: int = 0):
    """Identify the system; returns (k_hat, k_true, losses) as numpy."""
    import jax.numpy as jnp

    x, k_true, eps = make_problem(n, klen, batch, noise, seed)
    fit = make_trainer(n, klen, batch, steps, lr, mesh=mesh)
    # observations from the TRUE kernel (any conv implementation works;
    # use numpy so the target is independent of the trained pipeline)
    pad = np.zeros((batch, n), np.float32)
    half = klen // 2
    for b in range(batch):
        pad[b] = np.convolve(x[b], k_true, mode="full")[half:half + n]
    y = pad + eps
    k_hat, losses = fit(jnp.asarray(x), jnp.asarray(y),
                        jnp.zeros(klen, jnp.float32))
    return np.asarray(k_hat), k_true, np.asarray(losses)


def main():
    import jax
    if "xla_force_host_platform_device_count" in os.environ.get(
            "XLA_FLAGS", ""):
        jax.config.update("jax_platforms", "cpu")
    from webgpufft_tpu.parallel import sharded

    n, klen, batch, steps = 512, 33, 8, 400

    k_hat, k_true, losses = run(n, klen, batch, steps)
    err = np.max(np.abs(k_hat - k_true)) / np.max(np.abs(k_true))
    print(f"single-chip: loss {losses[0]:.3e} -> {losses[-1]:.3e}, "
          f"kernel rel err {err:.2e}")
    assert losses[-1] < 1e-5 and err < 2e-2

    ndev = min(8, jax.device_count())
    if ndev >= 4:
        mesh = sharded.make_mesh({"dp": 2, "sp": ndev // 2})
        kd, _, ld = run(n, klen, batch, steps, mesh=mesh)
        dk = np.max(np.abs(kd - k_hat)) / np.max(np.abs(k_hat))
        print(f"distributed (dp=2 x sp={ndev // 2}): final loss "
              f"{ld[-1]:.3e}, kernel vs single-chip {dk:.2e}")
        assert dk < 1e-4           # gradient parity holds run-long (1e-7 obs)
    print("OK")


if __name__ == "__main__":
    main()
