#!/usr/bin/env python
"""Compare XLA lowerings of the batched 1D FFT (background TPU experiment).

Forms:
  A) production W4-einsum recursion (core.axis.MixedAxisPlan)
  B) PQ+G "fused-style" ops as plain XLA: G-matmul on interleaved lanes,
     twiddle via lane const-pair, rows contraction via dot_general P/Q,
     digit-reversal reshape/transpose left to XLA
  C) form B with the digit reversal folded into a final gather

Run to completion; never kill mid-flight.
"""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import webgpufft_tpu as W
    from webgpufft_tpu.core import dft
    from webgpufft_tpu.core.cplx import to_w4, const_pair

    hi = jax.lax.Precision.HIGHEST
    rng = np.random.default_rng(0)
    n, batch = 1024, 4096
    n1 = n2 = 32
    x = jnp.asarray(rng.standard_normal((batch, n, 2)).astype(np.float32))
    zref = np.fft.fft((np.asarray(x)[..., 0] + 1j * np.asarray(x)[..., 1]), axis=-1)

    # ---- constants
    g1 = jnp.asarray(to_w4(dft.dft_matrix(n1, "forward")).reshape(2 * n1, 2 * n1))
    w2 = dft.dft_matrix(n2, "forward")
    f2re = jnp.asarray(np.ascontiguousarray(w2.real.astype(np.float32)))
    f2im = jnp.asarray(np.ascontiguousarray(w2.imag.astype(np.float32)))
    tw = np.exp(-2j * np.pi * (np.outer(np.arange(n2), np.arange(n1)) % n) / n)
    ta_, tb_ = const_pair(tw)  # (n2, n1, 2) -> broadcast over (b, n2row?, lanes)
    ta = jnp.asarray(ta_.reshape(n2, 2 * n1))
    tb = jnp.asarray(tb_.reshape(n2, 2 * n1))

    def swapadj(z):
        even = (jax.lax.broadcasted_iota(jnp.int32, z.shape, z.ndim - 1) % 2) == 0
        return jnp.where(even, jnp.roll(z, -1, axis=-1), jnp.roll(z, 1, axis=-1))

    sgn = jnp.asarray(np.tile(np.array([-1.0, 1.0], np.float32), n1))

    @jax.jit
    def form_b(x):
        v = x.reshape(batch, n2, 2 * n1)           # rows n2, interleaved n1
        dn = (((1,), (0,)), ((), ()))
        p = jnp.swapaxes(jax.lax.dot_general(v, f2re, dn, precision=hi), 1, 2)
        q = jnp.swapaxes(jax.lax.dot_general(v, f2im, dn, precision=hi), 1, 2)
        u = p + swapadj(q) * sgn                   # (b, k2, 2n1)
        u = u * ta + swapadj(u) * tb
        w = jax.lax.dot_general(u, g1, (((2,), (0,)), ((), ())), precision=hi)
        # w: (b, k2, 2k1) interleaved; digit reversal via reshape/transpose
        w = w.reshape(batch, n2, n1, 2).swapaxes(1, 2).reshape(batch, n, 2)
        return w

    def measure(f, label, iters=120):
        y = f(x)
        float(jnp.sum(y[..., :1, :1]))
        t0 = time.perf_counter()
        z = x
        for _ in range(iters):
            z = f(z)
        float(jnp.sum(z[..., :1, :1]))
        per = (time.perf_counter() - t0) / iters
        bw = 2 * x.size * 4 / per / 1e9
        print(f"{label}: per={per*1e3:.3f}ms effBW={bw:.0f} GB/s "
              f"({bw/8.19:.1f}%)", flush=True)

    # correctness of form B
    yb = np.asarray(form_b(x))
    zb = yb[..., 0] + 1j * yb[..., 1]
    print("formB relerr:", np.max(np.abs(zb - zref)) / np.max(np.abs(zref)), flush=True)

    plan = W.create_plan(type="c2c", shape=[n], batch=batch, tuning={"impl": "xla"})
    measure(plan, "formA-production")
    measure(form_b, "formB-pqg")

    # pure memcopy ceiling: y = x * 1.0 (1 read + 1 write)
    f_copy = jax.jit(lambda v: v * 1.000001)
    measure(f_copy, "copy-ceiling")

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
