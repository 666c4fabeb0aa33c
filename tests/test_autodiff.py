"""Differentiability and vmap composition of the plan layer and facade.

Every pipeline in the framework is a pure jax function, so jax.grad /
jvp / vjp / vmap compose with plan exec and the facade for free — a
capability the reference (imperative WGSL dispatch recording) cannot
offer at all.  These tests PIN that property so a regression (an eager
numpy escape, a non-traceable eager check, an int cast on a tracer)
cannot silently ship.

Oracles are closed-form gradients: Parseval gives d/dx sum|Fx|^2 = 2n x
for the unnormalized forward FFT; a 'full' convolution sums to
(sum x)(sum k), so d/dk = sum(x); an ortho roundtrip is the identity.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import webgpufft_tpu as W
from webgpufft_tpu import fftapi as F
from webgpufft_tpu.parallel import sharded


def _interleave(rng, *shape):
    z = rng.standard_normal((*shape, 2)).astype(np.float32)
    return jnp.asarray(z)


# ---------------------------------------------------------------------------
# Plan layer
# ---------------------------------------------------------------------------

def test_grad_plan_c2c_parseval(rng, assert_close):
    """d/dx sum|F x|^2 = 2 n x (forward, normalize='none')."""
    n, b = 32, 4
    plan = W.create_plan(type="c2c", shape=[n], batch=b)
    x = _interleave(rng, b, n)

    def loss(x):
        return jnp.sum(plan.exec(x) ** 2)

    g = jax.grad(loss)(x)
    assert_close(np.asarray(g), 2.0 * n * np.asarray(x), label="c2c grad")
    # jit(grad) composes too
    gj = jax.jit(jax.grad(loss))(x)
    assert_close(np.asarray(gj), np.asarray(g), atol_scale=1e-6,
                 label="jit(grad)")


def test_grad_plan_roundtrip_identity(rng, assert_close):
    """grad of sum(w * ifft(fft(x))) through two plans is exactly w."""
    n, b = 24, 3
    fwd = W.create_plan(type="c2c", shape=[n], batch=b, normalize="unitary")
    inv = W.create_plan(type="c2c", shape=[n], batch=b, normalize="unitary",
                        direction="inverse")
    x = _interleave(rng, b, n)
    w = _interleave(rng, b, n)

    def loss(x):
        return jnp.sum(w * inv.exec(fwd.exec(x)))

    g = jax.grad(loss)(x)
    assert_close(np.asarray(g), np.asarray(w), atol_scale=1e-5,
                 label="roundtrip grad")


def test_jvp_linearity_r2c(rng, assert_close):
    """Transforms are linear: jvp(f, x, v) == f(v), exactly."""
    n, b = 40, 2
    plan = W.create_plan(type="r2c", shape=[n], batch=b)
    x = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32))
    y, t = jax.jvp(lambda x: plan.exec(x), (x,), (v,))
    assert_close(np.asarray(t), np.asarray(plan.exec(v)), atol_scale=1e-6,
                 label="jvp == apply")


def test_vjp_adjoint_inner_product(rng, assert_close):
    """<f(x), u> == <x, vjp(u)> (the defining adjoint identity) for the
    interleaved real representation of the FFT."""
    n, b = 16, 2
    plan = W.create_plan(type="c2c", shape=[n], batch=b)
    x = _interleave(rng, b, n)
    u = _interleave(rng, b, n)
    y, vjp_fn = jax.vjp(lambda x: plan.exec(x), x)
    (xt,) = vjp_fn(u)
    lhs = float(jnp.vdot(y, u))
    rhs = float(jnp.vdot(x, xt))
    assert abs(lhs - rhs) / max(abs(lhs), 1e-12) < 1e-5


def test_vmap_plan_exec(rng, assert_close):
    """vmap over an extra leading dim == the same plan at a wider batch."""
    n, k = 32, 6
    p1 = W.create_plan(type="c2c", shape=[n], batch=1)
    pk = W.create_plan(type="c2c", shape=[n], batch=k)
    x = _interleave(rng, k, 1, n)
    y = jax.vmap(lambda xi: p1.exec(xi))(x)
    ref = pk.exec(x.reshape(k, n, 2))
    assert_close(np.asarray(y).reshape(k, n, 2), np.asarray(ref),
                 atol_scale=1e-6, label="vmap == batch")


def test_grad_through_distributed_plans(rng, assert_close):
    """jax.grad flows through the distributed plan exec (shard_map
    collectives differentiate), and the gradient equals the single-chip
    plan's gradient — the adjoint-solver use case (e.g. spectral PDE
    inverse problems over a mesh)."""
    n = 32
    mesh = sharded.make_mesh({"sp": 8})
    dist = W.create_distributed_plan(type="r2c", shape=[n, n], batch=1,
                                     direction="forward",
                                     normalize="unitary",
                                     mesh=mesh, seq_axis="sp")
    local = W.create_plan(type="r2c", shape=[n, n], batch=1,
                          direction="forward", normalize="unitary")
    x = jnp.asarray(rng.standard_normal((1, n, n)).astype(np.float32))
    w = jnp.asarray(
        rng.standard_normal((1, n // 2 + 1, n, 2)).astype(np.float32))
    gd = jax.grad(lambda v: jnp.sum(w * dist.exec(v)))(x)
    gl = jax.grad(lambda v: jnp.sum(w * local.exec(v)))(x)
    assert_close(np.asarray(gd), np.asarray(gl), atol_scale=1e-5,
                 label="distributed grad == local grad")
    # pencil decomposition differentiates too
    pmesh = sharded.make_mesh({"sp1": 2, "sp2": 4})
    pp = W.create_distributed_plan(type="c2c", shape=[n, n], batch=1,
                                   direction="forward",
                                   normalize="unitary",
                                   mesh=pmesh, seq_axis=("sp1", "sp2"))
    lc = W.create_plan(type="c2c", shape=[n, n], batch=1,
                       direction="forward", normalize="unitary")
    z = jnp.asarray(rng.standard_normal((1, n, n, 2)).astype(np.float32))
    gp = jax.grad(lambda v: jnp.sum(pp.exec(v) ** 2))(z)
    gc = jax.grad(lambda v: jnp.sum(lc.exec(v) ** 2))(z)
    assert_close(np.asarray(gp), np.asarray(gc), atol_scale=1e-5,
                 label="pencil grad == local grad")


def test_grad_fftconv_kernel(rng, assert_close):
    """d/dk sum((x conv k)_full) = sum(x) * ones (exact)."""
    n, kn, b = 64, 9, 2
    plan = W.create_plan(type="fftconv", shape=[n], batch=b,
                         fftConv={"boundary": "linear-full",
                                  "kernelShape": [kn]})
    x = _interleave(rng, b, n)
    k = _interleave(rng, 1, kn)

    def loss(k):
        return jnp.sum(plan.exec(x, kernel=k))

    g = np.asarray(jax.grad(loss)(k))
    sx = np.sum(np.asarray(x), axis=(0, 1))          # (2,): sum re, sum im
    # complex product: d/dk_re sums (x_re - x_im*i) contributions; for the
    # sum of BOTH output components the cotangent is ones on re and im, so
    # dL/dk_re = sum(x_re) + sum(x_im), dL/dk_im = sum(x_re) - sum(x_im).
    want = np.empty_like(g)
    want[..., 0] = b * 0 + (sx[0] + sx[1])
    want[..., 1] = sx[0] - sx[1]
    assert_close(g, np.broadcast_to(want, g.shape), atol_scale=1e-5,
                 label="conv kernel grad")


# ---------------------------------------------------------------------------
# Facade
# ---------------------------------------------------------------------------

def test_grad_facade_fft_parseval(rng, assert_close):
    n = 48
    x = _interleave(rng, 3, n)

    def loss(x):
        return jnp.sum(F.fft(x, interleaved=True) ** 2)

    g = jax.grad(loss)(x)
    assert_close(np.asarray(g), 2.0 * n * np.asarray(x), label="facade grad")


def test_grad_facade_fftconvolve(rng, assert_close):
    """Real-path facade convolution: d/dk sum(full conv) = sum(x)."""
    x = jnp.asarray(rng.standard_normal((32,)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((7,)).astype(np.float32))

    g = jax.grad(lambda k: jnp.sum(F.fftconvolve(x, k, "full")))(k)
    want = np.full((7,), float(jnp.sum(x)), np.float32)
    assert_close(np.asarray(g), want, atol_scale=1e-5, label="facade conv grad")


def test_jvp_facade_stft_linear(rng, assert_close):
    """STFT (gcd-block framing path) is linear in the signal; jvp == apply."""
    x = jnp.asarray(rng.standard_normal((512,)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((512,)).astype(np.float32))

    def f(x):
        return F.stft(x, nperseg=64, noverlap=16)[2]

    y, t = jax.jvp(f, (x,), (v,))
    assert_close(np.asarray(t), np.asarray(f(v)), atol_scale=1e-6,
                 label="stft jvp")


def test_vmap_facade_dct(rng, assert_close):
    x = rng.standard_normal((5, 20)).astype(np.float32)
    y = jax.vmap(lambda r: F.dct(jnp.asarray(r), norm="ortho"))(jnp.asarray(x))
    ref = F.dct(jnp.asarray(x), norm="ortho")
    assert_close(np.asarray(y), np.asarray(ref), atol_scale=1e-6,
                 label="vmap dct")


# ---------------------------------------------------------------------------
# Distributed (shard_map pipelines differentiate too)
# ---------------------------------------------------------------------------

def test_grad_distributed_sp(rng, assert_close):
    mesh = sharded.make_mesh({"sp": 8})
    n, b = 64, 2
    plan = W.create_distributed_plan(type="c2c", shape=[n], batch=b,
                                     mesh=mesh, seq_axis="sp")
    x = _interleave(rng, b, n)

    g = jax.grad(lambda x: jnp.sum(plan(x) ** 2))(x)
    assert_close(np.asarray(g), 2.0 * n * np.asarray(x),
                 label="distributed grad")


def test_grad_distributed_pencil(rng, assert_close):
    mesh = sharded.make_mesh({"sp0": 2, "sp1": 4})
    shape, b = [8, 16], 2
    plan = W.create_distributed_plan(type="c2c", shape=shape, batch=b,
                                     mesh=mesh, seq_axis=("sp0", "sp1"))
    x = _interleave(rng, b, *shape)
    nt = int(np.prod(shape))

    g = jax.grad(lambda x: jnp.sum(plan(x) ** 2))(x)
    assert_close(np.asarray(g), 2.0 * nt * np.asarray(x),
                 label="pencil grad")
